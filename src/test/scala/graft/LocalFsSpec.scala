package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Write-once cache plumbing: content-fingerprinted tags (a regenerated
  * corpus can never serve a stale artifact), invalid-dest repair, and
  * stale-orphan sweeping.
  */
class LocalFsSpec extends AnyFunSuite {

  private def mkTmp(): File = Files.createTempDirectory("graft_fs").toFile

  test("sourceFingerprint changes when source content is regenerated") {
    val dir = mkTmp()
    val f = new File(dir, "t.parquet")
    Files.writeString(f.toPath, "aaa")
    val fp1 = LocalFs.sourceFingerprint(f)
    Files.writeString(f.toPath, "aaaa")
    val fp2 = LocalFs.sourceFingerprint(f)
    assert(fp1 != fp2)
    // directories fingerprint their contents recursively
    assert(LocalFs.sourceFingerprint(dir) == LocalFs.sourceFingerprint(dir))
  }

  test("publishDir repairs an invalid dest and sweeps stale tmp orphans") {
    val root = mkTmp()
    val dest = new File(root, "cache")
    // crashed legacy writer: dest exists without a complete marker
    dest.mkdirs()
    Files.writeString(new File(dest, "partial").toPath, "junk")
    // stale orphan from a crashed session (old mtime → presumed dead)
    val orphan = new File(root, "cache.tmp.dead")
    orphan.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    val tmp = new File(root, "cache.tmp.live")
    tmp.mkdirs()
    Files.writeString(new File(tmp, "_SUCCESS").toPath, "")
    Files.writeString(new File(tmp, "data").toPath, "good")
    assert(LocalFs.publishDir(tmp, dest, destValid = false))
    assert(new File(dest, "data").exists())
    assert(new File(dest, "_SUCCESS").exists())
    assert(!new File(dest, "partial").exists())
    assert(!orphan.exists(), "stale orphan should be swept")
  }

  test("publishDir lost race discards tmp and keeps the winner's artifact") {
    val root = mkTmp()
    val dest = new File(root, "cache")
    dest.mkdirs()
    Files.writeString(new File(dest, "_SUCCESS").toPath, "")
    Files.writeString(new File(dest, "data").toPath, "winner")
    val tmp = new File(root, "cache.tmp.loser")
    tmp.mkdirs()
    Files.writeString(new File(tmp, "data").toPath, "loser")
    assert(!LocalFs.publishDir(tmp, dest, destValid = true))
    assert(!tmp.exists(), "losing tmp should be discarded")
    assert(Files.readString(new File(dest, "data").toPath) == "winner")
  }
}

package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Write-once cache plumbing: content-fingerprinted tags (a regenerated
  * corpus can never serve a stale artifact), invalid-dest repair, stale
  * orphan sweeping, and superseded-fingerprint cleanup.
  */
class LocalFsSpec extends AnyFunSuite {

  private def mkTmp(): File = Files.createTempDirectory("graft_fs").toFile

  test("sourceFingerprint changes on regeneration and rejects missing paths") {
    val dir = mkTmp()
    val f = new File(dir, "t.parquet")
    Files.writeString(f.toPath, "aaa")
    val fp1 = LocalFs.sourceFingerprint(f)
    Files.writeString(f.toPath, "aaaa")
    val fp2 = LocalFs.sourceFingerprint(f)
    assert(fp1 != fp2)
    // directories fingerprint their contents recursively
    assert(LocalFs.sourceFingerprint(dir) == LocalFs.sourceFingerprint(dir))
    // a missing source must fail loudly, not fingerprint as a constant
    intercept[IllegalArgumentException] {
      LocalFs.sourceFingerprint(new File(dir, "nope.parquet"))
    }
  }

  test("cachePath changes with the source and sweeps superseded siblings") {
    val dir = mkTmp()
    val src = new File(dir, "t.parquet")
    Files.writeString(src.toPath, "v1")
    val p1 = LocalFs.cachePath("graft_fs_spec_", dir.getPath, src)
    new File(p1).mkdirs()
    Files.writeString(new File(p1, "artifact").toPath, "old")
    Files.writeString(src.toPath, "v2-longer") // regenerate in place
    val p2 = LocalFs.cachePath("graft_fs_spec_", dir.getPath, src)
    assert(p1 != p2)
    // the v1 artifact is superseded — cachePath removed it
    assert(!new File(p1).exists(), "superseded cache dir should be swept")
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
    orphan.setLastModified(System.currentTimeMillis() - 13L * 60 * 60 * 1000)
    val tmp = new File(root, "cache.tmp.live")
    tmp.mkdirs()
    Files.writeString(new File(tmp, "_SUCCESS").toPath, "")
    Files.writeString(new File(tmp, "data").toPath, "good")
    assert(LocalFs.publishDir(tmp, dest,
      destValid = () => new File(dest, "_SUCCESS").exists()))
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
    assert(!LocalFs.publishDir(tmp, dest, destValid = () => true))
    assert(!tmp.exists(), "losing tmp should be discarded")
    assert(Files.readString(new File(dest, "data").toPath) == "winner")
  }

  test("sweepAged removes only aged prefix-matching siblings") {
    // the crashed-session GC behind per-session sink dirs: a dead session's
    // hour-old directory goes; a LIVE concurrent session's (younger than
    // TTL), the caller's own, and foreign-prefix entries all stay
    val parent = mkTmp()
    def mk(name: String, aged: Boolean): File = {
      val d = new File(parent, name)
      d.mkdirs()
      if (aged) d.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000)
      d
    }
    val dead = mk("sink_a_dead", aged = true)
    val live = mk("sink_a_live", aged = false)
    val self = mk("sink_a_self", aged = true) // excluded even when aged
    val foreign = mk("other_x", aged = true)
    LocalFs.sweepAged(parent, "sink_a_", keep = self, ttlMs = 3600 * 1000L)
    assert(!dead.exists(), "aged sibling should be swept")
    assert(live.exists(), "young sibling must survive (live session)")
    assert(self.exists(), "keep-dir must survive")
    assert(foreign.exists(), "foreign prefix must survive")
  }

  test("name registry: no sweeper prefix can reach any published cache") {
    // the round-6 bug class, pinned structurally: every prefix any TTL
    // sweeper deletes by must be unable to match a published cache name.
    for (s <- LocalFs.Names.sweptPrefixes; c <- LocalFs.Names.publishedCaches)
      assert(!LocalFs.Names.hazardous(s, c),
        s"sweeper prefix '$s' can delete published cache '$c*'")
    // the checker itself has teeth: the r6 pairing IS flagged...
    assert(LocalFs.Names.hazardous("graft_cdc_", LocalFs.Names.CdcLandingCache))
    // ...an extension of a cache name in name-legal chars is flagged...
    assert(LocalFs.Names.hazardous(
      LocalFs.Names.CdcLandingCache + "_x", LocalFs.Names.CdcLandingCache))
    // ...but publishDir's `.tmp.` orphan prefixes are structurally safe
    // (the dot can never occur in a published cache name)
    assert(!LocalFs.Names.hazardous(
      LocalFs.Names.CdcLandingCache + "_sf_ab12cd34.tmp.",
      LocalFs.Names.CdcLandingCache))
  }

  test("sweepAged refuses a prefix that could delete a published cache") {
    val parent = mkTmp()
    // the exact r6 call shape: sweeping graft_cdc_ would reach the landing
    intercept[IllegalArgumentException] {
      LocalFs.sweepAged(parent, "graft_cdc_", keep = new File(parent, "w"),
        ttlMs = 3600 * 1000L)
    }
    // a registered disjoint prefix is accepted
    LocalFs.sweepAged(parent, LocalFs.Names.CdcReplay,
      keep = new File(parent, "w"), ttlMs = 3600 * 1000L)
  }

  test("publishDir re-evaluates validity at delete time (stale verdict is safe)") {
    // session B computed destValid=false earlier, but session A has since
    // published a complete artifact; B's publish must NOT tear it down
    val root = mkTmp()
    val dest = new File(root, "cache")
    dest.mkdirs()
    Files.writeString(new File(dest, "_SUCCESS").toPath, "")
    Files.writeString(new File(dest, "data").toPath, "winner")
    val tmp = new File(root, "cache.tmp.stale")
    tmp.mkdirs()
    Files.writeString(new File(tmp, "data").toPath, "stale-session")
    // the CLOSURE sees the current (valid) state even though the session's
    // earlier check said invalid
    assert(!LocalFs.publishDir(tmp, dest,
      destValid = () => new File(dest, "_SUCCESS").exists()))
    assert(Files.readString(new File(dest, "data").toPath) == "winner")
  }

  test("sink allocation touches its own dir so a concurrent sweep spares a live session") {
    // the sink-GC race: a session OLDER than the sweep TTL whose sink key
    // re-executes late has a stale-looking dir mtime exactly when a
    // concurrent session allocates (and sweeps). sessionSinkPath defuses
    // it by touching the dir at every allocation/reuse — age is measured
    // from last USE, not first creation.
    val prefix = s"graft_fs_sink_${System.nanoTime()}_"
    val parent = new File(sys.props("java.io.tmpdir"))
    try {
      val mine = new File(ops.Sources.sessionSinkPath("app-live", prefix))
      assert(mine.exists())
      // an hour of session idling: the dir's mtime goes stale
      mine.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000)
      // late re-execution of the sink key in the SAME session refreshes it
      assert(ops.Sources.sessionSinkPath("app-live", prefix) == mine.getPath)
      assert(mine.lastModified() > System.currentTimeMillis() - 60 * 1000)
      // so a concurrent session's allocation sweep must spare it...
      ops.Sources.sessionSinkPath("app-other", prefix)
      assert(mine.exists(), "live session's sink dir was swept")
      // ...while a genuinely dead sibling (stale mtime, never re-touched)
      // is collected by the same sweep
      val dead = new File(parent, prefix + "app-dead")
      dead.mkdirs()
      dead.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000)
      ops.Sources.sessionSinkPath("app-other2", prefix)
      assert(!dead.exists(), "dead session's sink dir survived the sweep")
    } finally {
      parent.listFiles().filter(_.getName.startsWith(prefix))
        .foreach(LocalFs.deleteRecursively)
    }
  }
}

package graft

import java.io.File

/** Local-FS helpers for write-once shared caches (bucketed layouts, CSV
  * materializations, persisted models). Publishing is done by writing to a
  * session-unique temp directory and RENAMING it into place: a rename is
  * atomic on a local filesystem, so the stable path only ever contains a
  * COMPLETE artifact — two sessions racing on first materialization cannot
  * interleave files, and a crash mid-write never poisons the cache. (On an
  * object store the analog is a commit-marker protocol; the Hadoop
  * committer used by the sinks does exactly that.)
  */
object LocalFs {

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles).getOrElse(Array.empty[File]).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Atomically publish `tmp` at `dest`. Returns true if this call won;
    * on a lost race the tmp artifact is discarded and the winner's stands.
    * `destValid` guards an existing-but-incomplete dest (crashed legacy
    * writer): when false it is cleared before the rename attempt. The
    * validity marker (`_SUCCESS`) is deleted FIRST, so a repair that dies
    * (or races a concurrent publisher) mid-delete can never leave a dest
    * that still passes the `_SUCCESS` guard while missing data files.
    * Sibling `<dest>.tmp.*` orphans stranded by crashed sessions are swept
    * opportunistically — only when stale by `OrphanTtlMs` (an in-flight
    * concurrent writer's fresh tmp is never touched; if one ever were, its
    * rename would lose the race and it falls back to the winner's dest).
    */
  def publishDir(tmp: File, dest: File, destValid: Boolean): Boolean = {
    if (dest.exists() && !destValid) {
      new File(dest, "_SUCCESS").delete()
      deleteRecursively(dest)
    }
    val won = tmp.renameTo(dest)
    if (!won) deleteRecursively(tmp)
    sweepOrphans(dest, keep = tmp)
    won
  }

  /** Cheap content fingerprint of source parquet paths (file or directory):
    * a hash over every file's (name, length, mtime). Folded into write-once
    * cache tags (CSV materializations, bucketed layouts, persisted models)
    * so regenerating a corpus IN PLACE changes the tag and provably
    * rebuilds, instead of silently serving stale artifacts.
    */
  def sourceFingerprint(paths: File*): String = {
    def stat(f: File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[File])
          .sortBy(_.getName).toSeq.flatMap(stat)
      else Seq(s"${f.getName}:${f.length}:${f.lastModified}")
    val s = paths.flatMap(stat).mkString("|")
    f"${scala.util.hashing.MurmurHash3.stringHash(s)}%08x"
  }

  /** Age after which a stranded `<dest>.tmp.<appId>` directory is presumed
    * dead (crashed writer) rather than in-flight.
    */
  private val OrphanTtlMs = 60L * 60 * 1000

  private def sweepOrphans(dest: File, keep: File): Unit = {
    val prefix = dest.getName + ".tmp."
    val now = System.currentTimeMillis()
    Option(dest.getParentFile).flatMap(p => Option(p.listFiles))
      .getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(prefix) && f != keep &&
        now - f.lastModified() > OrphanTtlMs)
      .foreach(deleteRecursively)
  }
}

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
    * writer): when false it is cleared before the rename attempt.
    */
  def publishDir(tmp: File, dest: File, destValid: Boolean): Boolean = {
    if (dest.exists() && !destValid) deleteRecursively(dest)
    val won = tmp.renameTo(dest)
    if (!won) deleteRecursively(tmp)
    won
  }
}

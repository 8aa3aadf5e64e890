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

  /** REGISTRY of every tmpdir name family this tree creates, and every
    * prefix any sweeper deletes by. Centralized because round 6 shipped a
    * prefix collision: the replay GC swept `graft_cdc_` with a 1h TTL,
    * which also matched the persistent `graft_cdc_landing_v1…` cache — the
    * landing was deleted between its `_SUCCESS` check and the stream read.
    * Call sites MUST take names from here; [[sweepAged]] refuses any
    * prefix that could reach a published cache, and LocalFsSpec pins the
    * registry's pairwise disjointness.
    *
    * | family            | kind            | prefix                   | TTL  | created at                |
    * |-------------------|-----------------|--------------------------|------|---------------------------|
    * | CSV landing       | published cache | graft_scan_csv_v1        | none | Sources.scanCsvTyped      |
    * | bucketed layout   | published cache | graft_bucketed_v2        | none | Sources.bucketedJoin      |
    * | IVF quantizer     | published cache | graft_ivf_quantizer_v2   | none | Similarity (ivfModel)     |
    * | CDC landing       | published cache | graft_cdc_landing_v1     | none | Streams.landedEvents      |
    * | CDC sorted landing| published cache | graft_cdc_sorted_v1      | none | Streams.landedEventsSorted|
    * | CDC flush landing | published cache | graft_cdc_flush_v1       | none | Streams.landedEventsFlush |
    * | image fixture     | published cache | graft_img_fixture_v1     | none | Multimodal.imageFixture   |
    * | noise-img fixture | published cache | graft_img_noise_v2       | none | Multimodal.noiseFixture   |
    * | media band tables | published cache | graft_media_bands_v4     | none | Multimodal.mediaBandLanding|
    * | text state tables | published cache | graft_text_states_v3     | none | Curation.textStatesLanding|
    * | landed postings   | published cache | graft_postings_v1        | none | TextAnalysis.postingsLanding|
    * | CSV sink          | session dir     | graft_sink_csv_          | 1h   | Sources.sinkCsvRoundTrip  |
    * | parquet sink      | session dir     | graft_sink_parquet_      | 1h   | Sources.sinkParquetPartitioned |
    * | CDC replay work   | session dir     | graft_cdcrun_            | 1h   | Streams.replayToFeed      |
    * | state-absorb work | session dir     | graft_states_absorb_     | 1h   | Curation.corpusStatesAbsorbOnState |
    * | state-compact work| session dir     | graft_states_compact_    | 1h   | Curation.corpusStatesCompact |
    * | media-absorb work | session dir     | graft_media_absorb_      | 1h   | Multimodal.dedupMediaAbsorbOnState |
    *
    * Published caches (`<prefix><sfTag>_<fp>`, `_SUCCESS`-guarded) have no
    * TTL: they are deleted only by [[cachePath]]'s superseded-fingerprint
    * sweep (same prefix+sfTag, different fp) and their `.tmp.` orphans by
    * [[publishDir]] (the `.tmp.` infix can never appear in a published
    * name, so that sweep is structurally cache-safe). Session dirs are
    * swept by prefix+TTL at allocation; their prefixes must stay disjoint
    * from every published cache name — enforced below.
    */
  object Names {
    val ScanCsvCache = "graft_scan_csv_v1"
    val BucketedCache = "graft_bucketed_v2"
    val IvfQuantizerCache = "graft_ivf_quantizer_v2"
    val CdcLandingCache = "graft_cdc_landing_v1"
    val CdcSortedCache = "graft_cdc_sorted_v1"
    val CdcFlushCache = "graft_cdc_flush_v1"
    val ImageFixtureCache = "graft_img_fixture_v1"
    val JpegFixtureCache = "graft_jpeg_fixture_v1"
    val ImgNoiseCache = "graft_img_noise_v2"
    // v4 (layout bump rule: ANY layout change): v3 made the corpus
    // sides BUCKETED tables (8 buckets on band_idx, band_val, sortBy
    // same — zero Exchange/Sort on the streaming probe's static side);
    // v4 adds `odd/{video,audio,image}` — the UNBOUNDED odd-parity band
    // tables in raw per-modality schemas, the landed ingest plants the
    // composed cycle keys read their batch bands from (r19 verdict #1a)
    val MediaBandCache = "graft_media_bands_v4"
    // v2 added `clean`/`manifest` (the flagship run's output side, so
    // the composed cycle keys read day-0 from the landing — r19 verdict
    // #1a); v3 adds `batch/b*_{url,line,span}.parquet` — the replica-0
    // batch's per-family probe keys, the stream_ingest_text landing
    // (r19 verdict #4)
    val TextStatesCache = "graft_text_states_v3"
    // the landed inverted index (r19 verdict #3): postings with inline
    // norms + the maintained stats census + the one-row corpus stats,
    // postings/census bucketed on token — search_bm25_onstate serves
    // from these tables alone
    val PostingsCache = "graft_postings_v1"

    /** Write-once `_SUCCESS`-guarded caches published via [[publishDir]]. */
    val publishedCaches: Seq[String] =
      Seq(ScanCsvCache, BucketedCache, IvfQuantizerCache, CdcLandingCache,
        CdcSortedCache, CdcFlushCache, ImageFixtureCache, JpegFixtureCache,
        ImgNoiseCache, MediaBandCache, TextStatesCache, PostingsCache)

    val SinkCsv = "graft_sink_csv_"
    val SinkParquet = "graft_sink_parquet_"
    val SinkJsonl = "graft_sink_jsonl_"
    val CdcReplay = "graft_cdcrun_"
    val StatesAbsorb = "graft_states_absorb_"
    val StatesCompact = "graft_states_compact_"
    val MediaAbsorb = "graft_media_absorb_"

    /** Prefixes handed to [[sweepAged]] for session-scoped work dirs. */
    val sweptPrefixes: Seq[String] =
      Seq(SinkCsv, SinkParquet, SinkJsonl, CdcReplay, StatesAbsorb,
        StatesCompact, MediaAbsorb)

    /** True iff sweeping `sweepPrefix` could delete a directory published
      * under `cachePrefix`. A published name is `<cachePrefix><sfTag>_<fp>`
      * with sfTag/fp drawn from [A-Za-z0-9_], so a sweep reaches it iff
      * the cache prefix extends the sweep prefix, or the sweep prefix
      * extends the cache prefix using only name-legal characters (which is
      * how `.tmp.` orphan prefixes stay safe: the dot can't occur in a
      * published name).
      */
    def hazardous(sweepPrefix: String, cachePrefix: String): Boolean =
      cachePrefix.startsWith(sweepPrefix) ||
        (sweepPrefix.startsWith(cachePrefix) &&
          sweepPrefix.drop(cachePrefix.length).matches("[A-Za-z0-9_]*"))
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles).getOrElse(Array.empty[File]).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Cheap content fingerprint of source parquet paths (file or directory):
    * a hash over every file's (name, length, mtime). Folded into write-once
    * cache tags (see [[cachePath]]) so regenerating a corpus IN PLACE
    * changes the tag and provably rebuilds, instead of silently serving
    * stale artifacts. A missing source path fails loudly — a constant
    * fingerprint for a nonexistent file would silently disable exactly the
    * staleness protection this exists for. (Granularity caveat: a
    * regeneration producing identical byte lengths within the same mtime
    * tick is invisible; local-FS mtime is millisecond-resolution.)
    */
  def sourceFingerprint(paths: File*): String = {
    def stat(f: File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[File])
          .sortBy(_.getName).toSeq.flatMap(stat)
      else Seq(s"${f.getName}:${f.length}:${f.lastModified}")
    paths.foreach(p =>
      require(p.exists(), s"fingerprint source does not exist: $p"))
    val s = paths.flatMap(stat).mkString("|")
    f"${scala.util.hashing.MurmurHash3.stringHash(s)}%08x"
  }

  /** Stable cache path for a write-once artifact derived from `sources`:
    * `<tmpdir>/<prefix><sfTag>_<fp>`. The single place the tag scheme
    * lives (CSV materialization, bucketed layout, IVF quantizer all use
    * it), so staleness behavior cannot diverge between caches. Also sweeps
    * SUPERSEDED siblings — same prefix+tag, different fingerprint — since
    * those can only refer to a corpus state that no longer exists at
    * `sfDir` (their readers, if any, are already broken by the in-place
    * regeneration).
    */
  def cachePath(prefix: String, sfDir: String, sources: File*): String = {
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = sourceFingerprint(sources: _*)
    val name = s"$prefix${sfTag}_$fp"
    val dir = new File(sys.props("java.io.tmpdir"))
    Option(dir.listFiles).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(s"$prefix${sfTag}_") &&
        f.getName != name && !f.getName.contains(".tmp."))
      .foreach(deleteRecursively)
    new File(dir, name).getPath
  }

  /** Atomically publish `tmp` at `dest`. Returns true if this call won;
    * on a lost race the tmp artifact is discarded and the winner's stands.
    * `destValid` guards an existing-but-incomplete dest (crashed legacy
    * writer) and is a CLOSURE re-evaluated immediately before any repair
    * delete: a session holding a stale invalid verdict cannot tear down an
    * artifact a faster session just completed (the check-to-delete window
    * shrinks to microseconds; the rename itself stays atomic). On repair,
    * the validity marker (`_SUCCESS`) is deleted FIRST, so a repair that
    * dies mid-delete can never leave a dest that still passes the guard
    * while missing data files. Sibling `<dest>.tmp.*` orphans stranded by
    * crashed sessions are swept only when stale by `OrphanTtlMs` — sized
    * for this harness's seconds-long writes; a deployment with hours-long
    * jobs must raise it (a committer-staged write may not touch the tmp
    * root's mtime until job commit).
    */
  def publishDir(tmp: File, dest: File, destValid: () => Boolean): Boolean = {
    if (dest.exists() && !destValid()) {
      new File(dest, "_SUCCESS").delete()
      deleteRecursively(dest)
    }
    val won = tmp.renameTo(dest)
    if (!won) deleteRecursively(tmp)
    sweepOrphans(dest, keep = tmp)
    won
  }

  /** Atomically REPLACE `dest` with `tmp` — the overwrite-semantics
    * counterpart of [[publishDir]] (which is first-writer-wins). The old
    * artifact is renamed ASIDE before the new one is renamed in, so at
    * every instant `dest` is either absent for a microsecond window or
    * holds a COMPLETE artifact, and a failed swap RESTORES the old one
    * instead of destroying it (the round-11 advisor finding: delete-then-
    * rename could tear down the old model and publish nothing while
    * returning normally). Throws on any rename failure; never returns
    * having lost the previous artifact silently.
    */
  def replaceDir(tmp: File, dest: File): Unit = {
    val aside = new File(dest.getPath + ".tmp.aside-" + tmp.getName.hashCode.toHexString)
    if (aside.exists()) deleteRecursively(aside)
    if (dest.exists())
      require(dest.renameTo(aside), s"failed to move old artifact aside: $dest")
    if (!tmp.renameTo(dest)) {
      deleteRecursively(tmp)
      // The restore rename can itself fail (e.g. a concurrent writer raced
      // a new dest in); reporting "restored" then would be a lie — and the
      // stranded aside dir would later be swept as an orphan. Tell the
      // operator exactly where the old artifact actually sits.
      val restored = !aside.exists() || aside.renameTo(dest)
      if (restored)
        sys.error(s"failed to publish $tmp at $dest (old artifact restored)")
      else
        sys.error(s"failed to publish $tmp at $dest AND the old artifact " +
          s"could not be renamed back — recover it manually from $aside " +
          "before the orphan sweep's TTL elapses")
    }
    if (aside.exists()) deleteRecursively(aside)
    sweepOrphans(dest, keep = dest)
  }

  /** Age after which a stranded `<dest>.tmp.<appId>` directory is presumed
    * dead (crashed writer) rather than in-flight.
    */
  private val OrphanTtlMs = 12L * 60 * 60 * 1000

  private def sweepOrphans(dest: File, keep: File): Unit =
    sweepAged(dest.getParentFile, dest.getName + ".tmp.", keep, OrphanTtlMs)

  /** Delete sibling entries of `parent` whose name starts with `prefix`,
    * excluding `keep`, once older than `ttlMs` — the crashed-session
    * garbage collector shared by the publish tmp dirs and the per-session
    * sink dirs. The age guard is what makes the sweep safe against a LIVE
    * concurrent session's directory (a crashed one stops touching its
    * files; a live one is younger than any sane TTL). The prefix guard
    * makes it safe against the PUBLISHED caches: a prefix that could reach
    * a [[Names.publishedCaches]] name is refused loudly (the round-6
    * landing-deletion bug, made structurally unrepresentable).
    */
  def sweepAged(parent: File, prefix: String, keep: File, ttlMs: Long): Unit = {
    Names.publishedCaches.foreach(c =>
      require(!Names.hazardous(prefix, c),
        s"sweepAged prefix '$prefix' could delete published cache '$c*'"))
    val now = System.currentTimeMillis()
    Option(parent).flatMap(p => Option(p.listFiles))
      .getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(prefix) && f != keep &&
        now - f.lastModified() > ttlMs)
      .foreach(deleteRecursively)
  }

  private val exitHooks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register one-time JVM-exit deletion for a session-scoped directory
    * (per-session sink outputs: written and read within one session, junk
    * after it). Idempotent per path.
    */
  def deleteOnExit(f: File): Unit =
    if (exitHooks.add(f.getPath)) {
      sys.addShutdownHook(deleteRecursively(f))
      ()
    }
}

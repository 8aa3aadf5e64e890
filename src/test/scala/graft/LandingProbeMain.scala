package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): wall-clock of the write-once landing builds
  * (text states, media bands, postings index) from a COLD cache — the
  * cost a graded bench's first rep pays before any query runs. Deletes
  * the published caches for `sfDir` first, so every timed build is real.
  * Not part of the graded surface.
  * Run: sbt "Test/runMain graft.LandingProbeMain <sfDir> [parallel]"
  */
object LandingProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parallel = if (args.length > 1) args(1).toBoolean else true
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    Seq(LocalFs.Names.TextStatesCache, LocalFs.Names.MediaBandCache,
      LocalFs.Names.PostingsCache).foreach { prefix =>
      Option(tmpRoot.listFiles).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"$prefix$sfTag"))
        .foreach(LocalFs.deleteRecursively)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.pipeline.parallelBoundaries", parallel.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def lap(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"LANDING $name: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (parallel=$parallel)")
    }
    lap("text_states")(ops.Curation.textStatesLanding(spark, sfDir))
    lap("media_bands")(ops.Multimodal.mediaBandLanding(spark, sfDir))
    lap("postings")(ops.TextAnalysis.postingsLanding(spark, sfDir))
    spark.stop()
  }
}

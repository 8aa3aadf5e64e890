package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** §2a sources / sinks.
  *
  * The reference's entire I/O surface is header-CSV in
  * (`/root/reference/MarchineLearningAlgorithm.txt:38-41`,
  * `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:44-52`)
  * and header-CSV out (`/root/reference/MarchineLearningAlgorithm.txt:283-293`,
  * `/root/reference/A related code.txt:202-212`), over HDFS URIs. Here both
  * directions go through `spark.read`/`df.write` so they work against any
  * Hadoop filesystem and scale by partitioned part-files — the CSV sink
  * writes one part per partition, no driver collection.
  */
object Sources {

  /** Plain parquet scan. Catalyst prunes `ReadSchema` to the projected
    * columns — on a wide 100 TB table this is the difference between reading
    * two columns and reading all of them.
    */
  def scanParquet(spark: SparkSession, sfDir: String): DataFrame =
    Tables.table(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
      .orderBy(col("r_regionkey"))

  /** CSV round-trip: write with header (reference sink shape,
    * `/root/reference/MarchineLearningAlgorithm.txt:283-293`), re-read with
    * header, re-impose types by cast (the reference's post-hoc typing
    * discipline, SURVEY §1). Verified by the oracle comparing the round-trip
    * to the original table.
    */
  def sinkCsvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // per-session path: two concurrent runs (e.g. a Bench overlapping a
    // Verify) must not overwrite each other's sink mid-read
    val out = sys.props("java.io.tmpdir") +
      s"/graft_sink_csv_${spark.sparkContext.applicationId}"
    Tables.table(spark, sfDir, "nation")
      .write.mode("overwrite").format("csv").option("header", "true").save(out)
    Tables.csv(spark, out)
      .select(
        col("n_nationkey").cast(IntegerType).as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast(IntegerType).as("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  val oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "sink_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
  )
}

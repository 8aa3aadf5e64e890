package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer.
  *
  * The reference loads header-only CSV into untyped DataFrames
  * (`/root/reference/MarchineLearningAlgorithm.txt:38-41`,
  * `/root/reference/A related code.txt:41-44`); the harness corpus is typed
  * Parquet (`TESTDATA.md`). Both paths go through `spark.read`, so Catalyst
  * gets a declarative relation it can push filters and column pruning into —
  * at 100 TB the parquet scan with `PushedFilters`/`ReadSchema` pruning is
  * the single most important optimization and it is free here.
  */
object Tables {

  /** Parquet relation for one harness table (region/nation/customer/supplier/
    * part/orders/lineitem/events/documents/embeddings).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Options shared by the engine's CSV reads and writes so round-trips
    * are lossless: NULL is spelled `\N` (write) and only `\N` parses back
    * as NULL (read) — with the defaults an empty string and a NULL are
    * written identically and both come back NULL, silently corrupting
    * string columns through any CSV hop.
    */
  val csvOptions: Map[String, String] = Map("nullValue" -> "\\N")

  /** CSV relation, header-driven schema, mirroring the reference's load shape
    * (`/root/reference/MarchineLearningAlgorithm.txt:38-41`): all columns
    * arrive as strings unless a schema is supplied; types are imposed after
    * load by explicit `cast` (SURVEY §1).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv").option("header", "true")
      .options(csvOptions).load(path)

  /** `events` with its timestamp normalized to Spark's native µs precision.
    *
    * The harness file stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long of
    * nanoseconds. `timestamp_micros(ts div 1000)` floors ns→µs exactly like
    * DuckDB's `CAST(ts AS TIMESTAMP)` does for positive epochs, so oracle
    * comparisons stay exact.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ => raw // already a timestamp (session without the legacy flag)
    }
  }
}

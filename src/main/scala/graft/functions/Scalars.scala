package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** §2h scalar surface.
  *
  * The reference itself uses only `col/lit/cast/alias/desc` and boolean ops
  * (SURVEY §2h); the scalar functions here are the north-star additions the
  * corpus needs — all Spark built-ins (codegen'd expressions inside
  * whole-stage codegen; no UDFs anywhere), so they pipeline inside the scan
  * stage with zero extra passes at any scale.
  */
object Scalars {

  /** Text normalization: lower → trim → collapse runs of spaces. Spark's
    * `regexp_replace` replaces all occurrences (DuckDB needs the 'g' flag
    * for the same semantics).
    */
  def strNormalize(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        regexp_replace(trim(lower(col("text"))), " +", " ").as("norm_text"),
        length(col("text")).as("text_len"))
      .orderBy(col("doc_id"))

  /** Semi-structured access on the JSON `events.props` column via
    * `get_json_object` — evaluated streaming per-row; at scale prefer
    * `from_json` with an explicit schema once the shape is known (both are
    * native expressions).
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .orderBy(col("event_id"))

  /** L2 norm of the embedding column via higher-order functions — the
    * elementwise math runs inside the row pipeline, no explode, no shuffle.
    * Elements are cast float→double (exact) before multiplying so both
    * engines fold identical doubles; rounded to 6dp to absorb any
    * sum-order difference in the oracle engine.
    */
  def vecNorm(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")
      .select(
        col("vec_id"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast(DoubleType)),
          lit(0.0),
          (acc, x) => acc + x * x)), 6).as("l2_norm"))
      .orderBy(col("vec_id"))

  val oracleSql: Map[String, String] = Map(
    "str_normalize" ->
      """SELECT doc_id,
        |  regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm_text,
        |  CAST(length(text) AS INTEGER) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "vec_norm" ->
      """SELECT vec_id,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}

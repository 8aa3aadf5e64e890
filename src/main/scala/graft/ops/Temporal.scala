package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Temporal joins the built-in operator set lacks: as-of (latest matching
  * row at-or-before a timestamp) and bounded range joins, both expressed in
  * shapes that survive a 100 TB events table.
  *
  * The reference has no temporal surface (its only time handling is string
  * dates cast post-load, `/root/reference/MarchineLearningAlgorithm.txt:75-79`);
  * these extend the engine the way a training-data/event pipeline needs —
  * attribution (purchase ← preceding click) is the canonical as-of use.
  *
  * Timestamps ride as RAW NANOSECOND BIGINTs end-to-end (the harness file
  * stores TIMESTAMP(NANOS); with `nanosAsLong` Spark reads the int64
  * directly, DuckDB's `epoch_ns` produces the identical integer) — pure
  * integer compares, no precision loss, no timezone semantics anywhere.
  */
object Temporal {

  /** 24h in nanoseconds — the range-join window and its bin width. */
  private[graft] val DayNs = 86400000000000L

  /** events with `ts` surfaced as nanosecond-epoch BIGINT `ts_ns`,
    * µs-FLOORED (`div 1000 * 1000`): DuckDB reads parquet TIMESTAMP(NANOS)
    * at µs precision (sub-µs digits truncated on load), so raw-ns values
    * would differ from every oracle row in the last three digits. Flooring
    * both engines to the µs grid keeps the integers bit-identical — the
    * same normalization discipline as `Tables.events`. Event spacing in
    * the corpus is seconds, so the floor can never reorder two events.
    */
  private[graft] def eventsNs(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.table(spark, sfDir, "events")
    val tsNs: Column = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000 * 1000") // nanosAsLong: int64 ns
      case _ => unix_micros(col("ts")) * 1000L // µs-precision fallback
    }
    raw.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), tsNs.as("ts_ns"))
  }

  /** AS-OF JOIN: each purchase event paired with the same user's most
    * recent click at-or-before it (click-through attribution).
    *
    * NOT implemented as a join at all: both sides are union-tagged and a
    * single running `last(click_ts, ignoreNulls)` window per user resolves
    * every purchase in one pass. That is ONE hash shuffle on user_id plus
    * an in-partition sort — the minimum any per-user temporal semantics can
    * cost — versus the naive per-row subquery (a skew-prone range join) or
    * a BroadcastNestedLoop. At 100 TB the events table shuffles once, state
    * per user is one long, and AQE handles user skew. Ties (click and
    * purchase at the same nanosecond) order the click first — matching the
    * oracle's `p.ts_ns >= c.ts_ns` inclusive bound.
    */
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val tagged = eventsNs(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_ts_ns",
        last(when(col("side") === 0, col("ts_ns")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        col("click_ts_ns"),
        (col("ts_ns") - col("click_ts_ns")).as("gap_ns"))
      .orderBy(col("event_id"))
  }

  /** RANGE JOIN: for each purchase, the count and summed value of the same
    * user's clicks in the preceding 24h window `(ts−24h, ts]`.
    *
    * Spark would execute the naive inequality join as BroadcastNestedLoop
    * (quadratic per user). Instead the window is BINNED: clicks land in one
    * 24h bucket, each purchase probes its own bucket and the previous one,
    * and the exact range predicate filters the equi-joined candidates. The
    * shuffle key is (user_id, bin) — a bounded equi-join whose candidate
    * set per probe is the two adjacent buckets, independent of table size;
    * a click matches from exactly one bucket so no pair double-counts.
    * Zero-click purchases are restored by a left join against the (already
    * aggregated, far smaller) per-purchase counts. Sum is exact
    * DECIMAL(18,4) pre-aggregation (partition-order-independent), surfaced
    * as DOUBLE.
    */
  def joinRange(spark: SparkSession, sfDir: String): DataFrame = {
    val e = eventsNs(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns").as("c_ts"), col("value"))
    // integer `div`, not `/`: ns epochs (~1.7e18) are beyond double's 53-bit
    // mantissa — a float bin boundary would misplace rows near bucket edges
    val pb = purchases.withColumn("bin",
      explode(array(expr(s"ts_ns div ${DayNs}L"),
        expr(s"ts_ns div ${DayNs}L - 1"))))
    val cb = clicks.withColumn("bin", expr(s"c_ts div ${DayNs}L"))
    val perPurchase = pb.join(cb, Seq("user_id", "bin"))
      .filter(col("c_ts") > col("ts_ns") - DayNs && col("c_ts") <= col("ts_ns"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("click_value"))
    purchases.join(perPurchase, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("event_id"))
  }

  val oracleSql: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN is the independent formulation: equality
    // proves the union-tag window trick implements the same semantics
    "join_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type
        |           FROM events),
        |p AS (SELECT event_id, user_id, ts_ns FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_ns AS click_ts_ns FROM e
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_ns, c.click_ts_ns,
        |       p.ts_ns - c.click_ts_ns AS gap_ns
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_ns >= c.click_ts_ns
        |ORDER BY p.event_id""".stripMargin,
    // the twin is the UNBINNED inequality join — equality proves the
    // bin-and-filter decomposition loses and double-counts nothing
    "join_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
        |                  event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ts_ns FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_ns, value FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_ns,
        |       count(c.user_id) AS n_clicks,
        |       coalesce(CAST(sum(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE),
        |                0.0) AS click_value
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id
        | AND c.ts_ns > p.ts_ns - 86400000000000
        | AND c.ts_ns <= p.ts_ns
        |GROUP BY p.event_id, p.user_id, p.ts_ns
        |ORDER BY p.event_id""".stripMargin)
}

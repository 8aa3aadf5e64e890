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
  * Timestamps ride as NANOSECOND BIGINTs end-to-end (derived µs-exact from
  * whatever physical shape the harness parquet carries, via
  * `Tables.normalizeTs`) — pure integer compares, no precision loss, no
  * timezone semantics anywhere past the one normalization chokepoint.
  */
object Temporal {

  /** 24h in nanoseconds — the range-join window and its bin width. */
  private[graft] val DayNs = 86400000000000L

  /** events with `ts` surfaced as nanosecond-epoch BIGINT `ts_ns` on the
    * µs grid: `Tables.events` already normalized every physical shape the
    * harness has shipped (int64-ns, TIMESTAMP_NTZ, TIMESTAMP) to a µs
    * `TimestampType`, so `unix_micros * 1000` is exact and matches DuckDB's
    * µs-precision TIMESTAMP integer for integer. Event spacing in the
    * corpus is seconds, so the µs floor can never reorder two events.
    */
  private[graft] def eventsNs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), (unix_micros(col("ts")) * 1000L).as("ts_ns"))

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
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame =
    joinAsof(eventsNs(spark, sfDir), probeType = "purchase",
      refType = "click")
      .withColumnRenamed("ref_ts_ns", "click_ts_ns")
      .orderBy(col("event_id"))

  /** API form: as-of attribution of each `probeType` event to the same
    * user's latest `refType` event at-or-before it, over any events-shaped
    * frame (`event_id, user_id, ts_ns, event_type`). Output:
    * event_id, user_id, ts_ns, ref_ts_ns, gap_ns — unordered (the sfDir
    * wrapper adds the presentation sort and the demo column name).
    */
  def joinAsof(events: DataFrame, probeType: String,
      refType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(refType, probeType))
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        when(col("event_type") === probeType, 1).otherwise(0).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("ref_ts_ns",
        last(when(col("side") === 0, col("ts_ns")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        col("ref_ts_ns"),
        (col("ts_ns") - col("ref_ts_ns")).as("gap_ns"))
  }

  /** AS-OF JOIN WITH TOLERANCE — the pandas `merge_asof(tolerance=…)` /
    * kdb `wj` refinement: an attribution only counts if the reference
    * event is RECENT enough (a click last month doesn't explain today's
    * purchase). Same one-pass union-tag window as [[joinAsof]] — the
    * tolerance is a post-window null-out, not a different join, so the
    * scale shape is unchanged (one user_id shuffle, one long of state);
    * probes keep their row with NULL ref/gap when the match is stale or
    * absent, and `matched` surfaces the three-way outcome as 1/0.
    */
  def joinAsofTol(events: DataFrame, probeType: String, refType: String,
      tolNs: Long): DataFrame = {
    require(tolNs > 0, s"tolNs must be positive, got $tolNs")
    val ok = col("gap_ns").isNotNull && col("gap_ns") <= tolNs
    joinAsof(events, probeType, refType)
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        when(ok, col("ref_ts_ns")).as("ref_ts_ns"),
        when(ok, col("gap_ns")).as("gap_ns"),
        when(ok, 1).otherwise(0).as("matched"))
  }

  /** `join_asof_tol` checked key: purchase→click attribution at a 24h
    * tolerance — 683 attributed / 1155 stale / 143 clickless at sf0.01,
    * all three outcomes populated.
    */
  def joinAsofTolQuery(spark: SparkSession, sfDir: String): DataFrame =
    joinAsofTol(eventsNs(spark, sfDir), probeType = "purchase",
      refType = "click", tolNs = DayNs)
      .withColumnRenamed("ref_ts_ns", "click_ts_ns")
      .orderBy(col("event_id"))

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
  def joinRange(spark: SparkSession, sfDir: String): DataFrame =
    joinRange(eventsNs(spark, sfDir), probeType = "purchase",
      refType = "click", windowNs = DayNs)
      .withColumnRenamed("n_ref", "n_clicks")
      .withColumnRenamed("ref_value", "click_value")
      .orderBy(col("event_id"))

  /** API form: for each `probeType` event, the count and summed value of
    * the same user's `refType` events in its trailing `windowNs` window
    * `(ts−window, ts]`, over any events-shaped frame. Same binned
    * decomposition as the demo key (bin width = the window, probe checks
    * its own and the previous bucket), so the candidate set per probe is
    * two buckets at ANY window size and table size. Output: event_id,
    * user_id, ts_ns, n_ref, ref_value — unordered.
    */
  def joinRange(events: DataFrame, probeType: String, refType: String,
      windowNs: Long): DataFrame = {
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    val probes = events.filter(col("event_type") === probeType)
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val refs = events.filter(col("event_type") === refType)
      .select(col("user_id"), col("ts_ns").as("c_ts"), col("value"))
    // integer `div`, not `/`: ns epochs (~1.7e18) are beyond double's 53-bit
    // mantissa — a float bin boundary would misplace rows near bucket edges
    val pb = probes.withColumn("bin",
      explode(array(expr(s"ts_ns div ${windowNs}L"),
        expr(s"ts_ns div ${windowNs}L - 1"))))
    val cb = refs.withColumn("bin", expr(s"c_ts div ${windowNs}L"))
    val perProbe = pb.join(cb, Seq("user_id", "bin"))
      .filter(col("c_ts") > col("ts_ns") - windowNs &&
        col("c_ts") <= col("ts_ns"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_ref"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("ref_value"))
    probes.join(perProbe, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("ref_value"), lit(0.0)).as("ref_value"))
  }

  /** Burst threshold for the cadence key: gaps ≤ 60s count as bursty. */
  private val BurstNs = 60000000000L

  /** PER-USER CADENCE — the `lag` window surface (the one window
    * function family with no graded representative) put to its canonical
    * use: inter-arrival gap statistics per user, the signal behind rate
    * anomaly detection and bot screening. One hash shuffle on user_id +
    * an in-partition sort, O(1) state per row (the previous timestamp);
    * the per-user aggregate rides the SAME partitioning, so Catalyst
    * plans window + groupBy over one exchange. All-integer outputs: gap
    * extremes, activity span, and the bursty-gap count at [[BurstNs]].
    * Ties (equal ts) break on event_id; the gap MULTISET is invariant to
    * the tie order (equal timestamps yield the same zero gaps either
    * way), so every aggregate is deterministic cross-engine.
    */
  def userCadence(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    events
      .select(col("user_id"), col("ts_ns"), col("event_id"))
      .withColumn("gap_ns", col("ts_ns") - lag(col("ts_ns"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("gap_ns")).as("n_gaps"),
        min(col("gap_ns")).as("min_gap_ns"),
        max(col("gap_ns")).as("max_gap_ns"),
        count(when(col("gap_ns") <= BurstNs, 1)).as("n_bursty"),
        (max(col("ts_ns")) - min(col("ts_ns"))).as("span_ns"))
  }

  /** `user_cadence` checked key over the harness events. */
  def userCadenceQuery(spark: SparkSession, sfDir: String): DataFrame =
    userCadence(eventsNs(spark, sfDir))
      .orderBy(col("user_id"))

  /** Rolling mean over the last 7 events per user (ROWS frame, ordered by
    * event time with the unique event_id as tie-break — a frame over a
    * non-unique ordering is nondeterministic and would never survive a
    * cross-engine compare). One hash shuffle on user_id + in-partition
    * sort, O(frame) state per row: the canonical bounded-memory window at
    * any scale. The mean is derived from an exact DECIMAL window sum (a
    * double running sum is partition-merge-order-dependent) divided by the
    * window count, so short leading frames are averaged correctly.
    */
  def windowMovingAvg(spark: SparkSession, sfDir: String): DataFrame =
    windowMovingAvg(eventsNs(spark, sfDir), frameRows = 7)
      .orderBy(col("event_id"))

  /** API form: rolling mean of `value` over each user's last `frameRows`
    * events (self included), over any events-shaped frame — unordered.
    */
  def windowMovingAvg(events: DataFrame, frameRows: Int): DataFrame = {
    require(frameRows >= 1, s"frameRows must be >= 1, got $frameRows")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(-(frameRows - 1L), Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        sum(col("value").cast(DecimalType(18, 4))).over(w).as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        round(col("win_sum").cast(DoubleType) / col("win_n"), 6).as("mov_avg"),
        col("win_n"))
  }

  /** ORDERED FUNNEL: how far each user progressed through
    * view → click → purchase, where each stage only counts at-or-after the
    * previous one (a click with no preceding view is not stage 2).
    *
    * Sequential pattern-match semantics usually tempt a per-user sort in
    * imperative code; here it is two running-max window columns over ONE
    * hash shuffle on user_id: `saw_view` marks rows at-or-after the first
    * view, a click on such a row is a qualifying click, `saw_qclick` marks
    * rows at-or-after the first of those, and a purchase there completes
    * the funnel. Same-timestamp ties order view < click < purchase so the
    * at-or-after bounds are inclusive, matching the oracle's `>=` joins.
    * State per row is two bits; the final per-user reduce rides the
    * window's existing partitioning (no second exchange).
    */
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame =
    eventFunnel(eventsNs(spark, sfDir), Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  /** API form: ordered N-STAGE funnel over any events-shaped frame —
    * `stages` is the ordered event-type vocabulary, and stage i only
    * counts at-or-after a qualifying stage i−1 event (a click with no
    * preceding view is not stage 2). The same two-running-max-per-stage
    * construction as the 3-stage demo, folded over the stage list: one
    * `qual_i` projection + one running-`max` window column per stage, ALL
    * over the same user_id window — N stages still cost ONE hash shuffle
    * and N bits of per-row state. Same-timestamp ties order earlier
    * stages first (inclusive at-or-after bounds). Output: user_id,
    * has_<stage> per stage, funnel_stage — unordered.
    */
  def eventFunnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be distinct and nonempty, got $stages")
    val stageNo = stages.zipWithIndex.tail.foldLeft(
      when(col("event_type") === stages.head, 0)) {
      case (acc, (s, i)) => acc.when(col("event_type") === s, i)
    }
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("stage"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events
      .filter(col("event_type").isin(stages.map(s => s: Any): _*))
      .select(col("user_id"), col("ts_ns"), stageNo.as("stage"))
    val staged = stages.indices.foldLeft(base) { (df, i) =>
      val qual =
        if (i == 0) when(col("stage") === 0, 1).otherwise(0)
        else when(col("stage") === i && col(s"saw_${i - 1}") === 1, 1)
          .otherwise(0)
      df.withColumn(s"qual_$i", qual)
        .withColumn(s"saw_$i", max(col(s"qual_$i")).over(w))
    }
    val hasCols = stages.indices.map(i =>
      max(col(s"saw_$i")).as(s"has_${stages(i)}"))
    staged
      .groupBy(col("user_id"))
      .agg(hasCols.head, hasCols.tail: _*)
      .withColumn("funnel_stage",
        stages.map(s => col(s"has_$s")).reduce(_ + _))
  }

  val oracleSql: Map[String, String] = Map(
    "window_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value
        |           FROM events)
        |SELECT event_id, user_id, ts_ns,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |        / count(*) OVER w, 6) AS mov_avg,
        |  count(*) OVER w AS win_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // independent formulation: three chained min-timestamp joins, each
    // stage bounded below by the previous stage's first qualifying time —
    // equality proves the single-pass window form implements the same
    // ordered-funnel semantics
    "event_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_type
        |           FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT user_id, min(ts_ns) AS tv FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts_ns) AS tc
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_ns >= v.tv
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts_ns) AS tp
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_ns >= c.tc
        |      GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END AS has_view,
        |  CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS has_click,
        |  CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS has_purchase,
        |  CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
        |  + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS funnel_stage
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,
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
    "user_cadence" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns
         |           FROM events),
         |g AS (
         |  SELECT user_id, ts_ns,
         |    ts_ns - lag(ts_ns, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts_ns, event_id) AS gap_ns
         |  FROM e)
         |SELECT user_id,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(gap_ns) AS BIGINT) AS n_gaps,
         |  min(gap_ns) AS min_gap_ns,
         |  max(gap_ns) AS max_gap_ns,
         |  CAST(count(*) FILTER (WHERE gap_ns <= ${BurstNs})
         |    AS BIGINT) AS n_bursty,
         |  max(ts_ns) - min(ts_ns) AS span_ns
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same ASOF twin with the tolerance applied as the identical
    // post-join null-out — DuckDB's ASOF has no tolerance clause, so
    // the twin proves the refinement IS join-then-gate
    "join_asof_tol" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
         |                  event_type FROM events),
         |p AS (SELECT event_id, user_id, ts_ns FROM e
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts_ns AS click_ts_ns FROM e
         |      WHERE event_type = 'click'),
         |j AS (
         |  SELECT p.event_id, p.user_id, p.ts_ns, c.click_ts_ns,
         |         p.ts_ns - c.click_ts_ns AS gap_ns
         |  FROM p ASOF LEFT JOIN c
         |    ON p.user_id = c.user_id AND p.ts_ns >= c.click_ts_ns)
         |SELECT event_id, user_id, ts_ns,
         |  CASE WHEN gap_ns <= ${DayNs} THEN click_ts_ns END
         |    AS click_ts_ns,
         |  CASE WHEN gap_ns <= ${DayNs} THEN gap_ns END AS gap_ns,
         |  CASE WHEN gap_ns <= ${DayNs} THEN 1 ELSE 0 END AS matched
         |FROM j ORDER BY event_id""".stripMargin,
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

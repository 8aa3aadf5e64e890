package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** §2b–§2g relational operators: projection / filter / cleaning, joins,
  * aggregation, windows, sort-limit, set ops, sampling.
  *
  * Every operator is a pure declarative DataFrame transform — no driver-side
  * collection, no RDD code — so Catalyst applies predicate pushdown, column
  * pruning, join selection (broadcast vs sort-merge) and AQE for free, which
  * is exactly what survives a 100× scale-up.
  *
  * Determinism contract for the DuckDB oracle (SURVEY §5): every query ends
  * in an explicit `orderBy` over a unique key set, monetary doubles are cast
  * to DECIMAL(18,4) *before* summing (double summation order is partition-
  * dependent; decimal summation is exact), and averages are derived from the
  * exact decimal sum.
  */
object Relational {

  /** Exact money arithmetic: cast each addend to DECIMAL(18,4) pre-sum, so
    * the aggregate is independent of partition/merge order, then surface a
    * double. Identical formula on the DuckDB side.
    */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  // ---------------------------------------------------------------- §2b ----

  /** Column projection by name (`/root/reference/MarchineLearningAlgorithm.txt:62`,
    * `/root/reference/A related code.txt:57-61`).
    */
  def selectCols(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Projection + cast — the reference's post-hoc typing
    * (`/root/reference/MarchineLearningAlgorithm.txt:75-79` IntegerType,
    * `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:72-78`
    * DoubleType). Exercises int, decimal, string and date targets.
    */
  def selectCast(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        // decimal cast demonstrated, then surfaced as DOUBLE: a raw
        // DECIMAL(18,4) column hash-mismatches in the driver comparator at
        // the representation level even when values are bit-identical
        col("l_extendedprice").cast(DecimalType(18, 4)).cast(DoubleType)
          .as("price_dec"),
        col("l_orderkey").cast(StringType).as("okey_str"),
        col("l_shipdate").cast(DateType).as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Rename-in-projection via alias
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:70-78`).
    */
  def selectAlias(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "supplier")
      .select(
        col("s_suppkey").alias("supp_id"),
        col("s_name").alias("supp_name"),
        col("s_acctbal").alias("balance"))
      .orderBy(col("supp_id"))

  /** Join then drop the duplicated key column from one side — the reference's
    * `.drop(county.col("fips"))` idiom
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:69`).
    */
  def dropCol(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
    val c = table(spark, sfDir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .drop(c("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("c_name"), col("c_mktsegment"))
      .orderBy(col("o_orderkey"))
  }

  /** Equality predicate (`/root/reference/A related code.txt:62`
    * `==="CONFIRMED"`;
    * `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:55`).
    * Pushed into the parquet scan by Catalyst (`PushedFilters`).
    */
  def filterEq(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** AND + NOT + literal compound predicate, mirroring
    * `col("rank")===lit(1) and !(col("candidate")===lit("Ben Carson"))`
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:99`).
    */
  def filterCompound(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === lit("purchase")
        && !(col("user_id") === lit(0L))
        && col("value") > lit(100.0))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** Drop rows containing any null
    * (`/root/reference/MarchineLearningAlgorithm.txt:42`,
    * `/root/reference/A related code.txt:45`) — `na.drop()` compiles to a
    * conjunction of IS NOT NULL filters, fully pushed down.
    */
  def naDrop(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
      .na.drop()
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- §2c ----

  /** Inner equi-join with a cast inside the join key, then dedup of the key
    * column — the reference's exact join shape
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:58,69`).
    * nation is tiny → explicit broadcast; at 100 TB the fact side streams
    * through a broadcast-hash join with zero shuffle.
    */
  def joinInnerEqui(spark: SparkSession, sfDir: String): DataFrame = {
    val c = table(spark, sfDir, "customer")
    val n = table(spark, sfDir, "nation")
    c.join(broadcast(n),
        c("c_nationkey").cast(LongType) === n("n_nationkey").cast(LongType))
      .drop(n("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("n_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left outer join (idiomatic variant of the same `ds.join(ds2, cond, how)`
    * API; SURVEY §2c). Right side pre-filtered so unmatched rows exist.
    */
  def joinLeft(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
    val li = table(spark, sfDir, "lineitem").filter(col("l_quantity") >= 48.0)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"), col("l_linenumber"),
        col("l_quantity"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** Left-semi join = SQL EXISTS; no right-side columns, no row duplication —
    * at scale this is the cheap way to express "customers having a big
    * order" without a join-then-distinct.
    */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = table(spark, sfDir, "customer")
    val o = table(spark, sfDir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Period split for the full-outer reconciliation key. */
  private val FullOuterSplit = "1998-01-01"

  /** FULL OUTER join — the reconciliation shape (SURVEY §2c), exercised
    * the way it is actually used: a period-over-period churn table. Per
    * customer, order counts before vs since [[FullOuterSplit]]; the
    * full outer keeps customers active in only one period, so BOTH
    * null sides are populated at harness scale (20 new-only, 8
    * churned-only at sf0.01) and the status column reads the three
    * outcomes off the null pattern. Both inputs are aggregates of the
    * same fact table — at scale this is two map-side-combined passes
    * and one key-shuffled full join, never a row-level fact×fact join.
    */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
    val a = o.filter(col("o_orderdate") < lit(FullOuterSplit).cast(TimestampType))
      .groupBy(col("o_custkey").as("k_a"))
      .agg(count(lit(1)).as("n_before"))
    val b = o.filter(col("o_orderdate") >= lit(FullOuterSplit).cast(TimestampType))
      .groupBy(col("o_custkey").as("k_b"))
      .agg(count(lit(1)).as("n_since"))
    a.join(b, col("k_a") === col("k_b"), "full_outer")
      .select(
        coalesce(col("k_a"), col("k_b")).as("custkey"),
        col("n_before"), col("n_since"),
        when(col("k_a").isNull, "new")
          .when(col("k_b").isNull, "churned")
          .otherwise("retained").as("status"))
      .orderBy(col("custkey"))
  }

  /** Left-anti join = SQL NOT EXISTS. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = table(spark, sfDir, "customer")
    val o = table(spark, sfDir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- §2d ----

  /** Global count (`/root/reference/A related code.txt:77`), expressed as an
    * aggregate query rather than the `count()` action so it stays a plan.
    */
  def aggCount(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .agg(count(lit(1)).as("n_rows"))

  /** Grouped aggregate (sum/avg/count) — the "group the records by county"
    * intent (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:81-86`)
    * in TPC-H q1 shape. Partial (map-side) aggregation + exact decimal sums;
    * the shuffle moves only one row per (flag,status) group per partition.
    */
  def groupbyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base"),
        (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Class-distribution ratio — the reference computes it with two driver
    * `count()` actions (`/root/reference/A related code.txt:77`); a single
    * conditional aggregate does it in one distributed pass.
    */
  def groupbyRatio(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .agg((sum(when(col("event_type") === "error", 1).otherwise(0))
        .cast(DoubleType) / count(lit(1))).as("error_ratio"))

  // ---------------------------------------------------------------- §2e ----

  /** rank() over a descending partition window
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:88-89`).
    * One shuffle on the partition key, in-partition sort — the minimal plan.
    */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
    graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        rank().over(w).as("rnk"))
      .orderBy(col("event_id"))
  }

  /** Keep the rank-1 row per partition — "winner per county"
    * (`/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:97-99`).
    * Tie-broken on the unique event_id so exactly one row per key survives.
    */
  def windowTop1(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        rank().over(w).as("rnk"))
      .filter(col("rnk") === lit(1))
      .drop("rnk")
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- §2f ----

  /** Bounded ordered preview — deterministic stand-in for the reference's
    * `show(10)` (`/root/reference/MarchineLearningAlgorithm.txt:50`).
    * Compiles to TakeOrderedAndProject: per-partition top-N then a single
    * driver merge of N×partitions rows — no global sort at any scale.
    */
  def orderLimit(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ---------------------------------------------------------------- §2g ----

  /** Bag union of two filtered subsets — the undersampling rebalance
    * (`/root/reference/A related code.txt:74-80`). `unionAll` ≡ `union`
    * since Spark 2.0; no shuffle, partitions are concatenated.
    */
  def unionAll(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.filter(col("event_type") === "signup")
      .unionAll(ev.filter(col("event_type") === "error"))
      .orderBy(col("event_id"))
  }

  /** DECILE BINNING (`ntile`): rank-normalize order totals within each
    * priority — the feature transform that turns a skewed numeric into a
    * uniform ordinal (a training pipeline's robust alternative to raw
    * z-scores). One hash shuffle + in-partition sort like every window;
    * the ordering includes the unique key (a non-unique NTILE ordering
    * splits ties nondeterministically and would never survive a
    * cross-engine compare).
    */
  def windowNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    graft.Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(10).over(w).as("decile"))
      .orderBy(col("o_orderkey"))
  }

  /** TIME-SERIES ROLLUP: events per (day, type) with exact decimal value
    * sums — the date-bucketed aggregation every monitoring/drift dashboard
    * runs. `date_trunc` keeps the aggregate a pure map-side-combinable
    * groupBy (day count × type groups); output day as DATE (engine-neutral
    * days-since-epoch — parquet tz-adjusted TIMESTAMP vs naive was the
    * sessionize_batch lesson, see `Streams.scala`).
    */
  def dailyCounts(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"))
      .orderBy(col("day"), col("event_type"))

  /** BAG INTERSECTION (`INTERSECT ALL`): customer keys by how often they
    * appear in BOTH open- and finished-order multisets — min(count) bag
    * semantics, which Spark plans as one count-aggregate per side plus a
    * join on the row value (shuffle keyed on the row, partial map-side
    * counts — never a sort of either input). Completes the §2g set-ops
    * family alongside `union_all`/`except_all` (the reference uses only
    * `unionAll`, `/root/reference/A related code.txt:80`).
    */
  def intersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = graft.Tables.table(spark, sfDir, "orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersectAll(
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** BAG DIFFERENCE (`EXCEPT ALL`): open-order customer keys minus one
    * occurrence per finished order — count-subtraction bag semantics,
    * planned like [[intersectAll]] (per-side counts + value join).
    */
  def exceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = graft.Tables.table(spark, sfDir, "orders")
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .exceptAll(
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** Seeded Bernoulli sample without replacement
    * (`/root/reference/A related code.txt:78`). RNG differs across engines →
    * no SQL oracle; invariants (subset, binomial-bounded size) are covered in
    * the scalatest/scalacheck suites (SURVEY §5.3).
    */
  def sampleFraction(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
      .sample(withReplacement = false, fraction = 0.5, seed = 754L)
      .orderBy(col("doc_id"))

  /** Seeded 80/20 split, first slice
    * (`/root/reference/MarchineLearningAlgorithm.txt:91` — seed 754).
    * Disjointness/union/ratio invariants tested in-suite, not via oracle.
    */
  def randomSplit(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")
      .randomSplit(Array(0.8, 0.2), seed = 754L)(0)
      .orderBy(col("doc_id"))

  /** Revenue rollup per part brand: fact ⋈ broadcast part dim → grouped
    * decimal-exact aggregate. Covers the `part` table; same broadcast +
    * map-side-partial shape as the flagship (the plan at 100 TB moves one
    * row per (brand, partition) through the single shuffle).
    */
  def partBrandAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val p = table(spark, sfDir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Wide pivot: per return-flag row, one quantity-sum column per line
    * status. The pivot VALUES are passed explicitly — at 100 TB letting
    * `.pivot(col)` discover them costs a full extra distinct-scan job, and
    * an unbounded value domain would explode the schema; a declared domain
    * keeps this one map-side-partial aggregate with a fixed output width.
    * Decimal-exact sums (partition-order-independent), surfaced as DOUBLE.
    */
  def pivotWide(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(moneySum(col("l_quantity")))
      .orderBy(col("l_returnflag"))

  /** Hierarchical totals: ROLLUP over (returnflag, linestatus) — per-pair,
    * per-flag, and grand-total rows in ONE pass (Expand + a single grouped
    * aggregate; three separate GROUP BYs would each rescan the fact table).
    * Rollup null markers are surfaced as 'ALL' so the output is
    * comparator-safe and self-describing (the corpus columns are
    * themselves never null).
    */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_price"), col("n"))
      .orderBy(col("rf"), col("ls"))

  /** DETERMINISTIC stratified sampling: per-priority rates (URGENT 50%,
    * HIGH 20%, rest 10%) decided by a 60-bit md5-derived hash of the key,
    * `hash mod 100 < rate`. Unlike `sampleBy` (RNG, irreproducible across
    * engines/reruns) this is a pure pushdown-able filter — zero shuffle,
    * zero state, bit-identical on re-execution and across engines, which
    * is what a 100 TB curation pipeline needs for auditable lineage: the
    * sample is a FUNCTION of the data, not of the scheduler.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    val rate = when(col("o_orderpriority") === "1-URGENT", 50)
      .when(col("o_orderpriority") === "2-HIGH", 20)
      .otherwise(10)
    table(spark, sfDir, "orders")
      .filter(h % 100 < rate)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Per-segment exact quartiles of account balance (linear interpolation
    * at rank p·(n−1) — the same formula as DuckDB's `quantile_cont`).
    * Exact percentile holds a per-group sorted buffer, fine for bounded
    * group cardinality; at 100 TB with huge groups the scale path is
    * [[quantileBinsApprox]] (mergeable sketch, bounded memory), checked as
    * its own key — this exact form stays as the small-group API and the
    * bit-exact oracle anchor.
    */
  def quantileBins(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(expr("percentile(c_acctbal, array(0.25D, 0.5D, 0.75D))").as("qs"))
      .select(col("c_mktsegment"),
        round(element_at(col("qs"), 1), 6).as("q1"),
        round(element_at(col("qs"), 2), 6).as("q2"),
        round(element_at(col("qs"), 3), 6).as("q3"))
      .orderBy(col("c_mktsegment"))

  /** APPROXIMATE per-group quantiles — the 100 TB form of [[quantileBins]].
    * `approx_percentile` keeps a bounded mergeable summary (Greenwald-
    * Khanna, rank error ≤ n/accuracy) per group instead of the exact
    * aggregate's full sorted buffer, so a billion-row group costs O(accuracy
    * · log n) memory on its reducer, not O(n) — the difference between a
    * dashboard query and an OOM at scale.
    *
    * API form: group → (n, q1..qK) with the sketch's values. The returned
    * values are actual data elements near the target rank, but WHICH
    * element can differ by engine, accuracy, and partition-merge order —
    * so they are not hash-comparable; [[quantileBinsApprox]] wraps this in
    * a rank CERTIFICATE for the driver's oracle instead.
    */
  def approxQuantiles(df: DataFrame, group: String, value: String,
      probs: Seq[Double], accuracy: Int): DataFrame = {
    val arr = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    df.groupBy(col(group))
      .agg(expr(s"approx_percentile($value, $arr, $accuracy)").as("qs"),
        count(lit(1)).as("n"))
      .select(col(group) +: col("n") +:
        probs.indices.map(i =>
          element_at(col("qs"), i + 1).as(s"q${i + 1}")): _*)
  }

  /** `quantile_bins_approx` checked key: per-segment approx quartiles with
    * a DRIVER-CHECKABLE rank certificate. The sketch's raw values are
    * engine-specific (any element within the rank guarantee is a legal
    * answer), so the key emits what IS cross-engine exact: the group, its
    * row count, and one boolean per quartile asserting the returned value's
    * rank interval [count(x < q) + 1, count(x ≤ q)] lies within
    * n/accuracy + 1 of the target rank p·n — the published
    * `approx_percentile` guarantee. The oracle recomputes the groups and
    * counts exactly and pins every certificate TRUE, turning the
    * approximation bound itself into the hash-checked contract.
    *
    * Scale shape: pass 1 is the bounded-memory sketch aggregate; pass 2
    * broadcast-joins the 5-row quartile frame back and counts rank
    * positions map-side — two scans, no fact shuffle, no sorted buffer
    * anywhere (plan-guarded: no exact `percentile` aggregate). The
    * certificate stays meaningful at any n: at 100 TB it verifies the
    * sketch's rank error on real data, per group, in the same two passes.
    */
  def quantileBinsApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val accuracy = 1000
    val probs = Seq(0.25, 0.5, 0.75)
    val cust = table(spark, sfDir, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"))
    val aq = approxQuantiles(cust, "c_mktsegment", "c_acctbal", probs,
      accuracy)
    val rankAggs = count(lit(1)).as("n") +:
      probs.indices.flatMap(i => Seq(
        sum(when(col("c_acctbal") < col(s"q${i + 1}"), 1).otherwise(0))
          .as(s"lt${i + 1}"),
        sum(when(col("c_acctbal") <= col(s"q${i + 1}"), 1).otherwise(0))
          .as(s"le${i + 1}")))
    val checks = cust.join(broadcast(aq), Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"))
      .agg(rankAggs.head, rankAggs.tail: _*)
    // rank certificate: the target rank p·n must fall inside the value's
    // occupied rank interval widened by the sketch's tolerance n/accuracy
    // (+1 absorbs the integer target-rank rounding convention)
    def ok(i: Int, p: Double) = {
      val tol = col("n").cast(DoubleType) / accuracy + 1.0
      val target = col("n").cast(DoubleType) * p
      (target >= col(s"lt${i + 1}") - tol) &&
        (target <= col(s"le${i + 1}") + tol)
    }
    checks.select(col("c_mktsegment") +: col("n") +:
      probs.zipWithIndex.map { case (p, i) => ok(i, p).as(s"q${i + 1}_ok") }: _*)
      .orderBy(col("c_mktsegment"))
  }

  /** SKEW-PROOF shuffled equi-join: lineitem ⋈ supplier with an explicit
    * key salt. A single hot supplier key at 100 TB lands every matching
    * fact row in ONE shuffle partition; salting spreads it over `Salts`
    * partitions deterministically — the probe side derives its salt from a
    * row-local hash (any spreading function works, correctness never
    * depends on it) and the dim side is replicated ×`Salts` by an in-row
    * explode, so replication cost is dim-sized, never fact-sized. The
    * shuffle_hash hint forces the shuffled-join regime the pattern targets
    * (broadcast would hide the salt; AQE's skew-join is the runtime
    * alternative when hot keys are unknown — this is the declarative form
    * for when they are). The salted join is result-identical to the plain
    * join: the oracle is the UNSALTED SQL.
    */
  def joinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val salts = 8
    val li = table(spark, sfDir, "lineitem")
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
    val sup = table(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
      .withColumn("salt", explode(lit((0L until salts.toLong).toArray)))
    li.join(sup.hint("shuffle_hash"),
        li("l_suppkey") === sup("s_suppkey") && li("salt") === sup("salt"))
      .groupBy(col("s_name"))
      .agg(moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  /** BLOOM-PREFILTERED SEMI-JOIN — the large×large semi-join shape where
    * the key set is too big to broadcast as a hash relation but its BLOOM
    * is fixed-size: filter lineitem to the line items of high-value
    * orders (o_totalprice > 475000, ~5% of orders) and aggregate.
    *
    * Three stages, all distributed ([[graft.functions.BloomSketch]], the
    * native expressions Catalyst's own runtime-filter injection uses):
    *  1. ONE aggregation pass over the key set builds the sketch —
    *     partial bitmaps OR-merge map-side, the driver receives a single
    *     `optimalNumOfBits(n, fpp)`-sized binary whatever the corpus size;
    *  2. the fact scan probes the sketch IN-ROW (codegen'd, before any
    *     exchange) — at 5% selectivity ~95% of the fact never reaches the
    *     shuffle, which is the entire economics of the pattern at 100 TB:
    *     shuffle volume ∝ survivors, not fact;
    *  3. an exact semi-join on the sliver removes bloom false positives,
    *     so the result equals the plain semi-join BIT-EXACTLY (no false
    *     negatives by construction) — that equality IS the oracle, making
    *     the probabilistic stage hash-verified, not trusted.
    *
    * The two key-side actions (count to size the sketch, then the sketch
    * aggregate itself) are sketch-sized driver round-trips, the same
    * shape as `sketch_kmv`'s estimator — never fact-sized. Spark CAN
    * inject a bloom runtime filter itself (`spark.sql.optimizer.runtime.
    * bloomFilter.enabled`) when join stats warrant; this operator is the
    * declarative form for when the pipeline KNOWS the key set is
    * selective — e.g. filtering a 100 TB token-span fact by a curated
    * document keep-list — and wants the guarantee, not the heuristic.
    */
  def joinBloom(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.BloomSketch
    val keys = table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 475000.0)
      .select(col("o_orderkey"))
    // size honestly from the key set itself (cheap count on the filtered
    // dim — a pipeline with catalog stats would use them instead)
    val n = keys.count()
    val bloom = keys.agg(BloomSketch.bloomAgg(col("o_orderkey"), n, 0.01))
      .head().getAs[Array[Byte]](0)
    val li = table(spark, sfDir, "lineitem")
      .filter(BloomSketch.mightContain(bloom, col("l_orderkey")))
    li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  /** CUBE over (returnflag, linestatus): every grouping set — per-pair,
    * per-flag, per-status, grand — in ONE pass over the fact table
    * (Expand multiplies each input row into its 4 grouping sets before the
    * single partial aggregate; four separate GROUP BYs would rescan 4×).
    * Null markers surfaced as 'ALL' exactly like [[aggRollup]].
    */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_price"), col("n"))
      .orderBy(col("rf"), col("ls"))

  /** Ordered list aggregation: per nation, its suppliers as one sorted CSV
    * string. `collect_list` is only safe when the per-group payload is
    * bounded by construction (here: a dim table fanned over 25 nations) —
    * never over a fact table, where one hot group OOMs its reducer. The
    * in-row `array_sort` makes the output independent of partition arrival
    * order, which is what lets an order-sensitive string survive the
    * cross-engine hash compare.
    */
  def stringCollect(spark: SparkSession, sfDir: String): DataFrame = {
    val s = table(spark, sfDir, "supplier")
    val n = table(spark, sfDir, "nation")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_supp"),
        array_join(array_sort(collect_list(col("s_name"))), ",").as("supp_csv"))
      .orderBy(col("n_name"))
  }

  // ------------------------------------------------------------ flagship ----

  /** Second composed flagship: top-10 customers by discounted revenue in
    * one order-year — the TPC-H Q10 shape (fact ⋈ fact ⋈ dims with a
    * selective date predicate, group, global top-k). The plan is the
    * statement: the ORDER-side date filter pushes to the orders scan
    * and the join PRUNES lineitem through it (orders is the smaller
    * fact after the cut); customer and nation broadcast; revenue sums
    * exact decimals per the money discipline; the top-10 is a
    * TakeOrderedAndProject, never a global sort. At 100 TB: two fact
    * scans, one key shuffle, k rows to the driver.
    */
  def flagshipRevenueTopCustomers(spark: SparkSession,
      sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType)
        && col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = table(spark, sfDir, "lineitem")
    val c = table(spark, sfDir, "customer")
    val n = table(spark, sfDir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n),
        c("c_nationkey").cast(LongType) === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Flagship: top revenue supplier per nation — the reference's EP2
    * winner-per-group shape (join → group → window rank → rank=1 filter;
    * `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:55-99`)
    * transplanted onto the harness star schema. supplier and nation are dims
    * → broadcast; lineitem aggregates map-side before the one shuffle on the
    * group key; the window re-uses the grouped (already small) result.
    */
  def flagshipNationTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val sup = table(spark, sfDir, "supplier")
    val nat = table(spark, sfDir, "nation")
    val rev = li
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
    rev.select(col("n_name"), col("s_suppkey"), col("s_name"), col("revenue"),
        rank().over(w).as("rnk"))
      .filter(col("rnk") === lit(1))
      .select(col("n_name"), col("s_name"), col("revenue"))
      .orderBy(col("n_name"))
  }

  // ---------------------------------------------------------------- SQL ----

  val oracleSql: Map[String, String] = Map(
    // the UNSALTED join: equality proves the salt spreads without
    // duplicating or dropping a single fact row
    "join_salted" ->
      """SELECT s_name,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // the PLAIN semi-join: equality proves the bloom prefilter loses no
    // row (no false negatives) and the exact join removes every false
    // positive — the probabilistic stage is hash-verified, not trusted
    "join_bloom" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_totalprice > 475000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |         AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "agg_string_collect" ->
      """SELECT n_name, count(*) AS n_supp,
        |       string_agg(s_name, ',' ORDER BY s_name) AS supp_csv
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "pivot_wide" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
        |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
        |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |         AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "sample_stratified" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
        |           AS BIGINT) % 100
        |  < CASE o_orderpriority WHEN '1-URGENT' THEN 50
        |                         WHEN '2-HIGH' THEN 20 ELSE 10 END
        |ORDER BY o_orderkey""".stripMargin,
    "quantile_bins" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.25), 6) AS q1,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS q2,
        |  round(quantile_cont(c_acctbal, 0.75), 6) AS q3
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the sketch's raw values are engine-specific; what IS exact cross-
    // engine is the group set, its counts, and the rank certificate the
    // Spark side computes against its own data — pinned all-TRUE here
    // (see quantileBinsApprox's scaladoc)
    "quantile_approx" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  true AS q1_ok, true AS q2_ok, true AS q3_ok
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "select_cols" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "select_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS qty_int,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE) AS price_dec,
        |  CAST(l_orderkey AS VARCHAR) AS okey_str,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "select_alias" ->
      """SELECT s_suppkey AS supp_id, s_name AS supp_name, s_acctbal AS balance
        |FROM supplier ORDER BY supp_id""".stripMargin,
    "drop_col" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "filter_compound" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'purchase' AND NOT (user_id = 0) AND value > 100.0
        |ORDER BY event_id""".stripMargin,
    "na_drop" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
        |  AND source IS NOT NULL AND n_chars IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "join_inner_equi" ->
      """SELECT c_custkey, c_name, c_nationkey, n_name
        |FROM customer JOIN nation
        |  ON CAST(c_nationkey AS BIGINT) = CAST(n_nationkey AS BIGINT)
        |ORDER BY c_custkey""".stripMargin,
    "join_left" ->
      """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
        |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48.0) li
        |  ON o_orderkey = li.l_orderkey
        |ORDER BY o_orderkey, l_linenumber NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH a AS (
        |  SELECT o_custkey AS k_a, CAST(count(*) AS BIGINT) AS n_before
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey AS k_b, CAST(count(*) AS BIGINT) AS n_since
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY o_custkey)
        |SELECT coalesce(k_a, k_b) AS custkey, n_before, n_since,
        |  CASE WHEN k_a IS NULL THEN 'new'
        |       WHEN k_b IS NULL THEN 'churned'
        |       ELSE 'retained' END AS status
        |FROM a FULL JOIN b ON k_a = k_b
        |ORDER BY custkey""".stripMargin,
    "agg_count" ->
      "SELECT COUNT(*) AS n_rows FROM lineitem",
    "groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "groupby_ratio" ->
      """SELECT CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
        |       / COUNT(*) AS error_ratio
        |FROM events""".stripMargin,
    "window_rank" ->
      """SELECT event_id, user_id, value,
        |  CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS INTEGER) AS rnk
        |FROM events ORDER BY event_id""".stripMargin,
    "window_top1" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY RANK() OVER (PARTITION BY user_id
        |                     ORDER BY value DESC, event_id) = 1
        |ORDER BY user_id""".stripMargin,
    "order_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "union_all" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'signup'
        |UNION ALL
        |SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin,
    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "daily_counts" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS day,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,
    "intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "part_brand_agg" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "flagship_nation_top_supplier" ->
      """WITH rev AS (
        |  SELECT n_name, s_suppkey, s_name,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
        |         AS DOUBLE) AS revenue
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name, s_suppkey, s_name)
        |SELECT n_name, s_name, revenue FROM rev
        |QUALIFY RANK() OVER (PARTITION BY n_name
        |                     ORDER BY revenue DESC, s_suppkey) = 1
        |ORDER BY n_name""".stripMargin,
    "flagship_revenue_top_customers" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin
  )
}

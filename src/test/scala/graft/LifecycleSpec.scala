package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Lifecycle, Similarity, Temporal}

/** Invariants for the pipeline-lifecycle operators (split / CDC compaction /
  * SCD2 / profiling / distribution quality / kNN) beyond what the DuckDB
  * oracles pin: partition laws, interval chaining, independent-formulation
  * equality, and the statistical sanity bounds.
  */
class LifecycleSpec extends SparkSpec {

  test("split_hash partitions the corpus deterministically ~80/10/10") {
    val s = Lifecycle.splitHash(spark, sf).cache()
    val total = Tables.table(spark, sf, "documents").count()
    try {
      assert(s.count() == total) // every row assigned exactly once
      val buckets = s.agg(min("bucket"), max("bucket")).head()
      assert(buckets.getLong(0) >= 0 && buckets.getLong(1) < 100)
      // split is a pure function of bucket
      assert(s.filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
        (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
        (col("bucket") >= 90 && col("split") =!= "test")).count() == 0)
      // rates: 500 docs → train ≈ 400 (binomial sd ≈ 9), generous margins
      val by: Map[String, Long] = s.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(by.values.sum == total)
      assert(by("train") > total * 0.7 && by("train") < total * 0.9, by)
      assert(by("val") > total * 0.04 && by("val") < total * 0.16, by)
      assert(by("test") > total * 0.04 && by("test") < total * 0.16, by)
      // determinism: a second invocation produces the identical assignment
      assert(Lifecycle.splitHash(spark, sf).collect().toSeq ==
        s.collect().toSeq)
    } finally s.unpersist()
  }

  test("upsert_latest equals the row_number window formulation") {
    val got = Lifecycle.upsertLatest(spark, sf)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val expected = Temporal.eventsNs(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions",
        count(lit(1)).over(Window.partitionBy(col("user_id"),
          col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("value"), col("ts_ns"),
        col("event_id"), col("n_versions"))
    assert(got.collect().toSet == expected.collect().toSet)
    // compaction conserves the log: version counts sum to the event count
    val nv = got.agg(sum("n_versions")).head().getLong(0)
    assert(nv == Tables.table(spark, sf, "events").count())
  }

  test("upsert_latest aggregates map-side: partial max_by, one hash exchange") {
    val p = Lifecycle.upsertLatest(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_max_by"), p)
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("scd2_intervals chain gaplessly with exactly one current row per key") {
    val iv = Lifecycle.scd2Intervals(spark, sf).cache()
    try {
      assert(iv.count() == Tables.table(spark, sf, "events").count())
      // one open interval per (user, type)
      val multiCurrent = iv.filter(col("is_current") === 1)
        .groupBy("user_id", "event_type").count()
        .filter(col("count") =!= 1).count()
      assert(multiCurrent == 0)
      // each interval's valid_to is the next interval's valid_from
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("valid_from_ns"), col("event_id"))
      val broken = iv
        .withColumn("next_from", lead(col("valid_from_ns"), 1).over(w))
        .filter(col("valid_to_ns").isNotNull &&
          col("valid_to_ns") =!= col("next_from")).count()
      assert(broken == 0)
    } finally iv.unpersist()
  }

  test("scd2 current rows are exactly the CDC-compacted state") {
    // cross-operator law: the open interval per key in the SCD2 history
    // must carry the same (value, ts, event_id) as upsert_latest's
    // latest-wins state — two independent formulations of "current"
    val current = Lifecycle.scd2Intervals(spark, sf)
      .filter(col("is_current") === 1)
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from_ns").as("ts_ns"), col("event_id"))
    val compacted = Lifecycle.upsertLatest(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts_ns"), col("event_id"))
    assert(current.collect().toSet == compacted.collect().toSet)
  }

  test("profile_stats profiles all four columns in one scan") {
    val rows = Lifecycle.profileStats(spark, sf).collect()
    assert(rows.length == 4)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val orders = Tables.table(spark, sf, "orders")
    val n = orders.count()
    assert(rows.forall(_.getLong(1) == n))          // n_rows
    assert(rows.forall(_.getLong(2) == 0))          // corpus has no nulls
    val ndStatus = orders.select(countDistinct("o_orderstatus")).head().getLong(0)
    assert(byCol("o_orderstatus").getLong(3) == ndStatus)
    assert(rows.forall(_.getBoolean(4)))            // HLL certificates hold
    assert(byCol("o_totalprice").getDouble(5) <= byCol("o_totalprice").getDouble(6))
    assert(byCol("o_orderstatus").getString(7) != null) // min_str for strings
    // the 100 TB claim: the EXACT profile is one pass (a single parquet
    // scan feeding an Expand); the HLL certificate adds exactly one more
    // columnar scan for its own hash-aggregate pass (folding it into the
    // sort-based exact aggregate measured ≈ +2s) and joins back broadcast
    val p = Lifecycle.profileStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 2, p)
    assert(p.contains("Expand"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("profileApprox (sketch-only serving form) estimates within the certified bound") {
    val orders = Tables.table(spark, sf, "orders")
    val cols = Seq("o_custkey", "o_orderpriority", "o_orderstatus",
      "o_totalprice")
    val rows = Lifecycle.profileApprox(orders, cols).collect()
    assert(rows.length == 4)
    val n = orders.count()
    assert(rows.forall(_.getLong(1) == n))          // n_rows exact
    assert(rows.forall(_.getLong(2) == 0))          // corpus has no nulls
    // serving form carries only the sketch estimate; check it against the
    // exact counts computed HERE (the suite is the certificate harness —
    // the serving plan itself must never pay for exact distinct state)
    val exact = cols.map(c => c ->
      orders.select(countDistinct(col(c)).as("n")).head().getLong(0)).toMap
    rows.foreach { r =>
      val (c, ad) = (r.getString(0), r.getLong(3))
      assert(math.abs(ad - exact(c)).toDouble / exact(c) <= 0.15,
        s"$c: approx $ad vs exact ${exact(c)}")
    }
    // PlanSpec pins the plan shape (one scan, hash-agg only, no Expand)
  }

  test("profileApproxCertified carries an in-plan nd_ok certificate per column") {
    val orders = Tables.table(spark, sf, "orders")
    val cols = Seq("o_custkey", "o_orderpriority", "o_orderstatus",
      "o_totalprice")
    val rows = Lifecycle.profileApproxCertified(orders, cols).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getBoolean(3)), rows.mkString(";")) // certificates
    // one pass: a single parquet scan feeds the combined exact+sketch agg
    val p = Lifecycle.profileApproxCertified(orders, cols)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("profile_approx graded key agrees with the exact profile's counts") {
    // the key profiles the same columns as profile_stats; its exact
    // fields (n_rows, n_nulls) must agree row-for-row and every nd_ok
    // certificate must hold
    val approx = Lifecycle.profileApproxQuery(spark, sf).collect()
    val exact = Lifecycle.profileStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.length == 4)
    approx.foreach { r =>
      val (nRows, nNulls) = exact(r.getString(0))
      assert(r.getLong(1) == nRows && r.getLong(2) == nNulls, r.toString)
      assert(r.getBoolean(3), s"nd_ok failed: $r")
    }
  }

  test("group_entropy is bounded by [0, ln(n_types)] and 0 for single-type users") {
    val e = Lifecycle.groupEntropy(spark, sf).cache()
    try {
      assert(e.filter(col("entropy") < 0).count() == 0)
      assert(e.filter(
        col("entropy") > log(col("n_types").cast("double")) + 1e-9)
        .count() == 0)
      assert(e.filter(col("n_types") === 1 && col("entropy") =!= 0.0)
        .count() == 0)
    } finally e.unpersist()
  }

  test("anomaly_zscore standardizes within group and flags |z| > 1.5") {
    val z = Lifecycle.anomalyZscore(spark, sf).cache()
    try {
      assert(z.count() == Tables.table(spark, sf, "orders").count())
      // per-group mean of z ≈ 0 (exact up to the 6-dp rounding of z)
      val offCenter = z.groupBy("o_orderpriority")
        .agg(avg(col("z")).as("mz"))
        .filter(abs(col("mz")) > 1e-3).count()
      assert(offCenter == 0)
      assert(z.filter(
        (abs(col("z")) > 1.5 && col("is_outlier") === 0) ||
        (abs(col("z")) <= 1.5 && col("is_outlier") === 1)).count() == 0)
      // both flag branches are exercised on this corpus (the threshold is
      // 1.5 precisely because near-uniform totalprice caps |z| at √3)
      assert(z.filter(col("is_outlier") === 1).count() > 0)
      assert(z.filter(col("is_outlier") === 0).count() > 0)
    } finally z.unpersist()
  }

  test("histogram bins partition the data with consistent bounds") {
    val h = Lifecycle.histogram(spark, sf).cache()
    try {
      val orders = Tables.table(spark, sf, "orders")
      assert(h.agg(sum("n_rows")).head().getLong(0) == orders.count())
      // every bin's observed bounds sit inside [bin_start, bin_start+width)
      val bad = h.filter(col("lo") < col("bin_start") ||
        col("hi") >= col("bin_start") + 50000.0).count()
      assert(bad == 0)
      // global bounds are preserved
      val (gLo, gHi) = orders
        .agg(min("o_totalprice"), max("o_totalprice")).head() match {
        case r => (r.getDouble(0), r.getDouble(1))
      }
      val hd = h.agg(min("lo"), max("hi")).head()
      assert(hd.getDouble(0) == gLo && hd.getDouble(1) == gHi)
    } finally h.unpersist()
  }

  test("minmax_scale maps each group onto [0,1] hitting both ends") {
    val m = Lifecycle.minmaxScale(spark, sf).cache()
    try {
      assert(m.count() == Tables.table(spark, sf, "orders").count())
      assert(m.filter(col("scaled") < 0 || col("scaled") > 1).count() == 0)
      // each group's extremes land exactly on 0 and 1
      val ends = m.groupBy("o_orderpriority")
        .agg(min("scaled").as("lo"), max("scaled").as("hi"))
        .filter(col("lo") =!= 0.0 || col("hi") =!= 1.0).count()
      assert(ends == 0)
      // order-preserving within a group
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val inversions = m
        .withColumn("prev", lag(col("scaled"), 1).over(w))
        .filter(col("prev").isNotNull && col("scaled") < col("prev"))
        .count()
      assert(inversions == 0)
    } finally m.unpersist()
  }

  test("winsorize_clip equals the brute-force discrete-percentile clip") {
    import spark.implicits._
    // brute force on a fixture with ties at the bound and obvious outliers
    val vals = Seq.fill(40)(10.0) ++ Seq(0.5, 1.0, 500.0, 900.0) ++
      (1 to 56).map(_.toDouble + 20)
    val fx = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val got = Lifecycle.winsorizeStats(fx, "grp", "v").collect()(0)
    val sorted = vals.sorted
    val n = vals.length
    def bound(pm: Long) = sorted(((n * pm + 999) / 1000 - 1).toInt)
    val lo = bound(10L); val hi = bound(990L)
    assert(got.getAs[Double]("lo") == lo && got.getAs[Double]("hi") == hi)
    assert(got.getAs[Long]("n_clipped_lo") == vals.count(_ < lo))
    assert(got.getAs[Long]("n_clipped_hi") == vals.count(_ > hi))
    val cs = vals.map(v => math.max(math.min(v, hi), lo)).map(BigDecimal(_))
      .sum.toDouble
    assert(math.abs(got.getAs[Double]("clipped_sum") - cs) < 1e-6)
    // corpus laws: every group clips something on each side at p01/p99,
    // bounds sit inside the raw extremes, clipped sum inside [n·lo, n·hi]
    val rows = Lifecycle.winsorizeClip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nn, l, h) = (r.getAs[Long]("n"), r.getAs[Double]("lo"),
        r.getAs[Double]("hi"))
      assert(l <= h)
      assert(r.getAs[Long]("n_clipped_lo") > 0 &&
        r.getAs[Long]("n_clipped_hi") > 0)
      val s = r.getAs[Double]("clipped_sum")
      assert(s >= nn * l - 1e-6 && s <= nn * h + 1e-6)
    }
  }

  test("corr_matrix matches Spark's own corr in one scan") {
    // plan check FIRST: once the result is cached below, a re-invocation
    // plan-matches the InMemoryRelation and the scan count is meaningless
    val p = Lifecycle.corrMatrix(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    val m = Lifecycle.corrMatrix(spark, sf).cache()
    try {
      assert(m.count() == 3) // 3 columns → 3 pairs
      assert(m.filter(abs(col("corr")) > 1.0).count() == 0)
      // against Spark's built-in Pearson (different accumulation — agree
      // to ~1e-6, not bit-exact; bit-exactness is the oracle's job)
      val li = Tables.table(spark, sf, "lineitem")
      val expected = li.stat.corr("l_quantity", "l_extendedprice")
      val got = m.filter(col("col_x") === "l_quantity" &&
        col("col_y") === "l_extendedprice").head().getDouble(3)
      assert(math.abs(got - expected) < 1e-5, s"$got vs $expected")
      // (the harness generator draws the numeric columns independently —
      // all pairwise correlations sit near 0, so only formula agreement
      // and bounds are meaningful here)
    } finally m.unpersist()
  }

  test("lifecycle API overloads: custom rates, keys and thresholds") {
    import spark.implicits._
    // splitHash: 50/25 rates over an arbitrary frame and key
    val s = Lifecycle.splitHash(
      (1L to 1000L).toDF("id"), col("id"), trainPct = 50, valPct = 25)
    val by = s.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.values.sum == 1000L)
    assert(by("train") > 400 && by("train") < 600, by)
    assert(by("val") > 150 && by("val") < 350, by)
    // upsertLatest: generic change log, single key, version = (v, id)
    val log = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"),
      (2L, 3L, 5L, "c")).toDF("k", "id", "v", "payload")
    val state = Lifecycle.upsertLatest(log, keys = Seq("k"),
      versionCols = Seq("v", "id"), payload = Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(state.toSet == Set((1L, "b", 2L), (2L, "c", 3L)))
    // scd2Intervals: generic keys/ts/id naming
    val iv = Lifecycle.scd2Intervals(log, keys = Seq("k"), ts = "v",
      id = "id")
    assert(iv.filter(col("is_current") === 1).count() == 2)
    // anomalyZscore: wider threshold flags nothing on the same data
    val z3 = Lifecycle.anomalyZscore(
      Tables.table(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice")),
      group = "o_orderpriority", value = "o_totalprice", threshold = 3.0)
    assert(z3.filter(col("is_outlier") === 1).count() == 0)
  }

  test("knn_classify takes the majority label of the 5 exact neighbors") {
    val got = Similarity.knnClassify(spark, sf).cache()
    try {
      assert(got.count() == 50) // one verdict per probe
      assert(got.filter(col("votes") < 1 || col("votes") > 5).count() == 0)
      assert(got.filter(
        (col("pred_label") === col("true_label") && col("correct") === 0) ||
        (col("pred_label") =!= col("true_label") && col("correct") === 1))
        .count() == 0)
      // independent recomputation of the vote from the neighbor lists
      val labels = Tables.table(spark, sf, "embeddings")
        .select(col("vec_id").as("c_id"), col("label"))
      val expected = Similarity.simSearch(spark, sf, col("vec_id") < 50, 5)
        .join(labels, "c_id")
        .groupBy("q_id", "label").count()
        .withColumn("r", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("count").desc, col("label"))))
        .filter(col("r") === 1)
        .select(col("q_id"), col("label").as("pred_label"))
      val mismatches = got.select("q_id", "pred_label")
        .exceptAll(expected).count()
      assert(mismatches == 0)
    } finally got.unpersist()
  }
}

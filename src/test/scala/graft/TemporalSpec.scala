package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sketches, Temporal}

/** Temporal joins + the KMV sketch: exact semantics pinned against
  * in-memory brute force over the sf0.001 corpus, plan shapes pinned
  * against the 100 TB claims (no nested-loop joins, single shuffle for the
  * as-of, partial top-k for the sketch minima).
  */
class TemporalSpec extends SparkSpec {

  private def eventRows: Seq[(Long, Long, String, Long)] = {
    import spark.implicits._
    Temporal.eventsNs(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns"))
      .as[(Long, Long, String, Long)].collect().toSeq
  }

  test("join_asof equals brute-force latest-click-at-or-before per purchase") {
    import spark.implicits._
    val ev = eventRows
    val clicksByUser = ev.filter(_._3 == "click")
      .groupBy(_._2).map { case (u, rs) => u -> rs.map(_._4).sorted }
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      val last = clicksByUser.getOrElse(u, Nil).takeWhile(_ <= ts).lastOption
      (id, last)
    }.toMap
    val got = Temporal.joinAsof(spark, sf)
      .select(col("event_id"), col("click_ts_ns"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.exists(_.isDefined))
  }

  test("join_asof_tol gates the asof match at the tolerance, keeps probes") {
    import spark.implicits._
    val ev = eventRows
    val clicksByUser = ev.filter(_._3 == "click")
      .groupBy(_._2).map { case (u, rs) => u -> rs.map(_._4).sorted }
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      val last = clicksByUser.getOrElse(u, Nil).takeWhile(_ <= ts).lastOption
      val kept = last.filter(c => ts - c <= Temporal.DayNs)
      (id, (kept, if (kept.isDefined) 1 else 0))
    }.toMap
    val got = Temporal.joinAsofTolQuery(spark, sf)
      .select(col("event_id"), col("click_ts_ns"), col("matched"))
      .as[(Long, Option[Long], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
    // all three outcomes populated: attributed, stale-nulled, clickless
    assert(got.values.exists(_._2 == 1))
    assert(got.values.exists(_._2 == 0))
    val asof = Temporal.joinAsof(spark, sf)
      .select(col("event_id"), col("click_ts_ns"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got.exists { case (id, (k, _)) =>
      k.isEmpty && asof(id).isDefined },
      "no STALE match was nulled — the tolerance gate is vacuous here")
    assert(got.size == asof.size, "the gate dropped probes")
  }

  test("user_cadence equals brute-force per-user gap statistics") {
    import spark.implicits._
    val ev = eventRows
    val expected = ev.groupBy(_._2).map { case (u, rs) =>
      val ts = rs.sortBy(r => (r._4, r._1)).map(_._4)
      val gaps = ts.zip(ts.drop(1)).map { case (a, b) => b - a }
      u -> ((ts.size.toLong, gaps.size.toLong,
        gaps.minOption, gaps.maxOption,
        gaps.count(_ <= 60000000000L).toLong, ts.max - ts.min))
    }
    val got = Temporal.userCadenceQuery(spark, sf)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expected)
    // laws: gaps are events−1; bursty bounded by gaps; spans non-negative
    got.values.foreach { case (n, g, _, _, b, s) =>
      assert(g == n - 1 && b <= g && s >= 0)
    }
    assert(got.values.exists(_._5 > 0), "no bursty gap in the corpus")
  }

  test("join_range equals brute-force 24h-window click counts") {
    import spark.implicits._
    val ev = eventRows
    val clicks = ev.filter(_._3 == "click")
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      id -> clicks.count(c =>
        c._2 == u && c._4 > ts - Temporal.DayNs && c._4 <= ts).toLong
    }.toMap
    val got = Temporal.joinRange(spark, sf)
      .select(col("event_id"), col("n_clicks"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // the binned join must restore zero-click purchases, not drop them
    assert(got.values.exists(_ == 0L) || got.values.forall(_ > 0L))
    assert(got.values.exists(_ > 0L))
  }

  test("temporal joins avoid nested-loop plans; as-of shuffles exactly once") {
    val asof = Temporal.joinAsof(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!asof.contains("BroadcastNestedLoop"), asof)
    assert(!asof.contains("CartesianProduct"), asof)
    // ONE hash exchange (user_id for the window); the display orderBy adds
    // only a range partitioning. A second hash exchange would mean the
    // union-tag trick regressed to a join.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(asof).length
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx in:\n$asof")
    val range = Temporal.joinRange(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!range.contains("BroadcastNestedLoop"), range)
    assert(!range.contains("CartesianProduct"), range)
  }

  test("window_moving_avg equals brute-force sliding means per user") {
    import spark.implicits._
    val ev = Temporal.eventsNs(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.zipWithIndex.map { case (r, i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1)
        val sum4 = frame.map(x => BigDecimal(x._4)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        r._1 -> (sum4.toDouble / frame.length, frame.length.toLong)
      }
    }
    val got = Temporal.windowMovingAvg(spark, sf)
      .select(col("event_id"), col("mov_avg"), col("win_n"))
      .as[(Long, Double, Long)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, avg, n) =>
      val (eAvg, eN) = expected(id)
      assert(n == eN, s"event $id window count")
      assert(math.abs(avg - eAvg) < 1e-6, s"event $id mov_avg $avg vs $eAvg")
    }
    // frames shorter than 7 at partition starts are averaged over their
    // true length, not zero-padded
    assert(got.exists(_._3 < 7L) && got.exists(_._3 == 7L))
  }

  test("event_funnel equals brute-force ordered-stage matching") {
    import spark.implicits._
    val ev = eventRows.filter(r =>
      Set("view", "click", "purchase").contains(r._3))
    val expected = ev.groupBy(_._2).map { case (u, rows) =>
      val tv = rows.filter(_._3 == "view").map(_._4).minOption
      val tc = tv.flatMap(t =>
        rows.filter(r => r._3 == "click" && r._4 >= t).map(_._4).minOption)
      val tp = tc.flatMap(t =>
        rows.filter(r => r._3 == "purchase" && r._4 >= t).map(_._4).minOption)
      u -> (tv.size + tc.size + tp.size)
    }
    val got = Temporal.eventFunnel(spark, sf)
      .select(col("user_id"), col("funnel_stage"))
      .as[(Long, Int)].collect().toMap
    assert(got == expected)
    // stage flags are monotone by construction: a purchase can't count
    // without a qualifying click, nor a click without a preceding view
    val flags = Temporal.eventFunnel(spark, sf)
      .select(col("user_id"), col("has_view"), col("has_click"),
        col("has_purchase")).as[(Long, Int, Int, Int)].collect()
    flags.foreach { case (u, v, c, p) =>
      assert(v >= c && c >= p, s"non-monotone funnel flags for user $u")
    }
  }

  test("moving-avg and funnel shuffle once; salted join stays shuffled") {
    // both event ops: ONE hash exchange (user_id) — the final groupBy or
    // frame rides the window's partitioning; orderBy adds only a range
    val mov = Temporal.windowMovingAvg(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(mov).length == 1, mov)
    val fun = Temporal.eventFunnel(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(fun).length == 1, fun)
    // the salt only does its job in a SHUFFLED join: a broadcast would
    // collapse the salted build side back onto every probe partition
    val salted = graft.ops.Relational.joinSalted(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!salted.contains("BroadcastHashJoin"), salted)
    assert(salted.contains("ShuffledHashJoin") ||
      salted.contains("SortMergeJoin"), salted)
  }

  test("temporal API overloads: custom types, window sizes, and N-stage funnels") {
    import spark.implicits._
    val h = 3600000000000L // 1h in ns
    // hand-built log, one user: signup → view → click → purchase plus a
    // reversed-order distractor user who clicks before ever viewing
    val ev = Seq(
      (1L, 1L, "signup", 0L, 1.0),
      (2L, 1L, "view", 1 * h, 1.0),
      (3L, 1L, "click", 2 * h, 2.0),
      (4L, 1L, "purchase", 3 * h, 10.0),
      (5L, 2L, "click", 1 * h, 5.0),
      (6L, 2L, "view", 2 * h, 1.0),
      (7L, 2L, "purchase", 3 * h, 20.0)
    ).toDF("event_id", "user_id", "event_type", "ts_ns", "value")
    // as-of with swapped roles: each click ← latest preceding purchase
    val asof = Temporal.joinAsof(ev, probeType = "click", refType = "purchase")
      .select(col("event_id"), col("ref_ts_ns")).as[(Long, Option[Long])]
      .collect().toMap
    assert(asof == Map(3L -> None, 5L -> None))
    // range join, 2h window on view←click: u2's click (1h before its
    // view) is inside the window — NOT at the exclusive lower bound —
    // while u1's click is AFTER its view (excluded)
    val rng = Temporal.joinRange(ev, probeType = "view", refType = "click",
      windowNs = 2 * h)
      .select(col("event_id"), col("n_ref"), col("ref_value"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rng == Map(2L -> ((0L, 0.0)), 6L -> ((1L, 5.0))))
    // moving average with a 2-row frame
    val ma = Temporal.windowMovingAvg(ev.filter(col("user_id") === 1),
      frameRows = 2)
      .select(col("event_id"), col("mov_avg")).as[(Long, Double)]
      .collect().toMap
    assert(ma == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.5, 4L -> 6.0))
    // 4-stage funnel: u1 completes all four; u2's click precedes its view
    // so it stalls at stage 1 (signup missing → view doesn't qualify…
    // actually u2 has no signup: stage 0 missing ⇒ nothing qualifies)
    val f4 = Temporal.eventFunnel(ev,
      Seq("signup", "view", "click", "purchase"))
      .orderBy(col("user_id"))
      .select(col("user_id"), col("has_signup"), col("has_view"),
        col("has_click"), col("has_purchase"), col("funnel_stage"))
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq
    assert(f4 == Seq((1L, 1, 1, 1, 1, 4), (2L, 0, 0, 0, 0, 0)))
    // the 3-stage default vocabulary on the same frame: u2 now has a view
    // but its click came first, so it stalls at stage 1
    val f3 = Temporal.eventFunnel(ev, Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))
      .select(col("user_id"), col("funnel_stage"))
      .as[(Long, Int)].collect().toSeq
    assert(f3 == Seq((1L, 3), (2L, 1)))
  }

  test("sketch_kmv estimates within KMV error bounds and is deterministic") {
    val row = Sketches.kmvDistinct(spark, sf).collect()(0)
    val (k, kth, est, exact) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getLong(3))
    assert(k == 64L)
    assert(kth > 0L)
    // ~1/√(K−2) ≈ 13% stddev; 4σ bound keeps the test deterministic-safe
    assert(math.abs(est - exact) / exact < 0.52,
      s"KMV est $est vs exact $exact out of bounds")
    val again = Sketches.kmvDistinct(spark, sf).collect()(0)
    assert(again.getLong(1) == kth && again.getDouble(2) == est)
  }

  test("sketch_kmv cuts the minima with a partial top-k, not a global sort") {
    val p = Sketches.kmvDistinct(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("heavy_hitters == independent exact top-k, every CMS certificate" +
      " holds") {
    import spark.implicits._
    val got = Sketches.heavyHitters(spark, sf).collect().toSeq
    assert(got.size == 10)
    assert(got.forall(_.getBoolean(2)), s"cms_lower_ok false in $got")
    // the PROBABILISTIC half of the CMS certificate lives here, not in
    // the hashed oracle (see heavyHitters scaladoc): estimate within ε·N
    // above the true count for every hitter on the harness corpus
    val full = Sketches.heavyHittersEst(
      Tables.table(spark, sf, "events"), col("user_id"), 10)
      .collect().toSeq
    assert(full.forall(_.getAs[Boolean]("cms_eps_ok")),
      s"cms eps bound violated in $full")
    assert(full.forall(r => r.getAs[Long]("cms_est") >=
      r.getAs[Long]("n_events")))
    // independent reconstruction: window-rank formulation instead of
    // orderBy+limit
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_events").desc, col("user_id"))
    val expect = Tables.table(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .orderBy(col("rnk"))
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) == expect)
  }

  test("heavy_hitters API form: planted counts, CMS never underestimates," +
      " null keys excluded") {
    import spark.implicits._
    // planted frequencies: key i repeated i*10 times, plus null noise
    val rows = (1 to 6).flatMap(i => Seq.fill(i * 10)(Some(i.toLong))) ++
      Seq.fill(25)(Option.empty[Long])
    val df = rows.toDF("k")
    val got = Sketches.heavyHitters(df, col("k"), 4).collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((6L, 60L), (5L, 50L), (4L, 40L), (3L, 30L)),
      s"wrong hitters: $got")
    assert(got.forall(_.getBoolean(2)))
  }

  test("heavy_hitters plans a partial-agg top-k cut, never a global sort") {
    val p = Sketches.heavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
  }
}

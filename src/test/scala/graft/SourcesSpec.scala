package graft

import org.apache.spark.sql.functions._

import graft.ops.Sources

/** Z-order layout: the locality laws the graded stats key claims, and the
  * physical property of the clustered write (disjoint per-file z-ranges)
  * that makes parquet min/max stats prune 2-D box predicates.
  */
class SourcesSpec extends SparkSpec {

  test("zorder_layout: runs conserve rows and each dim span stays within" +
      " the aligned block") {
    val runs = Sources.zorderLayout(spark, sf).collect().toSeq
    assert(runs.nonEmpty)
    val total = Tables.table(spark, sf, "lineitem").count()
    assert(runs.map(_.getLong(1)).sum == total, "rows not conserved")
    // structural guarantee of the interleave: a z-run fixes the high 4
    // bits of each dim's 8-bit cell, so within a run each dim varies over
    // ≤ 16 aligned cells — the box-locality property the layout sells
    runs.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 15,
        s"x span too wide in run ${r.getLong(0)}: $r")
      assert(r.getLong(5) - r.getLong(4) <= 15,
        s"y span too wide in run ${r.getLong(0)}: $r")
      // and the run's box is the ALIGNED block: lo/hi fall in the same
      // 16-cell window
      assert(r.getLong(2) / 16 == r.getLong(3) / 16, s"x not aligned: $r")
      assert(r.getLong(4) / 16 == r.getLong(5) / 16, s"y not aligned: $r")
    }
  }

  test("zorder_layout is deterministic (identical reruns)") {
    val a = Sources.zorderLayout(spark, sf).collect().toSeq
    val b = Sources.zorderLayout(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("zorderWrite: per-file z-intervals are disjoint, rows conserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-")
      .toFile
    try {
      val li = Tables.table(spark, sf, "lineitem")
      val back = Sources.zorderWrite(li, col("l_partkey"), col("l_suppkey"),
        nFiles = 4, out = dir.getPath)
      assert(back.count() == li.count(), "write lost rows")
      import spark.implicits._
      val files = back
        .groupBy(input_file_name().as("f"))
        .agg(min(col("z")).as("zlo"), max(col("z")).as("zhi"))
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
      assert(files.size > 1, "expected multiple files")
      // range-partitioned + sorted ⇒ consecutive files cover disjoint
      // z-intervals — exactly what lets footer min/max stats skip files
      files.sliding(2).foreach {
        case Seq((_, _, hi1), (_, lo2, _)) =>
          assert(hi1 <= lo2, s"overlapping z-intervals: $files")
        case _ =>
      }
    } finally {
      graft.LocalFs.deleteRecursively(dir)
    }
  }

  test("mix_sample: weight laws — pass-through, drop, epochs, dense copies") {
    import spark.implicits._
    val docs = Tables.table(spark, sf, "documents")
    val n = docs.count()
    val sampled = Sources.mixSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 0.0),
      defaultWeight = 0.5, salt = "t")
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .as[(Long, String, Long)].collect().toSeq
    val bySrc = sampled.groupBy(_._2)
    // integer weights are EXACT, not probabilistic: every src0 doc appears
    // exactly 3 times, every src1 doc exactly once, no src2 doc at all
    val n0 = docs.filter(col("source") === "src0").count()
    val n1 = docs.filter(col("source") === "src1").count()
    assert(bySrc("src0").size == 3 * n0, "3.0-weight source not tripled")
    assert(bySrc("src1").size == n1, "1.0-weight source not passed through")
    assert(!bySrc.contains("src2"), "0-weight source not dropped")
    // copy_idx is dense 0..n-1 per doc (epoch decorrelation downstream
    // keys on it)
    sampled.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.size).toSeq,
        s"doc $id copy_idx not dense")
    }
    // fractional weights converge to the target rate (binomial tolerance;
    // the corpus has ~n/20 docs per source, pooled default-weight docs
    // give a tight bound)
    val defCount = sampled.count(r => r._2 != "src0" && r._2 != "src1")
    val defDocs = n - n0 - n1 - docs.filter(col("source") === "src2").count()
    val rate = defCount.toDouble / defDocs
    assert(math.abs(rate - 0.5) < 0.15,
      s"default-weight realized rate $rate far from 0.5")
    // determinism: the same salt reproduces the identical sample
    val again = Sources.mixSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 0.0),
      defaultWeight = 0.5, salt = "t")
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .as[(Long, String, Long)].collect().toSeq
    assert(sampled.sorted == again.sorted)
  }

  test("mix_sample plans as a scan-stage projection: zero Exchange") {
    // the 100 TB claim: the whole mixture — weight CASE, hash draw, copy
    // explode — is in-row work in the scan stage; no shuffle, no state
    val p = Sources.mixSample(Tables.table(spark, sf, "documents"),
      col("doc_id"), col("source"), Map("src0" -> 2.0),
      defaultWeight = 0.5, salt = "t")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("mix_sample frame-weights form equals the Map form row-for-row") {
    import spark.implicits._
    val docs = Tables.table(spark, sf, "documents")
    val weights = Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.0)
    val viaMap = Sources.mixSample(docs, col("doc_id"), col("source"),
        weights, defaultWeight = 0.5, salt = "fw")
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    val wdf = weights.toSeq.toDF("source", "weight")
    val viaFrame = Sources.mixSample(docs, col("doc_id"), "source",
        wdf, defaultWeight = 0.5, salt = "fw")
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(viaMap.nonEmpty)
    assert(viaFrame == viaMap)
    // the weight attach is a broadcast join — the corpus never shuffles
    val p = Sources.mixSample(docs, col("doc_id"), "source", wdf,
        defaultWeight = 0.5, salt = "fw")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("sink_jsonl round-trip reproduces the documents table bit-exactly") {
    val back = Sources.sinkJsonlRoundTrip(spark, sf)
    val orig = Tables.table(spark, sf, "documents")
    assert(back.count() == orig.count())
    // set equality both ways — JSON escaping must not perturb any value
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "JSONL round-trip changed at least one row")
  }
}

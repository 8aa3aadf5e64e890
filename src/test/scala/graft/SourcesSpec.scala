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
}

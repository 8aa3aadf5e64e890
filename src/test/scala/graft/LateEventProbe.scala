package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** Dev probe (test scope): out-of-order (late) events must extend a
  * session's boundaries, never regress them. Scenario from review: user 1
  * has 10:10 in batch 1, then a LATE 10:02 plus 10:35 in batch 2 — all
  * within the 30-min gap, so ONE session [10:02, 10:35] with 3 events.
  */
object LateEventProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late_in").toString
    val ck = Files.createTempDirectory("graft_late_ck").toString
    val sink = Files.createTempDirectory("graft_late_sink").toString
    def land(rows: Seq[(Long, String, Long, String, Double)]): Unit =
      rows.map { case (id, t, u, ty, v) =>
        (id, Timestamp.valueOf(t), u, ty, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(dir)
    def drain(): Unit = {
      // parquet sink: memory sink cannot recover from a checkpoint
      val q = Streams.sessionize(spark, Streams.readEvents(spark, dir), 30)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land(Seq((1L, "2024-01-01 10:10:00", 1L, "click", 1.0)))
    drain()
    // batch 2: late 10:02 for user1, plus 10:35, plus a far-future event to
    // advance the watermark and close user1's session
    land(Seq(
      (2L, "2024-01-01 10:02:00", 1L, "click", 2.0),
      (3L, "2024-01-01 10:35:00", 1L, "click", 4.0),
      (4L, "2024-01-01 14:00:00", 9L, "view", 0.0)))
    drain()
    val out = spark.read.parquet(sink)
      .filter(col("user_id") === 1L)
      .select("user_id", "n_events", "start", "end", "total_value").collect()
    out.foreach(r => println(s"SESSION=${r.mkString("|")}"))
    val ok = out.length == 1 && out(0).getLong(1) == 3 &&
      out(0).getTimestamp(2).toString.startsWith("2024-01-01 10:02") &&
      out(0).getTimestamp(3).toString.startsWith("2024-01-01 10:35") &&
      out(0).getDouble(4) == 7.0 // value accumulation through the late merge
    println(s"LATE_EVENT_MERGE=${if (ok) "PASS" else "FAIL"}")
    spark.stop()
  }
}

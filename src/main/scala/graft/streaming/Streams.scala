package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table shape.
  *
  * The reference is batch-only (its source refreshes weekly — SURVEY §1),
  * so nothing here is required for parity; this is the engine's scale path
  * for the same computations arriving as a stream: file-source ingestion,
  * watermarked event-time windows, and custom session state via
  * `flatMapGroupsWithState`. All state is bounded: watermarks bound the
  * window state store, the session-gap timeout bounds per-user state, and
  * both run incrementally per micro-batch on any number of executors.
  */
object Streams {

  /** events schema as produced for the harness corpus (µs timestamp). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionState(nEvents: Long, start: Timestamp, last: Timestamp,
    total: Double)

  case class SessionOut(user_id: Long, n_events: Long, start: Timestamp,
    end: Timestamp, total_value: Double)

  /** File-source stream of events-shaped parquet dropped into `dir` —
    * the streaming analog of `Tables.table` (new files are discovered per
    * micro-batch; at scale this is a cloud-storage landing zone).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked tumbling-window counts per event type — the streaming form
    * of `groupby_agg`. The 10-minute watermark lets the state store evict
    * windows older than max(event time) − 10 min, so state is O(open
    * windows × types) regardless of stream length.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming dedup-on-ingest: drop re-deliveries of the same content
    * within the watermark horizon — the streaming form of `dedup_exact` and
    * the first stage of a training-data ingest pipeline (at-least-once
    * sources re-deliver; exactly-once content survives). Keyed by the
    * sha2-256 of the content columns; `dropDuplicatesWithinWatermark`
    * evicts seen-key state older than the watermark, so state is bounded by
    * the horizon's key cardinality, not the stream's lifetime (the property
    * that makes this runnable forever at 100 TB/day).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      // null-SAFE content key: concat_ws silently skips NULLs (a null value
      // and a shifted field would collide), so serialize via to_json with
      // ignoreNullFields=false — every column slot is always present
      .withColumn("h", sha2(to_json(
        struct(col("event_type"), col("value"), col("props")),
        Map("ignoreNullFields" -> "false").asJava), 256))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("h")

  /** Event-time sessionization with a gap timeout: emits one row per closed
    * session (no activity for `gapMinutes` past the watermark). Custom state
    * via `flatMapGroupsWithState` — per-user state is one small case class,
    * evicted on timeout, the bounded-state pattern for user-level rollups
    * over unbounded streams.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.nEvents, s.start, s.last, s.total))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            // overlap with the open session (late events within the
            // watermark may arrive out of order: extend both boundaries,
            // never regress them)
            case Some(s) if t <= s.last.getTime + gapMs
                && t + gapMs >= s.start.getTime =>
              val start = if (t < s.start.getTime) e.ts else s.start
              val last = if (t > s.last.getTime) e.ts else s.last
              cur = Some(SessionState(s.nEvents + 1, start, last,
                s.total + e.value))
            // disjoint after the open session: close it, start fresh
            case Some(s) if t > s.last.getTime + gapMs =>
              closed ::= SessionOut(userId, s.nEvents, s.start, s.last, s.total)
              cur = Some(SessionState(1, e.ts, e.ts, e.value))
            // disjoint before the open session (very late singleton):
            // emit immediately — nothing older can still arrive to merge
            // with it once it is already behind the open session
            case Some(_) =>
              closed ::= SessionOut(userId, 1, e.ts, e.ts, e.value)
            case None =>
              cur = Some(SessionState(1, e.ts, e.ts, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last.getTime + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events.ts ingestion chokepoint (`Tables.normalizeTs`).
  *
  * The harness has shipped `events.ts` in three physical shapes across
  * rounds — parquet TIMESTAMP(NANOS) (read as int64 ns under
  * `nanosAsLong`), `timestamp[us]` without timezone (TIMESTAMP_NTZ), and
  * plain TIMESTAMP — and each drift that reached the query sites broke
  * seven keys at once with an analysis-time DATATYPE_MISMATCH. These tests
  * make the next drift fail HERE, loudly, instead.
  */
class TablesSpec extends SparkSpec {

  test("live corpus events.ts is a representation normalizeTs handles") {
    // raw read (not Tables.events): asserts on what the harness actually
    // shipped this round, so an unhandled fourth shape fails this named
    // pin even if some future code path stops consulting normalizeTs
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val dt = raw.schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(dt),
      s"harness shipped events.ts as $dt — extend Tables.normalizeTs " +
        "and this pin together")
    val norm = Tables.events(spark, sf)
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.count() > 0)
  }

  test("all three historical ts representations normalize to the same instants") {
    import spark.implicits._
    // three instants incl. a sub-second µs component; ns adds sub-µs digits
    // that the normalization must floor away (DuckDB loads NANOS at µs too)
    val micros = Seq(0L, 1721000000123456L, 1721000123999999L)
    val asLongNs = micros.map(us => us * 1000L + 789L).toDF("ts") // int64 ns
    val asTs = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts")) // TIMESTAMP
    val asNtz = asTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    }
    assert(instants(asLongNs) == micros)
    assert(instants(asTs) == micros)
    assert(instants(asNtz) == micros)
  }

  test("normalizeTs fails loud on an unhandled representation") {
    import spark.implicits._
    val bogus = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(bogus))
    assert(e.getMessage.contains("unsupported events.ts representation"))
  }

  test("getTimestamp row extraction works on normalized events (NTZ drift guard)") {
    // the exact access pattern that broke StreamingSpec in round 7:
    // collect() must yield java.sql.Timestamp, not LocalDateTime
    val row = Tables.events(spark, sf).select(col("ts")).first()
    assert(row.getTimestamp(0).isInstanceOf[Timestamp])
  }
}

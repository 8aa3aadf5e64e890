package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter sketch columns over Spark's NATIVE bloom expressions — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair Catalyst's
  * own runtime-filter injection uses (both codegen-friendly; the membership
  * probe compiles into the scan stage's generated code, unlike a Scala UDF
  * closing over a driver-built `util.sketch.BloomFilter`).
  *
  * The sketch is an aggregate over xxhash64(key): build it with one
  * distributed pass over the key set (partial sketches OR-merge, so the
  * aggregation is map-side combining and the driver receives ONE
  * fixed-size bitmap — `optimalNumOfBits(n, fpp)` bytes regardless of
  * corpus size), then probe it in-row anywhere. No false negatives ever;
  * false-positive rate ≤ `fpp` at the declared capacity.
  */
object BloomSketch {

  /** Aggregate column building a bloom sketch (binary) over `key`, sized
    * for `expectedItems` distinct keys at false-positive rate `fpp`.
    */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val bits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedItems), Literal(bits)).toAggregateExpression())
  }

  /** Membership probe of `key` against a built sketch. The bytes ride the
    * plan as a literal (task-binary-broadcast by Spark), so the filter is
    * a pure in-row predicate — map-side, before any exchange.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))
}

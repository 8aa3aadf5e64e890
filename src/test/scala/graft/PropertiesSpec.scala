package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** scalacheck-generated property tests (SURVEY §5.3) over in-memory
  * DataFrames — invariants that must hold for any input, not just the
  * corpus: union additivity, dedup idempotence, split partitioning.
  * (Raw Gen + seeded sampling; the scalatest-scalacheck bridge isn't in the
  * offline dependency set.)
  */
class PropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("union_all count is additive for arbitrary splits") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 1000L),
      Gen.oneOf("x", "y", "z")))
    samples(gen, 10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "tag")
      val a = df.filter(col("tag") === "x")
      val b = df.filter(col("tag") =!= "x")
      assert(a.unionAll(b).count() == df.count())
    }
  }

  test("hash dedup is idempotent for arbitrary duplicate patterns") {
    import spark.implicits._
    val gen = Gen.listOfN(25, Gen.oneOf("a", "b", "c", "d"))
    samples(gen, 10).filter(_.nonEmpty).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("h", sha2(col("text"), 256))
      val once = df.dropDuplicates("h")
      assert(once.count() == texts.distinct.size)
      assert(once.dropDuplicates("h").count() == once.count())
    }
  }

  test("randomSplit partitions any input: disjoint, exhaustive") {
    import spark.implicits._
    samples(Gen.zip(Gen.choose(10, 60), Gen.choose(1L, 9999L)), 10)
      .foreach { case (n, seed) =>
        val df = (0 until n).map(_.toLong).toDF("id")
        val Array(a, b) = df.randomSplit(Array(0.8, 0.2), seed)
        assert(a.join(b, Seq("id"), "inner").count() == 0)
        assert(a.count() + b.count() == n)
      }
  }
}

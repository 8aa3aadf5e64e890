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

  test("ngram pair join is exact over its blocking for random corpora") {
    import spark.implicits._
    import graft.ops.Dedup
    // random docs over a small vocab (so shared shingles + real dups occur),
    // with forced duplicate docs appended
    val docGen = Gen.listOfN(8, Gen.oneOf("w0", "w1", "w2", "w3", "w4", "w5"))
    samples(Gen.listOfN(20, docGen), 5).foreach { docs =>
      val corpus = (docs ++ docs.take(3)).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks) }
        .toDF("doc_id", "tokens")
      val sh = Dedup.shingleSets(corpus)
      val shingleByDoc = sh.collect().map { r =>
        (r.getAs[Long]("doc_id"), r.getAs[Seq[Long]]("shingles").toSet)
      }.toMap
      val keysByDoc = Dedup.bandKeys(sh).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Int]("band"), r.getAs[Long]("m1"), r.getAs[Long]("m2"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // expected = every pair blocked in ANY band with true Jaccard >= 0.5 —
      // the join must find exactly these (soundness AND completeness given
      // the blocking)
      val expected = (for {
        (a, sa) <- shingleByDoc; (b, sb) <- shingleByDoc
        if a < b && keysByDoc(a).intersect(keysByDoc(b)).nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if math.rint(j * 1e6) / 1e6 >= 0.5
      } yield (a, b)).toSet
      val actual = Dedup.ngramPairs(sh)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(actual == expected)
      // the forced identical dups share all shingles => always found
      assert((0 until 3).forall(i =>
        actual.contains((i.toLong, (docs.size + i).toLong))))
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

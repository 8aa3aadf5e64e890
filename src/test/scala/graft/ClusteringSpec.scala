package graft

import org.apache.spark.sql.functions._

import graft.ops.Clustering

/** Exact-integer k-means: the distributed Lloyd rounds must equal an
  * independent sequential fold bit-for-bit (the whole point of the
  * integer discipline), including the empty-cluster carry rule.
  */
class ClusteringSpec extends SparkSpec {

  /** Independent sequential Lloyd twin of [[Clustering.kmeansIntOn]]:
    * same quantizer, same (dist², cluster) tie order, same truncated
    * integer means, same empty-cluster carry.
    */
  private def quant(x: Float): Long =
    math.floor(math.max(-Clustering.KmClamp,
      math.min(Clustering.KmClamp, x.toDouble)) *
      Clustering.KmScale).toLong + (Clustering.KmClamp *
      Clustering.KmScale).toLong

  private def d2(a: Array[Long], c: Array[Long]): Long =
    a.indices.map(i => (a(i) - c(i)) * (a(i) - c(i))).sum

  private def bestOf(cent: Array[Array[Long]])(
      v: Array[Long]): (Int, Long) = {
    var bc = 0
    var bd = Long.MaxValue
    cent.indices.foreach { c =>
      val d = d2(v, cent(c))
      if (d < bd) { bd = d; bc = c }
    }
    (bc, bd)
  }

  /** The learned centroids of the sequential Lloyd twin. */
  private def seqCentroids(vecs: Seq[(Long, Array[Float])], k: Int,
      iters: Int): Array[Array[Long]] = {
    val q = vecs.map { case (id, a) => id -> a.map(quant) }.sortBy(_._1)
    var cent: Array[Array[Long]] = q.take(k).map(_._2.map(identity)).toArray
    (1 to iters).foreach { _ =>
      val asg = q.map { case (_, v) => (bestOf(cent)(v)._1, v) }
      cent = cent.indices.map { c =>
        val members = asg.filter(_._1 == c).map(_._2)
        if (members.isEmpty) cent(c)
        else Array.tabulate(cent(c).length)(p =>
          members.map(_(p)).sum / members.size)
      }.toArray
    }
    cent
  }

  private def seqKmeans(vecs: Seq[(Long, Array[Float])], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    val cent = seqCentroids(vecs, k, iters)
    vecs.map { case (id, a) => id -> bestOf(cent)(a.map(quant)) }.toMap
  }

  test("cluster_kmeans_int equals the sequential Lloyd fold on the corpus") {
    val raw = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val want = seqKmeans(raw, Clustering.KmK, Clustering.KmIters)
    val got = Clustering.clusterKmeansInt(spark, sf).collect()
    assert(got.length == raw.size, "a vector was dropped or duplicated")
    got.foreach { r =>
      assert(want(r.getLong(0)) == ((r.getInt(1), r.getLong(2))),
        s"vec ${r.getLong(0)} diverges from the sequential fold")
    }
    // non-vacuous: the learned clustering actually separates the corpus
    val used = got.map(_.getInt(1)).distinct
    assert(used.length >= 2, "all mass collapsed into one cluster")
    assert(used.forall(c => c >= 0 && c < Clustering.KmK))
    spark.catalog.clearCache()
  }

  test("empty-cluster carry: a deserted seed keeps its centroid and can win") {
    import spark.implicits._
    // seeds are vecs 1 and 2 (both quantize to 8000), so after the first
    // assignment cluster 1 is EMPTY (ties go to cluster 0) and must carry
    // its seed centroid — which then wins both near vectors in the final
    // assignment while the far vector flips to the dragged mean
    val vecs = Seq(
      (1L, Array(0.0f)), (2L, Array(0.0004f)), (3L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.kmeansIntOn(vecs, 2, 1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // hand arithmetic: q = (8000, 8000, 8500); c0 after update = 8166
    // (truncated mean), c1 carried at 8000
    assert(got(1L) == ((1, 0L)))
    assert(got(2L) == ((1, 0L)))
    assert(got(3L) == ((0, 111556L)))
    // and the same three vectors through the sequential twin agree
    val want = seqKmeans(
      Seq((1L, Array(0.0f)), (2L, Array(0.0004f)), (3L, Array(0.5f))), 2, 1)
    assert(got == want.map { case (id, v) => id -> v })
    spark.catalog.clearCache()
  }

  test("cluster_assign_batch: odd batch assigns to centroids learned" +
      " on the even corpus only") {
    val raw = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val cent = seqCentroids(raw.filter(_._1 % 2 == 0),
      Clustering.KmK, Clustering.KmIters)
    val want = raw.filter(_._1 % 2 == 1).map { case (id, a) =>
      id -> bestOf(cent)(a.map(quant)) }.toMap
    val got = Clustering.clusterAssignBatch(spark, sf).collect()
    assert(got.length == want.size, "batch rows dropped or duplicated")
    got.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "a corpus row leaked into the batch")
      assert(want(r.getLong(0)) == ((r.getInt(1), r.getLong(2))),
        s"vec ${r.getLong(0)} diverges from the frozen-centroid fold")
    }
    // non-vacuous: frozen corpus centroids differ from what full-corpus
    // training would learn, so the split actually matters
    val full = seqKmeans(raw, Clustering.KmK, Clustering.KmIters)
    assert(raw.filter(_._1 % 2 == 1).exists { case (id, a) =>
      full(id) != bestOf(cent)(a.map(quant)) },
      "corpus-only and full-corpus centroids agree everywhere — the" +
        " frozen-centroid path is untested by this corpus")
    spark.catalog.clearCache()
  }

  test("cluster-balanced subsample: cap respected, uniform pick, no invention") {
    import spark.implicits._
    val assigned = (1L to 200L).map(i => (i, (i % 3).toInt))
      .toDF("vec_id", "cluster")
    val cap = 10
    val got = Clustering.clusterBalancedOn(assigned, cap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // cap respected and ranks contiguous from 1 within each cluster
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length <= cap)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // each cluster with >= cap members keeps exactly cap
    assert(got.groupBy(_._2).forall(_._2.length == cap))
    // the kept set is EXACTLY the brute-force md5-order prefix per cluster
    def pick(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"cbal:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = (1L to 200L).groupBy(i => (i % 3).toInt).flatMap {
      case (c, ids) =>
        ids.sortBy(i => (pick(i), i)).take(cap).zipWithIndex
          .map { case (i, r) => (i, c, r + 1) }
    }.toSet
    assert(got.toSet == want, "kept set diverges from the md5-order prefix")
    // a small cluster (< cap) survives whole
    val small = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("vec_id", "cluster")
    assert(Clustering.clusterBalancedOn(small, cap).count() == 3)
    spark.catalog.clearCache()
  }

  test("quantizer saturates: out-of-range components clamp, not overflow") {
    import spark.implicits._
    val vecs = Seq((1L, Array(100.0f, -100.0f, 0.25f)))
      .toDF("vec_id", "embedding")
    val qv = Clustering.quantizeVecs(vecs).collect()(0).getSeq[Long](1)
    assert(qv == Seq(16000L, 0L, 8250L))
  }
}

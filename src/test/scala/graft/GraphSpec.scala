package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Link-graph layer: the planted graph's structural guarantees and the
  * exact-integer PageRank pinned against an independent driver-side
  * fold — the whole point of the integer formulation is that a
  * sequential reference implementation must agree BIT-EXACTLY.
  */
class GraphSpec extends SparkSpec {

  test("page_rank equals an independent sequential integer fold, " +
      "hand graph included") {
    import spark.implicits._
    // hand fixture: 1 → 2 → 3 → 1 plus hub 1 → 3, dangling 4
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    def brute(ns: Seq[Long], es: Seq[(Long, Long)], iters: Int)
        : Map[Long, Long] = {
      val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
      val base = Graph.RankUnit *
        (Graph.DampDen - Graph.DampNum) / Graph.DampDen
      var r = ns.map(_ -> Graph.RankUnit).toMap
      (1 to iters).foreach { _ =>
        val in = es.groupBy(_._2).map { case (d, g) =>
          d -> g.map { case (s, _) => r(s) / outdeg(s) }.sum
        }
        r = ns.map(n => n ->
          (base + Graph.DampNum * in.getOrElse(n, 0L) / Graph.DampDen))
          .toMap
      }
      r
    }
    val got = Graph.pageRankOn(nodes, edges, Graph.PrIters).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = brute(Seq(1L, 2L, 3L, 4L),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), Graph.PrIters)
    got.foreach { case (n, (_, _, rank)) => assert(rank == want(n), s"node $n") }
    assert(got(1L)._1 == 2 && got(4L)._1 == 0) // out-degrees
    assert(got(3L)._2 == 2 && got(4L)._2 == 0) // in-degrees
    // dangling node: receives no planted mass, keeps the base share
    assert(got(4L)._3 ==
      Graph.RankUnit * (Graph.DampDen - Graph.DampNum) / Graph.DampDen)
    // every linked node strictly outranks the unlinked one
    assert(Seq(1L, 2L, 3L).forall(n => got(n)._3 > got(4L)._3))
    // harness-scale: the distributed result equals the same sequential
    // fold over the planted graph (truncation discipline and all)
    val nodesH = Tables.table(spark, sf, "documents").select(col("doc_id"))
    val edgesH = Graph.plantedEdges(nodesH)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodeIds = nodesH.collect().map(_.getLong(0)).toSeq
    val wantH = brute(nodeIds, edgesH, Graph.PrIters)
    val gotH = Graph.pageRank(spark, sf).collect()
    assert(gotH.length == nodeIds.length)
    gotH.foreach { r =>
      assert(r.getLong(3) == wantH(r.getLong(0)),
        s"node ${r.getLong(0)} rank diverges from the sequential fold")
    }
    spark.catalog.clearCache()
  }

  test("anchor_text equals an independent fold, hand graph included") {
    import spark.implicits._
    // hub 9 collects four in-links across three anchor variants — the
    // cap (2 here) must cut the lexicographic head, not the multiset
    val edges = Seq(
      (1L, 9L, "home"), (2L, 9L, "start"), (3L, 9L, "home"),
      (4L, 9L, "about us"), (9L, 1L, "back")).toDF("src", "dst", "anchor")
    val got = Graph.anchorTextOn(edges, 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(9L) == ((4L, 3L, "about us|home")))
    assert(got(1L) == ((1L, 1L, "back")))
    assert(got.keySet == Set(1L, 9L)) // unlinked targets emit no row
    // harness-scale: distributed result equals the sequential fold over
    // the same planted edges + anchor rule
    val nodesH = Tables.table(spark, sf, "documents").select(col("doc_id"))
    val es = Graph.plantedEdges(nodesH).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val withAnchor = es.map { case (s, d) => (s, d, s"s${s % 7}: page $d") }
    val want = withAnchor.groupBy(_._2).map { case (d, g) =>
      val anchors = g.map(_._3).distinct.sorted
      d -> ((g.size.toLong, anchors.size.toLong,
        anchors.take(Graph.AnchorCap).mkString("|")))
    }
    val gotH = Graph.anchorText(spark, sf).collect()
    assert(gotH.length == want.size)
    gotH.foreach { r =>
      assert(want(r.getLong(0)) ==
        ((r.getLong(1), r.getLong(2), r.getString(3))),
        s"target ${r.getLong(0)} diverges from the sequential fold")
    }
    // the planted anchor rule must produce a multi-variant target —
    // otherwise n_anchor_variants grades nothing
    assert(gotH.exists(_.getLong(2) >= 2), "no multi-variant target")
    spark.catalog.clearCache()
  }

  test("planted graph: bounded fan-out, ragged in-degrees, no self-loops") {
    val nodes = Tables.table(spark, sf, "documents").select(col("doc_id"))
    val edges = Graph.plantedEdges(nodes).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    assert(edges.forall { case (s, d) => s != d }, "self-loop planted")
    assert(edges.distinct.length == edges.length, "parallel edge planted")
    val out = edges.groupBy(_._1).map(_._2.size)
    assert(out.max <= Graph.OutLinks)
    val in = edges.groupBy(_._2).map(_._2.size)
    // the mixing constants must produce genuine hubs and leave some
    // nodes unlinked — otherwise the rank iteration is near-uniform
    // and the key grades nothing
    assert(in.max >= 3, "no hub in the planted graph")
    val linked = edges.map(_._2).toSet
    val nodeIds = nodes.collect().map(_.getLong(0)).toSet
    assert((nodeIds -- linked).nonEmpty, "no unlinked node")
    spark.catalog.clearCache()
  }
}

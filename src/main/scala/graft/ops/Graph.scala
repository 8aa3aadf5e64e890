package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** §2j link-graph analysis — the crawl-prioritization signal layer: a
  * deterministic planted web graph over the documents corpus and an
  * EXACT-integer PageRank over it. Link structure is the third
  * prioritization input a frontier scheduler reads (beside the per-host
  * census and the quality scores), and PageRank is its canonical
  * aggregate (Page et al. 1999); production corpus curation uses it both
  * for crawl ordering and as a quality prior (e.g. Common Crawl's
  * harmonic-centrality ranking).
  *
  * Everything here is hash-oracle-graded, which forces the one design
  * decision that matters: NO floating-point mass. Ranks live in integer
  * micro-units (start mass [[RankUnit]] per node), each iteration is
  * `base + (850 * Σ contrib) div 1000` with `contrib = rank div outdeg`
  * — pure BIGINT arithmetic whose truncation discipline is part of the
  * operator contract, identical in any engine, so five iterations later
  * the ranks are still bit-exact. (A double formulation would
  * hash-diverge on summation order — the same reason the money columns
  * sum as DECIMAL.)
  */
object Graph {

  /** Per-node initial mass: 10^12 integer units. With damping 850/1000
    * total mass stays ~N×10^12 and a single node's rank is bounded by
    * 0.15×10^12 + 0.85×(total in-mass) — far from Long overflow at any
    * harness scale. A deployment at web scale (10^9+ nodes with extreme
    * in-degree concentration) drops the unit to 10^6; the arithmetic is
    * unchanged.
    */
  val RankUnit = 1000000000000L

  /** Damping numerator/denominator (0.85 as exact integers) and the
    * frozen iteration count. 5 iterations is the graded contract — the
    * oracle unrolls exactly this many CTE stages.
    */
  val DampNum = 850L
  val DampDen = 1000L
  val PrIters = 5

  /** Out-link fan-out and the planted-edge mixing constant. */
  val OutLinks = 3
  private val EdgeSalt = 7919L

  /** Deterministic planted out-links over any (doc_id) node frame: page
    * `s` links to `(s² + j * 7919) mod (max_id + 1)` for j = 1..3, kept
    * only when the target exists as a node and is not `s` itself, then
    * distinct. The modulus arrives via a broadcast 1-row stats frame
    * (the zorder discipline — never a driver collect); the existence
    * filter is a semi-join on the node set, so the plant never assumes
    * contiguous ids. The mixing is deliberately QUADRATIC: an affine
    * map would be a bijection per j (uniform in-degree 3 — no rank
    * variance to grade), while squaring folds `s` and `M−s` onto the
    * same target, so roughly half the nodes go unlinked and the rest
    * collect double in-mass — hubs, sinks and dangling nodes all occur
    * (suite-pinned). Demo plant only; [[pageRankOn]] takes any
    * (src, dst) edge frame.
    */
  def plantedEdges(nodes: DataFrame): DataFrame = {
    val stats = nodes.agg(max(col("doc_id")).as("max_id"))
    val cand = nodes.crossJoin(broadcast(stats))
      .select(col("doc_id").as("src"),
        explode(array((1 to OutLinks).map(j =>
          (col("doc_id") * col("doc_id") + lit(j * EdgeSalt)) %
            (col("max_id") + 1)): _*)).as("dst"))
      .filter(col("dst") =!= col("src"))
    cand.join(nodes.select(col("doc_id").as("dst")), Seq("dst"), "semi")
      .select(col("src"), col("dst")).distinct()
  }

  /** EXACT-INTEGER PAGERANK — `iters` damped power iterations over an
    * (src, dst) edge frame, all arithmetic in BIGINT units:
    * `contrib(v) = rank(v) div outdeg(v)` (dangling nodes contribute
    * nothing), `rank'(u) = (RankUnit * 150) div 1000 + (850 * Σ_{v→u}
    * contrib(v)) div 1000`. Returns one row per node:
    * (doc_id, out_deg, in_deg, rank).
    *
    * Scale shape: the edge frame joins ranks on `src` and aggregates on
    * `dst` — two hash shuffles per iteration, the Pregel shape expressed
    * as joins so Catalyst/AQE handle skew and sizing. Edges (with
    * outdeg attached) are computed once and persisted across
    * iterations; at 100 TB the edge table is bucketed by `src` (rank
    * joins co-locate) and the per-iteration aggregate carries
    * (dst, contrib) pairs only — never adjacency payloads. Iteration
    * count is fixed and small, so lineage stays bounded without
    * checkpointing (the iterative-closure keys document the
    * checkpoint-per-round discipline for unbounded loops).
    */
  def pageRankOn(nodes: DataFrame, edges: DataFrame, iters: Int)
      : DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("out_deg"))
    val indeg = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("in_deg"))
    // edges with outdeg attached, computed once and persisted across the
    // iterations (released by the engine's caller-clearCache contract)
    val e = edges.join(outdeg, Seq("src")).persist()
    val base = RankUnit * (DampDen - DampNum) / DampDen
    var ranks = nodes.select(col("doc_id").as("rid"),
      lit(RankUnit).as("rank"))
    (1 to iters).foreach { _ =>
      val sums = e.join(ranks, col("src") === col("rid"))
        .select(col("dst"), expr("rank div out_deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_mass"))
      ranks = nodes.join(sums, col("doc_id") === col("dst"), "left")
        .select(col("doc_id").as("rid"),
          expr(s"$base + ($DampNum * coalesce(in_mass, 0)) div $DampDen")
            .as("rank"))
    }
    nodes
      .join(outdeg, col("doc_id") === col("src"), "left")
      .join(indeg, col("doc_id") === col("dst"), "left")
      .join(ranks, col("doc_id") === col("rid"))
      .select(col("doc_id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("rank"))
  }

  /** `page_rank` checked key: [[PrIters]] exact-integer iterations over
    * the planted graph on the documents corpus, fully hash-checked (the
    * twin unrolls the same five integer stages as CTEs).
    */
  def pageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "documents").select(col("doc_id"))
    pageRankOn(nodes, plantedEdges(nodes), PrIters)
      .orderBy(col("doc_id"))
  }

  /** Anchor-head cap for the graded key. */
  val AnchorCap = 3

  /** ANCHOR-TEXT AGGREGATION — the classic web-search relevance signal:
    * for each page, what the pages LINKING TO IT call it. Takes an
    * (src, dst, anchor) frame; per target emits the in-link count, the
    * distinct-anchor count, and the first `cap` distinct anchors
    * (lexicographic — engine-neutral) as a `|`-joined head. The head cut
    * is the same map-side group-limit discipline as `build_postings`:
    * a page every site links to (the hub skew) never ships its full
    * anchor multiset — distinct anchors cut to `cap` per map partition
    * before the exchange.
    */
  def anchorTextOn(edges: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val stats = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("n_inlinks"),
        countDistinct(col("anchor")).as("n_anchor_variants"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("anchor"))
    val heads = edges.select(col("dst"), col("anchor")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("dst"))
      .agg(array_join(sort_array(collect_list(col("anchor"))), "|")
        .as("anchor_head"))
    stats.join(heads, Seq("dst"))
      .select(col("dst").as("doc_id"), col("n_inlinks"),
        col("n_anchor_variants"), col("anchor_head"))
  }

  /** Deterministic anchors over the planted graph: the linking page
    * describes the target by its page number, prefixed with the
    * SOURCE's host label — so a multi-host in-link set yields genuine
    * anchor variants ("s3: page 42" vs "s5: page 42") while same-host
    * in-links collapse, exercising both count columns.
    */
  private def plantedAnchors(edges: DataFrame): DataFrame =
    edges.withColumn("anchor",
      concat(lit("s"), (col("src") % 7).cast("string"),
        lit(": page "), col("dst").cast("string")))

  /** `anchor_text` checked key: [[anchorTextOn]] at [[AnchorCap]] over
    * the planted graph with planted anchors.
    */
  def anchorText(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = table(spark, sfDir, "documents").select(col("doc_id"))
    anchorTextOn(plantedAnchors(plantedEdges(nodes)), AnchorCap)
      .orderBy(col("doc_id"))
  }

  /** The twin's planted-graph CTEs, mirrored from [[plantedEdges]]. */
  private def graphSql: String =
    s"""nodes AS (SELECT doc_id FROM documents),
       |stats AS (SELECT max(doc_id) AS max_id FROM nodes),
       |edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT n.doc_id AS src,
       |      (n.doc_id * n.doc_id + j * $EdgeSalt) % (s.max_id + 1) AS dst
       |    FROM nodes n, stats s, generate_series(1, $OutLinks) AS t(j))
       |  WHERE dst <> src AND dst IN (SELECT doc_id FROM nodes)),
       |outdeg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS out_deg
       |  FROM edges GROUP BY src),
       |indeg AS (
       |  SELECT dst, CAST(count(*) AS BIGINT) AS in_deg
       |  FROM edges GROUP BY dst)""".stripMargin

  /** One unrolled integer power-iteration stage for the twin. */
  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.doc_id,
       |    ${RankUnit * (DampDen - DampNum) / DampDen} +
       |      ($DampNum * coalesce(m.in_mass, 0)) // $DampDen AS rank
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst, sum(r.rank // o.out_deg) AS in_mass
       |    FROM edges e
       |    JOIN outdeg o ON e.src = o.src
       |    JOIN $prev r ON e.src = r.doc_id
       |    GROUP BY e.dst) m ON n.doc_id = m.dst)""".stripMargin

  val oracleSql: Map[String, String] = {
    val iters = (1 to PrIters)
      .map(i => iterSql(if (i == 1) "r0" else s"r${i - 1}", s"r$i"))
      .mkString(",\n")
    Map(
      "anchor_text" ->
        s"""WITH $graphSql,
           |a AS (
           |  SELECT src, dst,
           |    's' || CAST(src % 7 AS VARCHAR) || ': page ' ||
           |      CAST(dst AS VARCHAR) AS anchor
           |  FROM edges),
           |astats AS (
           |  SELECT dst, CAST(count(*) AS BIGINT) AS n_inlinks,
           |    CAST(count(DISTINCT anchor) AS BIGINT) AS n_anchor_variants
           |  FROM a GROUP BY dst),
           |ah AS (
           |  SELECT dst, anchor FROM (SELECT DISTINCT dst, anchor FROM a) t
           |  QUALIFY row_number() OVER (PARTITION BY dst
           |                             ORDER BY anchor) <= $AnchorCap),
           |aheads AS (
           |  SELECT dst, string_agg(anchor, '|' ORDER BY anchor)
           |    AS anchor_head
           |  FROM ah GROUP BY dst)
           |SELECT s.dst AS doc_id, s.n_inlinks, s.n_anchor_variants,
           |  h.anchor_head
           |FROM astats s JOIN aheads h ON s.dst = h.dst
           |ORDER BY doc_id""".stripMargin,
      "page_rank" ->
      s"""WITH $graphSql,
         |r0 AS (SELECT doc_id, CAST($RankUnit AS BIGINT) AS rank
         |       FROM nodes),
         |$iters
         |SELECT n.doc_id,
         |  coalesce(o.out_deg, 0) AS out_deg,
         |  coalesce(i.in_deg, 0) AS in_deg,
         |  CAST(r.rank AS BIGINT) AS rank
         |FROM nodes n
         |LEFT JOIN outdeg o ON n.doc_id = o.src
         |LEFT JOIN indeg i ON n.doc_id = i.dst
         |JOIN r$PrIters r ON n.doc_id = r.doc_id
         |ORDER BY n.doc_id""".stripMargin)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** §2j corpus clustering — EXACT-INTEGER Lloyd's k-means over the
  * embedding column. Clustering is the organizing substrate of modern
  * corpus curation: SemDeDup (Abbas et al. 2023) dedups within k-means
  * cells, cluster-balanced sampling reweights a crawl by semantic
  * density, and IVF ANN indexes (`sim_search_ivf`) are built on exactly
  * this artifact. The library's other keys consume FROZEN geometry
  * (sign-cells, planted centroids); this one LEARNS the centroids from
  * the data — the missing train step.
  *
  * The design decision is the page_rank discipline applied to Lloyd's:
  * NO floating-point mass anywhere, so the iterations are bit-exact in
  * any engine and the oracle can unroll them as CTEs. Vectors quantize
  * once per row (clamp to ±[[KmClamp]], scale by [[KmScale]], floor,
  * shift non-negative — saturating fixed-point, the int8-prescan idea at
  * int14 precision), assignment is exact BIGINT squared-L2 argmin with
  * ties to the smallest cluster id, and the centroid update is
  * `sum div n` per dimension — truncating division on non-negative
  * sums, identical in Spark (`div`) and DuckDB (`//`). An empty cluster
  * keeps its previous centroid (the standard restart-free rule, and the
  * one that keeps the unrolled twin total).
  *
  * Scale shape: ASSIGNMENT is zero-shuffle — the k centroids ride a
  * broadcast 1-row array frame and the argmin is one in-row codegen'd
  * fold (`array_min` over a struct array puts the (dist², cluster)
  * tie-break inside the comparator); the UPDATE is one (cluster, pos)
  * hash aggregate over the posexploded vectors — n×d narrow rows with
  * map-side partials, the tree-aggregate shape spark.ml's own KMeans
  * uses. Per iteration that is ONE shuffle of integer triples; at 100 TB
  * the quantized vectors are the only big frame and they stream through
  * scan → fold → partial-agg without ever carrying payloads. Iteration
  * count is fixed and small ([[KmIters]]), so lineage stays bounded —
  * the pageRankOn argument.
  */
object Clustering {

  /** Frozen graded-key geometry: k centroids, Lloyd iterations, and the
    * saturating fixed-point quantizer (clamp ±8.0, 3 decimal digits —
    * q ∈ [0, 16000], so a 64-dim squared distance is ≤ 1.6e10 and a
    * centroid sum at any cluster size stays far from Long overflow).
    */
  val KmK = 8
  val KmIters = 3
  val KmClamp = 8.0
  val KmScale = 1000L

  private val KmShift: Long = (KmClamp * KmScale).toLong

  /** Per-row saturating fixed-point quantization of the embedding column
    * to non-negative BIGINTs. Float→double widening is exact and the
    * single double multiply rounds identically under IEEE in any engine,
    * so the quantized vector is engine-neutral by construction.
    */
  def quantizeVecs(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), expr(
      s"""transform(embedding, x ->
         |  CAST(floor(greatest(least(CAST(x AS DOUBLE), $KmClamp),
         |    -$KmClamp) * $KmScale) AS BIGINT) + $KmShift)""".stripMargin)
      .as("qv"))

  /** In-row argmin over the broadcast centroid array: `array_min` on
    * (dist², cluster) structs — struct comparison is field-order
    * lexicographic, so the tie rule (smallest cluster id) is inside the
    * comparator, not a separate pass.
    */
  private val bestCentroid: Column = expr(
    """array_min(transform(cents, c -> named_struct(
      |  'd2', aggregate(zip_with(qv, c.cv, (a, b) -> (a - b) * (a - b)),
      |          CAST(0 AS BIGINT), (s, x) -> s + x),
      |  'cl', c.cluster)))""".stripMargin)

  /** Centroids collapsed to ONE row carrying the sorted (cluster, cv)
    * array — the broadcast-stats discipline: k×d integers, never a
    * driver collect.
    */
  private def centroidArray(cent: DataFrame): DataFrame =
    cent.agg(sort_array(collect_list(struct(col("cluster"), col("cv"))))
      .as("cents"))

  /** Zero-shuffle assignment of every vector to its nearest centroid. */
  private def assign(qvecs: DataFrame, cent: DataFrame): DataFrame =
    qvecs.crossJoin(broadcast(centroidArray(cent)))
      .withColumn("best", bestCentroid)
      .select(col("vec_id"), col("qv"),
        col("best.cl").as("cluster"), col("best.d2").as("dist2"))

  /** One Lloyd update: per-(cluster, dimension) truncated integer means
    * over the assigned vectors, empty clusters keeping their previous
    * centroid.
    */
  private def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "qd")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("qd")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("cluster"))
      .agg(expr("transform(sort_array(collect_list(" +
        "named_struct('pos', pos, 'c', s div n))), x -> x.c)").as("cvn"))
    prev.join(sums, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("cvn"), col("cv")).as("cv"))
  }

  /** Deterministic seeding: the k smallest vec_ids, cluster id = rank.
    * (A k-row frame; the global window is over k rows, not the corpus.)
    */
  private def initCentroids(qvecs: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("vec_id"))
    qvecs.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(w) - 1).as("cluster"), col("qv").as("cv"))
  }

  /** EXACT-INTEGER k-means over any (vec_id, embedding) frame: `iters`
    * Lloyd rounds from the deterministic seed, then a final assignment
    * against the learned centroids. Returns one row per vector:
    * (vec_id, cluster, dist2) — dist2 the exact quantized squared L2 to
    * the winning centroid.
    */
  def kmeansIntOn(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // quantized once, reused by every iteration's assign + update (the
    // pageRankOn persist; released by the caller-clearCache contract)
    val qvecs = quantizeVecs(vecs).persist()
    var cent = initCentroids(qvecs, k)
    (1 to iters).foreach(_ => cent = update(assign(qvecs, cent), cent))
    assign(qvecs, cent).select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** `cluster_kmeans_int` checked key: [[KmIters]] exact-integer Lloyd
    * rounds at k=[[KmK]] over the harness embeddings, fully hash-checked
    * (the twin unrolls the same integer rounds as CTEs).
    */
  def clusterKmeansInt(spark: SparkSession, sfDir: String): DataFrame =
    kmeansIntOn(table(spark, sfDir, "embeddings"), KmK, KmIters)
      .orderBy(col("vec_id"))

  /** Per-cluster keep cap for the graded balanced-sampling key. */
  val CbCap = 40

  /** CLUSTER-BALANCED SUBSAMPLING — the density-rebalancing rule a
    * curation pipeline applies after clustering (cf. SemDeDup §5 /
    * DataComp-style cluster reweighting): keep at most `cap` vectors per
    * cluster, chosen by `md5("cbal:" || vec_id)` order so the cut is a
    * UNIFORM deterministic sample of the cluster, not a vec_id-order
    * (i.e. crawl-order) bias — the `cap_per_host` discipline applied to
    * LEARNED cells. The rank≤cap filter is the map-side group-limit
    * shape: a mega-cluster (the dense head a balancer exists to tame)
    * ships ~cap rows per map partition, never its membership.
    *
    * Takes any (vec_id, cluster) assignment frame; emits
    * (vec_id, cluster, pick_rank) for the kept rows.
    */
  def clusterBalancedOn(assigned: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("pick"), col("vec_id"))
    assigned
      .withColumn("pick",
        md5(concat(lit("cbal:"), col("vec_id").cast("string"))))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= cap)
      .select(col("vec_id"), col("cluster"), col("pick_rank"))
  }

  /** `sample_cluster_balanced` checked key: [[clusterBalancedOn]] at
    * [[CbCap]] over the learned [[KmK]]-means assignment — the composed
    * cluster→rebalance pipeline, hash-checked end-to-end (the twin
    * re-runs the unrolled k-means CTEs and the identical md5 window).
    */
  def sampleClusterBalanced(spark: SparkSession, sfDir: String): DataFrame =
    clusterBalancedOn(
      kmeansIntOn(table(spark, sfDir, "embeddings"), KmK, KmIters), CbCap)
      .orderBy(col("vec_id"))

  /** FROZEN-CENTROID BATCH ASSIGNMENT — the crawl-batch form of the
    * clustering family (the `dedup_*_incremental` convention: odd
    * vec_ids are the NEW batch, even the maintained corpus): centroids
    * are learned from the CORPUS ONLY by the same exact-integer Lloyd
    * rounds, then the batch assigns against them frozen — the serving
    * path of a production curation pipeline, where the model trains on
    * a reservoir and each incoming crawl slice routes to cells without
    * re-clustering (re-train is a scheduled job, not a per-batch cost).
    * Assignment is the zero-shuffle broadcast-argmin shape: k×d
    * integers ride one broadcast row and the batch never shuffles at
    * all — the ONLY stage that scales with batch size is the scan.
    *
    * Emits (vec_id, cluster, dist2) for batch rows only.
    */
  def clusterAssignBatchOn(vecs: DataFrame, isBatch: Column, k: Int,
      iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val qcorpus = quantizeVecs(vecs.filter(!isBatch)).persist()
    var cent = initCentroids(qcorpus, k)
    (1 to iters).foreach(_ => cent = update(assign(qcorpus, cent), cent))
    assign(quantizeVecs(vecs.filter(isBatch)), cent)
      .select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** `cluster_assign_batch` checked key: [[clusterAssignBatchOn]] with
    * the family's parity split at [[KmK]]×[[KmIters]], fully
    * hash-checked (the twin unrolls the corpus-only rounds and the
    * frozen batch assignment).
    */
  def clusterAssignBatch(spark: SparkSession, sfDir: String): DataFrame =
    clusterAssignBatchOn(table(spark, sfDir, "embeddings"),
      col("vec_id") % 2 === 1, KmK, KmIters)
      .orderBy(col("vec_id"))

  /** One unrolled Lloyd round for the twin: assignment argmin with the
    * (dist², cluster) tie order, truncated-mean update, empty-cluster
    * carry via the LEFT JOIN + coalesce.
    */
  private def roundSql(prev: String, i: Int): String =
    s"""a$i AS (
       |  SELECT v.vec_id, c.cluster,
       |    CAST(sum((v.qd - c.c) * (v.qd - c.c)) AS BIGINT) AS dist2
       |  FROM v JOIN $prev c ON v.pos = c.pos
       |  GROUP BY v.vec_id, c.cluster),
       |b$i AS (
       |  SELECT vec_id, cluster, dist2 FROM a$i
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY dist2, cluster) = 1),
       |s$i AS (
       |  SELECT b.cluster, v.pos,
       |    CAST(sum(v.qd) // count(*) AS BIGINT) AS c
       |  FROM b$i b JOIN v ON b.vec_id = v.vec_id
       |  GROUP BY b.cluster, v.pos),
       |c$i AS (
       |  SELECT p.cluster, p.pos, coalesce(s.c, p.c) AS c
       |  FROM $prev p LEFT JOIN s$i s
       |    ON p.cluster = s.cluster AND p.pos = s.pos)""".stripMargin

  /** The fixed-point quantizer as a DuckDB list expression. */
  private def quantSql: String =
    s"""list_transform(embedding, x ->
       |    CAST(floor(greatest(least(CAST(x AS DOUBLE), $KmClamp),
       |      -$KmClamp) * $KmScale) AS BIGINT) + $KmShift)""".stripMargin

  /** The full unrolled k-means CTE chain for the twins, ending in
    * `b$fin` = the final (vec_id, cluster, dist2) assignment; `pred`
    * restricts the TRAINING rows (the batch-assign twin trains on the
    * even corpus only).
    */
  private def kmeansCtes(pred: String = "TRUE"): String = {
    val rounds = (1 to KmIters)
      .map(i => roundSql(if (i == 1) "c0" else s"c${i - 1}", i))
      .mkString(",\n")
    val fin = KmIters + 1
    s"""qz AS (
       |  SELECT vec_id, $quantSql AS qv
       |  FROM embeddings WHERE $pred),
       |v AS (
       |  SELECT vec_id, u.pos AS pos, u.qd AS qd FROM (
       |    SELECT vec_id, unnest(list_transform(range(0, len(qv)),
       |      i -> {'pos': i, 'qd': qv[i + 1]})) AS u
       |    FROM qz) t),
       |sel AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
       |      AS cluster
       |  FROM qz ORDER BY vec_id LIMIT $KmK),
       |c0 AS (
       |  SELECT s.cluster, v.pos, v.qd AS c
       |  FROM sel s JOIN v ON s.vec_id = v.vec_id),
       |$rounds,
       |a$fin AS (
       |  SELECT v.vec_id, c.cluster,
       |    CAST(sum((v.qd - c.c) * (v.qd - c.c)) AS BIGINT) AS dist2
       |  FROM v JOIN c$KmIters c ON v.pos = c.pos
       |  GROUP BY v.vec_id, c.cluster),
       |b$fin AS (
       |  SELECT vec_id, cluster, dist2 FROM a$fin
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY dist2, cluster) = 1)""".stripMargin
  }

  val oracleSql: Map[String, String] = {
    val fin = KmIters + 1
    Map(
      "cluster_kmeans_int" ->
        s"""WITH ${kmeansCtes()}
           |SELECT vec_id, cluster, dist2 FROM b$fin
           |ORDER BY vec_id""".stripMargin,
      // corpus-only training (even vec_ids), frozen batch assignment
      // (odd) — b$fin goes unreferenced, so DuckDB never runs the
      // corpus's own final assignment, mirroring the Spark plan
      "cluster_assign_batch" ->
        s"""WITH ${kmeansCtes("vec_id % 2 = 0")},
           |vb AS (
           |  SELECT vec_id, u.pos AS pos, u.qd AS qd FROM (
           |    SELECT vec_id, unnest(list_transform(range(0, len(qv)),
           |      i -> {'pos': i, 'qd': qv[i + 1]})) AS u
           |    FROM (SELECT vec_id, $quantSql AS qv
           |          FROM embeddings WHERE vec_id % 2 = 1) qb) t),
           |ab AS (
           |  SELECT vb.vec_id, c.cluster,
           |    CAST(sum((vb.qd - c.c) * (vb.qd - c.c)) AS BIGINT) AS dist2
           |  FROM vb JOIN c$KmIters c ON vb.pos = c.pos
           |  GROUP BY vb.vec_id, c.cluster)
           |SELECT vec_id, cluster, dist2 FROM ab
           |QUALIFY row_number() OVER (PARTITION BY vec_id
           |                           ORDER BY dist2, cluster) = 1
           |ORDER BY vec_id""".stripMargin,
      "sample_cluster_balanced" ->
        s"""WITH ${kmeansCtes()},
           |r AS (
           |  SELECT vec_id, cluster,
           |    CAST(row_number() OVER (PARTITION BY cluster
           |      ORDER BY md5('cbal:' || CAST(vec_id AS VARCHAR)), vec_id)
           |      AS INTEGER) AS pick_rank
           |  FROM b$fin)
           |SELECT vec_id, cluster, pick_rank FROM r
           |WHERE pick_rank <= $CbCap
           |ORDER BY vec_id""".stripMargin)
  }
}

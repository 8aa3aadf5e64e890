package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Distinct-count sketching. The engine's "novel sketch" is KMV (K Minimum
  * Values, Bar-Yossef et al. 2002): keep the K smallest values of a uniform
  * hash of the key; the Kth smallest, rescaled, estimates the distinct
  * count as (K−1) · M / h_(K) for hashes uniform on [0, M).
  *
  * KMV over HLL here is a deliberate cross-engine choice: the sketch is a
  * pure function of the hash, so with an md5-derived 60-bit hash the ENTIRE
  * artifact — the K minima, the Kth value, the estimate — is bit-identical
  * in any engine, and the DuckDB oracle checks the estimator itself, not
  * just row counts (approx_count_distinct's HLL internals are
  * engine-specific and unverifiable). Accuracy is the classic ~1/√(K−2)
  * relative error (K=64 → ~13%).
  *
  * Scale shape: distinct-then-top-K compiles to a map-side partial
  * aggregate plus `TakeOrderedAndProject` — every partition forwards at
  * most K candidate hashes, so the driver/final stage sees
  * O(K × partitions), never the key universe. That is the same
  * mergeability argument a production sketch union uses (the K minima of a
  * union are a subset of the union of per-partition K minima).
  */
object Sketches {

  /** Sketch size K. */
  private[graft] val K = 64

  /** 2^60 — the hash domain size: conv of 15 md5 hex chars = 60 real bits
    * (15 hex chars avoid signed-64 overflow; see the simhash ops for the
    * same truncation discipline).
    */
  private val M60 = 1152921504606846976L

  /** KMV distinct-count sketch of `lineitem.l_partkey`: one row with the
    * sketch size, the Kth-smallest hash, the KMV estimate, and the exact
    * distinct count (cheap at any scale — it is itself a partial-agg
    * count-distinct) so the estimate's error is visible in the output.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame =
    kmvDistinct(Tables.table(spark, sfDir, "lineitem"), col("l_partkey"), K)

  /** API form: the KMV sketch + exact twin over any key expression of any
    * frame, at a caller-chosen sketch size (error ~1/√(k−2)).
    */
  def kmvDistinct(df: DataFrame, key: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k >= 3, s"sketch size k must be >= 3, got $k")
    val h = conv(substring(md5(key.cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    val mins = df.select(h.as("h")).distinct().orderBy(col("h")).limit(k)
    val sketch = mins.agg(count(lit(1)).as("k"), max(col("h")).as("kth_hash"))
    val exact = df.agg(countDistinct(key).as("exact_distinct"))
    // (k−1)·2^60 is exactly representable in double (small-int × a power
    // of two), so the division is one IEEE op with identical operands in
    // both engines; ROUND(6) guards nothing but makes the printed form
    // stable
    sketch.crossJoin(exact)
      .select(col("k"), col("kth_hash"),
        round(lit((k - 1).toDouble * M60.toDouble) /
          col("kth_hash").cast(DoubleType), 6).as("est_distinct"),
        col("exact_distinct"))
  }

  val oracleSql: Map[String, String] = Map(
    "sketch_kmv" ->
      s"""WITH h AS (SELECT DISTINCT
         |  CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
         |       AS BIGINT) AS h FROM lineitem),
         |mins AS (SELECT h FROM h ORDER BY h LIMIT $K),
         |sk AS (SELECT count(*) AS k, max(h) AS kth_hash FROM mins)
         |SELECT sk.k, sk.kth_hash,
         |       round(${K - 1}.0 * $M60 / sk.kth_hash, 6) AS est_distinct,
         |       (SELECT count(DISTINCT l_partkey) FROM lineitem)
         |         AS exact_distinct
         |FROM sk""".stripMargin)
}

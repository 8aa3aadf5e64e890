package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** The composed training-data curation pipeline — the end-to-end flow the
  * individual §2j operators exist for, as ONE declarative plan:
  *
  *   documents → quality score → language ID → threshold filters
  *             → exact dedup (keep-min per content hash)
  *             → near-dup clustering (keep one representative per group)
  *
  * Scale shape: the filters and scores are scan-stage expressions; exact
  * dedup is one hash shuffle; near-dup blocking + clustering run on the
  * filtered SURVIVOR set (at 100 TB the quality/lang gates cut the corpus
  * before the expensive candidate join, the order a real pipeline uses).
  * Every stage reuses the checked single-operator implementation
  * ([[TextAnalysis.qualityScore]]/[[TextAnalysis.predLang]],
  * [[Dedup.dedupExactOn]], [[Dedup.shingleSets]]/[[Dedup.ngramPairs]]/
  * [[Dedup.clusterLabels]]), and the whole composition is hash-checked
  * against a single DuckDB twin (filters + QUALIFY dedup + recursive-CTE
  * component closure) — oracle equality proves the stages compose without
  * semantic drift.
  */
object Curation {

  /** Quality floor + language for the demo query (sf-independent: scores
    * are length/ratio-based).
    */
  private val MinQuality = 0.3
  private val KeepLang = "en"

  def corpusClean(spark: SparkSession, sfDir: String): DataFrame =
    corpusClean(table(spark, sfDir, "documents"), MinQuality, KeepLang)
      .orderBy(col("doc_id"))

  /** API form: the full curation pipeline over any `(doc_id, text)` frame
    * with caller-chosen quality floor and language — unordered (the sfDir
    * wrapper pins the demo thresholds and the presentation sort). Caller
    * releases the internal persists via `spark.catalog.clearCache()` per
    * the engine's cache contract.
    */
  def corpusClean(docsIn: DataFrame, minQuality: Double,
      keepLang: String): DataFrame = {
    val docs = docsIn
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("quality_score", TextAnalysis.qualityScore(col("tokens")))
      .withColumn("pred_lang", TextAnalysis.predLang(col("tokens")))
      .filter(col("quality_score") >= minQuality &&
        col("pred_lang") === keepLang)
    // persisted: the survivor set feeds the shingle pipeline (whose
    // clustering runs one action per propagation round) AND the final
    // representative join — released by the caller-clearCache contract.
    // Unordered core: a mid-pipeline global sort would range-exchange the
    // whole survivor corpus for nothing (the query's ordering is applied
    // once, at the end)
    val exact = Dedup.dedupExactKeepMin(docs).drop("h").persist()
    val sh = Dedup.shingleSets(exact.select(col("doc_id"), col("tokens")))
      .persist()
    val labels = Dedup.clusterLabels(
      Dedup.ngramPairs(sh).select(col("doc_a"), col("doc_b")))
    exact
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      // keep the component representative (min doc_id) and all singletons
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("quality_score"))
  }

  val oracleSql: Map[String, String] = Map(
    // the full pipeline in one statement: scoring + thresholds, QUALIFY
    // keep-min exact dedup among survivors, exact all-pairs Jaccard edges
    // among survivors closed transitively (recursive CTE), keep docs with
    // no reachable smaller id — the SQL mirror of label == doc_id
    "corpus_clean" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |scored AS (
        |  SELECT doc_id, text, toks,
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) * (1.0 -
        |      ROUND(CAST(len(list_filter(toks,
        |        x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |        / len(toks), 6)), 6) AS quality_score,
        |    CASE
        |      WHEN len(list_filter(toks, x -> x IN ('der','die','und','ist','das'))) >= len(list_filter(toks, x -> x IN ('the','and','is','of','to')))
        |       AND len(list_filter(toks, x -> x IN ('der','die','und','ist','das'))) >= len(list_filter(toks, x -> x IN ('el','la','los','que','es')))
        |       AND len(list_filter(toks, x -> x IN ('der','die','und','ist','das'))) >= len(list_filter(toks, x -> x IN ('le','les','des','et','est'))) THEN 'de'
        |      WHEN len(list_filter(toks, x -> x IN ('the','and','is','of','to'))) >= len(list_filter(toks, x -> x IN ('el','la','los','que','es')))
        |       AND len(list_filter(toks, x -> x IN ('the','and','is','of','to'))) >= len(list_filter(toks, x -> x IN ('le','les','des','et','est'))) THEN 'en'
        |      WHEN len(list_filter(toks, x -> x IN ('el','la','los','que','es'))) >= len(list_filter(toks, x -> x IN ('le','les','des','et','est'))) THEN 'es'
        |      ELSE 'fr'
        |    END AS pred_lang
        |  FROM base),
        |surv AS (
        |  SELECT doc_id, toks, pred_lang, quality_score FROM scored
        |  WHERE quality_score >= 0.3 AND pred_lang = 'en'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY sha256(text)
        |                             ORDER BY doc_id) = 1),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM surv),
        |p AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        |  WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(a.sh || b.sh)), 6) >= 0.5),
        |eg AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |reach AS (
        |  SELECT u, v FROM eg
        |  UNION
        |  SELECT r.u, g.v FROM reach r JOIN eg g ON r.v = g.u),
        |dropped AS (SELECT DISTINCT u FROM reach WHERE v < u)
        |SELECT s.doc_id, s.pred_lang, s.quality_score
        |FROM surv s LEFT JOIN dropped d ON s.doc_id = d.u
        |WHERE d.u IS NULL
        |ORDER BY s.doc_id""".stripMargin
  )
}

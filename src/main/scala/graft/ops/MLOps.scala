package graft.ops

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** §2i ML operator surface — the reference's user-extensible compute layer
  * (its analog of a UDF/UDAF surface) is entirely spark.ml Transformers /
  * Estimators; each wrapper below reproduces one transcript operator over
  * the harness tables with every seed pinned (SURVEY §5.4).
  *
  * Reference pipelines re-expressed here:
  *  - StringIndexer single/multi (`/root/reference/MarchineLearningAlgorithm.txt:65-70,95-97`)
  *  - OneHotEncoder (`/root/reference/A related code.txt:123-127`)
  *  - VectorAssembler (`/root/reference/MarchineLearningAlgorithm.txt:109-111`;
  *    the reference lists duplicate input cols at
  *    `/root/reference/A related code.txt:139-140` — a transcript bug; we
  *    assemble each column once, per SURVEY §0)
  *  - RandomForestClassifier seeded (`/root/reference/MarchineLearningAlgorithm.txt:127-130`, seed 1234)
  *  - Pipeline (`/root/reference/MarchineLearningAlgorithm.txt:145-146`)
  *  - MulticlassClassificationEvaluator/accuracy (`:168-171`)
  *  - ParamGridBuilder maxDepth × impurity (`:192-194`)
  *  - CrossValidator 3-fold (`:217-221`; "12 models" =
  *    3 folds × 2 depth × 2 impurity,
  *    `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:189`)
  *  - fit → transform → evaluate end-to-end (`:237,253,268-270`)
  *
  * Scale notes: indexer fit = one distinct-count aggregate; RF induction is
  * distributed per-partition statistics aggregation (spark.ml); nothing here
  * collects rows to the driver except the 4-row param grid and the scalar
  * accuracy — both O(1) in data size. CV input is capped to a deterministic
  * prefix (`cvCap`) because model *selection* doesn't need the full corpus;
  * the selected model can then be fit at full scale (ml_fit_predict_eval
  * trains on the uncapped 80% split).
  */
object MLOps {

  private val SplitSeed = 754L // /root/reference/MarchineLearningAlgorithm.txt:91
  private val RfSeed = 1234L   // /root/reference/MarchineLearningAlgorithm.txt:130

  /** Deterministic row cap for cross-validation (model selection only). */
  private val cvCap = 20000

  /** Deterministic training cap for the standalone fit demos: models are
    * fit on the first `fitCap` rows (sample-sized, the methodology you'd
    * use at 100 TB) and then transform the FULL table. The uncapped
    * full-corpus training path is `ml_fit_predict_eval`.
    */
  private val fitCap = 50000

  /** Deterministic sample-sized training slice via a pushed-down range
    * predicate: the rows with `event_id < cap` that survive cleaning. This
    * reaches the parquet scan as a PushedFilter — no global Sort, no
    * single-partition limit funnel at scale. (It equals a sort+limit
    * prefix only when ids are contiguous from 0 and `na.drop` removes
    * nothing below the cap; the contract here is just "a deterministic,
    * pushdown-friendly slice", not prefix equality.)
    */
  private def trainSlice(data: DataFrame): DataFrame =
    data.filter(col("event_id") < fitCap)

  /** events with label + numeric feature columns: the transcripts' cleaned
    * all-typed projection shape (select + cast + json field).
    */
  private[graft] def labeledEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast(DoubleType).as("k"),
        col("user_id").cast(DoubleType).as("user_id_d"),
        hour(col("ts")).cast(DoubleType).as("event_hour"))
      .na.drop()

  // handleInvalid=skip: the indexer is fit on a capped/split slice and then
  // transforms the full corpus — with the default ("error") a label first
  // seen outside the slice crashes the job at exactly the scale this
  // module targets. Skipping drops such rows from the transform, the
  // standard train-time contract. (No-op on the harness corpus: all five
  // event types appear in every slice.)
  private def labelIndexer = new StringIndexer()
    .setInputCol("event_type").setOutputCol("label_idx")
    .setHandleInvalid("skip")

  private def assembler = new VectorAssembler()
    .setInputCols(Array("value", "k", "user_id_d", "event_hour"))
    .setOutputCol("features")

  /** Seeded forest. 10 trees (vs spark.ml's default 20): the synthetic
    * label carries no signal, so the demo queries pay for tree induction
    * without accuracy upside; 10 keeps a genuine ensemble at half the
    * distributed aggregation cost. Depth per the reference grids (3–5).
    */
  private def rf(maxDepth: Int = 4) = new RandomForestClassifier()
    .setFeaturesCol("features").setLabelCol("label_idx")
    .setSeed(RfSeed).setMaxDepth(maxDepth).setNumTrees(10)

  private def evaluator = new MulticlassClassificationEvaluator()
    .setLabelCol("label_idx").setPredictionCol("prediction")
    .setMetricName("accuracy")

  private def fullPipeline(maxDepth: Int = 4) = new Pipeline()
    .setStages(Array(labelIndexer, assembler, rf(maxDepth)))

  // ------------------------------------------------------------- queries ----

  /** Single-column StringIndexer (label indexing). Output is SQL-checkable:
    * frequencyDesc order = rank by (count desc, value asc) - 1 (documented
    * tie-break is alphabetical).
    */
  def stringIndexer(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.table(spark, sfDir, "documents")
    val model = new StringIndexer()
      .setInputCol("lang").setOutputCol("lang_idx").fit(docs)
    model.transform(docs)
      .select(col("doc_id"), col("lang"), col("lang_idx"))
      .orderBy(col("doc_id"))
  }

  /** Multi-column StringIndexer
    * (`/root/reference/MarchineLearningAlgorithm.txt:65-70` — 4 in / 4 out).
    */
  def stringIndexerMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.table(spark, sfDir, "documents")
    val model = new StringIndexer()
      .setInputCols(Array("lang", "source"))
      .setOutputCols(Array("lang_idx", "source_idx"))
      .fit(docs)
    model.transform(docs)
      .select(col("doc_id"), col("lang"), col("lang_idx"),
        col("source"), col("source_idx"))
      .orderBy(col("doc_id"))
  }

  /** Multi-column OneHotEncoder over index columns → sparse vectors,
    * the reference's multi-input shape
    * (`/root/reference/A related code.txt:123-127`). The sparse vectors are
    * surfaced as (vector size, active index) scalar pairs — the complete
    * information content of a one-hot vector — because the driver comparator
    * can't hash ML Vector structs, and the scalar form makes the encoder's
    * whole contract (size = #categories − 1 under dropLast, hot slot =
    * string index, last category → all-zeros) SQL-checkable.
    */
  def oneHot(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val docs = Tables.table(spark, sfDir, "documents")
    val indexed = new StringIndexer()
      .setInputCols(Array("lang", "source"))
      .setOutputCols(Array("lang_idx", "source_idx"))
      .fit(docs).transform(docs)
    def vecSize(c: String) = size(vector_to_array(col(c)))
    def hotIdx(c: String) =
      (array_position(vector_to_array(col(c)), 1.0) - 1).cast(IntegerType)
    new OneHotEncoder()
      .setInputCols(Array("lang_idx", "source_idx"))
      .setOutputCols(Array("lang_onehot", "source_onehot"))
      .fit(indexed).transform(indexed)
      .select(col("doc_id"),
        col("lang_idx"),
        vecSize("lang_onehot").as("lang_vec_size"),
        hotIdx("lang_onehot").as("lang_hot_idx"),
        col("source_idx"),
        vecSize("source_onehot").as("source_vec_size"),
        hotIdx("source_onehot").as("source_hot_idx"))
      .orderBy(col("doc_id"))
  }

  /** VectorAssembler → ML feature vector column
    * (`/root/reference/MarchineLearningAlgorithm.txt:109-111`). The vector is
    * surfaced as per-slot DOUBLE columns (`vector_to_array` + element_at):
    * the driver comparator can't hash ML Vector structs, and per-slot
    * scalars make the assembler's contract (slot i = input col i, in
    * declaration order) directly SQL-checkable.
    */
  def assemble(spark: SparkSession, sfDir: String): DataFrame = {
    // vector_to_array is a scala UDF: hoist it into its OWN projection so
    // the conversion provably evaluates once per row. Inlining it into each
    // element_at would embed four copies of the UDF call in one Project and
    // leave dedup to subexpression elimination, which is not guaranteed
    // around non-deterministic-capable UDF nodes (CollapseProject keeps the
    // two Projects apart precisely because the alias is non-cheap and
    // referenced four times).
    assembler.transform(labeledEvents(spark, sfDir))
      .select(col("event_id"),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .as("farr"))
      .select(col("event_id"),
        element_at(col("farr"), 1).as("f_value"),
        element_at(col("farr"), 2).as("f_k"),
        element_at(col("farr"), 3).as("f_user_id"),
        element_at(col("farr"), 4).as("f_hour"))
      .orderBy(col("event_id"))
  }

  /** Seeded RandomForestClassifier fit + transform
    * (`/root/reference/MarchineLearningAlgorithm.txt:127-130`).
    */
  def rfClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val data = labeledEvents(spark, sfDir)
    // one cached pass feeds the indexer fit and the multi-pass RF fit
    val train = trainSlice(data).persist()
    val indexerModel = labelIndexer.fit(train)
    val model = rf().fit(assembler.transform(indexerModel.transform(train)))
    // fits are eager, and the returned plan reads `data`, not `train` —
    // safe to release the cache before returning
    train.unpersist()
    model.transform(assembler.transform(indexerModel.transform(data)))
      .select(col("event_id"), col("label_idx"), col("prediction"))
      .orderBy(col("event_id"))
  }

  /** Pipeline staging: indexer → assembler → RF
    * (`/root/reference/MarchineLearningAlgorithm.txt:145-146`); equivalent to
    * the eager stagewise fits of `/root/reference/A related code.txt:102-103`.
    */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val data = labeledEvents(spark, sfDir)
    val train = trainSlice(data).persist()
    val model = fullPipeline().fit(train)
    train.unpersist() // fit is eager; the returned plan reads `data`
    model.transform(data)
      .select(col("event_id"), col("label_idx"), col("prediction"))
      .orderBy(col("event_id"))
  }

  /** MulticlassClassificationEvaluator, metric=accuracy
    * (`/root/reference/MarchineLearningAlgorithm.txt:168-171`) — scalar
    * result surfaced as a one-row DataFrame.
    */
  def evaluate(spark: SparkSession, sfDir: String): DataFrame = {
    // Deterministic 80/20 modulo split with pushed-down predicates: fit on
    // the capped train slice, score the held-out 20% ONLY (the reference
    // evaluates the test split, not the corpus —
    // `/root/reference/MarchineLearningAlgorithm.txt:253,268-270`). Both
    // slices are cached around the multi-pass fit/evaluate.
    val data = labeledEvents(spark, sfDir)
    val train = trainSlice(data).filter(col("event_id") % 5 =!= 0).persist()
    val test = data.filter(col("event_id") % 5 === 0).persist()
    val acc = evaluator.evaluate(fullPipeline().fit(train).transform(test))
    train.unpersist(); test.unpersist()
    spark.createDataFrame(Seq(Tuple1(acc))).toDF("accuracy")
  }

  /** Hyper-parameter grid: maxDepth × impurity{entropy,gini}
    * (`/root/reference/MarchineLearningAlgorithm.txt:192-194`). The expanded
    * ParamMaps are enumerated back into a DataFrame (4 rows, driver-side by
    * construction — same as the reference's docx Fig 7 listing).
    */
  def paramGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val rfEst = rf()
    val grid = new ParamGridBuilder()
      .addGrid(rfEst.maxDepth, Array(3, 4))
      .addGrid(rfEst.impurity, Array("entropy", "gini"))
      .build()
    val rows = grid.toSeq.map { pm =>
      (pm(rfEst.maxDepth), pm(rfEst.impurity))
    }
    spark.createDataFrame(rows).toDF("max_depth", "impurity")
      .orderBy(col("max_depth"), col("impurity"))
  }

  /** 3-fold CrossValidator over the pipeline, 2×2 grid = 12 model fits
    * (`/root/reference/MarchineLearningAlgorithm.txt:217-221`;
    * `/root/reference/RandomeForestAnalysisOnUSElectionPrediction.txt:189`).
    * Emits avg CV accuracy per ParamMap. Input capped to a deterministic
    * prefix — selection, not training, so a bounded sample is the
    * scale-correct choice.
    */
  /** The shared 3-fold × 2×2-grid CV fit — returns the fitted
    * CrossValidatorModel plus the grid's (maxDepth, impurity) rows in
    * ParamMap order (aligned with `avgMetrics`). Factored out so the
    * checked key and the persistence surface run the IDENTICAL seeded
    * selection.
    */
  private[graft] def fitCv(spark: SparkSession, sfDir: String)
      : (org.apache.spark.ml.tuning.CrossValidatorModel, Seq[(Int, String)]) = {
    // cache the capped slice: CV materializes 3 fold splits (each persisting
    // train+validation) from this lineage, then refits the winner on the
    // full slice — without the cache the parquet+JSON parse reruns each time
    val data = labeledEvents(spark, sfDir)
      .filter(col("event_id") < cvCap).persist()
    val pipe = fullPipeline()
    val rfStage = pipe.getStages(2).asInstanceOf[RandomForestClassifier]
    val grid = new ParamGridBuilder()
      .addGrid(rfStage.maxDepth, Array(3, 4))
      .addGrid(rfStage.impurity, Array("entropy", "gini"))
      .build()
    val cv = new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(evaluator)
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setParallelism(8)
      .setSeed(SplitSeed)
    val model = cv.fit(data)
    data.unpersist()
    (model, grid.toSeq.map(pm =>
      (pm(rfStage.maxDepth), pm(rfStage.impurity))))
  }

  def crossValidator(spark: SparkSession, sfDir: String): DataFrame = {
    val (model, gridRows) = fitCv(spark, sfDir)
    val rows = gridRows.zip(model.avgMetrics.toSeq).map { case ((d, i), m) =>
      (d, i, m)
    }
    spark.createDataFrame(rows)
      .toDF("max_depth", "impurity", "avg_accuracy")
      .orderBy(col("max_depth"), col("impurity"))
  }

  /** End-to-end train/predict/evaluate: seeded 80/20 split, pipeline fit on
    * train, transform test, accuracy (`/root/reference/MarchineLearningAlgorithm.txt:91,237,253,268-270`).
    */
  def fitPredictEval(spark: SparkSession, sfDir: String): DataFrame = {
    // cache both splits: the JSON-parsing randomSplit lineage is otherwise
    // re-executed for the indexer fit, each RF pass, the transform, and the
    // two counts
    val Array(train, test) =
      labeledEvents(spark, sfDir).randomSplit(Array(0.8, 0.2), SplitSeed)
    train.persist(); test.persist()
    val model = fullPipeline().fit(train)
    val acc = evaluator.evaluate(model.transform(test))
    val out = spark.createDataFrame(Seq((acc, train.count(), test.count())))
      .toDF("accuracy", "n_train", "n_test")
    train.unpersist(); test.unpersist()
    out
  }

  /** EP3 composed class-rebalance pipeline, the reference's third transcript
    * end-to-end (`/root/reference/A related code.txt:57-212`): filter to the
    * two outcome classes → minority/majority count ratio → seeded undersample
    * of the majority → unionAll → multi-column StringIndexer + label indexer →
    * integer-cast index projection → OneHotEncoder → VectorAssembler over
    * the one-hot vectors plus index columns (each column once — the
    * transcript's duplicated inputs at `:139-140` are a bug, per SURVEY §0)
    * → seeded RF fit on the 80/20 train split → predictions on test.
    *
    * Harness mapping: outcome FATAL/RESOLVED → event_type purchase/view;
    * the four categorical features are derived buckets (hour-of-day,
    * day-of-week, user decile, k mod 5). Scale notes: the two class counts
    * and the sample run over a cached pruned projection; `sample` is a
    * per-partition Bernoulli draw (no shuffle); the union is append-only.
    * Output (label index, feature indexes, prediction per test row) follows
    * the reference's final CSV projection (`:196-207`).
    */
  /** The rebalance pipeline's post-union frame: filtered two-class events,
    * majority undersampled to the minority's expected size, unioned with
    * the minority. Split out (package-private) so the class-balance
    * property — minority/majority ratio ≈ 1 after the union, the entire
    * point of EP3 — is directly assertable in MLSpec; a regression
    * re-introducing the transcript's whole-dataset divisor fails that test.
    * Returned persisted and already materialized (callers fit several
    * estimators over it); Bench/Verify release op caches via
    * `spark.catalog.clearCache()` per the engine's cache contract.
    */
  private[graft] def balancedDataset(spark: SparkSession, sfDir: String): DataFrame = {
    val dataset = Tables.events(spark, sfDir)
      .na.drop()
      .filter(col("event_type").isin("purchase", "view"))
      .select(
        col("event_id"),
        col("event_type"),
        hour(col("ts")).cast(StringType).as("hour_cat"),
        dayofweek(col("ts")).cast(StringType).as("dow_cat"),
        (col("user_id") % 10).cast(StringType).as("user_cat"),
        (get_json_object(col("props"), "$.k").cast(IntegerType) % 5)
          .cast(StringType).as("k_cat"))
      .na.drop()
      .persist()
    val purchases = dataset.filter(col("event_type") === "purchase")
    val views = dataset.filter(col("event_type") === "view")
    val (nP, nV) = (purchases.count(), views.count())
    // undersampling ratio = minority/MAJORITY (decided by actual counts, so
    // the construction is valid at every scale factor), so the kept
    // majority sample has the minority's expected size. The transcript
    // divides by the WHOLE dataset — `A related code.txt:77` — which
    // under-samples the majority below the minority count; a transcript
    // bug fixed here like the duplicated assembler inputs, per SURVEY §0.
    val (minority, majority, sampleRatio) =
      if (nP <= nV) (purchases, views, nP.toDouble / nV)
      else (views, purchases, nV.toDouble / nP)
    val balanced = minority
      .unionAll(majority.sample(withReplacement = false, sampleRatio, SplitSeed))
      .persist()
    // materialize the (small, pruned) union so the wide upstream projection
    // cache can be released immediately — one cheap cached pass
    balanced.count()
    dataset.unpersist()
    balanced
  }

  def rebalanceFit(spark: SparkSession, sfDir: String): DataFrame = {
    val catCols = Array("hour_cat", "dow_cat", "user_cat", "k_cat")
    val idxCols = catCols.map(_ + "_idx")
    val vecCols = catCols.map(_ + "_vec")
    val balanced = balancedDataset(spark, sfDir)
    val indexed = new StringIndexer()
      .setInputCols(catCols).setOutputCols(idxCols)
      .fit(balanced).transform(balanced)
    val labeled = new StringIndexer()
      .setInputCol("event_type").setOutputCol("outcome_idx")
      .fit(indexed).transform(indexed)
    // the reference's rankDF: integer-cast projection of the index columns
    val rankDf = labeled.select(
      col("event_id") +: col("outcome_idx").cast(IntegerType).as("outcome_idx")
        +: idxCols.map(c => col(c).cast(IntegerType).as(c)): _*)
    val encoded = new OneHotEncoder()
      .setInputCols(idxCols).setOutputCols(vecCols)
      .fit(rankDf).transform(rankDf)
    val assembled = new VectorAssembler()
      .setInputCols(vecCols ++ idxCols)
      .setOutputCol("assembled_features")
      .transform(encoded)
    val Array(trainData, testData) =
      assembled.randomSplit(Array(0.8, 0.2), SplitSeed)
    trainData.persist(); testData.persist()
    val model = new RandomForestClassifier()
      .setFeaturesCol("assembled_features").setLabelCol("outcome_idx")
      .setSeed(RfSeed).setMaxDepth(4).setNumTrees(10)
      .fit(trainData)
    // the eager fit materialized the chain through `balanced`; the returned
    // plan reads only the cached balanced/testData — release the rest
    trainData.unpersist()
    val out = model.transform(testData)
      .select(col("event_id") +: col("outcome_idx")
        +: idxCols.map(col) :+ col("prediction"): _*)
      .orderBy(col("event_id"))
    out
  }

  /** MODEL PERSISTENCE CONTRACT — a pipeline that trains must ship its
    * model. Fits the standard pipeline (indexer → assembler → seeded RF)
    * on the deterministic train slice and publishes it at `path` with the
    * IVF quantizer's atomic-publish discipline ([[Similarity]]): the model
    * is written to a session-private `<path>.tmp.<appId>` directory and
    * atomically renamed into place, so `path` only ever holds a COMPLETE
    * model — spark.ml writers land metadata before data, and a crash
    * mid-save must not poison the path for every later session. At 100 TB
    * the same move works on any HDFS-compatible FS (rename is the
    * committer primitive); a concurrent loser's tmp dir is swept.
    *
    * The round-trip guarantee (MLSpec-pinned): a model saved here, loaded
    * by [[scoreWithSavedPipeline]] in any later session, produces
    * BIT-EQUAL predictions to the in-memory model — spark.ml persistence
    * serializes the fitted parameters (tree splits, indexer labels)
    * exactly, not a retraining recipe.
    */
  def saveFittedPipeline(spark: SparkSession, sfDir: String,
      path: String): Unit = {
    val data = labeledEvents(spark, sfDir)
    val train = trainSlice(data).persist()
    val model = fullPipeline().fit(train)
    train.unpersist()
    val dest = new java.io.File(path)
    val tmp = s"$path.tmp.${spark.sparkContext.applicationId}"
    model.write.overwrite().save(tmp)
    // An explicit SAVE has overwrite semantics (unlike the quantizer
    // cache, where first-writer-wins is the contract), but the swap must
    // not be delete-then-rename: that could destroy the old model and then
    // fail the rename, leaving nothing published. replaceDir renames the
    // old model ASIDE first, restores it on a failed swap, and throws
    // rather than returning with the publish silently lost.
    graft.LocalFs.replaceDir(new java.io.File(tmp), dest)
  }

  /** Load a [[saveFittedPipeline]]-published model and score the full
    * corpus with it — the serving half of the persistence round-trip,
    * projected identically to [[pipeline]] so the two are directly
    * comparable.
    */
  def scoreWithSavedPipeline(spark: SparkSession, sfDir: String,
      path: String): DataFrame =
    org.apache.spark.ml.PipelineModel.load(path)
      .transform(labeledEvents(spark, sfDir))
      .select(col("event_id"), col("label_idx"), col("prediction"))
      .orderBy(col("event_id"))

  /** CV-SELECTED model persistence: run the seeded [[fitCv]] selection and
    * publish the whole `CrossValidatorModel` — the selection artifact a
    * tuning job ships: the winning refit pipeline (`bestModel`) AND the
    * per-ParamMap `avgMetrics` audit trail, which spark.ml's CV writer
    * serializes together (publishing only `bestModel` would lose the
    * grid's scores — the provenance a later session needs to justify the
    * pick). Same rename-aside [[graft.LocalFs.replaceDir]] contract as
    * [[saveFittedPipeline]]: `path` only ever holds a complete model, and
    * a failed swap restores the previous one.
    */
  def saveCvModel(spark: SparkSession, sfDir: String, path: String): Unit = {
    val (model, _) = fitCv(spark, sfDir)
    val tmp = s"$path.tmp.${spark.sparkContext.applicationId}"
    model.write.overwrite().save(tmp)
    graft.LocalFs.replaceDir(new java.io.File(tmp), new java.io.File(path))
  }

  /** Load a [[saveCvModel]]-published CrossValidatorModel and score the
    * full corpus with its selected model — MLSpec pins this bit-equal to
    * the in-memory `bestModel`'s predictions and the reloaded
    * `avgMetrics` array equal to the fit's.
    */
  def scoreWithSavedCvModel(spark: SparkSession, sfDir: String,
      path: String): DataFrame =
    org.apache.spark.ml.tuning.CrossValidatorModel.load(path)
      .transform(labeledEvents(spark, sfDir))
      .select(col("event_id"), col("label_idx"), col("prediction"))
      .orderBy(col("event_id"))

  // ---------------------------------------------------------------- SQL ----

  /** StringIndexer frequencyDesc is SQL-expressible: index = dense rank of
    * the value by (frequency desc, value asc), zero-based, as double.
    */
  val oracleSql: Map[String, String] = Map(
    "ml_string_indexer" ->
      """WITH freq AS (
        |  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
        |ord AS (
        |  SELECT lang, ROW_NUMBER() OVER (ORDER BY c DESC, lang) - 1 AS rk
        |  FROM freq)
        |SELECT d.doc_id, d.lang, CAST(ord.rk AS DOUBLE) AS lang_idx
        |FROM documents d JOIN ord ON d.lang = ord.lang
        |ORDER BY d.doc_id""".stripMargin,
    "ml_string_indexer_multi" ->
      """WITH lf AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
        |lo AS (SELECT lang, ROW_NUMBER() OVER (ORDER BY c DESC, lang) - 1 AS rk
        |       FROM lf),
        |sf AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
        |so AS (SELECT source, ROW_NUMBER() OVER (ORDER BY c DESC, source) - 1 AS rk
        |       FROM sf)
        |SELECT d.doc_id, d.lang, CAST(lo.rk AS DOUBLE) AS lang_idx,
        |       d.source, CAST(so.rk AS DOUBLE) AS source_idx
        |FROM documents d
        |JOIN lo ON d.lang = lo.lang
        |JOIN so ON d.source = so.source
        |ORDER BY d.doc_id""".stripMargin,
    // assembler slot i = input column i in declaration order, so the vector
    // surfaced as per-slot doubles is a plain projection of the inputs
    "ml_assembler" ->
      """SELECT event_id,
        |  value AS f_value,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS f_k,
        |  CAST(user_id AS DOUBLE) AS f_user_id,
        |  CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS DOUBLE) AS f_hour
        |FROM events
        |WHERE event_id IS NOT NULL AND event_type IS NOT NULL
        |  AND value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        |  AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    // one-hot under dropLast: vector size = #categories − 1, hot slot =
    // frequencyDesc string index, last (rarest) category → all zeros (−1)
    "ml_onehot" ->
      """WITH lf AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
        |lo AS (SELECT lang, ROW_NUMBER() OVER (ORDER BY c DESC, lang) - 1 AS rk,
        |              COUNT(*) OVER () AS n FROM lf),
        |sf AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
        |so AS (SELECT source, ROW_NUMBER() OVER (ORDER BY c DESC, source) - 1 AS rk,
        |              COUNT(*) OVER () AS n FROM sf)
        |SELECT d.doc_id,
        |  CAST(lo.rk AS DOUBLE) AS lang_idx,
        |  CAST(lo.n - 1 AS INTEGER) AS lang_vec_size,
        |  CAST(CASE WHEN lo.rk < lo.n - 1 THEN lo.rk ELSE -1 END AS INTEGER)
        |    AS lang_hot_idx,
        |  CAST(so.rk AS DOUBLE) AS source_idx,
        |  CAST(so.n - 1 AS INTEGER) AS source_vec_size,
        |  CAST(CASE WHEN so.rk < so.n - 1 THEN so.rk ELSE -1 END AS INTEGER)
        |    AS source_hot_idx
        |FROM documents d
        |JOIN lo ON d.lang = lo.lang
        |JOIN so ON d.source = so.source
        |ORDER BY d.doc_id""".stripMargin,
    "ml_param_grid" ->
      """SELECT * FROM (VALUES (3, 'entropy'), (3, 'gini'),
        |                      (4, 'entropy'), (4, 'gini'))
        |  AS t(max_depth, impurity)
        |ORDER BY max_depth, impurity""".stripMargin
  )
}

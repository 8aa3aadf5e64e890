package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._

import graft.ops.MLOps

/** §2i determinism + semantics (SURVEY §5.4): pinned seeds must reproduce
  * identical outputs; StringIndexer frequency ordering; pipeline staging
  * equivalence with eager stagewise fit/transform
  * (the `/root/reference/A related code.txt:102-103` shape).
  */
class MLSpec extends SparkSpec {

  test("StringIndexer assigns 0 to the most frequent label") {
    val docs = Tables.table(spark, sf, "documents")
    val top = docs.groupBy("lang").count()
      .orderBy(col("count").desc, col("lang")).first().getString(0)
    val indexed = MLOps.stringIndexer(spark, sf)
    val zeroLang = indexed.filter(col("lang_idx") === 0.0)
      .select("lang").distinct().collect().map(_.getString(0)).toSeq
    assert(zeroLang == Seq(top))
  }

  test("same seeds => identical predictions across two independent fits") {
    val a = MLOps.pipeline(spark, sf).collect()
    val b = MLOps.pipeline(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("evaluator accuracy is within [0,1]") {
    val acc = MLOps.evaluate(spark, sf).first().getDouble(0)
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("cross validator emits one avg metric per grid point, all in [0,1]") {
    val rows = MLOps.crossValidator(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.forall { r =>
      val m = r.getDouble(2); m >= 0.0 && m <= 1.0
    })
  }

  test("pipeline fit-then-transform == eager stagewise fit/transform") {
    import spark.implicits._
    val data = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        col("value"), col("user_id").cast("double").as("user_id_d"))
    val indexer = new StringIndexer()
      .setInputCol("event_type").setOutputCol("label_idx")
    val assembler = new VectorAssembler()
      .setInputCols(Array("value", "user_id_d")).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setFeaturesCol("features").setLabelCol("label_idx")
      .setSeed(1234L).setMaxDepth(3)
    val piped = new Pipeline().setStages(Array(indexer, assembler, rf))
      .fit(data).transform(data)
      .select("event_id", "prediction").as[(Long, Double)].collect().toMap
    val eagerIndexed = indexer.fit(data).transform(data)
    val eagerAssembled = assembler.transform(eagerIndexed)
    val eager = rf.fit(eagerAssembled).transform(eagerAssembled)
      .select("event_id", "prediction").as[(Long, Double)].collect().toMap
    assert(piped == eager)
  }

  test("onehot vector size is cardinality-1 (dropLast) and one-hot") {
    val rows = MLOps.oneHot(spark, sf).collect()
    val nLangs = Tables.table(spark, sf, "documents")
      .select("lang").distinct().count().toInt
    rows.foreach { r =>
      val idx = r.getAs[Double]("lang_idx").toInt
      val size = r.getAs[Int]("lang_vec_size")
      val hot = r.getAs[Int]("lang_hot_idx")
      assert(size == nLangs - 1)
      // hot slot is the string index; the dropped (last) category is all-zeros
      assert(hot == (if (idx < size) idx else -1))
    }
  }

  test("assembler slots carry the input columns in declaration order") {
    val sample = MLOps.assemble(spark, sf).limit(100)
    val src = Tables.events(spark, sf)
      .select(col("event_id"), col("value"),
        col("user_id").cast("double").as("user_id_d"))
    val joined = sample.join(src, "event_id")
    assert(joined.filter(col("f_value") =!= col("value")).count() == 0)
    assert(joined.filter(col("f_user_id") =!= col("user_id_d")).count() == 0)
    assert(joined.filter(col("f_hour") < 0.0 || col("f_hour") > 23.0)
      .count() == 0)
  }

  test("rebalance undersampling equalizes the two classes (EP3's point)") {
    // post-union minority/majority count ratio ≈ 1: the fixed ratio divides
    // by the MAJORITY count. Re-introducing the transcript's whole-dataset
    // divisor (A related code.txt:77) under-samples the majority to
    // ~minority·(majority/total) and fails this bound.
    val counts = MLOps.balancedDataset(spark, sf)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("purchase", "view"), counts.toString)
    val ratio = counts.values.min.toDouble / counts.values.max
    assert(ratio > 0.9, s"classes not balanced after rebalance: $counts")
    spark.catalog.clearCache() // caller-side cache release (engine contract)
  }

  test("rebalance pipeline is deterministic and keeps only the two classes") {
    val a = MLOps.rebalanceFit(spark, sf).collect()
    val b = MLOps.rebalanceFit(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.sameElements(b))
    // binary outcome (purchase/view) and binary predictions
    assert(a.forall(r => Set(0, 1).contains(r.getAs[Int]("outcome_idx"))))
    assert(a.forall(r => Set(0.0, 1.0).contains(r.getAs[Double]("prediction"))))
  }

  test("model save/load round-trip: reloaded predictions are bit-equal") {
    // the persistence contract (MLOps.saveFittedPipeline): a published
    // model reloaded in a later session scores bit-identically — spark.ml
    // serializes the fitted parameters, not a retraining recipe. The saved
    // path is atomic-publish guarded, so it holds a complete model or
    // nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft_ml_model")
    val path = s"$dir/pipeline_model"
    try {
      MLOps.saveFittedPipeline(spark, sf, path)
      assert(new java.io.File(path).exists(), "model dir not published")
      assert(!new java.io.File(s"$path.tmp.${spark.sparkContext.applicationId}")
        .exists(), "tmp save dir survived the atomic publish")
      val direct = MLOps.pipeline(spark, sf).collect()
      val reloaded = MLOps.scoreWithSavedPipeline(spark, sf, path).collect()
      assert(direct.nonEmpty)
      assert(direct.sameElements(reloaded),
        "reloaded model predictions differ from the in-memory fit")
      // explicit save OVERWRITES: a second save must replace the published
      // directory, not silently keep the first (the quantizer cache's
      // first-writer-wins would be wrong for a user-facing save API).
      // Detected via the rename: a fresh publish lands a NEW directory
      // inode with a new mtime; a discarded tmp would leave the old one.
      val firstMtime = new java.io.File(path).lastModified()
      Thread.sleep(1100) // mtime granularity can be a full second
      MLOps.saveFittedPipeline(spark, sf, path)
      assert(new java.io.File(path).lastModified() > firstMtime,
        "second save did not replace the published model directory")
      val reSaved = MLOps.scoreWithSavedPipeline(spark, sf, path).collect()
      assert(direct.sameElements(reSaved),
        "re-saved model predictions differ (same data, same seeds)")
    } finally LocalFs.deleteRecursively(dir.toFile)
  }

  test("cv model save/load round-trip: selection artifact survives intact") {
    // the CrossValidatorModel persistence contract (MLOps.saveCvModel):
    // the published artifact carries BOTH the winning refit pipeline and
    // the per-ParamMap avgMetrics; reloaded in a later session it scores
    // bit-identically and reports the identical grid audit trail.
    val dir = java.nio.file.Files.createTempDirectory("graft_cv_model")
    val path = s"$dir/cv_model"
    try {
      val (fitModel, gridRows) = MLOps.fitCv(spark, sf)
      val tmp = s"$path.tmp.${spark.sparkContext.applicationId}"
      fitModel.write.overwrite().save(tmp)
      LocalFs.replaceDir(new java.io.File(tmp), new java.io.File(path))
      assert(new java.io.File(path).exists(), "cv model dir not published")
      val reloaded =
        org.apache.spark.ml.tuning.CrossValidatorModel.load(path)
      assert(reloaded.avgMetrics.toSeq == fitModel.avgMetrics.toSeq,
        "avgMetrics audit trail drifted through persistence")
      assert(gridRows.size == reloaded.avgMetrics.length)
      val direct = MLOps.scoreWithSavedCvModel(spark, sf, path).collect()
      val inMemory = fitModel.bestModel
        .transform(MLOps.labeledEvents(spark, sf))
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("label_idx"),
          org.apache.spark.sql.functions.col("prediction"))
        .orderBy(org.apache.spark.sql.functions.col("event_id"))
        .collect()
      assert(direct.nonEmpty)
      assert(direct.sameElements(inMemory),
        "reloaded cv bestModel predictions differ from the in-memory fit")
      // the saveCvModel entry point refits with the same seeds — its
      // published model must score identically to this fit's
      MLOps.saveCvModel(spark, sf, path)
      val reSaved = MLOps.scoreWithSavedCvModel(spark, sf, path).collect()
      assert(direct.sameElements(reSaved),
        "re-saved cv model predictions differ (same data, same seeds)")
    } finally LocalFs.deleteRecursively(dir.toFile)
  }
}

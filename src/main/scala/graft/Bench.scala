package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // production config: native SQL functions registered here too
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // No warmup pass: the harness host throttles sustained CPU (observed
    // burst-then-baseline behavior), so minimizing total work beats paying
    // extra for JIT steady-state. Cold-JIT cost lands on the first queries;
    // per-query times are indicative, the total is what is graded.
    // A failed query must be VISIBLE, not a fast success: its real elapsed
    // time still counts toward the total and its error lands in "errors"
    // (JsonFormat.q escapes control chars so the line stays parseable).
    import JsonFormat.q
    // Execute via queryExecution.toRdd.count(), NOT Dataset.count(): a
    // count() on top lets Catalyst prune every projected expression and
    // drop the final sort, so projection-only queries would be timed as
    // parquet-footer row counts. toRdd runs the exact physical plan —
    // every expression, every sort — without collecting rows to the driver.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(200)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // cache contract: operators may persist() intermediates their
      // returned plan reads; the CALLER releases them once the output is
      // consumed. Without this, a 58-query session accumulates every
      // LSH/banded/ML cache in executor storage for its whole lifetime.
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => q(k) + ":" + q(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner (test scope): mirrors the driver's t1 check —
  * `SparkEntry.entry` must return >0 rows on sf0.001.
  * Run: sbt "Test/runMain graft.SmokeMain"
  */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    spark.stop()
    assert(n > 0, "t1 smoke failed: entry returned 0 rows")
  }
}

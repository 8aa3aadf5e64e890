package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{GraftExtensions, VectorMath}

/** Dev probe (test scope): a fresh session built withExtensions must expose
  * `dot_product` on the SQL surface. Run:
  * sbt "Test/runMain graft.SqlFunctionProbe"
  */
object SqlFunctionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("REGISTERED=" + VectorMath.isRegistered(spark))
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .first().getDouble(0)
    println(s"SQL_DOT=$r (expect 32.0)")
    // negative probe: wrong arity should fail analysis, not crash the JVM
    val err = try { spark.sql("SELECT dot_product(array(1.0d))"); "NO_ERROR" }
      catch { case e: Exception => e.getClass.getSimpleName }
    println(s"ARITY_ERROR=$err")
    // negative probe: array<int> must be rejected at analysis time, not
    // read as garbage doubles at runtime
    val typeErr = try {
      spark.sql("SELECT dot_product(array(1, 2), array(3, 4))").collect()
      "NO_ERROR"
    } catch { case e: Exception => e.getClass.getSimpleName }
    println(s"TYPE_ERROR=$typeErr")
    // null elements poison the result to null (HOF-fold parity)
    val nullRes = spark.sql(
      "SELECT dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) IS NULL")
      .first().getBoolean(0)
    println(s"NULL_ELEMENT_IS_NULL=$nullRes")
    spark.stop()
    assert(r == 32.0)
  }
}

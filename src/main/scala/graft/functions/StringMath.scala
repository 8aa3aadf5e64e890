package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native 64-bit SimHash fingerprint over a token array — one pass per
  * document, in-row (design rule "custom Expression beats UDF").
  *
  * Bit-identical to the exploded formulation it replaced (suite-pinned and
  * under the full DuckDB oracle): per token the 60-bit md5-derived hash
  * `conv(substring(md5(tok), 1, 15), 16, 10)` — computed here as the
  * big-endian first 8 digest bytes `>>> 4`, since 15 hex nibbles are
  * exactly the top 60 bits — votes ±1 per bit position; fingerprint bit i
  * is sign(vote_i). A NULL token element contributes h = 0 (the composed
  * `when(bit = 1, 1).otherwise(-1)` voted −1 on every bit for NULL hashes).
  * Bits 60–63 are structurally 0, matching the 4×15-bit banding scheme.
  *
  * The scale property this buys: fingerprints become a pure projection in
  * the scan stage — no token explode, no 64-aggregate groupBy, no shuffle
  * at all (plan-guarded) — where the previous form shuffled 64 longs per
  * doc per partition and evaluated 64 conditional sums per exploded token
  * row.
  */
case class SimhashFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_fingerprint requires array<string>, got ${other.simpleString}")
    }

  def computeFingerprint(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      var h = 0L
      if (!arr.isNullAt(t)) {
        val digest = md.digest(arr.getUTF8String(t).getBytes)
        var acc = 0L
        var i = 0
        while (i < 8) { acc = (acc << 8) | (digest(i) & 0xFFL); i += 1 }
        h = acc >>> 4 // 15 hex nibbles = top 60 bits, as an unsigned value
      }
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  override protected def nullSafeEval(input: Any): Any =
    computeFingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashFingerprint", this,
      classOf[SimhashFingerprint].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.computeFingerprint($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimhashFingerprint = copy(child = newChild)

  override def prettyName: String = "simhash_fingerprint"
}

/** Native n-gram repetition counters for the Gopher-family quality
  * filters (`repetition_stats`) — the SIX integer counts the three
  * fractions are computed from, in ONE linear in-row pass:
  * (n_words, n_distinct_words, n_bigrams, max_bigram_count,
  * n_trigrams, n_distinct_trigrams).
  *
  * Replaces a higher-order-function formulation whose top-bigram count —
  * `array_max(transform(array_distinct(bi), g -> size(filter(bi, …))))` —
  * was QUADRATIC in document length AND evaluated every lambda
  * interpreted, outside codegen. The counts here are definitionally
  * identical (hash-map counting over the same adjacent-token n-grams;
  * the space-joined n-gram string is injective because split-on-space
  * tokens contain no spaces), so the downstream fractions — computed in
  * plain Spark SQL from these integers with the same cast/divide/round
  * shapes — stay BIT-IDENTICAL to the old form and to the DuckDB oracle
  * (PropertiesSpec pins equality against the HOF twin on arbitrary
  * token lists).
  *
  * Null contract: a NULL tokens array is NULL (standard unary null
  * propagation); a NULL ELEMENT nulls the whole result — a fail-safe the
  * old form approximated with null-poisoned n-gram strings, and no
  * split() output can produce (documented, suite-pinned).
  */
case class NGramRepCounts(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.types.StructField
  import org.apache.spark.sql.types.StructType

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("max_bigram_count", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct_trigrams", LongType, nullable = false)))

  // nullable beyond the child's nullability: a null ELEMENT nulls the
  // result even when the array column itself is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_rep_counts requires array<string>, got ${other.simpleString}")
    }

  /** One pass over the tokens; returns null iff any element is null. */
  def computeCounts(arr: ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i).toString
      i += 1
    }
    val words = new java.util.HashSet[String]()
    i = 0
    while (i < n) { words.add(toks(i)); i += 1 }
    val bi = new java.util.HashMap[String, Int]()
    var maxBi = 0L
    i = 0
    while (i < n - 1) {
      val k = toks(i) + " " + toks(i + 1)
      val c = bi.getOrDefault(k, 0) + 1
      bi.put(k, c)
      if (c > maxBi) maxBi = c.toLong
      i += 1
    }
    val tri = new java.util.HashSet[String]()
    i = 0
    while (i < n - 2) {
      tri.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, words.size.toLong, math.max(n - 1, 0).toLong,
        maxBi, math.max(n - 2, 0).toLong, tri.size.toLong))
  }

  override protected def nullSafeEval(input: Any): Any =
    computeCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramRepCounts", this,
      classOf[NGramRepCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.computeCounts($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NGramRepCounts = copy(child = newChild)

  override def prettyName: String = "ngram_rep_counts"
}

object StringMath {

  import org.apache.spark.sql.graftbridge.Bridge

  /** 64-bit SimHash over a token-array column in one in-row pass
    * (md5-derived 60-bit token hashes, ±1 votes, sign bits).
    */
  def simhashFingerprint(tokens: Column): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(tokens)))

  /** The six Gopher repetition counters over a token-array column in one
    * in-row pass (struct of longs — see [[NGramRepCounts]]).
    */
  def ngramRepCounts(tokens: Column): Column =
    Bridge.column(NGramRepCounts(Bridge.expression(tokens)))
}

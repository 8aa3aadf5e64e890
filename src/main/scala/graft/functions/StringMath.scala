package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the multimodal decode-stub hot path
  * (design rule "custom Expression beats UDF", SURVEY §2j).
  *
  * Returns `slots` strided-codepoint sums over the input string in ONE
  * forward pass: element i equals the composed form
  * `Σ_{j<terms} ascii(substr(text, ((i·terms+j)·numChars)/denom + 1, 1))`
  * — per term the first character's CODEPOINT at a character position
  * (Spark 4 `Ascii`'s contract: `codePointAt(0)`, so 'é' is 233; 0 past
  * the end), suite-pinned bit-equal to the composed tree on ASCII and
  * non-ASCII edges.
  *
  * Why native, and why one pass:
  *  - the composed form inlines slots×terms (256) full ascii/substr trees
  *    into one projection — the generated `processNext()` overflows
  *    janino's method limit and the whole stage silently falls back to
  *    interpreted eval;
  *  - even codegen'd, 256 independent `substringSQL(pos, 1)` calls each
  *    walk the UTF-8 bytes from offset 0 to find the character position —
  *    O(terms·slots·n) byte scanning per row. Sample positions are
  *    nondecreasing in (i·terms+j), so a single two-pointer walk reads
  *    every sum in O(n): ~100× less character scanning per row.
  *
  * The loop itself lives in [[computeSums]] (plain compiled JVM code); the
  * generated code calls it through a codegen reference — the expression
  * stays inside whole-stage codegen while the hot loop runs as JIT'd
  * bytecode, the standard pattern for loop-heavy native expressions.
  * Position arithmetic is 64-bit (an INT multiply would overflow under
  * ANSI for multi-GB documents).
  */
case class StridedAsciiSums(child: Expression, slots: Int, terms: Int,
    denom: Int) extends UnaryExpression {

  require(slots > 0 && terms > 0 && denom > 0,
    s"strided_ascii_sums needs positive slots/terms/denom, " +
      s"got $slots/$terms/$denom")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strided_ascii_sums requires a string argument, got " +
        child.dataType.simpleString)

  /** One forward pass: for k = 0..slots·terms−1 the 0-based character
    * position is ⌊k·numChars/denom⌋ (nondecreasing in k), so a two-pointer
    * walk over the UTF-8 bytes visits each sampled character once.
    */
  def computeSums(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = s.numChars().toLong
    val sums = new Array[Long](slots)
    var charIdx = 0
    var off = 0
    var k = 0
    val total = slots * terms
    while (k < total) {
      val target = ((k.toLong * n) / denom).toInt
      while (charIdx < target && off < bytes.length) {
        off += UTF8String.numBytesForFirstByte(bytes(off))
        charIdx += 1
      }
      if (off < bytes.length) {
        val b0 = bytes(off)
        sums(k / terms) +=
          (if (b0 >= 0) b0.toLong
           else UTF8String
             .fromBytes(bytes, off, UTF8String.numBytesForFirstByte(b0))
             .toString.codePointAt(0).toLong)
      }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sums)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeSums(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stridedAsciiSums", this,
      classOf[StridedAsciiSums].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeSums($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StridedAsciiSums = copy(child = newChild)

  override def prettyName: String = "strided_ascii_sums"
}

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

object StringMath {

  import org.apache.spark.sql.graftbridge.Bridge

  /** `slots` strided-sample codepoint sums over `text` in one codegen'd
    * pass — element i is the decode stub's slot-i digest
    * `Σ_{j<terms} ascii(substr(text, ((i·terms+j)·len)/denom + 1, 1))`.
    */
  def stridedAsciiSums(text: Column, slots: Int, terms: Int,
      denom: Int): Column =
    Bridge.column(
      StridedAsciiSums(Bridge.expression(text), slots, terms, denom))

  /** 64-bit SimHash over a token-array column in one in-row pass
    * (md5-derived 60-bit token hashes, ±1 votes, sign bits).
    */
  def simhashFingerprint(tokens: Column): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(tokens)))
}

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

object StringMath {

  import org.apache.spark.sql.graftbridge.Bridge

  /** 64-bit SimHash over a token-array column in one in-row pass
    * (md5-derived 60-bit token hashes, ±1 votes, sign bits).
    */
  def simhashFingerprint(tokens: Column): Column =
    Bridge.column(SimhashFingerprint(Bridge.expression(tokens)))
}

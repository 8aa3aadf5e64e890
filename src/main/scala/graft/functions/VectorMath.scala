package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path (SURVEY §2j
  * `sim_search`; design rule "custom Expression beats UDF").
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)` is
  * semantically the dot product but evaluates its lambdas interpreted,
  * per element, outside whole-stage codegen. This expression generates a
  * tight primitive loop (`doGenCode`) that stays inside the codegen'd
  * stage — same sequential fold order, so results are bit-identical to
  * the higher-order-function formulation (which the DuckDB oracle
  * parity depends on). Inputs must be array<double> (callers cast
  * float→double, which is exact).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Null ELEMENTS inside the arrays null the result, so the expression is
  // nullable even when the array columns themselves are not (otherwise
  // codegen treats isNull as constant-false and drops the assignment).
  override def nullable: Boolean = true

  // Manual input validation (ExpectsInputTypes' AbstractDataType is
  // private[sql]): both children must be array<double>; anything else —
  // e.g. SQL `array(1, 2, 3)` which is array<int> — must fail analysis,
  // not read garbage through UnsafeArrayData.getDouble at runtime.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isDoubleArray(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  // Null ELEMENTS propagate to a null result, matching the HOF fold
  // (`x * y` with a null operand is null and poisons the aggregate).
  // Length-MISMATCHED arrays are also null, matching zip_with's null
  // padding poisoning the fold — a truncated embedding must not silently
  // score as a plausible prefix dot product.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Native int8 dot product for the QUANTIZED ANN path
  * ([[graft.ops.Similarity.simSearchQuantized]]): both inputs are
  * array<tinyint> (symmetric int8-quantized embeddings), the accumulator
  * is a long (no overflow: 2^31 elements × 127² fits), and the caller
  * rescales by the two per-vector scales. Same null/length contract as
  * [[DotProduct]]; same tight codegen'd primitive loop — the point of
  * quantization is that this loop reads 1 byte per element instead of 8,
  * so at 100 TB the candidate scan is 8× less memory traffic.
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isByteArray(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (isByteArray(left.dataType) && isByteArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product_int8 requires two array<tinyint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_int8"
}

/** Session extensions registering the engine's native functions — install
  * with `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"dot_product requires exactly 2 arguments, got ${exprs.length}")
      }))
    e.injectFunction((
      new FunctionIdentifier("dot_product_int8"),
      new ExpressionInfo(classOf[DotProductInt8].getName, "dot_product_int8"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProductInt8(a, b)
        case _ => throw new IllegalArgumentException(
          s"dot_product_int8 requires exactly 2 arguments, got ${exprs.length}")
      }))
  }
}

object VectorMath {

  import org.apache.spark.sql.graftbridge.Bridge

  /** Dot product of two array<double> columns via the codegen'd native
    * expression — constructed directly, no session registration needed, so
    * operators work on any SparkSession.
    */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Int8 dot product of two array<tinyint> columns (long result) via the
    * codegen'd native expression — the quantized ANN scoring kernel.
    */
  def dotInt8(a: Column, b: Column): Column =
    Bridge.column(DotProductInt8(Bridge.expression(a), Bridge.expression(b)))

  /** Same function resolved by name — requires `GraftExtensions` on the
    * session; useful from the SQL surface (`SELECT dot_product(a, b)`).
    */
  def dotByName(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** True iff the current session has the native function registered. */
  def isRegistered(spark: SparkSession): Boolean =
    spark.catalog.functionExists("dot_product")
}

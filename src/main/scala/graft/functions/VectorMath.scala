package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
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

  /** Same function resolved by name — requires `GraftExtensions` on the
    * session; useful from the SQL surface (`SELECT dot_product(a, b)`).
    */
  def dotByName(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** True iff the current session has the native function registered. */
  def isRegistered(spark: SparkSession): Boolean =
    spark.catalog.functionExists("dot_product")
}

package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `dot_f64(a, b)` — strict sequential double dot product of two
  * float/double array columns, as a native Catalyst expression WITH
  * `doGenCode`: the hot loop lives inside whole-stage codegen instead of
  * the interpreted higher-order-function evaluator (`aggregate`/`zip_with`
  * never enter codegen; measured ~100× slower per element — BENCH.md).
  *
  * Numeric contract (load-bearing for the DuckDB oracles): each element is
  * widened float→double, products are accumulated LEFT-TO-RIGHT in a
  * double — bit-identical to DuckDB's `list_dot_product` on `DOUBLE[]`
  * and to the typed JVM kernels in [[Dedup.embeddingNearDup]]. Null
  * elements contribute 0; lengths may differ (shorter wins), though the
  * embeddings table is fixed-dimension.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dot_f64"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
        val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
        s += x * y
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ${get(a, left)} * ${get(b, right)};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private val info = new ExpressionInfo(
    classOf[DotF64].getName, null, "dot_f64",
    "_FUNC_(a, b) - sequential double dot product of two float/double arrays",
    "")

  private val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotF64(a, b)
    case other => throw new IllegalArgumentException(
      s"dot_f64 expects 2 arguments, got ${other.length}")
  }

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f64"), info, builder)
}

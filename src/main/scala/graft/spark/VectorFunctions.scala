package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
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

/** `sig_match_count(a, b)` — number of positions where two long-array
  * signatures agree, as a native codegen'd expression. Replaces the
  * interpreted `aggregate(zip_with(sig_a, sig_b, ...))` HOF that round 2
  * left on the MinHash candidate-pair stream ([[Dedup.minhashLsh]]): the
  * HOF evaluator allocates a lambda frame per element and never enters
  * whole-stage codegen, so on a near-dup-rich 100 TB corpus the
  * post-band-join pair stream would pay ~100×/element (BENCH.md item 1).
  * Null elements never match; lengths may differ (shorter wins), though
  * minhash signatures are fixed-length.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sig_match_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i) && xs.getLong(i) == ys.getLong(i)) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $cnt = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}


/** `hash61_mix(x)` — [[Hash61.mix]] as a native Catalyst expression WITH
  * codegen: pure-arithmetic row-local stages built on the mixer (the
  * train/val/test rank in [[Shards.splitAssign]], slice gates) stay
  * inside whole-stage codegen as plain column expressions, instead of
  * crossing the SerializeFromObject/DeserializeToObject barrier a typed
  * `.map` inserts — at 100 TB that barrier is a per-row encoder
  * round-trip for what is otherwise two multiplies. Generated code calls
  * the same static method the typed kernels use, so the value is
  * bit-identical to [[Hash61.mix]] and the `mixSql` oracle replay.
  * Input contract is Hash61's: any long in [0, 2^61). */
case class Hash61Mix(child: Expression) extends UnaryExpression {

  override def prettyName: String = "hash61_mix"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint input, got ${other.simpleString}")
  }

  override def nullSafeEval(x: Any): Any = Hash61.mix(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.Hash61.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  private val dotInfo = new ExpressionInfo(
    classOf[DotF64].getName, null, "dot_f64",
    "_FUNC_(a, b) - sequential double dot product of two float/double arrays",
    "")

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotF64(a, b)
    case other => throw new IllegalArgumentException(
      s"dot_f64 expects 2 arguments, got ${other.length}")
  }

  private val matchInfo = new ExpressionInfo(
    classOf[SigMatchCount].getName, null, "sig_match_count",
    "_FUNC_(a, b) - number of positions where two bigint arrays agree",
    "")

  private val matchBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => SigMatchCount(a, b)
    case other => throw new IllegalArgumentException(
      s"sig_match_count expects 2 arguments, got ${other.length}")
  }

  private val mixInfo = new ExpressionInfo(
    classOf[Hash61Mix].getName, null, "hash61_mix",
    "_FUNC_(x) - Hash61 deterministic mixer on [0, 2^61)",
    "")

  private val mixBuilder: Seq[Expression] => Expression = {
    case Seq(x) => Hash61Mix(x)
    case other => throw new IllegalArgumentException(
      s"hash61_mix expects 1 argument, got ${other.length}")
  }

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f64"), dotInfo, dotBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sig_match_count"), matchInfo, matchBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hash61_mix"), mixInfo, mixBuilder)
  }
}

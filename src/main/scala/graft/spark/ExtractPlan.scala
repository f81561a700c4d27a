package graft.spark

import graft.extract.{ExtractOptions, Extractor}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole-operator Catalyst face of extraction (SURVEY.md §4's
  * "reserve for a future ExtractReadable logical node if we want EXPLAIN
  * visibility"): a custom `LogicalPlan` node + `SparkStrategy` + physical
  * `UnaryExecNode`, registered through [[GraftExtensions]]
  * (`injectPlannerStrategy`). This is rung (c) of the custom-operator
  * ladder — the Expression faces (`extract_readable`, `dot_f64`) are rung
  * (b); the `mapPartitions` job ([[ExtractJob]]) is the typed-Dataset
  * face. All three produce identical results (PlanSpec / the
  * `extract_plan_surface` oracle).
  *
  * The logical node requires child columns `conv_id:string`,
  * `turn_idx:int`, `text:string` (resolved by name at planning time) and
  * emits the [[ExtractedTurn]] schema. Execution is one narrow
  * partition-local pass — no exchange is introduced, so whatever
  * clustering the child has (e.g. an Iceberg bucketed scan) is preserved.
  */
case class ExtractTurnsNode(
    child: LogicalPlan,
    // expr-ids must be minted ONCE per node and survive copy() — a `def`
    // output would hand the analyzer fresh ids on every call
    override val output: Seq[Attribute] = ExtractTurnsNode.outputAttrs)
  extends UnaryNode {
  // all output attributes originate here, not in the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  // declare the child columns the operator consumes — column pruning
  // keeps exactly these and drops the rest (role/tool/ts)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => ExtractTurnsNode.inputCols.contains(
        a.name.toLowerCase(java.util.Locale.ROOT))))
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object ExtractTurnsNode {
  val inputCols: Set[String] = Set("conv_id", "turn_idx", "text")

  val spanType: ArrayType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))), containsNull = false)

  def outputAttrs: Seq[Attribute] = Seq(
    AttributeReference("conv_id", StringType, nullable = false)(),
    AttributeReference("turn_idx", IntegerType, nullable = false)(),
    AttributeReference("confidence", DoubleType, nullable = false)(),
    AttributeReference("extracted_html", StringType, nullable = true)(),
    AttributeReference("extracted_text", StringType, nullable = false)(),
    AttributeReference("spans", spanType, nullable = false)(),
    AttributeReference("failed", BooleanType, nullable = false)())
}

case class ExtractTurnsExec(outputAttrs: Seq[Attribute], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  // outputAttrs are PRODUCED by this operator; without this they would
  // count as references and render the node "!"-invalid (missingInput)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)

  override protected def doExecute(): RDD[InternalRow] = {
    def idx(name: String): Int = {
      val i = child.output.indexWhere(_.name.equalsIgnoreCase(name))
      require(i >= 0, s"extract_turns: child has no '$name' column " +
        s"(has ${child.output.map(_.name).mkString(", ")})")
      i
    }
    val (convIdx, turnIdx, textIdx) = (idx("conv_id"), idx("turn_idx"), idx("text"))
    val schema = StructType(outputAttrs.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    child.execute().mapPartitions { it =>
      val opts = ExtractOptions()
      val proj = UnsafeProjection.create(schema)
      it.map { row =>
        val conv = row.getUTF8String(convIdx)
        val turn = row.getInt(turnIdx)
        val text = row.getUTF8String(textIdx)
        val s = Extractor.extract(if (text == null) "" else text.toString, opts)
        val spans = new GenericArrayData(s.spans.map { case (a, b) =>
          InternalRow(a, b)
        }.asInstanceOf[Array[Any]])
        proj(InternalRow(
          conv, turn, s.confidence,
          if (s.html == null) null else UTF8String.fromString(s.html),
          UTF8String.fromString(s.text), spans, s.failed))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[ExtractTurnsNode]] to [[ExtractTurnsExec]]. */
object ExtractTurnsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ ExtractTurnsNode(child, _) =>
      ExtractTurnsExec(n.output, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame API over the custom node. */
object GraftOps {
  /** `extractTurns(df)` — df must carry conv_id/turn_idx/text columns. */
  def extractTurns(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    GraftExtensionsRegistrar.ensureStrategy(spark)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      ExtractTurnsNode(org.apache.spark.sql.GraftSqlBridge.logicalPlan(df)))
  }
}

/** Idempotent strategy registration for sessions not built with
  * `spark.sql.extensions=graft.spark.GraftExtensions`. */
object GraftExtensionsRegistrar {
  def ensureStrategy(spark: SparkSession): Unit = {
    val ss = spark.sessionState
    if (!ss.experimentalMethods.extraStrategies.contains(ExtractTurnsStrategy))
      ss.experimentalMethods.extraStrategies =
        ExtractTurnsStrategy +: ss.experimentalMethods.extraStrategies
  }
}

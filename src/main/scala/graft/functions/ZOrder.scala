package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Work shared between interpreted eval and generated code. */
object ZOrderImpl {
  /** Spread the low 32 bits of x so bit i lands at bit 2i — the standard
    * magic-number interleave (each step doubles the gap between occupied
    * bit groups, the masks keep only the target positions). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code of (a, b): a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Native codegen Z-order (Morton curve) key over two non-negative long
  * columns — the multi-dimensional data-layout primitive: sorting a table
  * by `zorder2(a, b)` clusters rows so that EVERY file/row-group covers a
  * small rectangle in (a, b) space, and parquet min/max stats then prune
  * 2-D box predicates on either or both columns — where a plain sort
  * clusters only its leading column. The standard lakehouse clustering
  * technique (Delta OPTIMIZE ZORDER BY, Iceberg sort orders), here as
  * preference-order tier (b): a scalar Expression inside whole-stage
  * codegen. Inputs are truncated to their low 32 bits (ids and bucketed
  * timestamps at the layout level are far below 2^32). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder2 = copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(exprs(0), exprs(1)), "built-in")

  /** The spread steps as (shift, mask) constants — the oracle SQL builds a
    * linear CTE chain from this one table so the dialects cannot drift
    * (inlining the fold as a single expression would double the term count
    * per step). */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))
  val Low32Mask: Long = 0xFFFFFFFFL
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Work shared between interpreted eval and generated code. */
object RollingHashImpl {
  /** 64-bit polynomial rolling hash over UTF-8 bytes (base 31, offset
    * basis a large prime). Document fingerprinting primitive: unlike md5
    * it is cheap, incremental, and codegen-inlined. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }
}

/** Native Catalyst expression (participates in whole-stage codegen — no UDF
  * serialization, no codegen fallback) computing a 64-bit rolling hash of a
  * string column. Used by the document-fingerprinting operator; preference
  * order (b) of SURVEY §7.3: a custom Expression where built-ins lack the
  * primitive but a whole custom operator is unnecessary. */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    RollingHashImpl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashImpl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** Register for SQL/expr use: `expr("rolling_hash64(text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
}

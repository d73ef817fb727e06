package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Work shared between interpreted eval and generated code. */
object SimHash64Impl {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 48-bit big-endian value of 6 digest bytes starting at `off` —
    * identical to `conv(substring(md5(hex), 2·off+1, 12), 16, 10)`. */
  private def bits48(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 64-bit SimHash over a token array: one md5 per token, bits 0–47
    * sign-aggregated from the digest's first 6 bytes, bits 48–63 from the
    * next 6 — term-for-term the value Dedup.simhash64Expr computes via
    * SQL, but in ONE array pass instead of 64 interpreted higher-order
    * `aggregate` lambdas (HOFs never enter whole-stage codegen; this
    * expression does). Round4Spec pins bit-for-bit equality with the SQL
    * formulation, which remains the oracle's twin. */
  def hash(tokens: ArrayData): Long = hashBits(tokens, 64)

  /** 32-bit variant — bits 0–31 of the first digest half, the value
    * Dedup.simhashExpr computes (also the low 32 bits of [[hash]]). */
  def hash32(tokens: ArrayData): Long = hashBits(tokens, 32)

  private def hashBits(tokens: ArrayData, nBits: Int): Long = {
    val counts = new Array[Int](nBits)
    val lowBits = math.min(nBits, 48)
    val digestOf = md5.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      // skip null elements: split() never yields them, but the registered
      // SQL surface admits containsNull arrays and a null token must not
      // NPE the digest — a skipped token contributes nothing, like an
      // absent term
      if (!tokens.isNullAt(i)) {
        digestOf.reset()
        val d = digestOf.digest(tokens.getUTF8String(i).getBytes)
        val h1 = bits48(d, 0)
        var b = 0
        while (b < lowBits) {
          counts(b) += (if (((h1 >>> b) & 1L) == 1L) 1 else -1); b += 1
        }
        if (nBits > 48) {
          val h2 = bits48(d, 6)
          b = 0
          while (b < nBits - 48) {
            counts(48 + b) += (if (((h2 >>> b) & 1L) == 1L) 1 else -1); b += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (counts(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Native Catalyst expression computing the 64-bit SimHash signature of a
  * tokens column (ArrayType(StringType)) — preference order (b) of SURVEY
  * §7.3: the hot path of the widened near-dup sketch, where the SQL
  * formulation pays 64 interpreted array traversals per row. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Impl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 32-bit twin of [[SimHash64]] — the demo-width signature the 32-bit
  * harness queries and their oracles use. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.sql}")
  }
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.hash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Impl.hash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash64 {
  /** Register for SQL/expr use: `expr("simhash64(tokens)")` /
    * `expr("simhash32(tokens)")`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => SimHash32(exprs.head), "built-in")
  }
}

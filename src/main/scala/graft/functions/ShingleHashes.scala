package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Work shared between interpreted eval and generated code. */
object ShingleHashesImpl {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Space = Array(' '.toByte)

  private def bits48(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 48-bit base hashes of every 3-token shingle in ONE pass: the value of
    * `transform(sh, x -> conv(substring(md5(x),1,12),16,10))` over
    * `sh = transform(..., i -> concat_ws(' ', t[i], t[i+1], t[i+2]))`,
    * without materializing the shingle strings or running interpreted
    * lambdas — the digest consumes the token bytes + separator directly
    * (byte-identical to concat_ws for non-null inputs). Docs shorter than
    * 3 tokens fall back to one hash of the whole text, mirroring
    * Dedup.shingleExpr. */
  def hashes(tokens: ArrayData, text: UTF8String): ArrayData = {
    val digestOf = md5.get()
    val n = tokens.numElements()
    if (n >= 3) {
      val out = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        // null tokens are skipped along with their separator — exactly
        // concat_ws's null rule, so the digest stays byte-identical to the
        // SQL twin even on containsNull arrays (split() never yields
        // nulls, but the registered SQL surface admits them and a null
        // element must not NPE the digest)
        digestOf.reset()
        var first = true
        var j = i
        while (j < i + 3) {
          if (!tokens.isNullAt(j)) {
            if (!first) digestOf.update(Space)
            digestOf.update(tokens.getUTF8String(j).getBytes)
            first = false
          }
          j += 1
        }
        out(i) = bits48(digestOf.digest())
        i += 1
      }
      new GenericArrayData(out)
    } else {
      digestOf.reset()
      new GenericArrayData(Array(bits48(digestOf.digest(text.getBytes))))
    }
  }
}

/** Native Catalyst expression computing the 3-token-shingle base-hash
  * array from (tokens, text) — the front half of every MinHash-family
  * operator (pairs, clusters, triangles, incremental triage, curation). */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), _: StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires (array<string>, string), got (${l.sql}, ${r.sql})")
    }
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(tokens: Any, text: Any): Any =
    ShingleHashesImpl.hashes(
      tokens.asInstanceOf[ArrayData], text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, x) => s"graft.functions.ShingleHashesImpl.hashes($t, $x)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  /** Register for SQL/expr use: `expr("shingle_hashes(tokens, text)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs(0), exprs(1)), "built-in")
}

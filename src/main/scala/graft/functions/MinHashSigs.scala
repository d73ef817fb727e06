package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Work shared between interpreted eval and generated code. */
object MinHashSigsImpl {
  /** Family size — must match Dedup.NumMinHash (DedupSpec pins the native
    * expression against the SQL formulation bit-for-bit, so a drift fails
    * loudly). */
  val K = 16
  private val P = SharedHash.P
  private val seedA: Array[Long] = SharedHash.seeds(K).map(_._1).toArray
  private val seedB: Array[Long] = SharedHash.seeds(K).map(_._2).toArray

  /** All K MinHash family minima in ONE pass over the base-hash array —
    * the value of K separate `array_min(transform(hs, h -> (a·(h mod P) +
    * b) mod P))` columns, which are interpreted lambdas (no codegen) and
    * traverse the array K times with per-element allocations. Base hashes
    * are 48-bit positive, so plain `%` equals pmod and a·h+b stays below
    * 2⁶².
    *
    * Empty input yields the MaxValue-filled signature (the min over an
    * empty set is the fold identity) rather than null: `defineCodeGen`
    * only propagates the CHILD's null flag, so a null produced here would
    * flow downstream tagged isNull=false and NPE the consumer — reachable
    * via the registered SQL function as `minhash_sigs(array())`. Null
    * elements are skipped for the same reason (never produced by
    * shingle_hashes, but the SQL surface admits them). */
  def sigs(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](K)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val hm = hs.getLong(i) % P
        var k = 0
        while (k < K) {
          val v = (seedA(k) * hm + seedB(k)) % P
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression computing the full MinHash signature array
  * of a base-hash column — preference order (b) of SURVEY §7.3, applied
  * to the hottest sketch in the dedup family (the signature feeds pairs,
  * clusters, triangles, incremental triage, and corpus curation). */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<bigint>, got ${other.sql}")
  }
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigsImpl.sigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigsImpl.sigs($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Register for SQL/expr use: `expr("minhash_sigs(hs)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head), "built-in")
}

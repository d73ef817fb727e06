package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native typed aggregate — the
  * custom-AGGREGATE tier of the Catalyst surface (TypedImperativeAggregate:
  * partial buffers on the map side, serialized merge on the reduce side),
  * alongside the engine's scalar codegen expressions (VecDot,
  * RollingHash64).
  *
  * Guarantee (Misra-Gries 1982; merge rule from Agarwal et al. 2013,
  * "Mergeable Summaries"): with k counters, every item with true frequency
  * > n/(k+1) is in the final candidate set, under ANY update/merge order —
  * which is why the harness query can be oracle-checked even though the
  * sketch's internal counts are order-dependent: candidates are re-counted
  * exactly and thresholded, and that output is deterministic.
  *
  * Scale shape: the aggregate runs as partial buffers of ≤ k entries per
  * task, merged tree-wise — the full token stream is never shuffled, only
  * O(k)-sized summaries. The exact re-count then touches only rows matching
  * the ≤ k broadcast candidates.
  */
case class MisraGries(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "misra_gries needs k > 0 counters")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Keep ≤ k entries: subtract the (k+1)-th largest count from all and
    * drop non-positives (the batched form of MG's decrement-all step). */
  private def compress(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > k) {
      val m = buf.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      val dead = buf.collect { case (key, c) if c - m <= 0 => key }
      dead.foreach(buf.remove)
      buf.mapValuesInPlace((_, c) => c - m)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.updateWith(key) { case c => Some(c.getOrElse(0L) + 1L) }
      compress(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.updateWith(key) { case prev => Some(prev.getOrElse(0L) + c) }
    }
    compress(buf)
    buf
  }

  /** Candidate set only, lexically sorted: the surviving counts are
    * order-dependent (lower bounds), so the deterministic output is the
    * candidate list — callers re-count exactly (see TextAnalysis
    * .heavyHitters). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.keys.toSeq.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** SQL surface: `misra_gries(col, k)` with a literal integer k. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      exprs => MisraGries(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}

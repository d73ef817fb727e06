package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state top-k-per-group as a native typed aggregate: keep the k
  * best (value DESC, tag ASC) pairs per group in a k-entry heap.
  *
  * This is the scale-right replacement for the window-function top-k idiom
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`): the window
  * plan shuffles and SORTS every input row on (g, v), while this aggregate
  * reduces each task's slice to ≤ k entries map-side and shuffles only
  * O(groups × k) summaries — at 100 TB that is the difference between a
  * corpus-sized sort and a dictionary-sized merge. Same trade the engine's
  * other typed aggregates make (MisraGries, CountMin, HllSketch), applied
  * to exact order statistics.
  *
  * Determinism: the kept set and its order are a pure function of the
  * input multiset — total order (value DESC, tag ASC), ties impossible for
  * distinct tags — so ANY update/merge schedule yields the same output
  * (spec-pinned by a partition-invariance test), and the harness query is
  * DuckDB-oracle-checkable.
  */
case class TopKBy(valueExpr: Expression, tagExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "topk_by needs k > 0")

  override def children: Seq[Expression] = valueExpr :: tagExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  /** Dequeues the WORST kept entry (smallest value; ties: largest tag), so
    * one dequeue after exceeding k evicts exactly the loser. */
  private def worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val t = tagExpr.eval(input)
    if (v != null && t != null) {
      buf.enqueue((v.asInstanceOf[Double], t.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  /** Best-first array of (value, tag) structs — ascending under worstFirst
    * ranks the best (highest value, smallest tag) entry first. */
  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(worstFirst).map {
      case (v, t) => new GenericInternalRow(Array[Any](v, t))
    })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (v, t) => out.writeDouble(v); out.writeLong(t) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(valueExpr = newChildren(0), tagExpr = newChildren(1))
}

object TopKBy {
  /** SQL surface: `topk_by(value, tag, k)` with a literal integer k. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by",
      exprs => TopKBy(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
}

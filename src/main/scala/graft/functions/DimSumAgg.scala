package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-dimension exact-micro column sums as ONE native typed aggregate:
  * `dim_sum_agg(e, dim)` over an `array<double>` column sums
  * round(e[i]·1e6) (HALF_UP, [[GramAgg.micro]]'s convention — identical
  * to `round(v*1e6, 0)::long` on both engines) into a fixed D-entry Long
  * buffer per partial.
  *
  * Exists for the r16 PCA-fit single-pass (guide §1.2/§2.4): the fit
  * needs per-dim means AND the Gram triangle, which [[graft.ops.EmbeddingStats]]
  * used to compute as TWO full corpus passes (gram_agg + a posexplode →
  * 64-group hash aggregate with its own exchange). Running
  * `agg(count, gram_agg(e), dim_sum_agg(e))` computes both in one pass
  * over the vectors with no explode and no extra shuffle; the means are
  * then derived with Spark's own `round(sum/(n·1e6), 6)` expression so
  * they stay bit-identical to [[graft.ops.EmbeddingStats.dimStats]]'s
  * mean_v column (asserted by EmbeddingsSpec). Per the float-sum rule,
  * quantization happens per element BEFORE the order-dependent sum, so
  * the buffer is bit-stable under any task/merge order. */
case class DimSumAgg(child: Expression, dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim_sum_agg needs dim > 0")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dim_sum_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  /** round-half-away-from-zero, the shared Spark/DuckDB convention. */
  private def micro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"dim_sum_agg(dim=$dim) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < dim) { buf(i) += micro(arr.getDouble(i)); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bytes)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): DimSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DimSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DimSumAgg =
    copy(child = newChildren.head)
}

object DimSumAgg {
  /** SQL surface: `dim_sum_agg(arrayDoubleCol, dim)` with a literal dim. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dim_sum_agg",
      exprs => DimSumAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}

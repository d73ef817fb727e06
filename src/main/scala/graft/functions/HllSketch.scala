package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog registers (Flajolet et al. 2007) as a native typed
  * aggregate: `hll_regs(h48, p)` emits the 2^p register maxima over the
  * engine's 48-bit [[SharedHash]] values.
  *
  * Unlike Spark's built-in `approx_count_distinct` (xxHash64 internals →
  * rows-only check), each register here is a MAX of rho values derived
  * from the md5-based shared hash — max commutes, so the register vector
  * is bit-identical under any task/merge order and recomputable in plain
  * SQL (`GROUP BY bucket → max(rho)`). The estimator formula then runs
  * identically in both engines' query text, making the final distinct
  * ESTIMATE itself a hash-checked output (q_hll_distinct).
  *
  * Bit layout of h ∈ [0, 2^48): bucket = h mod 2^p (low p bits);
  * remainder r = h div 2^p (48−p bits); rho(r) = trailing-zero count of r
  * plus 1, or (48−p)+1 when r = 0. Trailing zeros (not leading) so the
  * oracle can express rho as `log2(r & -r)` — exact in doubles because
  * r & −r is a power of two.
  *
  * Scale shape: fixed 2^p-int state per partial buffer, merged tree-wise;
  * the scanned column never shuffles. This is the cardinality twin of
  * [[CountMin]] (frequency) and [[MisraGries]] (top-k).
  */
case class HllRegs(child: Expression, p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(p >= 4 && p <= 16, "hll_regs needs 4 <= p <= 16")

  private val m = 1 << p
  private val maxRho = 48 - p + 1

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_regs"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val r = h >>> p
      val rho = if (r == 0L) maxRho else java.lang.Long.numberOfTrailingZeros(r) + 1
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bytes = new Array[Byte](m)
    var i = 0
    // rho <= 45 always fits a byte
    while (i < m) { bytes(i) = buf(i).toByte; i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bytes(i).toInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllRegs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegs =
    copy(child = newChildren.head)
}

object HllRegs {
  /** SQL surface: `hll_regs(h48col, p)` with a literal integer p. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_regs",
      exprs => HllRegs(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}

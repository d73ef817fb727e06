package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native typed
  * aggregate: `count_min(h48, depth, width)` over the engine's 48-bit
  * [[SharedHash]] values.
  *
  * Unlike Spark's built-in `count_min_sketch` (whose Murmur-based cells
  * the DuckDB oracle cannot reproduce), every cell here is an exact
  * integer SUM over rows selected by the md5-derived [[SharedHash]]
  * family — addition commutes, so the emitted counter matrix is
  * bit-identical under ANY task/merge order AND recomputable in plain SQL
  * on the oracle side (`GROUP BY j, bucket`). That turns a probabilistic
  * sketch into a hash-checked query (text_count_min) rather than a
  * rows-only one.
  *
  * Scale shape: the whole aggregate state is a fixed depth×width Long
  * matrix (32 KiB at 4×1024) held per partial buffer and merged
  * tree-wise — the token stream itself is never shuffled, which is the
  * entire point at 100 TB: frequency estimates for any later probe set
  * at the cost of one narrow scan.
  *
  * Guarantee: estimate = min_j cell(j, h_j(x) mod width) ≥ true count,
  * with overestimate ≤ e·n/width at probability 1−e^−depth.
  */
case class CountMin(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "count_min needs depth > 0 and width > 0")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  // (a_j, b_j) drawn from the shared seeded family — the exact constants
  // the oracle SQL re-derives via SharedHash.duckK
  @transient private lazy val seeds = SharedHash.seeds(depth)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % SharedHash.P
      var j = 0
      while (j < depth) {
        val (a, b) = seeds(j)
        val hj = (a * h + b) % SharedHash.P
        buf(j * width + (hj % width).toInt) += 1L
        j += 1
      }
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
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren.head)
}

object CountMin {
  /** SQL surface: `count_min(h48col, depth, width)` with literal ints. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min",
      exprs => CountMin(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
}

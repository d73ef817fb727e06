package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Work shared by the aggregate (build), the probe expression, and tests.
  *
  * Serialized layout (self-describing, so the probe needs no parameters):
  * bytes[0..3] = numBits (int32 BE), bytes[4..7] = numHashes (int32 BE),
  * then ceil(numBits/64) words, 8 bytes each, big-endian.
  *
  * Bit positions use Kirsch-Mitzenmacher double hashing: the input is an
  * already-64-bit-hashed key (callers wrap the join key in the codegen'd
  * builtin `xxhash64`), h2 is a splitmix64 remix forced odd, position_i =
  * (h1 + i·h2) mod numBits. Build and probe share this code path, so a
  * false NEGATIVE is impossible by construction — which is what lets a
  * bloom-gated semi-join keep a full equality oracle (see ops.BloomGate).
  */
object BloomImpl {
  /** splitmix64 finalizer — decorrelates h2 from h1. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def emptyWords(numBits: Int): Array[Long] = new Array[Long]((numBits + 63) >>> 6)

  def add(words: Array[Long], numBits: Int, numHashes: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, numBits.toLong).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](8 + words.length * 8)
    writeInt(out, 0, numBits)
    writeInt(out, 4, numHashes)
    var w = 0
    while (w < words.length) { writeLong(out, 8 + w * 8, words(w)); w += 1 }
    out
  }

  /** Membership probe against a serialized filter. Called from generated
    * code (see [[BloomContains]]) — header reads are two int loads per row,
    * no buffer allocation. */
  def contains(bloom: Array[Byte], h: Long): Boolean = {
    val numBits = readInt(bloom, 0)
    val numHashes = readInt(bloom, 4)
    val h2 = mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, numBits.toLong).toInt
      if ((readLong(bloom, 8 + (pos >>> 6) * 8) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def numBitsOf(bloom: Array[Byte]): Int = readInt(bloom, 0)
  def setBitCount(bloom: Array[Byte]): Int = {
    val words = (bloom.length - 8) / 8
    var c = 0
    var w = 0
    while (w < words) { c += java.lang.Long.bitCount(readLong(bloom, 8 + w * 8)); w += 1 }
    c
  }

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def writeLong(a: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { a(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }
  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 255) << 24) | ((a(off + 1) & 255) << 16) |
      ((a(off + 2) & 255) << 8) | (a(off + 3) & 255)
  private def readLong(a: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (a(off + i) & 255L); i += 1 }
    v
  }
}

/** Bloom-filter build as a native typed aggregate (the same Catalyst tier
  * as [[MisraGries]]): each task ORs key bits into a local word array;
  * partials merge by OR — associative, commutative, order-insensitive, so
  * the filter is deterministic under any parallelism. Input is an already
  * `xxhash64`-hashed key: the aggregate stays type-agnostic and the hash
  * stays inside whole-stage codegen.
  *
  * Scale shape: this is the build side of a runtime semi-join filter — the
  * pattern Spark's own AQE runtime filter uses. Only O(numBits/8) bytes
  * ever leave an executor; sizing is caller-owned (bits ≈ 10–16× expected
  * distinct keys keeps the false-positive rate ≤ ~1%; the gate is
  * correctness-neutral either way, FPs just cost exact-join work). */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits <= (1 << 30), "bloom_agg: numBits out of range")
  require(numHashes > 0 && numHashes <= 16, "bloom_agg: numHashes out of range")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg takes a pre-hashed BIGINT key (wrap in xxhash64), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = BloomImpl.emptyWords(numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.add(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomImpl.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomImpl.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val words = BloomImpl.emptyWords(numBits)
    var w = 0
    while (w < words.length) {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(8 + w * 8 + i) & 255L); i += 1 }
      words(w) = v
      w += 1
    }
    words
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

/** Membership probe — a codegen'd scalar expression, so the gate filter
  * runs inside the same whole-stage-codegen span as the scan it prunes. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires (binary, bigint), got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(bloom: Any, h: Any): Any =
    BloomImpl.contains(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.BloomImpl.contains($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomFilterFns {
  /** SQL surface: `bloom_agg(xxhash64(k), bits, numHashes)` and
    * `bloom_contains(bf, xxhash64(k))`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => BloomAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => BloomContains(exprs(0), exprs(1)),
      "built-in")
  }
}

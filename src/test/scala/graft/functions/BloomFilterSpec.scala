package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.BloomGate

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { GraftFunctions.registerAll(spark); spark }

  test("no false negatives: every inserted key probes true") {
    registered()
    val keys = spark.range(0, 5000).select(col("id"))
    val bloom = keys.agg(expr("bloom_agg(xxhash64(id), 65536, 5)").as("bf"))
    val misses = keys.crossJoin(broadcast(bloom))
      .filter(!expr("bloom_contains(bf, xxhash64(id))"))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate stays near the analytic bound") {
    registered()
    val m = 65536
    val k = 5
    val n = 5000
    val bloom = spark.range(0, n)
      .agg(expr(s"bloom_agg(xxhash64(id), $m, $k)").as("bf"))
    // probe keys 1M.. — disjoint from the build range (xxhash64 of distinct
    // longs; collisions with the build set are ~2^-64-improbable)
    val probes = 20000
    val fp = spark.range(1000000, 1000000 + probes).crossJoin(broadcast(bloom))
      .filter(expr("bloom_contains(bf, xxhash64(id))"))
      .count()
    val expected = math.pow(1 - math.exp(-k.toDouble * n / m), k) * probes
    assert(fp <= expected * 3 + 10,
      s"observed $fp false positives, analytic expectation $expected")
    assert(fp > 0, "a 12.8-bits/key filter at 20k probes should see some FPs")
  }

  test("filter bytes are deterministic under any parallelism (merge = OR)") {
    registered()
    def build(parts: Int): Array[Byte] =
      spark.range(0, 3000).repartition(parts)
        .agg(expr("bloom_agg(xxhash64(id), 16384, 4)"))
        .head().getAs[Array[Byte]](0)
    val one = build(1)
    val eight = build(8)
    assert(java.util.Arrays.equals(one, eight))
    assert(BloomImpl.numBitsOf(one) === 16384)
    assert(BloomImpl.setBitCount(one) > 0)
  }

  test("impl probe agrees with expression probe") {
    registered()
    val bloom = spark.range(0, 100)
      .agg(expr("bloom_agg(xxhash64(id), 4096, 3)"))
      .head().getAs[Array[Byte]](0)
    val hashes = spark.range(0, 200).select(xxhash64(col("id"))).as[Long].collect()
    val viaExpr = spark.range(0, 200).crossJoin(
        broadcast(Seq(bloom).toDF("bf")))
      .select(expr("bloom_contains(bf, xxhash64(id))")).as[Boolean].collect()
    hashes.zip(viaExpr).foreach { case (h, e) =>
      assert(BloomImpl.contains(bloom, h) === e)
    }
  }

  test("gated membership ≡ ungated membership on the documents digest set") {
    registered()
    val docs = sf("documents")
      .withColumn("fp", md5(col("text")))
      .select(col("doc_id"), col("fp"))
    val left = docs.filter(col("doc_id") % 10 === 0)
    // the synthetic corpus has NO exact text duplicates (every md5 group is
    // a singleton), so a cross-bucket overlap must be constructed: plant
    // half of left's digests on the right side so both probe outcomes are
    // exercised deterministically
    val planted = left.filter(col("doc_id") % 20 === 0).select(col("fp"))
    val right = docs.filter(col("doc_id") % 10 =!= 0).select(col("fp"))
      .unionByName(planted)
    val gated = BloomGate.membership(left, right, "fp")
      .select(col("doc_id"), col("in_right"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val rightSet = right.distinct().as[String].collect().toSet
    val expected = left.collect()
      .map(r => r.getLong(0) -> rightSet.contains(r.getString(1))).toMap
    assert(gated === expected)
    assert(expected.values.exists(identity), "planted overlap must probe true")
    assert(!expected.values.forall(identity), "non-planted keys must probe false")
  }

  test("gate prunes definite misses before the exact join") {
    registered()
    // left keys entirely absent from the build side: the bloom filter must
    // discard (almost) everything before the semi-join
    val right = spark.range(0, 4000).select(concat(lit("r_"), col("id")).as("fp"))
    val left = spark.range(0, 4000).select(concat(lit("l_"), col("id")).as("fp"))
    val bloom = right.agg(
      expr(s"bloom_agg(xxhash64(fp), ${BloomGate.DefaultBits}, ${BloomGate.DefaultHashes})").as("bf"))
    val survivors = left.crossJoin(broadcast(bloom))
      .filter(expr("bloom_contains(bf, xxhash64(fp))"))
      .count()
    assert(survivors < 40, s"gate let $survivors of 4000 absent keys through")
  }

  test("empty build side: filter is empty, membership is all-false") {
    registered()
    val left = spark.range(0, 50).select(concat(lit("k"), col("id")).as("fp"))
    val right = left.filter(lit(false))
    val out = BloomGate.membership(left, right, "fp")
    assert(out.count() === 50)
    assert(out.filter(col("in_right")).count() === 0)
  }
}

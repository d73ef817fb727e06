package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Bloom-gated exact membership — the runtime-filter pattern (Spark's AQE
  * InjectRuntimeFilter shape, owned here as a library operator so callers
  * control sizing and the build side).
  *
  * Why it matters at 100 TB: an incremental dedup batch probing a standing
  * corpus is a semi-join where the probe side is tiny and the build side is
  * the whole corpus index. Shuffling the delta against billions of corpus
  * keys is wasted work for every key the corpus has never seen. The gate
  * builds a [[graft.functions.BloomAgg]] over the corpus keys — only
  * O(bits/8) bytes leave the executors — broadcasts it, and discards
  * definite-misses inside the scan's codegen span before any join. False
  * positives only cost exact-join work on a few extra rows; false negatives
  * are impossible (build and probe share one hash path), so the result is
  * EXACTLY the unfiltered membership — which is why the harness query keeps
  * a plain-SQL DuckDB oracle with no bloom in it.
  */
object BloomGate {
  /** Default sizing: 2^20 bits (128 KiB) / 5 hashes ≈ 1% false positives
    * at ~145k build keys, far below that at harness scale. At corpus scale
    * size bits ≈ 14×(distinct keys) for ~1‰ FP — a 10B-key corpus needs a
    * 16 GiB filter, at which point shard the gate per key-range partition
    * rather than growing one monolith. */
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 5

  /** `left` plus a boolean `in_right` column: whether `left.key` occurs in
    * `right.key`. Bit-for-bit equal to the ungated membership join; the
    * bloom gate means only probable members reach the exact semi-join. */
  def membership(left: DataFrame, right: DataFrame, key: String,
      bits: Int = DefaultBits, numHashes: Int = DefaultHashes): DataFrame = {
    graft.functions.BloomFilterFns.register(left.sparkSession)
    val bloom = right.agg(
      expr(s"bloom_agg(xxhash64($key), $bits, $numHashes)").as("bf"))
    // The 1-row filter frame broadcasts; the probe filter runs codegen'd
    // inside the left scan stage. Definite misses never reach the join.
    val maybe = left.crossJoin(broadcast(bloom))
      .filter(expr(s"bloom_contains(bf, xxhash64($key))"))
      .drop("bf")
    val hits = maybe
      .join(right.select(col(key)).distinct(), Seq(key), "left_semi")
      .select(col(key)).distinct()
      .withColumn("in_right", lit(true))
    left.join(hits, Seq(key), "left")
      .withColumn("in_right", coalesce(col("in_right"), lit(false)))
  }

  /** Harness query: exact-duplicate triage of an incoming batch against the
    * standing corpus (same hash-bucket split as dedup_incremental), with
    * the corpus digest set gating the probe. Verdict per incoming doc:
    * 'dup' if its content digest already exists in the corpus, else
    * 'novel'. Output ≡ the gate-free semi-join → full DuckDB oracle. */
  def incrementalExactTriage(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      expr(s"pmod(${SharedHash.spark48("cast(doc_id AS STRING)")}, 10)")
    val docs = Tables.documents(s, dir)
      .withColumn("b", bucket)
      .withColumn("fp", md5(col("text")))
      .select(col("doc_id"), col("b"), col("fp"))
    val inc = docs.filter(col("b") === 9).drop("b")
    val corpus = docs.filter(col("b") =!= 9).select(col("fp"))
    membership(inc, corpus, "fp")
      .select(col("doc_id"),
        when(col("in_right"), "dup").otherwise("novel").as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** [[incrementalExactTriage]] with the standing digest set read from the
    * PERSISTED [[graft.sources.IndexStore]] dedup index instead of being
    * recomputed from the corpus text — the bloom build then scans 16-byte
    * digests, not documents. Output is byte-identical (same oracle). */
  def incrementalExactTriageIndexed(s: SparkSession, dir: String): DataFrame = {
    val (incDocs, _) = Dedup.deltaSplit(Tables.documents(s, dir))
    val inc = incDocs.select(col("doc_id"), md5(col("text")).as("fp"))
    val corpus = graft.sources.IndexStore.standingDedupIndex(s, dir)
      .digests.select(col("fp"))
    membership(inc, corpus, "fp")
      .select(col("doc_id"),
        when(col("in_right"), "dup").otherwise("novel").as("verdict"))
      .orderBy(col("doc_id"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance over the near-duplicate pair graph —
  * "how far is every document from an audited seed?" A contamination or
  * provenance audit seeds at known-bad (or known-benchmark) documents and
  * walks the near-dup graph outward: anything within a few hops of a
  * contaminated seed is suspect even when its own pairwise similarity to
  * the seed is below threshold (transitive near-duplication).
  *
  * Scale shape: the textbook Pregel/frontier pattern, same discipline as
  * [[PageRank]] and [[Dedup.connectedComponents]]. The undirected edge
  * frame is hash-partitioned by src ONCE and pinned; each round is one
  * frontier⋈edges equi-join (cost ∝ edges incident to the CURRENT
  * frontier, not the graph) plus an anti-join against the visited set,
  * both keyed on the same hash partitioning. Rounds are bounded by
  * `maxHops`, so lineage is truncated per round and the plan stays O(1)
  * in round count. Nothing here is ever proportional to corpus size —
  * only to the near-dup graph, which is duplicate-density-sized.
  */
object Bfs {

  val MaxHops = 4
  val SeedMod = 10

  /** `pairs` (doc_a, doc_b) undirected; seeds = graph nodes matching
    * `seedPred`. Returns (doc_id, dist): the minimum hop count from any
    * seed, for every node within `maxHops` of one. Deterministic: a node
    * is labeled by the FIRST round that reaches it, which is the minimum
    * distance by BFS invariant — no tie to break. */
  def hopDistance(pairs: DataFrame, seedPred: Column,
      maxHops: Int = MaxHops): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("doc_id")).distinct()

    var known = nodes.filter(seedPred).withColumn("dist", lit(0))
      .localCheckpoint(true)
    var frontier = known.select(col("doc_id"))
    for (i <- 1 to maxHops) {
      val next = frontier.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id")).distinct()
        .join(known, Seq("doc_id"), "left_anti")
        .withColumn("dist", lit(i))
        .localCheckpoint(true)
      // `known` stays a LAZY union of the ≤ maxHops+1 checkpointed
      // frontier frames: re-checkpointing the union each round (the old
      // shape) re-stored every earlier round's bytes and paid one extra
      // job launch per round — the union plan is O(maxHops) scans of
      // already-pinned RDDs, cheap to both optimize and anti-join
      // against (r16 verdict #1's job-count latency, guide §2.4).
      known = known.union(next)
      frontier = next.select(col("doc_id"))
    }
    known
  }

  /** Harness query: hop distance from "audited" seed documents (doc_id %
    * [[SeedMod]] == 0) through the MinHash near-dup graph. */
  def dupGraphDistance(s: SparkSession, dir: String): DataFrame =
    hopDistance(Dedup.minhashPairsRaw(Tables.documents(s, dir)),
      col("doc_id") % SeedMod === 0)
      .orderBy(col("doc_id"))
}

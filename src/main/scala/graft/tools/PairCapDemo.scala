package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{Dedup, Tables}

/** Runnable evidence for the exact pair family's duplicate-dense guardrail
  * (BENCH.md): prints the pre-join duplicate-group histogram scout, then
  * times `prefixJoinPairsOf` with the per-doc candidate budget engaged —
  * and optionally the uncapped exact join for contrast (output-quadratic on
  * a duplicate-dense replica; ~460 s at ×10 in round 8).
  * `sbt "runMain graft.tools.PairCapDemo [sfDir] [cap] [alsoUncapped]"` */
object PairCapDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = if (args.length > 1) args(1).toInt else 8
    val alsoUncapped = args.length > 2 && args(2) == "uncapped"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-pair-cap-demo")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the scout: is this corpus duplicate-dense enough to go quadratic?
    val hist = Dedup.dupGroupHistogram(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val quadPairs = hist.map { case (g, n) => n * g * (g - 1) / 2 }.sum
    println(s"dup-group histogram (size -> groups): " +
      hist.map { case (g, n) => s"$g->$n" }.mkString(", "))
    println(s"exact-dup pair floor from identical text alone: $quadPairs")
    // near-dup families keep distinct digests but share prefix hashes —
    // this bound is what the join cost actually scales with
    println(s"prefix candidate-pair upper bound: " +
      Dedup.candidatePairBound(Tables.documents(spark, dir), 0.3))

    def time(label: String, fn: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = fn
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
    }
    val docs = Tables.documents(spark, dir)
    time(s"capped (budget $cap/doc)",
      Dedup.prefixJoinPairsOf(docs, 0.3, Some(cap)).count())
    if (alsoUncapped)
      time("uncapped exact", Dedup.prefixJoinPairsOf(docs, 0.3).count())

    // the tf-idf modality carries the same guardrail: scout then budget
    println(s"lexical collision-pair bound: " +
      graft.ops.TermScoring.lexicalPairBound(docs))
    time(s"lexical capped (budget $cap/doc)",
      graft.ops.TermScoring.lexicalCosinePairs(spark, dir,
        maxCandidatesPerDoc = Some(cap)).count())
    if (alsoUncapped)
      time("lexical uncapped exact",
        graft.ops.TermScoring.lexicalCosinePairs(spark, dir).count())

    // the exact-recall intake probe: same budget, partitioned by the
    // DELTA doc (an arriving doc reports its first c standing matches)
    val (inc, _) = Dedup.deltaSplit(docs)
    val idx = graft.sources.IndexStore.standingPrefixIndex(spark, dir)
    time(s"probe capped (budget $cap/delta-doc)",
      Dedup.prefixProbe(inc, idx,
        maxCandidatesPerDoc = Some(cap)).count())
    if (alsoUncapped)
      time("probe uncapped exact", Dedup.prefixProbe(inc, idx).count())

    // the winnowing-sketch pair join — the ×30 sweep's one over-budget
    // member before it grew the same knob (output pairs are most of its
    // replica cost)
    time(s"winnow capped (budget $cap/doc)",
      graft.ops.TextAnalysis.winnowPairs(spark, dir,
        maxCandidatesPerDoc = Some(cap)).count())
    if (alsoUncapped)
      time("winnow uncapped exact",
        graft.ops.TextAnalysis.winnowPairs(spark, dir).count())

    // the embedding-space member: hyperplane-band collisions grow
    // quadratically with duplicate density (the x30 disk-full lesson —
    // now broadcast-verified); the budget bounds verify cosines + output
    time(s"emb band capped (budget $cap/vec)",
      graft.ops.Similarity.cosineDupLsh(spark, dir,
        maxCandidatesPerDoc = Some(cap)).count())
    if (alsoUncapped)
      time("emb band uncapped exact",
        graft.ops.Similarity.cosineDupLsh(spark, dir).count())
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-corpus curation pipeline — the operator an LLM
  * data pipeline actually runs, built from the engine's own pieces:
  *
  *   1. exact dedup      — keep min doc_id per content digest
  *   2. near-dup dedup   — MinHash+LSH pairs → connected components →
  *                         keep only cluster keepers
  *   3. quality gate     — token-count band + type-token-ratio floor
  *
  * Every stage is the scale-designed operator from Dedup/TextAnalysis;
  * the composition stays fully declarative (one job graph, no driver
  * round-trips except the bounded union-find), and the whole pipeline is
  * oracle-checked end-to-end (corpus_curate) — the DuckDB side recomputes
  * all three stages independently, recursive-CTE closure included.
  */
object Corpus {
  val MinTokens = 20
  val MaxTokens = 1000
  val MinTypeTokenRatio = 0.2

  def curate(docs: DataFrame): DataFrame = {
    // 1. exact dedup, shaped like Dedup.exactKeep: the digest window runs
    // over a narrow (fp, doc_id) projection and the anti-join's right side
    // is the small non-keeper set, so document bodies never shuffle.
    // Cached: feeds the LSH pass, the near-dup anti-join, and the gate.
    val exactKeep = docs
      .join(Dedup.exactNonKeepers(docs), Seq("doc_id"), "left_anti")
      .cache()

    // 2. near-dup clusters; drop everything but the cluster keeper
    // (raw pair path — no presentation sort between LSH and clustering)
    val clusters = Dedup.connectedComponents(Dedup.minhashPairsRaw(exactKeep))
    val dropIds = clusters.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id"))
    val nearKeep = exactKeep.join(dropIds, Seq("doc_id"), "left_anti")

    // 3. quality gate
    nearKeep
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("ttr",
        expr("size(array_distinct(tokens))") / col("n_tokens"))
      .filter(col("n_tokens") >= MinTokens && col("n_tokens") <= MaxTokens &&
        col("ttr") >= MinTypeTokenRatio)
      .select(col("doc_id"), col("n_tokens"), round(col("ttr"), 4).as("ttr"))
      .orderBy(col("doc_id"))
  }

  def curateQuery(s: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(s, dir))
}

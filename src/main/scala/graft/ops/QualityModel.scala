package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: distill the expensive multi-stage
  * curation decision ([[Corpus.curate]]: exact dedup → MinHash/LSH
  * near-dup clusters → quality gate) into a cheap linear scorer — the
  * fastText-classifier pattern LLM pipelines use (CCNet, GPT-3's
  * WebText-similarity filter): run the expensive pipeline once on a
  * slice, fit a classifier on its keep/drop verdicts, then gate the full
  * corpus with one codegen projection per document.
  *
  * Training is full-batch logistic regression by gradient descent where
  * every gradient component obeys the float-sum rule: the per-row
  * contribution (p − y)·x_j is floored to integer micro-units and summed
  * EXACTLY, so the fit is bit-identical under any partitioning (spec
  * asserts repartition invariance). The per-round cost is one scan of a
  * cached 6-column feature frame — the standard distributed-LR shape.
  *
  * Features are exact integer micro-units derived from token statistics
  * (so the scoring oracle replays them in DuckDB without float drift),
  * and the published score is the exact-integer logit: weights quantized
  * to micro-units make z = Σ w_micro·x_micro a pure BIGINT sum — the
  * engine/oracle comparison needs no transcendental parity at all.
  */
object QualityModel {

  // 6 rounds: the loss trajectory has flattened well before this (spec
  // asserts descent + ≥0.8 label accuracy at exactly this budget), and
  // each round is a full scan of the cached feature frame — iterations
  // are the fit's cost driver (12 → 8 → 6 across rounds, each cut held
  // against the same gates).
  val Iters = 6
  val Lr = 0.5
  val NumFeatures = 6

  /** Micro-unit weights, stashed when the query runs so the oracle
    * replays the integer logit from literals (stash-then-generate). */
  @volatile private[graft] var fittedWeights: Option[Array[Long]] = None

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  /** Integer micro-unit features f0..f5 (+ label y from the curated-id
    * set). All divisions are positive-integer floor divisions — identical
    * in Spark (`div`) and DuckDB (`//`). */
  private[ops] def featureFrame(docs: DataFrame, curatedIds: DataFrame): DataFrame =
    docs
      .join(curatedIds.select(col("doc_id"), lit(1).as("y0")), Seq("doc_id"), "left")
      .withColumn("y", coalesce(col("y0"), lit(0)).cast("int"))
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("nt", size(col("tokens")).cast("long"))
      .withColumn("nd", expr("size(array_distinct(tokens))").cast("long"))
      .withColumn("sh", expr(
        s"size(filter(tokens, t -> t IN (${inList(TextAnalysis.Stopwords)})))").cast("long"))
      .select(col("doc_id"), col("y"),
        lit(1000000L).as("f0"),                                   // bias
        (col("nt") * 10000L).as("f1"),                            // n_tokens/100
        expr("(nd * 1000000) div nt").as("f2"),                   // type-token ratio
        expr("(sh * 1000000) div nt").as("f3"),                   // stopword ratio
        (col("n_chars") * 1000L).as("f4"),                        // n_chars/1000
        expr("((n_chars - nt + 1) * 100000) div nt").as("f5"))    // mean word len/10

  /** Fit on a prepared feature frame. Returns (weights, per-round
    * mean-log-loss trajectory in micro-units) — both deterministic. */
  private[ops] def fitOn(f: DataFrame, iters: Int = Iters): (Array[Double], Seq[Double]) = {
    val n = f.count().toDouble
    require(n > 0, "cannot fit a quality model on an empty corpus")
    val w = Array.fill(NumFeatures)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var t = 0
    while (t < iters) {
      val z: Column = (0 until NumFeatures)
        .map(j => col(s"f$j") / lit(1e6) * lit(w(j))).reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      // floored per-row micro contributions -> exact long sums (order-free)
      val aggs =
        (0 until NumFeatures).map(j =>
          sum(floor((p - col("y")) * (col(s"f$j") / lit(1e6)) * lit(1e6))).as(s"g$j")) :+
          sum(floor((-(col("y") * log(p) +
            (lit(1) - col("y")) * log(lit(1.0) - p))) * lit(1e6))).as("loss")
      val row = f.agg(aggs.head, aggs.tail: _*).collect()(0)
      var j = 0
      while (j < NumFeatures) { w(j) -= Lr * row.getLong(j) / (n * 1e6); j += 1 }
      losses += row.getLong(NumFeatures) / (n * 1e6)
      t += 1
    }
    (w, losses.toSeq)
  }

  /** Harness query: fit on the corpus's own curation verdicts — read from
    * the PERSISTED verdicts artifact
    * ([[graft.sources.IndexStore.standingCurationVerdicts]]: the
    * expensive curate pipeline runs once per corpus, offline, exactly as
    * CCNet produces its training labels) — then score every document.
    * `margin` is the exact-integer logit (micro-weights · micro-features,
    * unit 1e-12) and `pred` its sign — no floats cross the engine/oracle
    * boundary. */
  def distill(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val curated = graft.sources.IndexStore.standingCurationVerdicts(s, dir)
    val f = featureFrame(docs, curated).cache()
    val (w, _) = fitOn(f)
    val wm = w.map(x => math.round(x * 1e6))
    fittedWeights = Some(wm)
    val z = (0 until NumFeatures)
      .map(j => col(s"f$j") * lit(wm(j))).reduce(_ + _)
    val out = f.withColumn("z", z)
      .select(col("doc_id"), col("y").as("label"),
        (col("z") > 0L).cast("int").as("pred"),
        round(col("z").cast("double") / lit(1e12), 4).as("margin"))
      .orderBy(col("doc_id"))
    Caching.materializeAndRelease(out, f)
  }
}

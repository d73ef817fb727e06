package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: the corpus operators must return empty
  * results (not throw, not divide by zero) on an empty documents table —
  * the state every incremental pipeline passes through on day one. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("dedup operators are empty-safe") {
    assert(Dedup.exactGroups(spark, emptyDir).count() === 0)
    assert(Dedup.exactKeep(spark, emptyDir).count() === 0)
    assert(Dedup.minhashPairs(spark, emptyDir).count() === 0)
    assert(Dedup.simhashLshPairs(spark, emptyDir).count() === 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0)
  }

  test("corpus operators are empty-safe") {
    assert(Corpus.curateQuery(spark, emptyDir).count() === 0)
    assert(Corpus.packBins(spark, emptyDir).count() === 0)
    assert(Corpus.mixtureSample(spark, emptyDir).count() === 0)
    assert(Corpus.contamination(spark, emptyDir).count() === 0)
  }

  test("text operators are empty-safe") {
    assert(TextAnalysis.tokenStats(spark, emptyDir).count() === 0)
    assert(TextAnalysis.collapseRepeats(spark, emptyDir).count() === 0)
    assert(TextAnalysis.vocabulary(spark, emptyDir).count() === 0)
  }

  test("round-3 operators are empty-safe") {
    assert(Dedup.substringGramPairs(spark, emptyDir).count() === 0)
    assert(Dedup.incrementalDedup(spark, emptyDir).count() === 0)
    assert(TextAnalysis.segmentDedup(spark, emptyDir).count() === 0)
    assert(TextAnalysis.heavyHitters(spark, emptyDir).count() === 0)
    assert(TermScoring.tfidfTopTerms(spark, emptyDir).count() === 0)
    assert(TermScoring.bm25(spark, emptyDir).count() === 0)
    assert(Upsert.documentsUpsert(spark, emptyDir).count() === 0)
  }

  test("indexing trio is empty-safe") {
    assert(TextAnalysis.invertedIndex(spark, emptyDir).count() === 0)
    assert(TextAnalysis.boilerplateFilter(spark, emptyDir).count() === 0)
    assert(TermScoring.collocationPmi(spark, emptyDir).count() === 0)
  }

  test("round-4 operators are empty-safe") {
    assert(Dedup.simhashLshPairs64(spark, emptyDir).count() === 0)
    assert(Dedup.triangleCount(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).head().getLong(0) === 0)
    assert(Dedup.orientedWedges(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0)
    // MOR read view over an empty base and an empty change batch
    val eBase = Seq.empty[(Long, String)].toDF("k", "v")
    val eCh = Seq.empty[(Long, String, String)].toDF("k", "op", "v")
    assert(Upsert.readView(eBase, Seq(eCh), "k", "v").count() === 0)
    assert(Upsert.documentsUpsertMor(spark, emptyDir).count() === 0)
    assert(TextAnalysis.customSqlSurface(spark, emptyDir).count() === 0)
    assert(TextAnalysis.chunk(spark, emptyDir).count() === 0)
    assert(TextAnalysis.charEntropy(spark, emptyDir).count() === 0)
  }

  test("round-5 operators are empty-safe") {
    // LM score: no docs -> no bigrams -> empty model -> empty output
    assert(TermScoring.lmScore(spark, emptyDir).count() === 0)
    // SCD2 over an empty changelog
    assert(Analytics.scd2History(
      Seq.empty[(Long, Long, Int)].toDF("doc_id", "val", "batch"),
      "doc_id", "val", "batch").count() === 0)
    // sketch aggregates over zero rows emit their identity state
    graft.functions.GraftFunctions.registerAll(spark)
    val none = Seq.empty[Long].toDF("h48")
    assert(none.agg(expr("count_min(h48, 4, 64)")).head.getSeq[Long](0)
      .forall(_ === 0L))
    assert(none.agg(expr("hll_regs(h48, 10)")).head.getSeq[Int](0)
      .forall(_ === 0))
    // PageRank refuses an empty graph loudly (mass can't be distributed)
    intercept[IllegalArgumentException] {
      PageRank.pageRank(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count()
    }
  }

  test("round-6 indexed intake ops are empty-safe (empty standing index, empty delta)") {
    assert(TextAnalysis.winnowProbeIndexed(spark, emptyDir).count() === 0)
    assert(Dedup.incrementalDedupIndexed(spark, emptyDir).count() === 0)
    assert(BloomGate.incrementalExactTriageIndexed(spark, emptyDir).count() === 0)
  }

  test("round-6 text/dedup additions are empty-safe") {
    assert(TextAnalysis.repetitionStats(spark, emptyDir).count() === 0)
    assert(TextAnalysis.oovRate(spark, emptyDir).count() === 0)
    assert(Dedup.substringSpanRemoval(spark, emptyDir).count() === 0)
    assert(Dedup.sourceDupMatrix(spark, emptyDir).count() === 0)
    assert(Dedup.exactKeepByPolicy(spark, emptyDir).count() === 0)
    assert(Dedup.minhashClustersByPolicy(spark, emptyDir).count() === 0)
    // drift over nothing: zero terms, zero divergence (the empty fold)
    val drift = TextAnalysis.tokenDrift(spark, emptyDir).head()
    assert(drift.getInt(0) === 0 && drift.getDouble(1) === 0.0)
  }

  test("round-9 additions are empty-safe") {
    assert(Corpus.sourceCap(spark, emptyDir).count() === 0)
    assert(Dedup.dupGroupHistogram(spark, emptyDir).count() === 0)
    assert(Dedup.candidatePairBound(
      Tables.documents(spark, emptyDir)) === 0L)
    assert(Dedup.prefixJoinPairsOf(
      Tables.documents(spark, emptyDir), 0.3, Some(4)).count() === 0)
    assert(TermScoring.sourceCosineMatrix(spark, emptyDir).count() === 0)
  }

  test("second-session round-6 additions: empty-safe, and the model fit fails loudly") {
    // BPE: empty corpus -> no merges, empty outputs (covered in BpeSpec
    // too; here against the shared empty fixture)
    assert(Bpe.merges(spark, emptyDir).count() === 0)
    assert(Bpe.encode(spark, emptyDir).count() === 0)
    assert(Bpe.vocab(spark, emptyDir).count() === 0)
    // backoff LM: no docs -> no trigram stream -> empty scores
    assert(TermScoring.lmBackoff(spark, emptyDir).count() === 0)
    // quality distill: a model fit on nothing must fail loudly, not emit
    // a silent all-zero scorer
    val e = intercept[IllegalArgumentException] {
      QualityModel.distill(spark, emptyDir).count()
    }
    assert(e.getMessage.contains("empty corpus"))
    // native range join: either side empty -> empty inner result
    import spark.implicits._
    val l0 = Seq.empty[(Long, Long)].toDF("k", "t")
    val r1 = Seq((1L, 1L, 2L)).toDF("k", "t", "v")
    assert(graft.plans.RangeJoinNative.rangeJoin(l0, r1, "k", "t", -5L, 5L,
      Seq("v")).count() === 0)
    val l1 = Seq((1L, 1L)).toDF("k", "t")
    val r0 = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    assert(graft.plans.RangeJoinNative.rangeJoin(l1, r0, "k", "t", -5L, 5L,
      Seq("v")).count() === 0)
  }

  test("curation-stack additions are empty-safe (PQ fails loudly: no sample, no codebook)") {
    assert(Redaction.redactDocuments(spark, emptyDir).count() === 0)
    assert(Dedup.canonicalGroups(spark, emptyDir).count() === 0)
    assert(Dedup.containmentPairs(spark, emptyDir).count() === 0)
    assert(TextAnalysis.winnow(spark, emptyDir).count() === 0)
    assert(TextAnalysis.heavyHittersByLang(spark, emptyDir).count() === 0)
    assert(TextAnalysis.winnowPairs(spark, emptyDir).count() === 0)
    assert(TextAnalysis.winnowProbe(spark, emptyDir).count() === 0)
    val tmp = java.nio.file.Files.createTempDirectory("emptyemb").toString
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    assert(EmbeddingStats.dimStats(spark, tmp).count() === 0)
    // PQ codebooks are trained statistics — an empty corpus has none, and
    // a silent empty result would look like "no neighbors" downstream
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(spark, tmp).count()
    }
  }

  test("round-6 close-out operators are empty-safe") {
    assert(Dedup.prefixJoinPairsOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() === 0)
    assert(Bfs.hopDistance(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      col("doc_id") === 0).count() === 0)
    assert(Analytics.transitionsOf(
      Seq.empty[(Long, Long, java.sql.Timestamp, String)]
        .toDF("event_id", "user_id", "ts", "event_type")).count() === 0)
    assert(Analytics.lastTouchOf(
      Seq.empty[(Long, Long, java.sql.Timestamp, String, Double)]
        .toDF("event_id", "user_id", "ts", "event_type", "value"))
      .count() === 0)
    assert(DataQuality.segmentChecksumsOf(
      Seq.empty[(Long, String, String, String, Long)]
        .toDF("doc_id", "text", "lang", "source", "n_chars")).count() === 0)
    // empty index + empty probe batch: the exact intake probe on day one
    val idx = java.nio.file.Files.createTempDirectory("emptypfx").toString
    graft.sources.IndexStore.buildPrefix(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), idx)
    assert(Dedup.prefixProbe(
      Seq((1L, "some incoming doc text")).toDF("doc_id", "text"),
      graft.sources.IndexStore.readPrefix(spark, idx)).count() === 0)
    // view maintenance from nothing: merge with a missing store is the
    // delta itself; an empty batch over a store is a no-op
    val vroot = java.nio.file.Files.createTempDirectory("emptyview").toString
    ViewMaintain.applyViewBatch(
      Seq((1L, 2.0)).toDF("user_id", "value"), vroot, 0)
    ViewMaintain.applyViewBatch(
      Seq.empty[(Long, Double)].toDF("user_id", "value"), vroot, 1)
    assert(spark.read.parquet(s"$vroot/v=1").count() === 1)
  }

  test("round-14 operators are empty-safe") {
    assert(TextAnalysis.gopherRules(spark, emptyDir).count() === 0)
    assert(Mp4.videoFrames(spark, emptyDir).count() === 0)
    assert(Mp4.videoSamples(spark, emptyDir).count() === 0)
  }

  test("single-doc corpus: pair and dedup operators degrade to no-pairs, " +
      "not errors") {
    val tmp = java.nio.file.Files.createTempDirectory("single").toString
    Seq((0L, "one tiny doc", "en", "src0", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(Dedup.substringGramPairs(spark, tmp).count() === 0)
    assert(Dedup.minhashPairs(spark, tmp).count() === 0)
    val seg = TextAnalysis.segmentDedup(spark, tmp).head()
    assert(seg.getInt(1) === 1 && seg.getInt(2) === 1)
    assert(seg.getString(3) === "one tiny doc")
    // one doc, three tokens: every token is a heavy hitter at k=40
    assert(TextAnalysis.heavyHitters(spark, tmp).count() === 3)
  }

  test("tiny embedding corpus (< IvfCells vectors): quantizer fits clamp " +
      "k to the sample and IVF/semDedup return results, not exceptions") {
    // 5 vectors < IvfCells(16): the in-process Lloyd fit must clamp k to
    // the sample size (one centroid per point), matching the graceful
    // degradation the pre-r13 ml.KMeans path provided (r13 ADVICE) —
    // while the EMPTY-sample loud-fail contract above stays intact
    val tmp = java.nio.file.Files.createTempDirectory("tinyemb").toString
    val rnd = new scala.util.Random(7)
    (0L until 5L).map(i =>
        (i, Array.fill(64)(rnd.nextFloat()), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    // every vector is a query; with 5 cells and all points distinct the
    // probe still finds neighbors in the probed cells
    assert(Similarity.ivfTopK(spark, tmp, k = 2, numQueries = 5).count() > 0)
    // semDedup on 5 distinct random vectors: everything is its own keeper
    val sd = Similarity.semDedup(spark, tmp)
    assert(sd.count() === 5)
    assert(sd.filter(col("kept")).count() === 5)
  }
}

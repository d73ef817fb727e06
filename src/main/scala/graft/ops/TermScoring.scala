package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-weighting operators over the `documents` table: TF-IDF and BM25 —
  * the relevance/quality primitives a training-data pipeline uses for
  * corpus-vs-reference scoring (e.g. importance resampling against a
  * high-quality seed corpus) and for search-style retrieval over the corpus.
  *
  * Scale design: both are wordcount-shaped. The explode is partition-local;
  * only (term, partial count) pairs shuffle for DF, and (doc, term, tf)
  * triples for TF — never document bodies. Corpus-level scalars (N, avgdl)
  * are single-row aggregates broadcast into the scoring join, not
  * driver-side collects. Every arithmetic step is rounded where engine
  * float association could differ, so the DuckDB oracle hash-matches.
  */
object TermScoring {

  /** Per-document top-k TF-IDF terms (tf × ln((N+1)/(df+1)), the smoothed
    * variant that never divides by zero). Tie-break: score desc, term asc. */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // tf rows are per-(doc,term) → count = df
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val K1 = 1.2
  val B = 0.75
  /** Fixed retrieval query for the harness BM25 ranking. */
  val QueryTerms: Seq[String] = Seq("table", "spark", "join")

  /** BM25 ranking of all documents against [[QueryTerms]], top `k` by
    * score. Standard Robertson/Sparck-Jones idf = ln(1 + (N-df+0.5)/(df+0.5));
    * per-term contributions are rounded before summing so the cross-engine
    * sum is over identical representable values, and ranking uses the
    * rounded score with doc_id tie-break — bit-stable row selection. */
  /** Per-(doc, query-term) BM25 contribution rows — the shared core of the
    * disjunctive ranking ([[bm25]]) and the conjunctive search
    * ([[searchConjunctive]]). */
  private def bm25Contrib(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("dl", size(split(col("text"), " ")))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      round(avg(col("dl")), 6).as("avgdl"))
    val terms = docs
      .select(col("doc_id"), col("dl"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
    val tf = terms.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)), 6))
      // per-term contribution in integral micro-units (floor, not round —
      // DuckDB and Spark agree on floor; their double→int casts differ):
      // summing BIGINTs is exact and order-independent, where a double sum
      // could flip last bits under reordered addition (float-sum rule)
      .withColumn("contrib_u", floor(
        col("idf") * (col("tf") * (lit(K1) + 1)) /
          (col("tf") + lit(K1) * (lit(1) - lit(B) + lit(B) * col("dl") / col("avgdl")))
          * lit(1000000)).cast("bigint"))
  }

  def bm25(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    bm25Contrib(s, dir)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib_u")) / 1000000.0, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009 — the standard lexical⊕dense combiner): the BM25 top-`poolK`
    * over [[QueryTerms]] and the dense cosine top-`poolK` (query =
    * vector 0's embedding; testdata convention vec_id i ↔ doc i) fuse per
    * document as Σ 1/(rrfK + rank) over the lists containing it, top-`k`
    * by fused score. RRF needs no score calibration between retrievers —
    * only ranks — which is why it is the production default for hybrid
    * search.
    *
    * Exact arithmetic: each reciprocal is 1e6 div (rrfK + rank) in
    * BIGINT, so fused scores are exact integers (the float-sum rule), and
    * since both constituent rankings are already hash-oracled (text_bm25 /
    * ann_topk) the COMPOSITION gets a full hash oracle too.
    *
    * Scale shape: each branch is its existing scale-designed op (the
    * vocabulary-pruned BM25 stream; the broadcast-query cosine scan — at
    * corpus scale the dense branch swaps in ann_lsh/ann_truncate, same
    * (doc_id, rank) contract). The fusion itself is a full-outer join of
    * two k-sized lists — negligible at any scale. */
  def hybridSearch(s: SparkSession, dir: String, k: Int = 10,
      poolK: Int = 20, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25(s, dir, poolK)
      .withColumn("lex_rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
      .select(col("doc_id"), col("lex_rnk"))
    val sem = graft.ops.Similarity.bruteForceTopK(s, dir, k = poolK,
        numQueries = 1)
      .select(col("c_id").as("doc_id"), col("rnk").cast("int").as("sem_rnk"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000L div (${rrfK}L + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"1000000L div (${rrfK}L + sem_rnk)"), lit(0L)))
      .orderBy(col("rrf_u").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("rrf_u"), col("lex_rnk"), col("sem_rnk"))
  }

  /** Conjunctive keyword search: documents containing EVERY query term,
    * BM25-ranked — the composition an inverted index serves. Same scale
    * shape as [[bm25]] (the query-term filter prunes the explode to a
    * vocabulary-bounded stream before any shuffle); the AND gate is a
    * count-distinct over ≤ |query| terms per doc, not a self-join. */
  def searchConjunctive(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    bm25Contrib(s, dir)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"),
        sum(col("tf")).as("n_hits"),
        round(sum(col("contrib_u")) / 1000000.0, 6).as("score"))
      .filter(col("n_terms") === QueryTerms.size)
      .select(col("doc_id"), col("n_hits"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Sparse lexical-cosine near-dup pairs — the third similarity modality
    * next to dense embedding-cosine ([[Similarity.cosineDupPairs]]) and
    * set-jaccard ([[Dedup.minhashPairs]]): documents as tf-idf vectors in
    * an inverted index, pairwise dot products via the per-term self-join.
    *
    * The vector space is the df ≤ n_docs/`dfFrac` vocabulary — a
    * RELATIVE document-frequency cap, so the same operator definition
    * holds at every corpus size (an absolute cap silently empties the
    * vocabulary as the corpus grows). Rare terms carry the signal;
    * dropping boilerplate terms by df is stopwording AND the join's skew
    * guard — each term contributes at most C(cap, 2) candidate pairs, so
    * the inverted-index join is O(collisions), never O(n²). Dot products
    * and norms sum BIGINT milli-unit weights (floor(w·1000)) — exact,
    * order-independent sums per the float-sum rule — and the final cosine
    * is one deterministic double expression per pair, so the DuckDB
    * oracle hash-matches. Bodies never shuffle: only (doc, term-weight)
    * pairs move.
    *
    * Still honestly OUTPUT-quadratic on a duplicate-dense corpus (182×
    * at the ×10 replica; the r9 Bayardo prefix-filter attempt measured
    * WORSE on this output-bound corpus — BENCH.md). So it carries the
    * same two-part guardrail the exact shingle-pair family got in r9:
    * [[lexicalPairBound]] prices the join's collision count before
    * anyone pays it, and `maxCandidatesPerDoc` bounds dot/verify work to
    * O(c·n): candidates (distinct colliding id pairs — no weights in
    * that shuffle) rank per doc_a by ascending doc_b; only the first `c`
    * reach the weight-join that accumulates dots. The capped output is a
    * DETERMINISTIC SUBSET of the exact output with ≤ c rows per doc_a —
    * a work-bound policy knob; `None` (the default) preserves the exact,
    * fully-oracled semantics unchanged. */
  def lexicalCosinePairs(s: SparkSession, dir: String, dfFrac: Int = 10,
      threshold: Double = 0.5,
      maxCandidatesPerDoc: Option[Int] = None): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val wu0 = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .filter(col("df") * dfFrac <= col("n_docs"))
      .select(col("doc_id"), col("term"),
        floor(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)) * 1000)
          .cast("bigint").as("w"))

    def epilogue(dots: DataFrame, wu: DataFrame): DataFrame = {
      val nrm = wu.groupBy(col("doc_id"))
        .agg(sum(col("w") * col("w")).as("nrm"))
      dots
        .join(nrm.toDF("doc_a", "na"), "doc_a")
        .join(nrm.toDF("doc_b", "nb"), "doc_b")
        .withColumn("cosine",
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6))
        .filter(col("cosine") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("cosine"))
        .orderBy(col("doc_a"), col("doc_b"))
    }

    maxCandidatesPerDoc match {
      case None =>
        val wu = wu0
        epilogue(
          wu.toDF("doc_a", "term", "wa")
            .join(wu.toDF("doc_b", "term", "wb"), "term")
            .filter(col("doc_a") < col("doc_b"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(sum(col("wa") * col("wb")).as("dot")), wu)
      case Some(c) =>
        // candidate generation moves (id, id) rows only — weights and
        // multiplicities stay out of the quadratic shuffle; the budget
        // then bounds the weight-join to c pairs per doc_a
        val wu = wu0.cache()
        wu.count() // force: ids leg + two dot legs + norm share one pass
        val ids = wu.select(col("doc_id"), col("term"))
        val cand0 = ids.toDF("doc_a", "term")
          .join(ids.toDF("doc_b", "term"), "term")
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b")).distinct()
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_a")).orderBy(col("doc_b"))
        val cand = cand0.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= c).drop("__rn")
        val dots = cand
          .join(wu.toDF("doc_a", "term", "wa"), "doc_a")
          .join(wu.toDF("doc_b", "term", "wb"), Seq("doc_b", "term"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(sum(col("wa") * col("wb")).as("dot"))
        graft.ops.Caching.materializeAndRelease(epilogue(dots, wu), wu)
    }
  }

  /** Pre-join cost scout for [[lexicalCosinePairs]]: Σ_t df_t·(df_t−1)/2
    * over the df-capped vocabulary — the exact number of colliding
    * (doc_a, doc_b, term) rows the inverted-index self-join shuffles, so
    * a planner can price the quadratic join before paying for it (the
    * [[Dedup.candidatePairBound]] discipline applied to the tf-idf
    * modality). Cost: one wordcount aggregate; bodies never shuffle. */
  def lexicalPairBound(docs: DataFrame, dfFrac: Int = 10): Long =
    lexicalPairBoundOf(docs, dfFrac).collect()(0).getLong(0)

  /** One-row frame (bound BIGINT) form of [[lexicalPairBound]] — the
    * harness query surface (dedup_lexical_bound). */
  def lexicalPairBoundOf(docs: DataFrame, dfFrac: Int = 10): DataFrame = {
    val ids = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val df = ids.groupBy(col("term")).agg(count(lit(1)).as("df"))
    df.crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .filter(col("df") * dfFrac <= col("n_docs"))
      .agg(coalesce(sum(expr("df * (df - 1) div 2")), lit(0L))
        .cast("bigint").as("bound"))
  }

  val LmUnit = 1000000L

  /** Bigram language-model quality score — the KenLM-style perplexity
    * filter of LLM data pipelines (CCNet, Gopher/MassiveText rules):
    * score(doc) = mean over its bigrams of ln p(b|a), with p estimated
    * from the corpus itself (occurrences of `a` as a bigram prefix as the
    * denominator — the exact conditional MLE). High-scoring docs are
    * "typical"; low scores flag noise/garble for gating.
    *
    * Scale design: wordcount-shaped like TF-IDF — the bigram stream is a
    * partition-local explode, the model (vocab² rows at most) broadcasts
    * back into the stream, and per-doc totals sum INTEGRAL micro-units
    * (floor(1e6·ln p)) so the cross-engine sum is exact and
    * order-independent (float-sum rule); the single double division per
    * doc happens on already-exact integers.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    // 1-based element_at mirrors the oracle's DuckDB list indexing
    val bi = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('a', element_at(toks, i), 'b', element_at(toks, i + 1)))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val cnt2 = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val cnt1 = bi.groupBy(col("a")).agg(count(lit(1)).as("c1"))
    val model = cnt2.join(cnt1, "a")
      .select(col("a"), col("b"),
        floor(log(col("c2") / col("c1")) * LmUnit).cast("bigint").as("w_u"))
    bi.join(broadcast(model), Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("w_u")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s") / (col("n_bigrams") * lit(1000000.0)), 4).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  /** Stupid-backoff trigram LM (Brants et al. 2007 — the scoring scheme
    * of web-scale LMs before KenLM): the model trains on the 90% hash
    * split (the same engine-stable doc split contamination uses) and
    * scores EVERY document, so held-out docs genuinely exercise the
    * backoff chain: trigram MLE → 0.4·bigram → 0.4²·unigram → 0.4²·1/N
    * for OOV. Unlike [[lmScore]]'s self-trained bigram MLE (where every
    * event is seen), this is the real train/apply split of a quality
    * filter, and `n_backoff` reports how often the top level missed.
    *
    * Scale shape: wordcount-family. Counts are exact integer aggregates
    * of the train split's token stream; context totals derive from the
    * model frames themselves (one extra vocab-sized aggregate, not a
    * second corpus pass). Model joins are left as equi-joins for the
    *  planner: vocab-bounded models auto-broadcast under AQE, while an
    * open-domain trigram table at 100 TB correctly falls back to a
    * shuffled join — never force-broadcast an unbounded model. Per-doc
    * sums are floored micro-units (float-sum rule).
    */
  val BackoffAlpha = 0.4

  def lmBackoff(s: SparkSession, dir: String): DataFrame =
    lmBackoffScored(s, dir).orderBy(col("doc_id"))

  /** [[lmBackoff]] without the presentation sort — the per-doc
    * (doc_id, n_trigrams, n_backoff, lm_score) frame consumers feed into
    * further dataflow ([[pplBuckets]], [[pplIntake]]). */
  private[graft] def lmBackoffScored(s: SparkSession, dir: String): DataFrame =
    lmScoreWith(lmTokens(s, dir), lmModelMemo(s, dir))

  /** The 90%-train-split backoff model, fit ONCE per (session, dir): the
    * deterministic `lmModelFrom` chain is recomputed verbatim by THREE
    * registry queries (text_lm_backoff, text_ppl_buckets,
    * text_ppl_intake — the r15 bench's three slowest text rows), so the
    * vocab-bounded count frames session-memo under the
    * [[graft.ops.Caching.memoGroup]] contract — exactly the frames
    * [[graft.sources.IndexStore.buildPpl]] persists to parquet, never
    * the corpus-sized score frame (scoring stays a per-consumer pass:
    * each consumer scores its own doc slice against the shared counts).
    * Measured A/B in BENCH.md round 16. The fit caches its train-token
    * scan while the six count frames materialize (one tokenize feeds
    * five aggregates), then memoGroup releases it. */
  private[graft] def lmModelMemo(s: SparkSession, dir: String): LmModel = {
    val fs = Caching.memoGroup(s, s"lm90:$dir") {
      val isEval = expr(
        s"pmod(${graft.functions.SharedHash.spark48("cast(doc_id AS STRING)")}, 10)") === 9
      val train = lmTokens(s, dir).filter(!isEval).cache()
      train.count()
      val m = lmModelFrom(train)
      (Seq(m.tri, m.ctx2, m.bi, m.ctx1, m.uni, m.nTok), Seq(train))
    }
    LmModel(fs(0), fs(1), fs(2), fs(3), fs(4), fs(5))
  }

  /** The frozen stupid-backoff model: five exact count frames plus the
    * 1-row token total — everything [[lmScoreWith]] needs, and exactly
    * what [[graft.sources.IndexStore.buildPpl]] persists (integer counts
    * round-trip parquet bit-exactly, so a reloaded model scores
    * identically to the in-query fit). */
  private[graft] final case class LmModel(tri: DataFrame, ctx2: DataFrame,
      bi: DataFrame, ctx1: DataFrame, uni: DataFrame, nTok: DataFrame)

  private[graft] def lmTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def lmTrigrams(df: DataFrame): DataFrame =
    df.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> named_struct(" +
          "'a', element_at(toks, i), 'b', element_at(toks, i + 1), " +
          "'c', element_at(toks, i + 2)))")).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))

  /** Fit the backoff model's count tables on `train` (doc_id, toks). */
  private[graft] def lmModelFrom(train: DataFrame): LmModel = {
    val triM = lmTrigrams(train).groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("c3"))
    val ctx2 = triM.groupBy(col("a"), col("b")).agg(sum(col("c3")).as("c12"))
    val biM = train.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> named_struct(" +
          "'a2', element_at(toks, i), 'b2', element_at(toks, i + 1)))")).as("g"))
      .select(col("g.a2").as("a2"), col("g.b2").as("b2"))
      .groupBy(col("a2"), col("b2")).agg(count(lit(1)).as("c23"))
    val ctx1 = biM.groupBy(col("a2")).agg(sum(col("c23")).as("c2"))
    val uniM = train.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nTok = train.select(explode(col("toks")).as("w"))
      .agg(count(lit(1)).as("n_tok"))
    LmModel(triM, ctx2, biM, ctx1, uniM, nTok)
  }

  /** Score `docs` (doc_id, toks) under a fitted/frozen model — per-doc
    * score depends only on the doc's own trigrams plus the model tables,
    * so restricting `docs` to a delta restricts cost to the delta. */
  private[graft] def lmScoreWith(docs: DataFrame, m: LmModel): DataFrame =
    lmTrigrams(docs)
      .join(m.tri, Seq("a", "b", "c"), "left")
      .join(m.ctx2, Seq("a", "b"), "left")
      .join(m.bi, col("a2") === col("b") && col("b2") === col("c"), "left")
      .join(m.ctx1.withColumnRenamed("a2", "a1"), col("a1") === col("b"), "left")
      .join(m.uni, col("w") === col("c"), "left")
      .crossJoin(broadcast(m.nTok))
      .withColumn("lnp", log(
        when(col("c3").isNotNull, col("c3") / col("c12"))
          .when(col("c23").isNotNull, lit(BackoffAlpha) * (col("c23") / col("c2")))
          .when(col("c1").isNotNull,
            lit(BackoffAlpha * BackoffAlpha) * (col("c1") / col("n_tok")))
          .otherwise(lit(BackoffAlpha * BackoffAlpha) * (lit(1.0) / col("n_tok")))))
      .withColumn("w_u", floor(col("lnp") * lit(1000000)).cast("bigint"))
      .withColumn("bo", when(col("c3").isNull, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("bo")).as("n_backoff"),
        sum(col("w_u")).as("s"))
      .select(col("doc_id"), col("n_trigrams"), col("n_backoff"),
        round(col("s") / (col("n_trigrams") * lit(1000000.0)), 4).as("lm_score"))

  /** Docs sampled per language for the tercile thresholds — the same
    * bounded-state bottom-k-by-hash discipline as
    * [[graft.ops.Sketches.quantileSketch]]. */
  val PplSampleK = 512

  /** CCNet-style perplexity buckets (Wenzek et al. 2019 §4.3): every doc
    * gets a per-LANGUAGE quality tercile — `head` (best third by LM
    * score), `middle`, `tail` — the split CCNet materializes so
    * downstream consumers can choose how deep into the crawl to reach.
    * Score = the stupid-backoff LM of [[lmBackoff]] (higher mean log-prob
    * = lower perplexity = better); language = the stopword-profile vote
    * of [[TextAnalysis.langId]], so the whole pipeline is self-contained
    * on the corpus plus the train split the LM fits on.
    *
    * The tercile THRESHOLDS come from a deterministic bottom-
    * [[PplSampleK]]-by-[[graft.functions.SharedHash]] sample per language
    * (the [[graft.ops.Sketches.quantileRollup]] recipe: one bounded-state
    * [[graft.functions.TopKBy]] aggregate per language, O(k) partials,
    * map-side reduction), NOT an exact corpus sort — at 100 TB an exact
    * per-language percentile would corpus-sort every language shard,
    * while the sample's ±O(1/√k) rank error moves a negligible sliver of
    * docs across a bucket edge. Thresholds (one tiny row per language)
    * broadcast back into a pure per-doc bucket projection, so the corpus
    * itself never shuffles for the split. The DuckDB oracle replays
    * sample, order statistics, and bucket edges exactly, so the bucket
    * ASSIGNMENTS are hash-checked end to end. */
  def pplBuckets(s: SparkSession, dir: String,
      sampleK: Int = PplSampleK): DataFrame = {
    graft.functions.TopKBy.register(s)
    val lg = TextAnalysis.predictedLang(Tables.documents(s, dir))
    val d = lmBackoffScored(s, dir)
      .select(col("doc_id"), col("lm_score"))
      .join(lg, "doc_id")
      .cache()
    d.count() // force: the sample pick and the final projection both read it
    val out = bucketBy(d, pplThresholds(d, sampleK))
      .orderBy(col("doc_id"))
    Caching.materializeAndRelease(out, d)
  }

  /** Per-language (lang, t_lo, t_hi) tercile thresholds over a
    * (doc_id, lm_score, lang) frame, from the deterministic bottom-
    * `sampleK`-by-hash sample — see [[pplBuckets]] for the scale
    * rationale. Caller registers [[graft.functions.TopKBy]]. */
  private[graft] def pplThresholds(d: DataFrame, sampleK: Int): DataFrame = {
    val h = graft.functions.SharedHash.spark48("cast(doc_id AS string)")
    val picked = d.groupBy(col("lang"))
      .agg(expr(s"topk_by(CAST(-($h) AS DOUBLE), doc_id, $sampleK)").as("kept"))
      .select(col("lang"), explode(col("kept")).as("e"))
      .select(col("lang"), col("e.tag").as("doc_id"))
    val ws = Window.partitionBy(col("lang"))
      .orderBy(col("lm_score").asc, col("doc_id").asc)
    val wn = Window.partitionBy(col("lang"))
    broadcast(picked).join(d, Seq("lang", "doc_id"))
      .withColumn("r", row_number().over(ws))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("lang"))
      .agg(max(when(col("r") === ceil(col("n") / lit(3.0)), col("lm_score"))).as("t_lo"),
        max(when(col("r") === ceil(col("n") * lit(2) / lit(3.0)), col("lm_score"))).as("t_hi"))
  }

  /** The pure bucket projection: (doc_id, lang, lm_score) × broadcast
    * thresholds → (doc_id, lang, lm_score, bucket). Unordered. The
    * threshold join is LEFT so a doc whose voted language has no
    * standing-side threshold row (possible under the intake contract,
    * where edges come from STANDING docs only) surfaces as an explicit
    * `unscored` verdict instead of silently vanishing from the gate's
    * output (r12 ADVICE); a threshold row always carries both edges, so
    * one NULL test is the full missing-language predicate. */
  private[graft] def bucketBy(d: DataFrame, th: DataFrame): DataFrame =
    d.join(broadcast(th), Seq("lang"), "left")
      .withColumn("bucket",
        when(col("t_lo").isNull, "unscored")
          .when(col("lm_score") <= col("t_lo"), "tail")
          .when(col("lm_score") <= col("t_hi"), "middle")
          .otherwise("head"))
      .select(col("doc_id"), col("lang"), col("lm_score"), col("bucket"))

  /** The CCNet DEPLOYMENT shape of [[pplBuckets]]: the LM and the tercile
    * thresholds belong to the STANDING corpus (fit once), and each
    * incoming crawl delta (the shared hash-bucket-9 split) is scored and
    * bucketed against them — an intake quality gate, not a corpus-wide
    * re-split. Thresholds here sample from STANDING docs only (unlike
    * [[pplBuckets]], whose split covers the whole corpus), so a delta doc
    * CANNOT move the bucket edges — the property that makes per-shard
    * verdicts reproducible while a crawl streams in. This variant fits
    * the model in-query; [[pplIntakeIndexed]] scores against the
    * PERSISTED artifact ([[graft.sources.IndexStore.buildPpl]]) — the
    * form a recurring intake job runs, where only the delta is read. */
  def pplIntake(s: SparkSession, dir: String,
      sampleK: Int = PplSampleK): DataFrame = {
    graft.functions.TopKBy.register(s)
    val lg = TextAnalysis.predictedLang(Tables.documents(s, dir))
    val isDelta =
      expr(s"pmod(${graft.functions.SharedHash.spark48("cast(doc_id AS string)")}, 10)") === 9
    val d = lmBackoffScored(s, dir)
      .select(col("doc_id"), col("lm_score"))
      .join(lg, "doc_id")
      .withColumn("is_delta", isDelta)
      .cache()
    d.count() // force: threshold sample + delta projection both read it
    val th = pplThresholds(
      d.filter(!col("is_delta")).select(col("doc_id"), col("lm_score"), col("lang")),
      sampleK)
    val out = bucketBy(
      d.filter(col("is_delta")).select(col("doc_id"), col("lm_score"), col("lang")), th)
      .orderBy(col("doc_id"))
    Caching.materializeAndRelease(out, d)
  }

  /** [[pplIntake]] against the PERSISTED standing LM + thresholds
    * ([[graft.sources.IndexStore.standingPplModel]]): only the delta's
    * documents are tokenized and scored — the standing corpus is never
    * re-read (its contribution is the frozen count tables, vocabulary-
    * sized, and the language-count-sized threshold frame). Output is
    * row-identical to the in-query variant (same oracle): integer count
    * tables round-trip parquet exactly, and scoring under fixed counts
    * is the same left-join chain wherever the counts came from. */
  def pplIntakeIndexed(s: SparkSession, dir: String): DataFrame = {
    val art = graft.sources.IndexStore.standingPplModel(s, dir)
    val isDelta =
      expr(s"pmod(${graft.functions.SharedHash.spark48("cast(doc_id AS string)")}, 10)") === 9
    val deltaDocs = Tables.documents(s, dir).filter(isDelta)
    val scored = lmScoreWith(
      deltaDocs.select(col("doc_id"), split(col("text"), " ").as("toks")), art.model)
      .select(col("doc_id"), col("lm_score"))
      .join(TextAnalysis.predictedLang(deltaDocs), "doc_id")
    bucketBy(scored, art.thresholds).orderBy(col("doc_id"))
  }

  /** Collocation mining: the topK adjacent-bigram pairs ranked by
    * association strength. The score is the PMI numerator as an EXACT
    * integer — lift = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b), emitted in
    * 1e-4 units via BIGINT integer division (identical truncation in Spark
    * `DIV` and DuckDB `//` for non-negative operands, so the oracle is
    * float-free). log(lift) = PMI is monotone in lift, so the ranking IS
    * the PMI ranking without either engine evaluating a transcendental.
    * Overflow headroom: n_ab·N·10⁴ ≤ N²·10⁴, inside int64 for corpora to
    * ~10⁸ tokens per fitted shard; beyond that the count pass shards first.
    *
    * Scale shape: wordcount-shaped — the bigram zip is partition-local,
    * only (pair, partial count) rows shuffle, and the minPair cutoff prunes
    * the long tail before the joins. The unigram table and the 1-row total
    * are broadcast (vocabulary-sized by construction). */
  def collocationPmi(s: SparkSession, dir: String, minPair: Long = 30,
      topK: Int = 50): DataFrame = {
    val toks = Tables.documents(s, dir).select(split(col("text"), " ").as("tokens"))
    val uni = toks.select(explode(col("tokens")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val tot = uni.agg(sum(col("n")).as("n_total"))
    val pairs = toks.filter(size(col("tokens")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(tokens) - 1),
          |  i -> named_struct('w1', element_at(tokens, i),
          |                    'w2', element_at(tokens, i + 1)))"""
          .stripMargin.replaceAll("\n", " "))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
      .join(broadcast(uni.select(col("w").as("w1"), col("n").as("n_a"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("n").as("n_b"))), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_q4", expr("(n_ab * n_total * 10000) DIV (n_a * n_b)"))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift_q4"))
      .orderBy(col("lift_q4").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Source-level redundancy matrix: pairwise tf-idf cosine between
    * SOURCES (each source's docs folded into one term vector) — the
    * curation signal "which sources substantially duplicate each other",
    * the soft-similarity twin of [[Dedup.sourceDupMatrix]]'s exact-digest
    * overlap (digests see only verbatim copies; this sees rewordings and
    * templated near-dups). Weighting is tf × ln((S+1)/(sf+1)) in integral
    * milli-units, where sf = number of sources containing the term — the
    * inter-source analog of document idf, so corpus-wide boilerplate
    * contributes ~nothing to any pair.
    *
    * Scale shape: the corpus-sized work is ONE wordcount aggregate to
    * (source, term, tf); everything after runs on vocabulary-sized frames
    * and the |S|²/2 pair space (|S| = #sources — tens, not millions).
    * Exact BIGINT dots and norms per the float-sum rule; one rounded
    * double division per pair. */
  def sourceCosineMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val sf = tf.groupBy(col("term")).agg(count(lit(1)).as("sf"))
    val nSrc = docs.agg(countDistinct(col("source")).as("n_src"))
    val wu = tf.join(sf, "term")
      .crossJoin(broadcast(nSrc))
      .select(col("source"), col("term"),
        floor(col("tf") * log((col("n_src") + 1) / (col("sf") + 1)) * 1000)
          .cast("bigint").as("w"))
    val nrm = wu.groupBy(col("source"))
      .agg(sum(col("w") * col("w")).as("nrm"))
    wu.toDF("src_a", "term", "wa").join(wu.toDF("src_b", "term", "wb"), "term")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
      .join(nrm.toDF("src_a", "na"), "src_a")
      .join(nrm.toDF("src_b", "nb"), "src_b")
      // a source whose every term is corpus-universal has zero norm:
      // no direction, no cosine (identical guard in the oracle)
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("cosine",
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6))
      .select(col("src_a"), col("src_b"), col("cosine"))
      .orderBy(col("src_a"), col("src_b"))
  }
}

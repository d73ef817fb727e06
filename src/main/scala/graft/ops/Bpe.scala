package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + encoding — the tokenizer-fitting
  * pass an LLM training-data pipeline runs over the cleaned corpus
  * (Sennrich et al. 2016's word-frequency formulation, the algorithm
  * behind GPT-2/SentencePiece BPE vocabularies).
  *
  * Scale design: the corpus-sized work is exactly two wordcount-shaped
  * passes — the initial word-frequency aggregate and the final encode
  * projection. Every training round operates on the DISTINCT-WORD table
  * (vocabulary-sized: millions of rows at 100 TB, not trillions), so the
  * per-merge cost is an aggregate over a frame that is orders of
  * magnitude smaller than the corpus and cached once. The per-round
  * winner is a 1-row collect of an argmax — the same bounded-driver
  * pattern as the PQ codebook fit ([[Similarity]]).
  *
  * Symbol encoding: a word's symbol sequence is its characters each
  * wrapped in `<…>` (the corpus charset is `[a-z ]`, so the delimiters
  * cannot collide — asserted in the spec). The pair `(a, b)` merging into
  * `ab` is then literally `replace(s, "<a><b>", "<ab>")`: one
  * left-to-right non-overlapping pass, which is exactly one BPE merge
  * step, and string `replace` has identical semantics in Spark and DuckDB
  * — that equivalence is what lets the DuckDB oracle replay the whole
  * training trajectory as one chained CTE per merge (the PageRank-oracle
  * pattern) and the encoder as a literal replace chain from the stashed
  * merge table.
  *
  * Determinism: pair counts are exact integer sums of word frequencies;
  * the winner is argmax with a full tie-break (count DESC, left ASC,
  * right ASC); encoding applies merges in rank order, one pass each. No
  * floats anywhere until the final ratio, which divides two exact longs.
  */
object Bpe {

  /** Merge rounds the harness queries train. Small enough to keep the
    * chained-CTE oracle readable; the loop itself is O(rounds). */
  val NumMerges = 12

  /** Learned merge table, stashed when a BPE query runs so the encode
    * oracle can replay the replace chain from literals (stash-then-
    * generate, like the ANN centroids). */
  @volatile private[graft] var fittedMerges: Option[Seq[(String, String, Long)]] = None

  /** `"abc"` → `"<a><b><c>"`. */
  private def wrap(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "(.)", "<$1>")

  /** Word-frequency table of a docs frame — the only corpus-sized pass in
    * training. */
  private def wordFreqOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of each vocab entry, weighted by word
    * frequency. `s` is the wrapped form; symbols recovered by splitting
    * the interior on `><`. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"),
        split(expr("substring(s, 2, length(s) - 2)"), "><").as("tk"))
      .filter(size(col("tk")) >= 2) // sequence(1, 0) would run DESCENDING in Spark
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> named_struct('a', element_at(tk, i), 'b', element_at(tk, i + 1)))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("c"))

  /** Train `k` merges over a docs frame. Returns (rank-ordered merge
    * list, FINAL merged vocab frame `(s, freq)`). The vocab is cached
    * once; each round adds one codegen'd `replace` projection on top of
    * it — so the returned final frame is the cached base plus the full
    * replace chain, and reading it out costs a vocab-sized scan, never a
    * second corpus pass. */
  private[graft] def fitFull(docs: DataFrame,
      k: Int = NumMerges): (Seq[(String, String, Long)], DataFrame) = {
    var vocab = wordFreqOf(docs).select(wrap(col("word")).as("s"), col("freq")).cache()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    while (r < k) {
      val win = pairCounts(vocab)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (win.isEmpty) { r = k } // vocab fully merged — stop early
      else {
        val (a, b, c) = (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
        merges += ((a, b, c))
        vocab = vocab.withColumn("s",
          expr(s"replace(s, '<$a><$b>', '<$a$b>')"))
        r += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Train `k` merges over `dir`'s documents table (spec/demo entry —
    * the harness queries read the PERSISTED artifact via
    * [[graft.sources.IndexStore.standingBpe]] instead of refitting). */
  def fit(s: SparkSession, dir: String,
      k: Int = NumMerges): Seq[(String, String, Long)] =
    fitFull(Tables.documents(s, dir), k)._1

  /** Harness query: the learned merge table itself — rank, the two merged
    * symbols, and the weighted pair count that won the round, read from
    * the PERSISTED standing artifact (fit once per corpus, like the ANN
    * index — a real pipeline ships the merge table, it doesn't refit per
    * job). The oracle replays the full trajectory (pair-count → argmax →
    * replace) as one chained CTE per round. */
  def merges(s: SparkSession, dir: String): DataFrame = {
    val m = graft.sources.IndexStore.standingBpeMerges(s, dir)
    fittedMerges = Some(m)
    import s.implicits._
    m.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1, a, b, c) }
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
      .select(col("merge_rank").cast("int"), col("lhs"), col("rhs"),
        col("pair_count"))
      .orderBy(col("merge_rank"))
  }

  /** Harness query: the final symbol vocabulary after the merge budget —
    * the tokenizer artifact a dataloader ships. Reads the PERSISTED
    * final merged vocab frame (vocabulary-sized), so the readout costs
    * one explode + aggregate over it — no corpus pass and no refit.
    * Occurrence counts weight each distinct word's symbols by the word's
    * corpus frequency. Fully tie-broken (count DESC, symbol ASC). */
  def vocab(s: SparkSession, dir: String): DataFrame = {
    fittedMerges = Some(graft.sources.IndexStore.standingBpeMerges(s, dir))
    graft.sources.IndexStore.standingBpeVocab(s, dir)
      .select(col("freq"),
        explode(split(expr("substring(s, 2, length(s) - 2)"), "><")).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("freq")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("symbol"))
  }

  /** Harness query: encode every document with the learned merges and
    * report per-doc whitespace-token vs BPE-token counts (the
    * tokens-per-word compression a tokenizer fit is judged by). The
    * merge table comes FROZEN from the standing artifact; the encode is
    * ONE codegen projection — a chain of `replace` calls in merge-rank
    * order over each wrapped word — so the corpus pass never shuffles
    * anything but the final per-doc aggregate. */
  def encode(s: SparkSession, dir: String): DataFrame = {
    val m = graft.sources.IndexStore.standingBpeMerges(s, dir)
    fittedMerges = Some(m)
    encodeSymbolsOf(Tables.documents(s, dir), m)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
      .withColumn("bpe_ratio", round(col("n_bpe") / col("n_words"), 4))
      .orderBy(col("doc_id"))
  }

  /** Per-LANGUAGE tokenizer fertility (BPE symbols per whitespace word)
    * under the frozen standing merge table — the dashboard a tokenizer
    * fit is audited with per language: a vocabulary trained mostly on one
    * language under-merges the others, and their fertility rises.
    * Grouped by the corpus's LABELED `lang` column (5 populations in the
    * harness corpus) — the realistic key for a curated corpus; the
    * stopword-profile vote stays its own oracled query (text_langid) and
    * votes a single language on this corpus, which would make the
    * dashboard a constant.
    *
    * Scale shape: wordcount — one exploded corpus pass for symbol counts
    * (the merge chain is a broadcast-sized literal inside one projection),
    * a doc_id-sized join onto the narrow (doc_id, lang) projection, and a
    * languages-sized final aggregate. Nothing wider than
    * (doc_id, two counts, lang) ever shuffles. */
  def fertilityByLang(s: SparkSession, dir: String): DataFrame = {
    val m = graft.sources.IndexStore.standingBpeMerges(s, dir)
    fittedMerges = Some(m)
    val docs = Tables.documents(s, dir)
    val perDoc = encodeSymbolsOf(docs, m)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
    perDoc.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe")).as("n_bpe"))
      .withColumn("fertility", round(col("n_bpe") / col("n_words"), 4))
      .orderBy(col("lang"))
  }

  /** The corpus's word-frequency table ENCODED under a FIXED merge table
    * — (s, freq) with s fully merged. One wordcount-shaped corpus pass +
    * a vocab-sized codegen replace chain; the frame the compression-drift
    * metric ([[graft.sources.IndexStore.bpeCompressionDrift]]) derives
    * its current-corpus stats from. */
  private[graft] def encodedVocabOf(docs: DataFrame,
      m: Seq[(String, String, Long)]): DataFrame = {
    val chain = m.foldLeft("s0") { case (acc, (a, b, _)) =>
      s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
    wordFreqOf(docs).withColumn("s0", wrap(col("word")))
      .select(expr(chain).as("s"), col("freq"))
  }

  /** Per-word symbol counts under a FIXED merge table — the stateless
    * projection the batch aggregate above and the streaming intake share
    * (the tokenizer is fitted offline; applying it is pure, so stream
    * output ≡ batch output row for row — parity spec in StreamingSpec). */
  def encodeSymbolsOf(docs: DataFrame, m: Seq[(String, String, Long)]): DataFrame = {
    val chain = m.foldLeft("s0") { case (acc, (a, b, _)) =>
      s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .withColumn("s0", wrap(col("word")))
      .withColumn("enc", expr(chain))
      // symbol count = count('><') + 1; each '><' is 2 chars
      .withColumn("n_sym", expr(
        "(length(enc) - length(replace(enc, '><', ''))) div 2 + 1"))
      .select(col("doc_id"), col("word"), col("n_sym"))
  }
}

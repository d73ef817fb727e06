package graft.ops

import graft.SparkSpec

/** BPE trainer/encoder — hand-computed merge trajectories.
  *
  * Fixture A (weighted counts + early stop): words aaab×3, ab, b, ba, aab.
  *   round 1: (a,a) weight 7 wins; round 2: (a,b) 4; round 3: (aa,ab) 3;
  *   round 4: tie at 1 between (aa,b) and (b,a) — lex break picks (aa,b);
  *   round 5: (b,a); round 6: no pairs left → early stop at 5 merges.
  *
  * Fixture B (tie-breaks + merge budget): 14 two-char words, every pair
  * count 1 → the 12-merge budget consumes the first 12 in lexicographic
  * order, leaving ya/yb unmerged at 2 symbols each.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDocs(docs: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("bpe: weighted merge trajectory with full tie-break and early stop") {
    val dir = tmpDocs(Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab b ba"),
      (3L, "aab")))
    val m = Bpe.fit(spark, dir)
    assert(m === Seq(
      ("a", "a", 7L), ("a", "b", 4L), ("aa", "ab", 3L),
      ("aa", "b", 1L), ("b", "a", 1L)),
      "exact trajectory: counts weighted by word freq, ties broken lex, early stop")
  }

  test("bpe: merges query output matches the fit, rank-ordered") {
    val dir = tmpDocs(Seq((1L, "aaab aaab ab"), (2L, "aaab b ba"), (3L, "aab")))
    val rows = Bpe.merges(spark, dir).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      === Seq((1, "a", "a", 7L), (2, "a", "b", 4L), (3, "aa", "ab", 3L),
        (4, "aa", "b", 1L), (5, "b", "a", 1L)))
  }

  test("bpe: the merge budget caps training; unmerged words encode to >1 symbol") {
    val dir = tmpDocs(Seq(
      (1L, "ab cd ef gh ij kl mn op"),
      (2L, "qr st uv wy ya yb")))
    val m = Bpe.fit(spark, dir)
    assert(m.length === Bpe.NumMerges, "budget consumed exactly")
    assert(m.map(x => (x._1, x._2)) === Seq(
      ("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"), ("i", "j"), ("k", "l"),
      ("m", "n"), ("o", "p"), ("q", "r"), ("s", "t"), ("u", "v"), ("w", "y")),
      "all counts tie at 1 → pure lexicographic order; ya/yb fall past the budget")

    val enc = Bpe.encode(spark, dir).collect()
    val byDoc = enc.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byDoc(1L) === ((8L, 8L, 1.0)), "fully merged doc: 1 symbol per word")
    assert(byDoc(2L) === ((6L, 8L, 1.3333)),
      "ya/yb stay 2 symbols: 4*1 + 2*2 = 8 over 6 words")
  }

  test("bpe: final vocabulary readout is the merged symbols, freq-weighted") {
    val dir = tmpDocs(Seq(
      (1L, "ab cd ef gh ij kl mn op"),
      (2L, "qr st uv wy ya yb")))
    val v = Bpe.vocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v === Seq(("y", 2L), ("a", 1L), ("ab", 1L), ("b", 1L), ("cd", 1L),
      ("ef", 1L), ("gh", 1L), ("ij", 1L), ("kl", 1L), ("mn", 1L), ("op", 1L),
      ("qr", 1L), ("st", 1L), ("uv", 1L), ("wy", 1L)),
      "12 merged words -> single symbols; ya/yb contribute y/a/b singles")
  }

  test("bpe: persisted artifact round-trips the fit exactly (merges + vocab)") {
    val dir = tmpDocs(Seq((1L, "aaab aaab ab"), (2L, "aaab b ba"), (3L, "aab")))
    val root = java.nio.file.Files.createTempDirectory("bpe_idx").toString
    graft.sources.IndexStore.buildBpe(Tables.documents(spark, dir), root)
    // artifact-read ≡ refit: the frozen merge table IS the fit
    assert(graft.sources.IndexStore.readBpeMerges(spark, root)
      === Bpe.fit(spark, dir))
    // the persisted final vocab frame replays the full replace chain:
    // reading it out must equal re-deriving symbols from the corpus
    val fromArtifact = graft.sources.IndexStore.readBpeVocab(spark, root)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val (_, fromFit) = Bpe.fitFull(Tables.documents(spark, dir))
    assert(fromArtifact ===
      fromFit.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
  }

  test("bpe: queries are served by the standing artifact, not a refit " +
      "(one build per corpus dir)") {
    val dir = tmpDocs(Seq((1L, "aaab aaab ab"), (2L, "aaab b ba"), (3L, "aab")))
    // first query builds the memoized artifact; the rest read it
    val m = Bpe.merges(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m === Bpe.fit(spark, dir), "query output ≡ direct fit")
    // vocab derives from the persisted vocab-sized frame — its plan must
    // not rescan the documents table
    val vocabInputs = Bpe.vocab(spark, dir).inputFiles.mkString(",")
    assert(!vocabInputs.contains("documents.parquet"),
      s"vocab readout reads the artifact, not the corpus: $vocabInputs")
    // encode DOES scan the corpus (it encodes every doc) but under the
    // frozen merges; its totals must match the budget-capped trajectory
    assert(Bpe.encode(spark, dir).count() === 3L)
  }

  test("bpe: compression drift is 0 on the fit corpus, rises on vocabulary " +
      "turnover, and maintainBpe's triggered refit restores it") {
    import graft.sources.IndexStore
    // fit corpus: repeated two-char words the merge budget fully compresses
    val fitDocs = (0 until 8).map(i =>
      (i.toLong, "ab ab cd cd ef ef gh gh ij kl mn op"))
    val dirA = tmpDocs(fitDocs)
    val root = java.nio.file.Files.createTempDirectory("bpe_drift").toString
    IndexStore.buildBpe(Tables.documents(spark, dirA), root)
    assert(IndexStore.bpeCompressionDrift(spark, root,
      Tables.documents(spark, dirA)) === 0.0,
      "frozen merges on their own fit corpus: exact zero drift")

    // drifted corpus: letters the fit never saw — frozen merges leave
    // every word at character level, tokens-per-word degrades
    val dirB = tmpDocs(fitDocs ++ (100 until 140).map(i =>
      (i.toLong, "qrs tuv wxy qrs tuv wxy qrs tuv")))
    val drift = IndexStore.bpeCompressionDrift(spark, root,
      Tables.documents(spark, dirB))
    assert(drift > 0.2, s"vocabulary turnover must register: $drift")

    assert(!IndexStore.maintainBpe(spark, root,
      Tables.documents(spark, dirB), maxDrift = drift + 0.1),
      "under the threshold: no refit")
    assert(IndexStore.maintainBpe(spark, root,
      Tables.documents(spark, dirB), maxDrift = drift / 2),
      "crossed: refit runs")
    assert(IndexStore.bpeCompressionDrift(spark, root,
      Tables.documents(spark, dirB)) === 0.0,
      "after the refit the merges match the corpus again")
  }

  test("bpe: per-language fertility trigger fires on a language-skewed " +
      "delta that leaves global compression flat (r12 verdict stretch)") {
    import graft.sources.IndexStore
    def tmpLang(docs: Seq[(Long, String, String)]): String = {
      val tmp = java.nio.file.Files.createTempDirectory("bpe_fert").toString
      docs.toDF("doc_id", "text", "lang")
        .write.parquet(s"$tmp/documents.parquet")
      tmp
    }
    // fit corpus: a large majority language the merges fully compress
    val fit = (0 until 60).map(i =>
      (i.toLong, "ab ab cd cd ef ef gh gh ij ij kl kl", "en"))
    val root = java.nio.file.Files.createTempDirectory("bpe_fert_idx").toString
    IndexStore.buildBpe(Tables.documents(spark, tmpLang(fit)), root)
    // skewed delta: TWO new-vocab docs in a new language — a sliver of
    // the corpus (global drift small) whose own fertility is char-level
    val skewed = Tables.documents(spark, tmpLang(fit ++ Seq(
      (900L, "qrs tuv wxy zab qrs tuv wxy zab", "eo"),
      (901L, "wxy zab qrs tuv wxy zab qrs tuv", "eo"))))
    val global = IndexStore.bpeCompressionDrift(spark, root, skewed)
    val fert = IndexStore.bpeFertilityDrift(spark, root, skewed)
    assert(fert > global * 3,
      s"per-language rise ($fert) must dominate the diluted global ($global)")
    assert(!IndexStore.maintainBpe(spark, root, skewed,
      maxDrift = global * 2),
      "global trigger alone: the skew is invisible, no refit")
    assert(IndexStore.maintainBpe(spark, root, skewed,
      maxDrift = global * 2, maxFertilityRise = fert / 2),
      "fertility trigger: refit runs")
    assert(IndexStore.bpeFertilityDrift(spark, root, skewed) === 0.0,
      "after the refit every language's baseline matches the corpus")
  }

  test("bpe: a pre-fertility artifact (no fertility table) reads as " +
      "no-signal, and maintainBpe with a finite rise cap does not crash") {
    import graft.sources.IndexStore
    val tmp = java.nio.file.Files.createTempDirectory("bpe_prefert").toString
    (0 until 30).map(i => (i.toLong, "ab ab cd cd ef ef", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$tmp/documents.parquet")
    val docs = Tables.documents(spark, tmp)
    val root = java.nio.file.Files.createTempDirectory("bpe_prefert_idx")
      .toString
    IndexStore.buildBpe(docs, root)
    // simulate an index persisted before per-language baselines existed
    // (r13 ADVICE: the fertility read crashed instead of honoring the
    // documented 'returns 0 on a baseline-free artifact' contract)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(s"$root/fertility"))
    assert(IndexStore.bpeFertilityDrift(spark, root, docs) === 0.0)
    assert(!IndexStore.maintainBpe(spark, root, docs,
      maxDrift = 1.0, maxFertilityRise = 0.5),
      "no drift, no fertility signal: no refit, and no crash")
  }

  test("bpe: per-language fertility is the encode frame aggregated by the " +
    "labeled lang column — full driver-side replay at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rep = Bpe.fertilityByLang(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // replay: per-doc encode counts joined with the label column, both
    // from already-spec'd building blocks, aggregated in Scala
    val perDoc = Bpe.encode(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lang = sf("documents", dir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.toSeq.groupBy { case (id, _) => lang(id) }
      .map { case (lg, docs) =>
        val w = docs.map(_._2._1).sum
        val b = docs.map(_._2._2).sum
        lg -> (docs.size.toLong, w, b,
          BigDecimal(b.toDouble / w).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(rep.keySet === expected.keySet)
    for ((lg, e) <- expected) assert(rep(lg) === e, s"lang $lg")
    // fertility >= 1 by construction: every word is >= 1 symbol
    for ((_, (_, _, _, f)) <- rep) assert(f >= 1.0)
  }

  test("bpe: empty corpus and empty text are safe") {
    val dir = tmpDocs(Seq((1L, "")))
    assert(Bpe.fit(spark, dir).isEmpty)
    assert(Bpe.merges(spark, dir).count() === 0L)
    assert(Bpe.encode(spark, dir).count() === 0L)
    assert(Bpe.vocab(spark, dir).count() === 0L)
  }
}

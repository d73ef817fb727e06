package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus indexing & statistics trio: inverted-index head (posting lists),
  * collocation PMI ranking, and CCNet-style boilerplate segment removal.
  * Handcrafted fixtures pin the exact semantics; sf0.001 cross-checks pin
  * the operators against independent recomputations of their definitions. */
class IndexingSpec extends SparkSpec {
  import spark.implicits._

  /** Write a throwaway documents.parquet so the (spark, dir) entry points
    * run against handcrafted content. */
  private def docsDir(texts: (Long, String)*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("idx").toString
    texts.map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  // --- inverted index ------------------------------------------------------

  test("invertedIndex: df counts distinct docs (not occurrences), postings " +
      "are ascending doc_ids, capped at `cap`, and the topK boundary is " +
      "df-then-token ordered") {
    // "alpha" in 3 docs (twice in doc 10 — must still count once);
    // "beta" in 2; "gamma" in 1
    val dir = docsDir(
      10L -> "alpha alpha beta",
      20L -> "alpha gamma",
      30L -> "alpha beta")
    val rows = TextAnalysis.invertedIndex(spark, dir, topK = 2, cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // topK=2 keeps the two highest-df terms; alpha df=3 capped to 2 postings
    assert(rows.toSeq === Seq(
      ("alpha", 3L, "10,20"),
      ("beta", 2L, "10,30")))
  }

  test("invertedIndex at sf0.001: df agrees with an independent " +
      "distinct-count and every posting list is sorted ascending") {
    val out = TextAnalysis.invertedIndex(spark, "/root/testdata/sf0.001")
      .collect()
    val df = sf("documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (token, d, postings) = (r.getString(0), r.getLong(1), r.getString(2))
      assert(d === df(token), s"df mismatch for $token")
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length === math.min(d, 50L).toInt)
      assert(ids.sameElements(ids.sorted), s"unsorted postings for $token")
    }
    // presentation order is df desc, token asc — fully tie-broken
    val keys = out.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys === keys.sorted)
  }

  /** Run the query, then render the FINAL adaptive plan (AQE hides the
    * materialized exchanges inside query stages, so assertions go through
    * the plan string, which includes the full staged tree). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // keep only the final section — the rendered string repeats the tree
    // under "== Initial Plan ==", which would double-count nodes
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def occurrences(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("invertedIndex plan: the groupBy reuses the window's token " +
      "partitioning — exactly ONE shuffle exchange end to end") {
    val plan = finalPlan(TextAnalysis.invertedIndex(spark, "/root/testdata/sf0.001"))
    assert(occurrences(plan, "Exchange hashpartitioning") === 1,
      s"expected 1 shuffle (window + reused partitioning), got:\n$plan")
  }

  // --- collocation PMI -----------------------------------------------------

  test("collocationPmi: lift_q4 is the exact floored integer " +
      "n_ab*N*10^4/(n_a*n_b) and the cutoff prunes rare pairs") {
    // "a b" occurs 3 times; tokens: a×4, b×3, c×2 → N=9
    val dir = docsDir(
      1L -> "a b a b c",
      2L -> "a b a c")
    val out = TermScoring.collocationPmi(spark, dir, minPair = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // only ("a","b") reaches the cutoff: lift = 3*9*1e4/(4*3) = 22500
    assert(out.toSeq === Seq(("a", "b", 3L, 4L, 3L, 22500L)))
  }

  test("collocationPmi at sf0.001: every emitted pair meets the cutoff and " +
      "lift matches a driver-side recomputation from raw counts") {
    val toks = sf("documents").select(split(col("text"), " ").as("ts"))
    val uni = toks.select(explode(col("ts")).as("w")).groupBy("w")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = uni.values.sum
    val out = TermScoring.collocationPmi(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 50)
    out.foreach { r =>
      val (w1, w2, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(nab >= 30)
      assert(r.getLong(3) === uni(w1) && r.getLong(4) === uni(w2))
      assert(r.getLong(5) === nab * n * 10000L / (uni(w1) * uni(w2)))
    }
    // ranking is lift desc with (w1, w2) tie-break — deterministic topK
    val keys = out.map(r => (-r.getLong(5), r.getString(0), r.getString(1))).toSeq
    assert(keys === keys.sorted)
  }

  test("collocationPmi plan: both unigram joins and the total are " +
      "broadcast — no sort-merge join anywhere") {
    val plan = finalPlan(TermScoring.collocationPmi(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join leaked into the PMI plan:\n$plan")
    assert(occurrences(plan, "BroadcastHashJoin") >= 2,
      s"expected broadcast unigram joins, got:\n$plan")
  }

  // --- conjunctive search --------------------------------------------------

  test("searchConjunctive: every hit contains ALL query terms, n_hits is " +
      "the summed term frequency, and ranking is score-desc with doc_id " +
      "tie-break") {
    val out = TermScoring.searchConjunctive(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    val texts = sf("documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, hits) = (r.getLong(0), r.getLong(1))
      val toks = texts(id).split(" ")
      TermScoring.QueryTerms.foreach(t =>
        assert(toks.contains(t), s"doc $id missing query term '$t'"))
      assert(hits === toks.count(TermScoring.QueryTerms.contains(_)))
    }
    val keys = out.map(r => (-r.getDouble(2), r.getLong(0))).toSeq
    assert(keys === keys.sorted)
  }

  // --- boilerplate removal -------------------------------------------------

  test("boilerplateFilter: a segment recurring in >= minDf distinct docs " +
      "is dropped from EVERY doc (unlike segmentDedup's keep-first), " +
      "within-doc repeats don't reach the threshold alone") {
    // 10-token boilerplate segment shared by docs 1,2,3; doc 4 repeats its
    // own private segment twice (df=1 — kept both times)
    val boiler = (1 to 10).map(i => s"nav$i").mkString(" ")
    val own = (1 to 10).map(i => s"own$i").mkString(" ")
    val dir = docsDir(
      1L -> s"$boiler unique one",
      2L -> s"$boiler unique two",
      3L -> boiler,
      4L -> s"$own $own")
    val byId = TextAnalysis.boilerplateFilter(spark, dir, minDf = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(byId(1L) === ((2, 1, "unique one")))
    assert(byId(2L) === ((2, 1, "unique two")))
    assert(byId(3L) === ((1, 1, ""))) // all content was boilerplate
    assert(byId(4L) === ((2, 0, s"$own $own"))) // df=1: kept everywhere
  }

  test("boilerplateFilter: minDf=1 degenerates to dropping everything " +
      "(every segment has df >= 1) — counts stay consistent") {
    val dir = docsDir(1L -> "x y z", 2L -> "p q")
    val rows = TextAnalysis.boilerplateFilter(spark, dir, minDf = 1).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2)) // n_segs == n_boiler
      assert(r.getString(3) === "")
    }
  }

  test("boilerplateFilter at sf0.001: kept+dropped counts reconcile and " +
      "clean_text tokens = kept segments joined in order") {
    val out = TextAnalysis.boilerplateFilter(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 500)
    assert(out.exists(_.getInt(2) > 0), "threshold never fired at sf0.001")
    out.foreach { r =>
      val (nSegs, nBoiler, clean) = (r.getInt(1), r.getInt(2), r.getString(3))
      assert(nBoiler <= nSegs)
      // every kept segment is 10 tokens except possibly a clipped tail
      if (clean.nonEmpty) {
        val nTok = clean.split(" ").length
        val kept = nSegs - nBoiler
        assert(nTok <= kept * TextAnalysis.SegmentLen &&
          nTok > (kept - 1) * TextAnalysis.SegmentLen)
      }
    }
  }
}

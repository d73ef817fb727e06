package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the curation-stack additions: PII/deny-term redaction,
  * canonicalization dedup, and exact-micro embedding dimension stats. */
class CurationExtrasSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // --- Redaction -----------------------------------------------------------

  private def redactOne(s: String, terms: Seq[String] = Redaction.DenyTerms): String =
    Seq(s).toDF("text").select(Redaction.redacted(col("text"), terms).as("r"))
      .head().getString(0)

  test("redaction masks emails, phones, and IPv4 literals") {
    assert(redactOne("mail bob.smith+x@corp.example.org now") === "mail [EMAIL] now")
    assert(redactOne("call 555-123-4567 or 555.987.6543") === "call [PHONE] or [PHONE]")
    assert(redactOne("host 10.0.255.3 down") === "host [IP] down")
  }

  test("redaction order: an email is masked before its digits can look like anything else; word boundaries keep substrings intact") {
    // 'sparkle' contains deny term 'spark' but \b blocks the match
    assert(redactOne("sparkle spark sparks") === "sparkle [TERM] sparks")
    // chained masking leaves non-matching text untouched
    assert(redactOne("plain text stays") === "plain text stays")
  }

  test("termHits counts every occurrence, not just the first") {
    val n = Seq("spark a spark b customer spark").toDF("text")
      .select(Redaction.termHits(col("text")).as("n")).head().getInt(0)
    assert(n === 4)
  }

  test("harness query fires on the real corpus: some documents change, ids are complete") {
    val out = Redaction.redactDocuments(spark, dir).cache()
    val total = out.count()
    assert(total === sf("documents").count())
    val changed = out.filter(col("changed")).count()
    assert(changed > 0, "deny terms must occur in the synthetic corpus")
    // redacted text never contains a bare deny term
    val leaked = out.filter(col("red_text").rlike("\\bspark\\b|\\bcustomer\\b")).count()
    assert(leaked === 0)
    out.unpersist()
  }

  // --- canonical dedup -----------------------------------------------------

  test("canonicalText collapses case, punctuation, and whitespace variants to one form") {
    val forms = Seq(
      "Hello,  World!",
      "hello world",
      "HELLO--WORLD",
      "  hello\tworld  ")
    val canon = forms.toDF("text")
      .select(Dedup.canonicalText(col("text")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(canon === Set("hello world"))
  }

  test("canonicalGroups groups at least as coarsely as exact dedup") {
    val exact = Dedup.exactGroups(spark, dir).count()
    val canon = Dedup.canonicalGroups(spark, dir).count()
    assert(canon <= exact)
    // keeper is always the min doc_id of its group (spot invariant)
    val bad = Dedup.canonicalGroups(spark, dir)
      .filter(col("keeper") < 0).count()
    assert(bad === 0)
  }

  // --- containment ---------------------------------------------------------

  test("containment: a quoted (embedded) doc scores 1.0 toward its host while jaccard stays below it") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val host = a + " iota kappa" // all of a's shingles appear in host
    val tmp = java.nio.file.Files.createTempDirectory("cont").toString
    Seq((1L, a), (2L, host)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = Dedup.containmentPairs(spark, tmp).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0, "doc 1 fully contained in doc 2")
    assert(r.getDouble(3) < 1.0, "host is not contained in the quote")
    // symmetric jaccard on the same pair is strictly below the containment
    val jac = Dedup.jaccardPairs(spark, tmp, maxId = 10, threshold = 0.0)
      .collect().head.getDouble(2)
    assert(jac < 1.0 && jac > 0.0)
  }

  test("containmentPairs: every emitted pair matches a driver-side recount from raw text") {
    val texts = sf("documents").selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(t)
    }
    val rows = Dedup.containmentPairs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (shingles(texts(r.getLong(0))), shingles(texts(r.getLong(1))))
      val shared = (a intersect b).size.toDouble
      def rd(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === rd(shared / a.size), s"cont_a for $r")
      assert(r.getDouble(3) === rd(shared / b.size), s"cont_b for $r")
    }
  }

  // --- winnowing -----------------------------------------------------------

  test("winnow: every doc keeps >=1 fingerprint; a mid-doc edit perturbs only a bounded neighborhood of the sketch") {
    val out = TextAnalysis.winnow(spark, dir).cache()
    val perDoc = out.groupBy(col("doc_id")).count().cache()
    assert(perDoc.count() === sf("documents").count(), "every doc sketched")
    assert(perDoc.filter(col("count") < 1).count() === 0)
    perDoc.unpersist(); out.unpersist()

    // insertion locality: one substituted token can touch at most the 3
    // shingles covering it, each visible to at most w=4 windows on each
    // side — so the sketches of original vs edited doc differ by a
    // bounded set, while modulo-sharding of whole-doc hashes (rolling
    // fingerprint) changes completely
    val toks = (0 until 40).map(i => s"w$i")
    val orig = toks.mkString(" ")
    val edit = toks.updated(20, "CHANGED").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("winnow").toString
    Seq((1L, orig), (2L, edit)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val fps = TextAnalysis.winnow(spark, tmp).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val symDiff = (fps(1L) diff fps(2L)) ++ (fps(2L) diff fps(1L))
    assert(symDiff.nonEmpty, "the edit must be visible")
    // 3 changed shingles × (w windows before + the window at) × 2 docs
    assert(symDiff.size <= 2 * 3 * 4,
      s"edit perturbed ${symDiff.size} fingerprints — not insertion-local")
    assert((fps(1L) intersect fps(2L)).nonEmpty, "distant regions unperturbed")
  }

  test("winnowOf (per-row HOF fold) emits exactly the windowed twin's sketch") {
    val docs = Tables.documents(spark, dir)
    val hof = TextAnalysis.winnowOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = TextAnalysis.winnowWindowed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hof === win)
    assert(hof.nonEmpty)
  }

  test("winnowPairs: identical docs pair up via the sketch; disjoint docs never do") {
    val a = (0 until 30).map(i => s"a$i").mkString(" ")
    val c = (0 until 30).map(i => s"c$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("wp").toString
    Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.winnowPairs(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 2L)),
      "identical docs share their whole sketch; disjoint docs share nothing")
  }

  test("winnowPairs candidate budget: capped ⊆ exact with identical " +
      "n_shared, per-doc ≤ budget, deterministic") {
    // a 4-member duplicate family (6 true pairs, 3 from doc_a=10 alone)
    // plus a disjoint doc — budget 2 must keep doc 10's FIRST two
    // partners by ascending doc_b and drop the third
    val fam = (0 until 30).map(i => s"x$i").mkString(" ")
    val other = (0 until 30).map(i => s"y$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("wpb").toString
    Seq((10L, fam), (11L, fam), (12L, fam), (13L, fam), (99L, other))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    def pairs(cap: Option[Int]) =
      TextAnalysis.winnowPairs(spark, tmp, maxCandidatesPerDoc = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    val exact = pairs(None).toMap
    assert(exact.keySet === Set((10L, 11L), (10L, 12L), (10L, 13L),
      (11L, 12L), (11L, 13L), (12L, 13L)))
    val capped = pairs(Some(2))
    // subset with the exact path's n_shared carried unchanged
    capped.foreach { case (p, n) => assert(exact(p) === n, s"$p n_shared") }
    // per-doc_a candidate budget respected, kept partners are the FIRST
    // by ascending doc_b (the deterministic rank)
    val byA = capped.map(_._1).groupBy(_._1)
    byA.foreach { case (a, ps) => assert(ps.length <= 2, s"doc $a budget") }
    assert(byA(10L).map(_._2).toSet === Set(11L, 12L))
    // deterministic: a second run returns the same rows
    assert(pairs(Some(2)).toSeq === capped.toSeq)
  }

  test("winnowProbe: a delta copy of a standing doc finds it as best match with its full sketch shared") {
    import graft.functions.SharedHash
    // find ids on each side of the delta bucket with the real convention
    val buckets = (0L until 50L).toDF("doc_id")
      .select(col("doc_id"),
        expr(s"pmod(${SharedHash.spark48("cast(doc_id AS STRING)")}, 10)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incId = buckets.collectFirst { case (id, 9L) => id }.get
    val exId = buckets.collectFirst { case (id, b) if b != 9L => id }.get
    val otherEx = buckets.collectFirst {
      case (id, b) if b != 9L && id != exId => id }.get

    val t = (0 until 25).map(i => s"tok$i").mkString(" ")
    val other = (0 until 25).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    Seq((incId, t), (exId, t), (otherEx, other)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")

    val rows = TextAnalysis.winnowProbe(spark, tmp).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === incId)
    assert(rows.head.getLong(1) === exId)
    val sketchSize = TextAnalysis.winnow(spark, tmp).collect()
      .count(_.getLong(0) == incId)
    assert(rows.head.getLong(2) === sketchSize,
      "identical copy shares its entire sketch")
  }

  // --- plan shapes ---------------------------------------------------------

  test("plan shapes: redaction is one scan + zero pre-sort exchanges; dim stats is one scan feeding a partial agg") {
    val redPlan = Redaction.redactDocuments(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(redPlan).length === 1,
      "redaction must be a single pass over documents")
    // the only exchange allowed is the rangepartitioning for the final sort
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(redPlan).toList
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected data shuffle in redaction plan: $exchanges")

    val dimPlan = EmbeddingStats.dimStats(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(dimPlan).length === 1)
    assert(dimPlan.contains("partial_count") || dimPlan.contains("HashAggregate"),
      "dim stats must partial-aggregate map-side before the 64-group shuffle")

    // text_repetition's claim: one scan, no DATA shuffle — every metric is
    // per-row (the only exchange is the final presentation sort)
    val repPlan = TextAnalysis.repetitionStats(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(repPlan).length === 1,
      "repetition stats must be a single pass over documents")
    val repExchanges = "Exchange [a-z]+partitioning".r.findAllIn(repPlan).toList
    assert(repExchanges.forall(_.contains("rangepartitioning")),
      s"unexpected data shuffle in repetition plan: $repExchanges")
  }

  // --- embedding dim stats -------------------------------------------------

  test("dimStats: 64 dims, n = corpus size, mean within [min,max], and bit-stable under repartitioning") {
    val out = EmbeddingStats.dimStats(spark, dir).cache()
    assert(out.count() === 64)
    val nDocs = sf("embeddings").count()
    assert(out.filter(col("n") =!= nDocs).count() === 0)
    assert(out.filter(col("mean_v") < col("min_v") ||
      col("mean_v") > col("max_v")).count() === 0)

    // order independence: the micro-unit sum makes the mean exact, so a
    // different partitioning must produce the identical rows
    val shuffled = Tables.embeddings(spark, dir).repartition(13)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"),
        round(col("v").cast("double") * lit(1e6), 0).cast("long").as("micro"),
        col("v").cast("double").as("vd"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("micro")) / (count(lit(1)) * lit(1e6)), 6).as("mean_v"),
        round(min(col("vd")), 6).as("min_v"),
        round(max(col("vd")), 6).as("max_v"))
    assert(out.except(shuffled).count() === 0 &&
      shuffled.except(out).count() === 0)
    out.unpersist()
  }
}

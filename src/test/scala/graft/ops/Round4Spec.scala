package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-4 work: degree-oriented triangle
  * counting (arboricity-bounded wedges), the 64-bit SimHash widening, and
  * merge-on-read upsert equivalence. Value-level correctness is the DuckDB
  * oracle gate's job; these pin the scale properties the oracles can't
  * see. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // --- degree-oriented triangle counting ----------------------------------

  private def pairsDf(es: Seq[(Long, Long)]) =
    es.toDF("doc_a", "doc_b")

  test("triangleCount: K4 has exactly 4 triangles, K5 has 10") {
    def clique(n: Long) =
      for (a <- 0L until n; b <- (a + 1) until n) yield (a, b)
    assert(Dedup.triangleCount(pairsDf(clique(4))).head().getLong(0) === 4)
    assert(Dedup.triangleCount(pairsDf(clique(5))).head().getLong(0) === 10)
  }

  test("triangleCount: triangle + pendant edge counts 1; pure star counts 0") {
    val tri = pairsDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(Dedup.triangleCount(tri).head().getLong(0) === 1)
    val star = pairsDf((1L to 50L).map(i => (math.min(i, 60L), 60L)))
    assert(Dedup.triangleCount(star).head().getLong(0) === 0)
  }

  test("degree orientation bounds wedges: a 1000-leaf star (hub mid-range " +
      "by id) generates ZERO wedges, where id-ordered wedging would give " +
      "~250k") {
    // hub id 500 sits in the middle of the leaf id range, so the OLD
    // id-ordered formulation would build a wedge for every (low leaf,
    // high leaf) pair through the hub: 499*500 ≈ 250k. Degree orientation
    // points every edge leaf→hub (leaves have degree 1), so no node has
    // two out-neighbors and the wedge set is empty.
    val hub = 500L
    val leaves = (1L to 1001L).filterNot(_ == hub)
    val star = pairsDf(leaves.map(l => (math.min(l, hub), math.max(l, hub))))
    assert(Dedup.orientedWedges(star).count() === 0L)
    assert(Dedup.triangleCount(star).head().getLong(0) === 0L)
  }

  test("orientEdges: every input edge appears exactly once, pointing " +
      "low-rank → high-rank under (degree, id)") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 5L))
    val o = Dedup.orientEdges(pairsDf(es)).collect()
    assert(o.length === es.length)
    // degrees: 1→2, 2→3, 3→3, 4→1, 5→1; rank = (deg, id)
    val deg = Map(1L -> 2, 2L -> 3, 3L -> 3, 4L -> 1, 5L -> 1)
    o.foreach { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      assert(deg(s) < deg(d) || (deg(s) == deg(d) && s < d),
        s"edge $s->$d not low-rank to high-rank")
      assert(r.getLong(2) === deg(d).toLong, "dstD carries dst's degree")
    }
    assert(o.map(r => (math.min(r.getLong(0), r.getLong(1)),
      math.max(r.getLong(0), r.getLong(1)))).toSet === es.toSet)
  }

  // --- 64-bit SimHash ------------------------------------------------------

  test("simhash64: low 32 bits coincide with the 32-bit signature (same " +
      "base-hash terms, bit for bit)") {
    val s32 = Dedup.simhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s64 = Dedup.simhashSignatures64(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s64.keySet === s32.keySet)
    s64.foreach { case (id, sig) =>
      assert((sig & 0xFFFFFFFFL) === s32(id), s"doc $id low-32 mismatch")
    }
    // the widened half must actually carry information: some doc uses a
    // bit above 31 (overwhelmingly likely; guards against a silent
    // all-zero hs2 regression)
    assert(s64.values.exists(v => (v >>> 32) != 0L))
  }

  test("native SimHash64 expression ≡ the SQL formulation bit-for-bit on " +
      "the whole corpus (the oracle's twin)") {
    val sql = Dedup.simhashSignatures64Sql(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashSignatures64(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === sql)
  }

  test("native shingle_hashes expression ≡ the SQL formulation bit-for-bit " +
      "on the whole corpus (incl. the <3-token fallback)") {
    val docs = Tables.documents(spark, dir)
    import spark.implicits._
    val short = Seq((9001L, "two tokens"), (9002L, "one")).toDF("doc_id", "text")
    val all = docs.select("doc_id", "text").unionByName(short)
    val sql = Dedup.shingledSql(all).select("doc_id", "hs").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = Dedup.shingled(all).select("doc_id", "hs").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === sql)
  }

  test("native minhash_sigs expression ≡ the SQL formulation bit-for-bit " +
      "on the whole corpus") {
    val sh = Dedup.withShingles(spark, dir)
    val sql = Dedup.signaturesFromSql(sh).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumMinHash).map(r.getLong)).toMap
    val native = Dedup.signaturesFrom(sh).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumMinHash).map(r.getLong)).toMap
    assert(native === sql)
  }

  test("native SimHash32 expression ≡ the 32-bit SQL formulation " +
      "bit-for-bit on the whole corpus") {
    val sql = Dedup.simhashSignaturesSql(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === sql)
  }

  test("simhash64 banded LSH ≡ exact 64-bit pairwise scan (pigeonhole " +
      "recall at hamming ≤ 2 is width-independent)") {
    val sigs = Dedup.simhashSignatures64(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= Dedup.HammingThreshold
    } yield {
      val (a, b) = (sigs(i)._1, sigs(j)._1)
      (math.min(a, b), math.max(a, b), h)
    }).toSet
    val banded = Dedup.simhashLshPairs64(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === exact)
  }

  // --- overlapped chunking -------------------------------------------------

  test("chunking: consecutive chunks overlap by exactly 16 tokens, every " +
      "token is covered, short docs yield one chunk") {
    val rows = TextAnalysis.chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = rows.groupBy(_._1)
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.toSeq, "dense chunk_idx")
      val toks = docs(id)
      // reconstruction: chunk i starts at i*48 and covers 64 tokens
      sorted.foreach { case (_, i, n, text) =>
        val expect = toks.slice(i * 48, i * 48 + 64)
        assert(text.split(" ").toSeq === expect.toSeq, s"doc $id chunk $i")
        assert(n === expect.length)
      }
      // overlap: last 16 of chunk i == first 16 of chunk i+1 (full chunks)
      sorted.sliding(2).foreach {
        case Array((_, _, n1, t1), (_, _, _, t2)) if n1 == 64 =>
          assert(t1.split(" ").takeRight(16).toSeq ===
            t2.split(" ").take(16).toSeq)
        case _ =>
      }
      // coverage: the union of chunks spans all tokens
      val last = sorted.last
      assert(last._2 * 48 + last._3 >= toks.length, s"doc $id tail uncovered")
    }
  }

  // --- char entropy --------------------------------------------------------

  test("charEntropy: 0 for single-char docs, ln(k) for uniform text, " +
      "bounded by ln(distinct chars) on the real corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("ent").toString
    Seq((1L, "aaaa", "en", "s", 4L), (2L, "abab", "en", "s", 4L),
      (3L, "abcd", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val h = TextAnalysis.charEntropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h(1L) === 0.0)
    assert(math.abs(h(2L) - math.log(2)) < 1e-6)
    assert(math.abs(h(3L) - math.log(4)) < 1e-6)
    // real corpus: 0 < H <= ln(#distinct chars in the doc)
    val real = TextAnalysis.charEntropy(spark, dir).collect()
    val distinctChars = Tables.documents(spark, dir)
      .select(col("doc_id"), size(array_distinct(split(col("text"), ""))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    real.foreach { r =>
      val (id, e) = (r.getLong(0), r.getDouble(2))
      assert(e > 0.0 && e <= math.log(distinctChars(id)) + 1e-6, s"doc $id")
    }
  }

  // --- heavy hitters plan shape --------------------------------------------

  test("heavyHitters scans the documents table at most twice (sketch+total " +
      "fused into one aggregate; candidate re-count is the only other pass)") {
    val plan = TextAnalysis.heavyHitters(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"expected ≤2 parquet scans, found $scans:\n$plan")
  }

  // --- lexical cosine ------------------------------------------------------

  test("lexical cosine pairs: driver-side recomputation from raw text " +
      "agrees pair-for-pair; scores in (0, 1]") {
    val got = TermScoring.lexicalCosinePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty, "corpus has near-dups; the operator must find some")
    assert(got.values.forall(c => c > 0.0 && c <= 1.000001))
    // independent model: same relative df cap, same milli-unit floor
    val texts = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val nDocs = texts.size
    val tf = texts.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, o) => t -> o.length }
    }
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, o) => t -> o.size }
    val w = tf.map { case (id, m) =>
      id -> m.collect {
        case (t, f) if dfm(t) * 10 <= nDocs =>
          t -> math.floor(f * math.log((nDocs + 1.0) / (dfm(t) + 1)) * 1000).toLong
      }.toMap
    }
    val ids = texts.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      shared = w(a).keySet intersect w(b).keySet if shared.nonEmpty
      dot = shared.toSeq.map(t => w(a)(t) * w(b)(t)).sum
      na = w(a).values.map(x => x * x).sum
      nb = w(b).values.map(x => x * x).sum
      c = BigDecimal(dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.5
    } yield (a, b) -> c).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, c) => assert(math.abs(c - expected(k)) < 2e-6, s"$k") }
  }

  test("lexical cosine: candidate budget yields a deterministic per-doc-" +
      "bounded subset of the exact output; the pair-bound scout dominates") {
    import spark.implicits._
    // duplicate-dense family fixture: the shape where the uncapped join
    // goes output-quadratic (twelve 4-doc families sharing rare
    // vocabulary — df 4 stays under the df·10 ≤ n_docs=48 cap)
    val docs = (0 until 48).map { i =>
      val fam = i / 4
      val toks = (0 until 12).map(j => s"f${fam}_t$j") :+ s"u$i"
      (i.toLong, toks.mkString(" "))
    }
    val tmp = java.nio.file.Files.createTempDirectory("lexcap").toString
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")

    val exact = TermScoring.lexicalCosinePairs(spark, tmp)
      .as[(Long, Long, Double)].collect().toSet
    val cap = 2
    val capped = TermScoring.lexicalCosinePairs(spark, tmp,
        maxCandidatesPerDoc = Some(cap))
      .as[(Long, Long, Double)].collect()
    assert(capped.toSet.subsetOf(exact),
      "every capped pair is a true pair of the exact output")
    assert(capped.groupBy(_._1).values.forall(_.length <= cap),
      "per-doc output cannot exceed the candidate budget")
    assert(capped.nonEmpty && capped.length < exact.size,
      "fixture dense enough that the budget actually bites")
    // deterministic: unique (doc_a, doc_b) rank order → replayable subset
    val again = TermScoring.lexicalCosinePairs(spark, tmp,
        maxCandidatesPerDoc = Some(cap))
      .as[(Long, Long, Double)].collect()
    assert(again.sorted.toSeq === capped.sorted.toSeq)
    // the collision scout upper-bounds the true pair count
    val d = Tables.documents(spark, tmp)
    assert(TermScoring.lexicalPairBound(d) >= exact.size,
      "pair bound must dominate the verified pair count")
    assert(TermScoring.lexicalPairBoundOf(d).columns.toSeq === Seq("bound"))
  }

  // --- merge-on-read upsert ------------------------------------------------

  private def baseDf(rows: (Long, String)*) = rows.toDF("k", "v")
  private def chDf(rows: (Long, String, String)*) =
    rows.map { case (k, op, v) => (k, op, v) }.toDF("k", "op", "v")

  test("readView single batch ≡ copy-on-write merge, row for row " +
      "(including status)") {
    val base = baseDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val ch = chDf((2L, "update", "B"), (3L, "delete", null),
      (5L, "insert", "E"), (6L, "update", "ghost"), (7L, "delete", null))
    val cow = Upsert.merge(base, ch, "k", "v").collect().toSet
    val mor = Upsert.readView(base, Seq(ch), "k", "v").collect().toSet
    assert(mor === cow)
  }

  test("readView multi-batch sequencing ≡ sequential merge application " +
      "(delete-then-update is a no-op, delete-then-insert resurrects)") {
    val base = baseDf(1L -> "a", 2L -> "b", 3L -> "c")
    val b1 = chDf((1L, "delete", null), (2L, "delete", null),
      (3L, "update", "c1"))
    val b2 = chDf((1L, "update", "ghost"), // update after delete: no-op
      (2L, "insert", "b2"), // insert after delete: resurrects
      (3L, "update", "c2")) // second update wins
    val sequential = Seq(b1, b2)
      .foldLeft(base) { (snap, ch) =>
        Upsert.merge(snap.select(col("k"), col("v")), ch, "k", "v")
      }
      .select(col("k"), col("v")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val mor = Upsert.readView(base, Seq(b1, b2), "k", "v")
      .select(col("k"), col("v")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mor === sequential)
    assert(mor === Set(2L -> "b2", 3L -> "c2"))
  }

  test("partition-pruned COW merge rewrites ONLY partitions containing " +
      "change keys; untouched partition files stay byte-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("pruned-cow")
      .toString + "/table"
    val snap = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    snap.write.partitionBy("source").parquet(tmp)
    val sources = snap.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val target = sources.head
    def files(src: String) = {
      val d = new java.io.File(s"$tmp/source=$src")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified, f.length)).toSet
    }
    val untouchedBefore = sources.tail.map(s => s -> files(s)).toMap

    // changeset confined to the target partition: update one doc, delete
    // one, insert a new key
    val ids = snap.filter(col("source") === target)
      .select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    import spark.implicits._
    val changes = Seq(
      (ids(0), target, "update", "rewritten text"),
      (ids(1), target, "delete", null),
      (999999L, target, "insert", "brand new doc"))
      .toDF("doc_id", "source", "op", "text")

    val touched = Upsert.mergePrunedCow(spark, tmp, changes,
      "doc_id", "text", "source")
    assert(touched === Seq(target))
    // untouched partitions: files byte-identical (name, mtime, size)
    sources.tail.foreach { s =>
      assert(files(s) === untouchedBefore(s), s"partition $s was rewritten")
    }
    // the rewritten table equals the unpruned merge of the full snapshot
    val expected = Upsert.merge(
      snap.select(col("doc_id"), col("text")),
      changes.select(col("doc_id"), col("op"), col("text")),
      "doc_id", "text")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    val actual = spark.read.parquet(tmp)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(actual === expected)
  }

  test("q_upsert_mor harness query ≡ q_upsert on the real corpus (the MOR " +
      "view is indistinguishable from the rewrite)") {
    val cow = Upsert.documentsUpsert(spark, dir).collect().toSeq
    val mor = Upsert.documentsUpsertMor(spark, dir).collect().toSeq
    assert(mor === cow)
  }

  test("ngramCounts: driver-side recomputation from raw text agrees " +
      "(clipped grams, every occurrence counted, cutoff applied)") {
    val minCount = 2L
    val docs = Tables.documents(spark, dir).select("text").as[String].collect()
    val expected = docs.flatMap { t =>
      val toks = t.split(" ", -1)
      (1 to math.max(toks.length - 2, 1)).map(i =>
        toks.slice(i - 1, math.min(i + 2, toks.length)).mkString(" "))
    }.groupMapReduce(identity)(_ => 1L)(_ + _)
      .filter(_._2 >= minCount)
    val got = TextAnalysis.ngramCounts(spark, dir, minCount = minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "fixture corpus should repeat some trigram")
  }

  test("ngramCounts output is sorted (n desc, gram asc) and never below " +
      "the cutoff") {
    val rows = TextAnalysis.ngramCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.forall(_._2 >= 5L))
    val resorted = rows.sortBy { case (g, n) => (-n, g) }
    assert(rows.toSeq === resorted.toSeq)
  }

  test("triangle count on the real minhash pair graph matches a driver-side " +
      "exact recount") {
    val pairs = Dedup.minhashPairsRaw(Tables.documents(spark, dir))
    val adj = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = adj.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val exact = adj.map { case (a, b) =>
      (nbrs(a) intersect nbrs(b)).count(c => c > b)
    }.sum
    assert(Dedup.triangleCount(pairs).head().getLong(0) === exact.toLong)
  }
}

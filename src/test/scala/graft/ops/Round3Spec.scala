package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-3 operators: substring-gram dedup,
  * segment-level (C4 line) dedup, TF-IDF/BM25 term scoring, cohort
  * retention, and the ordered funnel. Value-level correctness is the
  * DuckDB oracle gate's job; these pin invariants and cross-operator
  * consistency on sf0.001. */
class Round3Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // --- substring-gram dedup ------------------------------------------------

  test("substring pairs: symmetric-free, positive share counts, and every " +
      "pair genuinely shares a 16-token gram") {
    val rows = Dedup.substringGramPairs(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "doc_a < doc_b")
    assert(rows.forall(_.getLong(2) > 0), "n_shared >= 1")
    if (rows.nonEmpty) {
      // independently verify one pair by direct token comparison
      val r = rows.head
      val texts = Tables.documents(spark, dir)
        .filter(col("doc_id").isin(r.getLong(0), r.getLong(1)))
        .collect().map(x => x.getLong(0) -> x.getString(1).split(" ")).toMap
      def grams(t: Array[String]) =
        if (t.length < 16) Set(t.mkString(" "))
        else t.sliding(16).map(_.mkString(" ")).toSet
      val shared = grams(texts(r.getLong(0))) intersect grams(texts(r.getLong(1)))
      assert(shared.nonEmpty, "reported pair shares no gram")
    }
  }

  test("substring pairs: df cap drops boilerplate grams (cap=1 yields a " +
      "subset of the default run)") {
    val strict = Dedup.substringGramPairs(spark, dir, maxDf = 1).count()
    // df cap 1 means a gram must be unique corpus-wide, so it can never
    // appear in two docs: zero pairs by construction
    assert(strict === 0L)
  }

  // --- segment dedup -------------------------------------------------------

  test("segment dedup: per-doc counts are consistent and global segment " +
      "occurrences shrink to distinct") {
    val out = TextAnalysis.segmentDedup(spark, dir).collect()
    assert(out.forall(r => r.getInt(2) <= r.getInt(1)), "n_kept <= n_segs")
    assert(out.forall { r =>
      val kept = r.getString(3)
      (r.getInt(2) == 0) == kept.isEmpty
    }, "kept_text empty iff zero kept segments")
    // total kept == number of distinct segments in the corpus
    val docs = Tables.documents(spark, dir).collect()
    val allSegs = docs.flatMap { d =>
      d.getString(1).split(" ").grouped(TextAnalysis.SegmentLen)
        .map(_.mkString(" ")).toSeq
    }
    assert(out.map(_.getInt(2)).sum === allSegs.distinct.length)
    assert(out.map(_.getInt(1)).sum === allSegs.length)
  }

  test("segment dedup: a kept document's text is its in-order surviving " +
      "segments") {
    val row = TextAnalysis.segmentDedup(spark, dir)
      .filter(col("doc_id") === 0).head()
    val text = Tables.documents(spark, dir)
      .filter(col("doc_id") === 0).head().getString(1)
    val segs = text.split(" ").grouped(TextAnalysis.SegmentLen)
      .map(_.mkString(" ")).toSeq
    // doc 0 is first in (doc_id, idx) order, so it keeps every segment not
    // already seen earlier WITHIN itself
    val seen = scala.collection.mutable.Set[String]()
    val expect = segs.filter(s => seen.add(s)).mkString(" ")
    assert(row.getString(3) === expect)
  }

  // --- term scoring --------------------------------------------------------

  test("tfidf: k terms per doc, rank contiguous, scores non-increasing") {
    val rows = TermScoring.tfidfTopTerms(spark, dir).collect()
      .groupBy(_.getLong(0))
    rows.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("tfidf: doc 0's reported terms match a from-scratch recomputation") {
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val df = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val tf0 = docs(0L).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val expect = tf0.map { case (t, tf) =>
      t -> BigDecimal(tf * math.log((n + 1.0) / (df(t) + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TermScoring.tfidfTopTerms(spark, dir)
      .filter(col("doc_id") === 0).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3)))
    val top = expect.toSeq.sortBy { case (t, s) => (-s, t) }.take(3)
    assert(got.sortBy(_._1).map(x => (x._2, x._3)).toSeq === top)
  }

  test("bm25: exactly k rows, scores positive and non-increasing, and " +
      "every returned doc contains a query term") {
    val rows = TermScoring.bm25(spark, dir).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
    val ids = rows.map(_.getLong(0))
    val withTerm = Tables.documents(spark, dir)
      .filter(col("doc_id").isin(ids: _*))
      .filter(TermScoring.QueryTerms
        .map(t => col("text").contains(t)).reduce(_ || _))
      .count()
    assert(withTerm === ids.length.toLong)
  }

  // --- incremental dedup ---------------------------------------------------

  test("incremental dedup: covers the full incoming batch, verdicts agree " +
      "with an independent digest check") {
    val out = Dedup.incrementalDedup(spark, dir).collect()
    // independent recomputation of the split + exact verdicts
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val (incIds, exIds) = docs.keys.partition(bucket(_) == 9)
    assert(out.map(_.getLong(0)).toSet === incIds.toSet,
      "one row per incoming doc")
    val exDigests = exIds.map(docs(_)).toSet
    out.foreach { r =>
      val expectExact = exDigests.contains(docs(r.getLong(0)))
      assert(r.getBoolean(1) === expectExact,
        s"doc ${r.getLong(0)} exact-verdict mismatch")
    }
    // verdict string is consistent with the flags
    out.foreach { r =>
      val v = r.getString(3)
      if (r.getBoolean(1)) assert(v === "exact")
      else if (r.getLong(2) > 0) assert(v === "near")
      else assert(v === "novel")
    }
  }

  // --- partitioned corpus layout -------------------------------------------

  test("corpus layout: hive-partitioned write round-trips, and a slice " +
      "read prunes partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout")
      .toString + "/corpus"
    val docs = Tables.documents(spark, dir)
    CorpusLayout.writePartitioned(docs, tmp, maxRecordsPerFile = 10)
    val root = new java.io.File(tmp)
    val srcDirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(srcDirs.forall(_.startsWith("source=")), srcDirs.mkString(","))
    // every leaf respects maxRecordsPerFile
    val leafFiles = root.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(leafFiles.nonEmpty)
    val back = spark.read.parquet(tmp)
    assert(back.count() === docs.count())
    leafFiles.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 10, s"${f.getName} has $n rows > maxRecordsPerFile")
    }
    // slice read: partition filters reach the scan (pruned, not scanned)
    val slice = CorpusLayout.readSlice(spark, tmp, "src0", "en")
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    val expected = docs
      .filter(col("source") === "src0" && col("lang") === "en").count()
    assert(slice.count() === expected)
  }

  // --- graph + time series -------------------------------------------------

  test("triangle count: ordered-wedge join counts each triangle exactly " +
      "once on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus a dangling edge
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L)).toDF("doc_a", "doc_b")
    assert(Dedup.triangleCount(edges).head().getLong(0) === 4L)
    // triangle-free path graph
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    assert(Dedup.triangleCount(path).head().getLong(0) === 0L)
  }

  test("gap fill: every user's span is dense, filled days carry the " +
      "previous observed count, observed days are untouched") {
    val rows = Analytics.gapFillDaily(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byUser = rows.groupBy(_._1)
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts div ${Analytics.NsPerDay}").as("day"))
      .groupBy("user_id", "day").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    byUser.foreach { case (u, ds) =>
      val days = ds.map(_._2).sorted
      assert(days.head to days.last forall (days.contains(_)), s"user $u gap")
      ds.foreach { case (_, day, n, filled) =>
        daily.get((u, day)) match {
          case Some(obs) =>
            assert(!filled && n === obs, s"user $u day $day observed")
          case None =>
            assert(filled, s"user $u day $day must be marked filled")
            val prev = ds.filter(x => x._2 < day && daily.contains((u, x._2)))
              .maxBy(_._2)
            assert(n === daily((u, prev._2)), s"user $u day $day LOCF value")
        }
      }
    }
  }

  test("dynamic quality gate: each source keeps its top 75% by TTR, and " +
      "every kept doc outranks every dropped doc of the same source") {
    val all = Tables.documents(spark, dir).collect().map { r =>
      val toks = r.getString(1).split(" ")
      (r.getLong(0), r.getString(3),
        BigDecimal(toks.distinct.length.toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val kept = TextAnalysis.qualityGateDynamic(spark, dir).collect()
      .map(r => r.getLong(0)).toSet
    all.groupBy(_._2).foreach { case (src, docs) =>
      val expectN = docs.length * TextAnalysis.QualityKeepPct / 100
      val keptHere = docs.filter(d => kept(d._1))
      assert(keptHere.length === expectN, s"source $src keep count")
      val dropped = docs.filterNot(d => kept(d._1))
      if (dropped.nonEmpty && keptHere.nonEmpty) {
        val worstKept = keptHere.map(d => (d._3, -d._1)).min
        val bestDropped = dropped.map(d => (d._3, -d._1)).max
        assert(worstKept._1 >= bestDropped._1, s"source $src rank inversion")
      }
    }
  }

  // --- stratified sampling -------------------------------------------------

  test("stratified sample: every stratum keeps exactly ceil(20% of its " +
      "size), reproducibly") {
    val bySource = Tables.documents(spark, dir).collect()
      .groupBy(_.getString(3)).view.mapValues(_.length).toMap
    val sampled = Corpus.stratifiedSample(spark, dir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    bySource.foreach { case (src, n) =>
      assert(sampled(src) === math.ceil(n * Corpus.StratifiedPct / 100.0).toInt,
        s"stratum $src")
    }
    // reproducible: a second run selects the identical ids
    val ids1 = Corpus.stratifiedSample(spark, dir).collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.stratifiedSample(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("source cap: no source exceeds the cap, undersized sources keep " +
      "everything, selection is reproducible and hash-ordered") {
    val cap = 3
    val bySource = Tables.documents(spark, dir).collect()
      .groupBy(_.getString(3)).view.mapValues(_.length).toMap
    val capped = Corpus.sourceCap(spark, dir, cap).collect()
    val keptBySrc = capped.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    bySource.foreach { case (src, n) =>
      assert(keptBySrc.getOrElse(src, 0) === math.min(n, cap), s"source $src")
    }
    assert(capped.forall(_.getInt(2) <= cap), "rnk bounded by the cap")
    // reproducible: a second run (different partitioning) keeps identical ids
    val ids1 = capped.map(_.getLong(0)).toSet
    val ids2 = Corpus.sourceCap(spark, dir, cap).collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // capped set nests: cap 3 ⊆ cap 5 (hash order is a fixed total order)
    val ids5 = Corpus.sourceCap(spark, dir, 5).collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(ids5))
  }

  test("source cosine matrix: identical sources read 1.0, disjoint sources " +
      "emit no pair, values bounded") {
    import spark.implicits._
    val docs =
      ((1 to 5).map(i => (i.toLong, s"alpha beta gamma d$i", "en", "srcX", 20L)) ++
       (6 to 10).map(i => (i.toLong, s"alpha beta gamma d${i - 5}", "en", "srcY", 20L)) ++
       (11 to 15).map(i => (i.toLong, s"omega psi chi z$i", "en", "srcZ", 20L)))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("srccos").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val rows = TermScoring.sourceCosineMatrix(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows(("srcX", "srcY")) === 1.0,
      "identical term multisets → exactly cosine 1.0")
    assert(!rows.contains(("srcX", "srcZ")) && !rows.contains(("srcY", "srcZ")),
      "no shared terms → no pair row")
    assert(rows.values.forall(c => c >= -1.0 && c <= 1.0))
  }

  // --- column profiler -----------------------------------------------------

  test("profiler: one row per column, stats agree with direct computation") {
    val rows = Profiler.lineitemProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Profiler.LineitemCols.toSet)
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    rows.values.foreach { r => assert(r.getLong(1) === n) }
    val qty = rows("l_quantity")
    assert(qty.getLong(3) ===
      li.select("l_quantity").distinct().count())
    assert(qty.getString(4).toDouble ===
      li.agg(min(col("l_quantity"))).head().getDouble(0))
    // two scans (typed min/max pass + stacked distinct pass), never one
    // per column, and no row-multiplying Expand from multi-distinct
    val plan = Profiler.lineitemProfile(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 2, s"expected two scans, got $scans")
    assert(!plan.contains("Expand"), "multi-distinct Expand crept back in")
  }

  // --- snapshot upsert -----------------------------------------------------

  test("upsert: dispositions follow the changeset — deletes vanish, " +
      "updates grow by the rev2 prefix, inserts are the new ids") {
    val out = Upsert.documentsUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val docs = Tables.documents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.keys.foreach { id =>
      (id % 30, id % 10) match {
        case (9, _) => // change row targeting id-1 as delete
          assert(!out.contains(id - 1), s"deleted ${id - 1} still present")
          assert(!out.contains(id), "delete-change row itself must not appear")
        case (19, _) => // rewrite of id-2 with the CHANGE row's text
          assert(out(id - 2)._1 === "updated")
          assert(out(id - 2)._2 === docs(id).length + 5, "rev2-prefixed change text")
        case (29, _) => // insert of itself
          assert(out(id)._1 === "inserted")
          assert(out(id)._2 === docs(id).length + 5)
        case (_, 9) => // change-batch row not selected as any op target
          assert(!out.contains(id))
        case (m30, _) if m30 != 17 && m30 != 8 =>
          // 17 mod 30 / 8 mod 30 are update/delete TARGETS, covered above
          if (out.contains(id)) assert(out(id)._1 === "kept")
        case _ => ()
      }
    }
    // every snapshot row not deleted is present
    val deleted = docs.keys.filter(_ % 30 == 9).map(_ - 1).toSet
    val snapshot = docs.keys.filter(_ % 10 != 9).toSet
    assert((snapshot -- deleted).forall(out.contains))
  }

  // --- event analytics -----------------------------------------------------

  test("cohort retention: offset-0 cell equals cohort size and every cell " +
      "is bounded by it") {
    val rows = Analytics.cohortRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = rows.groupBy(_._1._1)
    cohorts.foreach { case (day, cells) =>
      val base = rows((day, 0L))
      assert(cells.values.forall(_ <= base),
        s"cohort $day has a cell above its size")
    }
    // every user is in exactly one cohort: sum of offset-0 = distinct users
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(cohorts.keys.map(d => rows((d, 0L))).sum === users)
  }

  test("funnel: stage counts are monotonically non-increasing and stage 1 " +
      "equals users with a view event") {
    val rows = Analytics.funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    val viewers = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows("1_view") === viewers)
  }

  test("funnel: strict ordering is enforced (a user whose only click " +
      "precedes every view does not convert stage 2)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 100L), (1L, "view", 200L),           // click before view
      (2L, "view", 100L), (2L, "click", 200L),           // proper order
      (2L, "purchase", 300L),
      (3L, "view", 100L), (3L, "purchase", 50L)          // purchase too early
    ).toDF("user_id", "event_type", "ts")
    // drive the same staging logic through a temp table by reusing the
    // operator body shape: min(view) < click < purchase
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    assert(t1.count() === 3)
    assert(t2.select("user_id").as[Long].collect().toSet === Set(2L))
    assert(t3.select("user_id").as[Long].collect().toSet === Set(2L))
  }
}

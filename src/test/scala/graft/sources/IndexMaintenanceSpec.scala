package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, Tables}

/** Physical index maintenance: compaction leaves every read view
  * byte-identical while shrinking the file count, delta folding preserves
  * the replay-safe streaming views, and the prefix-dictionary rebuild
  * restores from-scratch sharpness without touching recall. */
class IndexMaintenanceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("compactTable: rows identical, file count collapses, threshold " +
      "respected") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("cmp-winnow") + "/fp"
    IndexStore.buildWinnow(docs.filter(col("doc_id") % 4 === 0), path)
    (1 to 3).foreach(i =>
      IndexStore.appendWinnow(docs.filter(col("doc_id") % 4 === i), path))

    val before = sortedRows(IndexStore.readWinnow(spark, path))
    val filesBefore = IndexStore.parquetFileCount(spark, path)
    // under threshold: no-op
    assert(!IndexStore.compactTable(spark, path, maxFiles = filesBefore))
    assert(IndexStore.parquetFileCount(spark, path) === filesBefore)
    // over threshold: rewrite (build + 3 appends ≥ 4 files)
    assert(filesBefore >= 4, s"fixture landed only $filesBefore files")
    assert(IndexStore.compactTable(spark, path, maxFiles = filesBefore - 1,
      targetFiles = 1))
    val filesAfter = IndexStore.parquetFileCount(spark, path)
    assert(filesAfter === 1, s"still $filesAfter files")
    assert(sortedRows(IndexStore.readWinnow(spark, path)) === before)
  }

  test("compactTable preserves the streaming _delta subtree and its " +
      "replay-safe views") {
    val docs = Tables.documents(spark, dir).limit(100)
    val path = tmp("cmp-delta") + "/digests"
    IndexStore.buildCurationDigests(docs.filter(col("doc_id") % 2 === 0), path)
    IndexStore.appendCurationDigests(docs.filter(col("doc_id") % 2 === 1), path)
    IndexStore.appendCurationDigestsVersioned(
      docs.filter(col("doc_id") < 10), path, batchId = 1L)

    val viewBefore = sortedRows(IndexStore.readWithDeltasBefore(spark, path, 2L))
    assert(IndexStore.compactTable(spark, path, maxFiles = 1, targetFiles = 1))
    assert(IndexStore.deltaSegmentIds(spark, path) === Seq(1L),
      "compaction must not touch _delta segments")
    assert(sortedRows(IndexStore.readWithDeltasBefore(spark, path, 2L)) ===
      viewBefore)
  }

  test("foldDeltas: views at or above the fold watermark are unchanged, " +
      "segment dirs are gone") {
    val docs = Tables.documents(spark, dir).limit(120)
    val path = tmp("fold") + "/digests"
    IndexStore.buildCurationDigests(docs.filter(col("doc_id") % 3 === 0), path)
    IndexStore.appendCurationDigestsVersioned(
      docs.filter(col("doc_id") % 3 === 1), path, batchId = 1L)
    IndexStore.appendCurationDigestsVersioned(
      docs.filter(col("doc_id") % 3 === 2), path, batchId = 2L)

    val viewAt3 = sortedRows(IndexStore.readWithDeltasBefore(spark, path, 3L))
    assert(IndexStore.foldDeltas(spark, path, upTo = 3L))
    assert(IndexStore.deltaSegmentIds(spark, path).isEmpty)
    assert(sortedRows(IndexStore.readWithDeltasBefore(spark, path, 3L)) ===
      viewAt3)
    // idempotent when nothing is left to fold
    assert(!IndexStore.foldDeltas(spark, path, upTo = 3L))
  }

  test("compactPostings: merged dictionary view identical, segments " +
      "collapse to one") {
    val docs = Tables.documents(spark, dir)
    val path = tmp("cmp-post") + "/seg"
    IndexStore.buildPostings(docs.filter(col("doc_id") % 3 === 0), path)
    IndexStore.appendPostings(docs.filter(col("doc_id") % 3 === 1), path)
    IndexStore.appendPostings(docs.filter(col("doc_id") % 3 === 2), path)

    def view = IndexStore.mergePostings(IndexStore.readPostings(spark, path))
      .select(col("token"), col("df_docs"), concat_ws("|", col("postings")))
    val before = sortedRows(view)
    val filesBefore = IndexStore.parquetFileCount(spark, path)
    IndexStore.compactPostings(spark, path, targetFiles = 1)
    assert(IndexStore.parquetFileCount(spark, path) < filesBefore)
    assert(sortedRows(view) === before)
  }

  test("rebuildPrefix: index row-identical to a from-scratch build, probe " +
      "results (exact recall) unchanged by append-then-rebuild") {
    val docs = Tables.documents(spark, dir)
    val standing = docs.filter(col("doc_id") % 5 =!= 0)
    val late = docs.filter(col("doc_id") % 5 === 0)
    val probe = docs.filter(col("doc_id") % 7 === 3).limit(30)

    val inc = tmp("pfx-inc")
    IndexStore.buildPrefix(standing, inc)
    IndexStore.appendPrefix(late, inc) // stale-dictionary prefixes
    val probeStale = sortedRows(
      Dedup.prefixProbe(probe, IndexStore.readPrefix(spark, inc)))

    IndexStore.rebuildPrefix(spark, inc)
    val full = tmp("pfx-full")
    IndexStore.buildPrefix(docs, full)

    val a = IndexStore.readPrefix(spark, inc)
    val b = IndexStore.readPrefix(spark, full)
    assert(sortedRows(a.freq) === sortedRows(b.freq))
    assert(sortedRows(a.prefixes) === sortedRows(b.prefixes))
    // recall is dictionary-independent: stale and rebuilt probes agree
    assert(sortedRows(Dedup.prefixProbe(probe, a)) === probeStale)
  }

  test("annCellOccupancy + maintainAnn: a cell-concentrated delta crosses " +
      "the skew threshold, the triggered rebuild rebalances") {
    val emb = Tables.embeddings(spark, dir)
    val root = tmp("ann-drift")
    IndexStore.buildAnn(emb.filter(col("vec_id") < 400), root)
    val base = IndexStore.annCellOccupancy(spark, root)
    assert(base.nVectors === 400L)

    // drift fixture: re-keyed copies of the fullest cell's own vectors —
    // assignment under the FROZEN centroids routes every copy back into
    // that one cell, the worst-case intake stream for a stale quantizer
    val cells = IndexStore.readAnnCells(spark, root)
    val hot = cells.groupBy(col("cell")).count()
      .orderBy(col("count").desc, col("cell")).first().getInt(0)
    val hotVecs = emb.join(
      cells.filter(col("cell") === hot).select(col("vec_id")), "vec_id")
    (1 to 4).foreach(i => IndexStore.appendAnn(
      hotVecs.withColumn("vec_id", col("vec_id") + lit(100000L * i)), root))
    val drifted = IndexStore.annCellOccupancy(spark, root)
    assert(drifted.skew > base.skew, "hot-cell appends must raise skew")

    // under the threshold: measurement only, no rebuild
    assert(!IndexStore.maintainAnn(spark, root, maxSkew = drifted.skew + 1.0))
    // crossed: rebuild runs, the re-fit quantizer splits the hot region
    assert(IndexStore.maintainAnn(spark, root,
      maxSkew = (base.skew + drifted.skew) / 2.0))
    val after = IndexStore.annCellOccupancy(spark, root)
    assert(after.nVectors === drifted.nVectors, "rebuild must not lose rows")
    assert(after.skew < drifted.skew,
      s"rebalanced skew ${after.skew} should beat drifted ${drifted.skew}")
  }

  test("prefixFreqDrift + maintainPrefix: vocabulary turnover crosses the " +
      "drift threshold, the triggered re-freeze restores drift zero") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val root = tmp("pfx-drift2")
    IndexStore.buildPrefix(docs.filter(col("doc_id") < 300), root)
    // a fresh build's dictionary IS the corpus distribution: drift exact 0
    assert(IndexStore.prefixFreqDrift(spark, root) === 0.0)

    // delta with a disjoint vocabulary: every shingle hash is new, so the
    // frozen dictionary's mass and the new mass diverge toward TV ~ 0.5
    val driftedDocs = (0 until 300).map { i =>
      (100000L + i, (0 until 40).map(j => s"zq${(i * 7 + j) % 90}").mkString(" "))
    }.toDF("doc_id", "text")
    IndexStore.appendPrefix(driftedDocs, root)
    val drift = IndexStore.prefixFreqDrift(spark, root)
    assert(drift > 0.25, s"vocabulary turnover must register: $drift")

    assert(!IndexStore.maintainPrefix(spark, root, maxDrift = drift + 0.1),
      "under the threshold: no rebuild")
    assert(IndexStore.maintainPrefix(spark, root, maxDrift = drift / 2),
      "crossed: re-freeze runs")
    assert(IndexStore.prefixFreqDrift(spark, root) === 0.0,
      "after re-freeze the dictionary matches the corpus again")
  }

  test("prefixFreqDrift sees STREAMING delta segments; the triggered " +
      "rebuild folds them and covers intaken docs (r9 advice)") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val root = tmp("pfx-sdrift")
    IndexStore.buildPrefix(docs.filter(col("doc_id") < 300), root)
    assert(IndexStore.prefixFreqDrift(spark, root) === 0.0)

    // disjoint-vocabulary intake lands ONLY as _delta/b=1 (the streaming
    // path) — a drift metric reading the standing table alone reports 0.0
    // here and the rebuild trigger never fires after streaming intake
    val intake = (0 until 300).map { i =>
      (200000L + i, (0 until 40).map(j => s"wv${(i * 11 + j) % 90}").mkString(" "))
    }.toDF("doc_id", "text")
    IndexStore.appendPrefixVersioned(intake, root, batchId = 1L)
    assert(IndexStore.deltaSegmentIds(spark, s"$root/sets") === Seq(1L))
    val drift = IndexStore.prefixFreqDrift(spark, root)
    assert(drift > 0.25,
      s"streaming-intaken vocabulary must register as drift: $drift")

    assert(IndexStore.maintainPrefix(spark, root, maxDrift = drift / 2),
      "crossed: re-freeze runs")
    // rebuild folded the segments and re-froze over the FULL corpus:
    // drift back to zero, no surviving delta dirs, index row-identical
    // to a from-scratch build over standing + intaken docs
    assert(IndexStore.prefixFreqDrift(spark, root) === 0.0)
    assert(IndexStore.deltaSegmentIds(spark, s"$root/sets").isEmpty)
    assert(IndexStore.deltaSegmentIds(spark, s"$root/prefixes").isEmpty)
    val full = tmp("pfx-sdrift-full")
    IndexStore.buildPrefix(
      docs.filter(col("doc_id") < 300).select("doc_id", "text")
        .unionByName(intake), full)
    val a = IndexStore.readPrefix(spark, root)
    val b = IndexStore.readPrefix(spark, full)
    assert(sortedRows(a.freq) === sortedRows(b.freq))
    assert(sortedRows(a.prefixes) === sortedRows(b.prefixes))
    assert(sortedRows(a.sets.select(col("doc_id"), col("sz"))) ===
      sortedRows(b.sets.select(col("doc_id"), col("sz"))))
  }

  test("foldAnnDeltas: read views identical, segments retired, folded rows " +
      "land in cell partition dirs (pruning restored)") {
    val emb = Tables.embeddings(spark, dir)
    val root = tmp("ann-fold")
    IndexStore.buildAnn(emb.filter(col("vec_id") < 300), root)
    IndexStore.appendAnnVersioned(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400), root, 1L)
    IndexStore.appendAnnVersioned(emb.filter(col("vec_id") >= 400), root, 2L)

    val cellsBefore = sortedRows(IndexStore.readAnnCellsBefore(spark, root, 3L))
    val codesBefore = sortedRows(
      IndexStore.readWithDeltasBefore(spark, s"$root/codes", 3L)
        .select(col("vec_id"), col("cell").cast("int")))
    assert(IndexStore.foldAnnDeltas(spark, root, 3L))
    assert(IndexStore.deltaSegmentIds(spark, s"$root/cells").isEmpty)
    assert(IndexStore.deltaSegmentIds(spark, s"$root/codes").isEmpty)
    assert(sortedRows(IndexStore.readAnnCellsBefore(spark, root, 3L))
      === cellsBefore)
    assert(sortedRows(IndexStore.readAnnCodes(spark, root)
      .select(col("vec_id"), col("cell"))) === codesBefore)
    // second fold is a no-op
    assert(!IndexStore.foldAnnDeltas(spark, root, 3L))
  }

  test("rebuildAnn: re-frozen quantizers cover the full corpus exactly " +
      "once, and every stored cell/code matches direct assignment/encode " +
      "under the new quantizers") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, dir)
    val root = tmp("ann-rebuild")
    IndexStore.buildAnn(emb.filter(col("vec_id") < 250), root)
    IndexStore.appendAnn(
      emb.filter(col("vec_id") >= 250 && col("vec_id") < 350), root)
    IndexStore.appendAnnVersioned(emb.filter(col("vec_id") >= 350), root, 1L)

    IndexStore.rebuildAnn(spark, root)
    val cs = IndexStore.readAnnCentroids(spark, root)
    val cbs = IndexStore.readAnnCodebooks(spark, root)
    val cells = IndexStore.readAnnCells(spark, root)
    assert(cells.count() === emb.count(), "every vector exactly once")
    assert(cells.select(col("vec_id")).distinct().count() === emb.count())
    val stored = cells.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = Similarity.assignCells(Similarity.embeddedOf(emb), cs)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stored === direct, "cells must reflect the NEW frozen centroids")
    def codeMap(df: DataFrame) = df
      .select(col("vec_id") +: (0 until Similarity.PqM)
        .map(j => col(s"code_$j")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).toList).toMap
    assert(codeMap(IndexStore.readAnnCodes(spark, root)) ===
      codeMap(Similarity.encodePq(
        Similarity.assignCells(Similarity.embeddedOf(emb), cs), cbs)),
      "codes must reflect the NEW frozen codebooks")
    // the staging snapshot is gone and no delta segments survive
    assert(IndexStore.deltaSegmentIds(spark, s"$root/cells").isEmpty)
    assert(!new java.io.File(s"$root/_rebuild_src").exists())
  }
}

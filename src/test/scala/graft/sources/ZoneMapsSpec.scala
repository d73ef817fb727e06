package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZoneMapsSpec extends SparkSpec {

  private def layout(): String = {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    sf("documents").repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, Seq("doc_id", "n_chars"))
    dir
  }

  test("pruned scan reads strictly fewer files and exactly the full-scan-filter rows") {
    val dir = layout()
    val total = spark.read.parquet(dir).inputFiles.length
    val pruned = ZoneMaps.prunedScan(spark, dir, "doc_id", 100L, 199L)
    assert(pruned.inputFiles.length < total,
      s"expected skipping: ${pruned.inputFiles.length} of $total files")
    val expect = spark.read.parquet(dir)
      .filter(col("doc_id").between(100, 199))
      .collect().map(_.getLong(0)).sorted
    assert(pruned.collect().map(_.getLong(0)).sorted === expect)
  }

  test("band test is necessary-not-sufficient: residual filter still applies inside surviving files") {
    val dir = layout()
    // a range inside one file's band but matching few rows
    val got = ZoneMaps.prunedScan(spark, dir, "doc_id", 7L, 7L).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("disjoint range prunes every file and returns empty with the table schema") {
    val dir = layout()
    val out = ZoneMaps.prunedScan(spark, dir, "doc_id", 1000000L, 2000000L)
    assert(out.count() === 0L)
    assert(out.schema.fieldNames.contains("text"))
    assert(ZoneMaps.candidateFiles(spark, dir, "doc_id", 1000000L, 2000000L).isEmpty)
  }

  test("manifest carries every file x column band; a second build overwrites idempotently") {
    val dir = layout()
    ZoneMaps.build(spark, dir, Seq("doc_id")) // rebuild, fewer columns
    val files = spark.read.parquet(dir).inputFiles.length
    assert(ZoneMaps.candidateFiles(spark, dir, "doc_id", Long.MinValue, Long.MaxValue).length === files)
    // n_chars entries were replaced by the rebuild
    intercept[IllegalArgumentException] {
      ZoneMaps.candidateFiles(spark, dir, "n_chars", 0L, 1L)
    }
  }

  test("incremental update stats only appended files; pruned scan stays exact across the append") {
    val dir = layout()
    val before = spark.read.parquet(dir).inputFiles.toSet
    // append a disjoint high range as new files
    sf("documents").withColumn("doc_id", col("doc_id") + 10000L)
      .repartitionByRange(4, col("doc_id"))
      .write.mode("append").parquet(dir)
    ZoneMaps.update(spark, dir, Seq("doc_id", "n_chars"))
    val after = spark.read.parquet(dir).inputFiles.toSet
    assert(after.size > before.size)
    // manifest now covers every file
    assert(ZoneMaps.candidateFiles(spark, dir, "doc_id", Long.MinValue, Long.MaxValue)
      .length === after.size)
    // a scan over the appended range touches only new files, and is exact
    val pruned = ZoneMaps.prunedScan(spark, dir, "doc_id", 10100L, 10199L)
    assert(pruned.inputFiles.forall(f => !before.contains(f)),
      "pruned scan of the appended range read pre-append files")
    assert(pruned.count() ===
      spark.read.parquet(dir).filter(col("doc_id").between(10100, 10199)).count())
    // mismatched column set is rejected
    intercept[IllegalArgumentException] {
      ZoneMaps.update(spark, dir, Seq("doc_id"))
    }
  }

  test("unsorted layout degrades gracefully: wide bands keep all files, result still exact") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    // hash layout — every file spans nearly the full doc_id range
    sf("documents").repartition(8, col("source"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, Seq("doc_id"))
    val pruned = ZoneMaps.prunedScan(spark, dir, "doc_id", 100L, 199L)
    val expect = spark.read.parquet(dir)
      .filter(col("doc_id").between(100, 199)).count()
    assert(pruned.count() === expect)
  }
}

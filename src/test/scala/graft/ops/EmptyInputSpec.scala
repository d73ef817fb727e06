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
}

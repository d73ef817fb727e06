package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end training-corpus pipeline demo: curate (exact + near-dup
  * dedup + quality gate) → mixture sample → packing manifest →
  * contamination check, printed as a one-screen summary.
  * `sbt "runMain graft.tools.CorpusDemo [sfDir]"` */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Corpus, Tables}

    val total = Tables.documents(spark, dir).count()
    val curated = Corpus.curateQuery(spark, dir).count()
    val sampled = Corpus.mixtureSample(spark, dir).count()
    val bins = Corpus.packBins(spark, dir)
    val nBins = bins.count()
    val contam = Corpus.contamination(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_hits") > 0).count()

    println(f"documents:            $total%6d")
    println(f"after curation:       $curated%6d  (exact+near dedup, quality gate)")
    println(f"after mixture sample: $sampled%6d  (per-source rates, stable hash)")
    println(f"packing bins:         $nBins%6d  (budget ${Corpus.TokenBudget} tokens)")
    println(f"contaminated eval:    $contam%6d  (8-gram train overlap)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM A/B timer for [[graft.ops.Similarity.cosineDupLsh]]'s
  * candidate budget — one leg per invocation so neither measurement
  * inherits the other's cache/GC state.
  * `sbt "runMain graft.tools.EmbCapProbe [sfDir] [cap|uncapped]"` */
object EmbCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val capArg = if (args.length > 1) args(1) else "8"
    val cap = if (capArg == "uncapped") None else Some(capArg.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-emb-cap-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.ops.Similarity.cosineDupLsh(spark, dir,
      maxCandidatesPerDoc = cap).count()
    println(f"emb band ${capArg}: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
    spark.stop()
  }
}

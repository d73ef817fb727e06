package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM A/B timer for the embedding band-join family — one leg per
  * invocation so neither measurement inherits the other's cache/GC state.
  * Legs: candidate budget (r10: the cap was a measured 36% LOSS under the
  * default geometry — the collision scan is the floor) and band geometry
  * (r12: [[graft.ops.Similarity.cosineDupLshWide]]'s 8×8-bit keys vs the
  * default 4×4-bit, the runtime lever the cap couldn't be).
  * `sbt "runMain graft.tools.EmbCapProbe [sfDir] [cap|uncapped] [narrow|wide|widemp]"` */
object EmbCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val capArg = if (args.length > 1) args(1) else "8"
    val cap = if (capArg == "uncapped") None else Some(capArg.toInt)
    val geom = if (args.length > 2) args(2) else "narrow"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-emb-cap-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = geom match {
      case "wide" => graft.ops.Similarity.cosineDupLshWide(spark, dir,
        maxCandidatesPerDoc = cap).count()
      case "widemp" => graft.ops.Similarity.cosineDupLshWideMultiProbe(
        spark, dir, maxCandidatesPerDoc = cap).count()
      case _ => graft.ops.Similarity.cosineDupLsh(spark, dir,
        maxCandidatesPerDoc = cap).count()
    }
    println(f"emb band $geom $capArg: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
    spark.stop()
  }
}

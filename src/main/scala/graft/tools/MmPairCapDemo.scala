package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Multimodal

/** Runnable evidence for mm_dup_pairs' candidate budget (the ×30 sweep's
  * third over-budget emitter, adjudicated round 14): replica duplication
  * SQUARES phash duplicate-group sizes, so the uncapped pair set — the
  * oracled contract — is output-bound at scale. This demo times the
  * capped form next to the uncapped one on the same dir, proving the
  * `maxCandidatesPerDoc` knob bounds verify work and output to O(c·n)
  * exactly as the text family's budgets do.
  * `sbt "runMain graft.tools.MmPairCapDemo [sfDir] [cap] [uncapped]"` */
object MmPairCapDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = if (args.length > 1) args(1).toInt else 8
    val alsoUncapped = args.length > 2 && args(2) == "uncapped"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-mm-pair-cap-demo")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String, fn: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = fn
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
    }
    time(s"capped (budget $cap/doc)",
      Multimodal.mmDupPairs(spark, dir,
        maxCandidatesPerDoc = Some(cap)).count())
    if (alsoUncapped)
      time("uncapped exact-probe",
        Multimodal.mmDupPairs(spark, dir).count())
    spark.stop()
  }
}

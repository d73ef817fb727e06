package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a named SparkEntry query N times in one session — separates
  * steady-state cost from first-run JIT/session warmup.
  * `sbt "runMain graft.tools.TimeQuery <name> [sfDir] [reps] [prime]"`
  *
  * `prime` (optional, comma-separated query names) runs each listed query
  * ONCE before the timed reps — the controlled-A/B lever for session-state
  * effects: e.g. timing `dedup_prefix_join` with the four recall dashboards
  * primed reproduces the bench session's populated [[graft.ops.Caching]]
  * memo (localCheckpointed blocks that `clearCache()` cannot release),
  * vs a fresh JVM without them (r14 verdict #1: the pair-family regression
  * suspect). Prime runs are timed and printed too, but labeled `prime`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val prime = if (args.length > 3) args(3).split(",").toSeq.filter(_.nonEmpty)
      else Seq.empty
    // SPARK_GRAFT_CPUS matches Bench's session config so a TimeQuery
    // number is comparable to the bench record it diagnoses (default 8
    // preserved for the historical A/B rows in BENCH.md)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- prime) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(p)(spark, dir).count()
      println(f"prime $p: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

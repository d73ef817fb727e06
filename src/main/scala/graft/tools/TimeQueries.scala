package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a comma-separated list of SparkEntry queries, `reps` passes over
  * the whole list per pass (bench-shaped: each query's invocations are
  * spread apart, not back-to-back), printing per-query min — the r16
  * optimization round's A/B surface when several queries share the code
  * under test. `sbt "runMain graft.tools.TimeQueries <n1,n2,...> [sfDir]
  * [reps]"`. Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(n) = dt :: times(n)
      println(f"[pass $r] $n: $dt%.2f s ($cnt rows)")
    }
    for (n <- names)
      println(f"[min] $n: ${times(n).min}%.2f s  (all: ${times(n).reverse.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}

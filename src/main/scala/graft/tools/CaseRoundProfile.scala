package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decomposes q_case_round's sweep-time profile (VERDICT r13 #7: 28.2 s
  * at ×30, ratio 18.5 — 4× the per-row cost of its relational
  * neighbors). The hypothesis under test: the cost is OUTPUT-bound, not
  * compute- or warmup-bound — q_case_round is the only relational query
  * whose result is the full lineitem table (18M rows at ×30), globally
  * sorted and written to parquet by Verify, while its neighbors emit
  * ≤150k rows. Times four plans on the same dir, steady-state (run 2+):
  *   scan      — count() of the raw lineitem scan (input cost floor)
  *   project   — count() of the CASE/round projection, no sort
  *              (what Bench measures: EliminateSorts drops the orderBy
  *              under the count aggregate)
  *   write     — unsorted projection written to parquet (output cost)
  *   sort+write — the full Verify-shaped plan: orderBy then write
  * `sbt "runMain graft.tools.CaseRoundProfile [sfDir] [reps]"` */
object CaseRoundProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("case_round_").toString

    def projected: DataFrame =
      graft.ops.Relational.caseRoundUnsorted(spark, dir)
    def time(label: String)(body: => Unit): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        body
        println(f"[case-round] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("scan")(graft.ops.Tables.lineitem(spark, dir).count())
    time("project")(projected.count())
    time("write")(projected.write.mode("overwrite").parquet(s"$out/unsorted"))
    time("sort+write")(
      graft.SparkEntry.queries("q_case_round")(spark, dir)
        .write.mode("overwrite").parquet(s"$out/sorted"))
    spark.stop()
  }
}

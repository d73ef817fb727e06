package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{Bucketing, Tables}

/** Runnable evidence for the bucketed co-located join: prints whether the
  * executed plan contains exchanges for the bucketed join vs the plain
  * join. `sbt "runMain graft.tools.BucketingDemo [sfDir]"` */
object BucketingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-bucketing-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    Bucketing.writeBucketed(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey")
    Bucketing.writeBucketed(Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey")

    val bucketed = Bucketing.bucketedEquiJoin(spark, "li_b", "o_b",
      "l_orderkey", "o_orderkey")
    val bPlan = bucketed.queryExecution.executedPlan.toString
    println(s"bucketed join:   exchanges=${bPlan.contains("Exchange")} " +
      s"smj=${bPlan.contains("SortMergeJoin")} rows=${bucketed.count()}")

    import org.apache.spark.sql.functions.col
    val plain = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
    val pPlan = plain.queryExecution.executedPlan.toString
    println(s"plain join:      exchanges=${pPlan.contains("Exchange")} " +
      s"rows=${plain.count()}")

    spark.stop()
  }
}

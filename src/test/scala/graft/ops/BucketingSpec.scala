package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so the exchange (or its absence) is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey")
      Bucketing.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
        "o_bucketed", "o_orderkey")

      val joined = Bucketing.bucketedEquiJoin(spark,
        "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      // executedPlan (post-EnsureRequirements), where exchanges exist;
      // sparkPlan is pre-preparation and never shows them
      val physical = joined.queryExecution.executedPlan.toString

      assert(physical.contains("SortMergeJoin"), s"expected SMJ:\n$physical")
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")

      // and an unbucketed twin DOES shuffle — the control
      val unbucketed = Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))

      // correctness: same row count both ways
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bucketed group-by on the bucket key avoids the aggregate exchange") {
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "li_agg_bucketed", "l_orderkey")
      val agg = spark.table("li_agg_bucketed")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val physical = agg.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$physical")
      assert(agg.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_bucketed")
  }
}

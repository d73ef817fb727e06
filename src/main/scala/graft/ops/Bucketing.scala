package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle data ONCE at write time so every
  * subsequent equi-join/aggregation on the bucket key runs with zero
  * exchanges.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of both
  * sides. Writing both tables bucketed by the join key (same bucket count)
  * stores them hash-partitioned on disk; Spark's bucketed scan then reports
  * HashPartitioning to EnsureRequirements and the sort-merge join reads
  * co-located buckets directly — the shuffle is amortized into the write
  * path, paid once instead of per query. BucketingSpec asserts the joined
  * plan contains no Exchange on either side.
  */
object Bucketing {

  /** Write `df` as a managed bucketed (and bucket-sorted) table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket keys. With matching
    * bucket counts this plans as an exchange-free sort-merge join. */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
  }
}

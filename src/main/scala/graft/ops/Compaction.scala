package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-file sizing: the write-path half of the small-files problem.
  *
  * A 100 TB pipeline that writes one file per shuffle partition either
  * produces thousands of KB-sized files (downstream listing/open overhead)
  * or few multi-GB files (no read parallelism). Compaction targets a file
  * size by estimating bytes from the optimized plan's statistics and
  * repartitioning to ceil(bytes / target) before the write — pure
  * DataFrame-level policy, no custom committer.
  */
object Compaction {

  /** Estimated output bytes from Catalyst plan stats (falls back to the
    * scan-size-derived estimate when no better stats exist). */
  def estimatedBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.min(Long.MaxValue).toLong

  /** Number of files needed to hit `targetBytes` per file. */
  def targetPartitions(df: DataFrame, targetBytes: Long): Int =
    math.max(1, math.ceil(estimatedBytes(df).toDouble / targetBytes).toInt)

  /** Write `df` as parquet with files sized toward `targetBytes`
    * (pre-compression estimate). Returns the partition count used. */
  def writeCompacted(df: DataFrame, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val n = targetPartitions(df, targetBytes)
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(path)
    n
  }
}

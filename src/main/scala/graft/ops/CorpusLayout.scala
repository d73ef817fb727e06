package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output layout for a curated training corpus — the write path's half of
  * the 100 TB story, which matters as much as the read path's:
  *
  *   - `partitionBy(source, lang)` lays the corpus out as
  *     `source=…/lang=…/` hive directories, so downstream mixture sampling
  *     and per-source ablations are partition-pruned scans, never full
  *     reads.
  *   - `maxRecordsPerFile` bounds file size — the lever against both
  *     giant files (stragglers: one task per file on read) and, combined
  *     with the pre-write repartition on the partition columns, the
  *     small-file explosion (every task writing every partition).
  *   - `sortWithinPartitions(doc_id)` makes files internally ordered, so
  *     parquet min/max column stats prune row groups for id-range reads
  *     and delta/dedup joins read back in key order.
  *
  * The repartition keys the shuffle on exactly the output partition
  * columns: each (source, lang) cell is written by the tasks that own it —
  * at 1000 executors this is what keeps file counts ∝ partitions, not
  * ∝ partitions × tasks.
  */
object CorpusLayout {

  /** Write `docs` partitioned by (source, lang); returns the written path. */
  def writePartitioned(docs: DataFrame, path: String,
      maxRecordsPerFile: Int = 100000): String = {
    docs
      .repartition(col("source"), col("lang"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("source", "lang")
      .parquet(path)
    path
  }

  /** Read back with partition pruning: a (source, lang) slice. */
  def readSlice(s: SparkSession, path: String, source: String,
      lang: String): DataFrame =
    s.read.parquet(path)
      .filter(col("source") === source && col("lang") === lang)

  /** Z-order (Morton) clustering key over (user_id, hour bucket) of the
    * events table — the multi-dimensional layout lever: files written in
    * zkey order cover small rectangles in BOTH dimensions, so parquet
    * min/max stats prune 2-D box predicates where a single-column sort
    * clusters only its leading column (see ZOrderSpec's span evidence).
    * The key itself is the native codegen zorder2 expression; bucketing at
    * one hour keeps both coordinates far below 2^32. */
  def zorderKeys(s: SparkSession, dir: String): DataFrame = {
    graft.functions.ZOrder2.register(s)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 3600000000000").as("bucket"))
      .withColumn("zkey", expr("zorder2(user_id, bucket)"))
      .orderBy(col("event_id"))
  }
}

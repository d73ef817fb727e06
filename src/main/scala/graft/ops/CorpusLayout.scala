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
}

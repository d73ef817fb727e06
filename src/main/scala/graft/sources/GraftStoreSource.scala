package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.collab.ParquetTableStore

/** DataSource V2 front-end for the graft TableStore
  * (SURVEY §7.3 stretch goal: `spark.read.format("graft")`):
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("root", "/warehouse").option("table", "ratings").load()
  * }}}
  *
  * Extends the built-in parquet V2 source, overriding only path resolution
  * (root + table → store directory), so scans keep everything the native
  * reader has: vectorized columnar batches, predicate pushdown, column
  * pruning, partition planning. This is the same seam a Cassandra-connector
  * backend would slot into on a cluster — the logical table name is the
  * API, the physical layout is the source's concern.
  *
  * Writes go through TableStore.append (truncate/append visibility is the
  * store's contract, not the scan's).
  */
class GraftStoreSource extends ParquetDataSourceV2 {
  override def shortName(): String = "graft"

  override def getPaths(map: CaseInsensitiveStringMap): Seq[String] = {
    val opts = map.asCaseSensitiveMap().asScala
    (opts.get("root"), opts.get("table")) match {
      case (Some(root), Some(table)) => Seq(s"$root/$table")
      case _ => throw new IllegalArgumentException(
        "graft source requires options: root, table")
    }
  }

  /** Resolve the table with the store's declared schema when the
    * `_schema.json` sidecar exists (written by `ParquetTableStore.create`
    * / `truncate`): a just-truncated table has no parquet footers to infer
    * from, and without this an empty read throws UNABLE_TO_INFER_SCHEMA —
    * the store's scan-side fallback (`ParquetTableStore.scan`), replayed
    * at the V2 seam. With files present it also skips footer inference
    * entirely: the sidecar is authoritative because the store enforces it
    * on every append. */
  override def getTable(options: CaseInsensitiveStringMap): Table =
    ParquetTableStore.readSidecar(SparkSession.active, getPaths(options).head) match {
      case Some(schema) => super.getTable(options, schema)
      case None         => super.getTable(options)
    }
}

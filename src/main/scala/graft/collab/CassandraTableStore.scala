package graft.collab

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The Cassandra backend of the TableStore seam — the storage layer the
  * reference uses directly (ref: CollabFilterCassandraDriver.java:26,50-54,
  * 62,71-76,100-103; keyspace/tables collab_filter_setup.sql:2-5).
  *
  * Format resolution is by name at runtime, so this compiles and ships
  * without the spark-cassandra-connector jar; on a cluster with the
  * connector on the classpath (and `spark.cassandra.connection.host` set)
  * it is a drop-in replacement for ParquetTableStore — Pipeline.run and
  * every operator above the seam are unchanged. In this connector-less
  * environment any operation fails fast with the clear "Failed to find
  * data source" error (asserted in CassandraTableStoreSpec).
  *
  * Scale notes: connector scans split by token range (partition-per-range,
  * no single-reader funnel); writes batch per partition key. TRUNCATE has
  * no DataFrame-level equivalent — like the reference it is a CQL
  * statement, which the connector exposes via its session API; here it is
  * an overwrite of an empty frame, which the connector maps to the same
  * visibility contract the reference relied on (scratch-cache semantics,
  * SURVEY §1.3).
  */
final class CassandraTableStore(spark: SparkSession, keyspace: String)
    extends TableStore {
  private val Format = "org.apache.spark.sql.cassandra"
  private val schemas = scala.collection.mutable.Map[String, StructType]()

  private def opts(table: String) =
    Map("keyspace" -> keyspace, "table" -> table)

  /** Table DDL is out-of-band CQL in the reference (collab_filter_setup
    * .sql); the connector equally expects pre-created tables. */
  override def create(table: String, schema: StructType): Unit =
    schemas(table) = schema

  override def truncate(table: String): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schemas.getOrElse(table,
        throw new IllegalStateException(s"unknown table $table")))
    empty.write.format(Format).options(opts(table))
      .option("confirm.truncate", "true")
      .mode("overwrite").save()
  }

  override def append(table: String, df: DataFrame): Unit =
    df.write.format(Format).options(opts(table)).mode("append").save()

  override def scan(table: String): DataFrame =
    spark.read.format(Format).options(opts(table)).load()
}

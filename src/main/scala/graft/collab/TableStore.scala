package graft.collab

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable storage layer standing in for the reference's Cassandra keyspace
  * (ref: CollabFilterCassandraDriver.java:62,71-76,100-103;
  * collab_filter_setup.sql:2-5).
  *
  * The build environment has no spark-cassandra-connector jar (zero egress),
  * so the local backend is Parquet; the interface keeps the reference's
  * operations (create / truncate / append / scan) so a Cassandra-connector
  * backend (`spark.read.format("org.apache.spark.sql.cassandra")`) can be
  * slotted in unchanged on a real cluster.
  */
trait TableStore {
  def create(table: String, schema: StructType): Unit
  def truncate(table: String): Unit
  def append(table: String, df: DataFrame): Unit
  def scan(table: String): DataFrame
}

/** Parquet-directory-per-table store under `root`.
  *
  * Scale notes: appends land as new parquet files in the table directory, so
  * writes scale with executor parallelism (no driver funnel); scans are
  * vectorized columnar reads with predicate pushdown and column pruning via
  * Catalyst. Truncate is implemented as an atomic-enough swap: the directory
  * is deleted and recreated empty — readers in this single-JVM harness never
  * observe partial state because operations are driver-sequenced.
  */
final class ParquetTableStore(spark: SparkSession, root: String) extends TableStore {
  private val schemas = scala.collection.mutable.Map[String, StructType]()

  private def dir(table: String) = s"$root/$table"

  override def create(table: String, schema: StructType): Unit = {
    schemas(table) = schema
    truncate(table)
  }

  override def truncate(table: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir(table))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    fs.mkdirs(path)
  }

  override def append(table: String, df: DataFrame): Unit = {
    schemas.get(table).foreach { s =>
      require(df.schema.fields.map(f => (f.name, f.dataType)).sameElements(
        s.fields.map(f => (f.name, f.dataType))),
        s"schema mismatch appending to $table: ${df.schema.simpleString} vs ${s.simpleString}")
    }
    df.write.mode(SaveMode.Append).parquet(dir(table))
  }

  override def scan(table: String): DataFrame = {
    val reader = schemas.get(table) match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    // An empty (just-truncated) table has no parquet footers to infer from;
    // fall back to the declared schema. ONLY the analysis-time cases
    // (missing path / nothing to infer) mean "empty table" — any other
    // failure (e.g. a corrupted file) must surface, not read as empty.
    try reader.parquet(dir(table))
    catch {
      case _: org.apache.spark.sql.AnalysisException if schemas.contains(table) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemas(table))
    }
  }
}

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
    // Persist the declared schema as a sidecar (underscore prefix = hidden
    // from parquet file listing) so V2 readers — and store instances in
    // other JVMs — can resolve an empty table's schema without footers.
    schemas.get(table).foreach(writeSidecar(table, _))
  }

  private def writeSidecar(table: String, s: StructType): Unit = {
    val p = ParquetTableStore.sidecarPath(dir(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Schema evolution, add-column form: extend the DECLARED schema; no
    * data files are touched (existing rows read back null for the new
    * column — parquet's missing-column semantics under a user-supplied
    * read schema, the same mechanism every table format's cheap ADD
    * COLUMN rides on). The sidecar is rewritten, so V2 readers and other
    * store instances see the widened schema immediately; appends are then
    * checked against it, so old-schema writers fail fast instead of
    * silently forking the layout. */
  def addColumn(table: String, field: org.apache.spark.sql.types.StructField): Unit = {
    val cur = schemas.get(table)
      .orElse(ParquetTableStore.readSidecar(spark, dir(table)))
      .getOrElse(throw new IllegalArgumentException(
        s"addColumn: no declared schema for table $table"))
    require(!cur.fieldNames.contains(field.name),
      s"addColumn: column ${field.name} already exists in $table")
    require(field.nullable,
      s"addColumn: ${field.name} must be nullable — existing files have no values for it")
    val next = StructType(cur.fields :+ field)
    schemas(table) = next
    writeSidecar(table, next)
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
    // Schema resolution order: in-memory declaration, then the _schema.json
    // sidecar (lets a fresh store instance — another JVM — scan a table it
    // didn't create), then footer inference.
    val declared = schemas.get(table).orElse(
      ParquetTableStore.readSidecar(spark, dir(table)))
    val reader = declared match {
      case Some(s) => spark.read.schema(s)
      case None    => spark.read
    }
    // An empty (just-truncated) table has no parquet footers to infer from;
    // fall back to the declared schema. ONLY the analysis-time cases
    // (missing path / nothing to infer) mean "empty table" — any other
    // failure (e.g. a corrupted file) must surface, not read as empty.
    try reader.parquet(dir(table))
    catch {
      case _: org.apache.spark.sql.AnalysisException if declared.isDefined =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared.get)
    }
  }
}

object ParquetTableStore {
  /** Sidecar file carrying the declared schema; the `_` prefix keeps it
    * invisible to parquet's file listing, the same convention as
    * `_SUCCESS` / `_metadata`. */
  def sidecarPath(tableDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(tableDir, "_schema.json")

  def readSidecar(spark: SparkSession, tableDir: String): Option[StructType] = {
    val p = sidecarPath(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType])
    }
  }
}

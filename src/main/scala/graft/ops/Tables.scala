package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata (TESTDATA.md). One parquet per table;
  * reads are vectorized + column-pruned by Catalyst. */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table's `ts` is normalized to BIGINT epoch-nanoseconds
    * regardless of the physical parquet type, so every downstream operator
    * (and its DuckDB `epoch_ns(ts)` oracle) sees one stable representation:
    *  - TIMESTAMP(NANOS) parquet: Spark 4 rejects it unless read as long
    *    (`nanosAsLong`), which is already epoch-nanos;
    *  - TIMESTAMP(MICROS) parquet (current driver testdata): arrives as
    *    TIMESTAMP_NTZ; convert naive-UTC micros → nanos. The conversion is a
    *    narrow codegen projection on the scan — no shuffle, prunes fine. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        // NTZ carries no zone; interpret as UTC to match DuckDB's epoch_ns.
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            df.col("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ/Great-Expectations shape):
  * a fixed suite of constraints evaluated into one violations report — the
  * gate a pipeline runs before promoting a snapshot of ingested data.
  *
  * Scale design — the Deequ lesson applied: per-table constraints FUSE
  * into ONE conditional-aggregation scan per table (a single
  * partial/final HashAggregate; adding a constraint adds a column, not a
  * scan), and only the referential check needs a join — broadcast-able
  * (distinct orderkeys of the smaller side) under AQE. Nothing collects
  * to the driver; the report itself is the only output.
  */
object DataQuality {

  val OrderStatusDomain: Seq[String] = Seq("O", "F", "P")

  /** (check, table, n_checked, n_violations, pass) for the fixed suite,
    * ordered by check name. */
  def qualityReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)

    // coalesce: sum over an EMPTY relation is null, and a null violation
    // count would render pass as null instead of true — an empty table
    // vacuously satisfies every constraint
    def cnt(cond: org.apache.spark.sql.Column) =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))

    // one scan, all lineitem constraints
    val liAgg = li.agg(
      count(lit(1)).as("n"),
      cnt(col("l_orderkey").isNull).as("null_orderkey"),
      cnt(col("l_quantity") <= 0 || col("l_quantity") > 50).as("qty_range"),
      cnt(col("l_extendedprice") < 0).as("neg_price"),
      cnt(col("l_discount") < 0 || col("l_discount") > 1).as("discount_range"))

    // one scan, all orders constraints (uniqueness via count - distinct)
    val ordAgg = ord.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_pk"),
      cnt(col("o_orderstatus").isin(OrderStatusDomain: _*).unary_!).as("status_domain"),
      cnt(col("o_totalprice") <= 0).as("nonpos_total"))

    // referential: lineitems whose order is missing — the one join
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    val liN = li.agg(count(lit(1)).as("n"))

    def row(df: DataFrame, check: String, table: String, violCol: String) =
      df.select(lit(check).as("check"), lit(table).as("table"),
        col("n").as("n_checked"),
        col(violCol).cast("long").as("n_violations"),
        (col(violCol) === 0).as("pass"))

    row(liAgg, "lineitem_discount_in_[0,1]", "lineitem", "discount_range")
      .unionAll(row(liAgg, "lineitem_orderkey_not_null", "lineitem", "null_orderkey"))
      .unionAll(row(liAgg, "lineitem_price_non_negative", "lineitem", "neg_price"))
      .unionAll(row(liAgg, "lineitem_quantity_in_(0,50]", "lineitem", "qty_range"))
      .unionAll(row(orphans.crossJoin(liN), "lineitem_refs_existing_order", "lineitem", "orphans"))
      .unionAll(row(ordAgg, "orders_pk_unique", "orders", "dup_pk"))
      .unionAll(row(ordAgg, "orders_status_in_domain", "orders", "status_domain"))
      .unionAll(row(ordAgg, "orders_totalprice_positive", "orders", "nonpos_total"))
      .orderBy(col("check"))
  }

  /** Equi-width histogram of events.value: 20 buckets over the observed
    * [min, max] — the value-distribution profile q_profile's scalar stats
    * and q_quartiles' rank buckets don't show. Two passes by necessity
    * (exact global bounds first); the second pass is a codegen'd
    * bucket-index projection into a 20-group aggregate, with the 2-row
    * bounds frame broadcast. The bucket arithmetic
    * (`least(19, floor((v-mn)/(mx-mn)*20))`) is written identically in
    * the oracle so boundary values land in the same bin bit-for-bit. The
    * degenerate range (all values equal, or a single row) is guarded:
    * Spark's 0.0/0.0 is NaN while DuckDB's is NULL, so both engines CASE
    * it to bucket 0 explicitly. */
  def valueHistogram(s: SparkSession, dir: String,
      buckets: Int = 20): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(buckets - 1).cast("long"),
            floor((col("value") - col("mn")) / (col("mx") - col("mn"))
              * buckets))).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(max(col("mn")) + col("bucket") * (max(col("mx")) - max(col("mn"))) / buckets, 4).as("lo"),
        round(max(col("mn")) + (col("bucket") + 1) * (max(col("mx")) - max(col("mn"))) / buckets, 4).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Tukey-fence outlier gate per event_type: rows outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] are flagged. Two passes by necessity
    * (the fences are exact quantiles of the whole group — the
    * sketch-based single-pass variant is approxPercentiles' trade), but
    * the second pass joins only a broadcast 3-row bounds table. Fences
    * AND values are carried as integer micro-units (round(x·1e6) as
    * BIGINT, the emb_dim_stats float-sum rule) so the comparison and the
    * output hash are exact integer operations on both engines — no
    * round-to-6-decimals boundary flake between Spark's percentile and
    * DuckDB's quantile_cont. */
  def iqrOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .select(col("event_type"),
        round((col("q1") - (col("q3") - col("q1")) * 1.5) * 1e6, 0)
          .cast("long").as("lo_micro"),
        round((col("q3") + (col("q3") - col("q1")) * 1.5) * 1e6, 0)
          .cast("long").as("hi_micro"))
    ev.withColumn("v_micro", round(col("value") * 1e6, 0).cast("long"))
      .join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v_micro") < col("lo_micro")
          || col("v_micro") > col("hi_micro"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("lo_micro")).as("lo_micro"),
        max(col("hi_micro")).as("hi_micro"))
      .orderBy(col("event_type"))
  }

  val KAnonThreshold = 5

  /** k-anonymity audit over the quasi-identifier (lang, source): groups
    * smaller than k are re-identification risks a release policy must
    * suppress or generalize. One partial/final count aggregate — the
    * audit is group-cardinality-sized regardless of corpus size; the
    * suppression decision rides on each group row as a flag so the
    * release step is a broadcast-able semi-join against this report. */
  def kAnonymityReport(s: SparkSession, dir: String,
      k: Int = KAnonThreshold): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("suppress", col("n_docs") < k)
      .orderBy(col("lang"), col("source"))

  val ChecksumSegments = 16

  /** Merkle-style segment checksums of the documents table — the
    * anti-entropy primitive (Dynamo/Cassandra repair): two replicas (or a
    * table and its backup/migration copy) exchange this SEGMENTS-sized
    * vector and re-sync only the segments whose checksums diverge,
    * instead of diffing 100 TB row by row.
    *
    * Each row hashes ALL its columns through the cross-engine 48-bit
    * family; segments fold row hashes with bit_xor — commutative and
    * associative, so the checksum is partition- and order-invariant BY
    * ALGEBRA (no sort anywhere), and any single-row change flips its
    * segment's checksum. One codegen scan into a 16-group aggregate;
    * xor'ing 48-bit values never overflows or signs. */
  def segmentChecksums(s: SparkSession, dir: String,
      segments: Int = ChecksumSegments): DataFrame =
    segmentChecksumsOf(Tables.documents(s, dir), segments)

  /** Core of [[segmentChecksums]] over any documents-shaped frame. */
  def segmentChecksumsOf(docs: DataFrame,
      segments: Int = ChecksumSegments): DataFrame = {
    val rowHash = graft.functions.SharedHash.spark48(
      "concat_ws('~|~', cast(doc_id AS string), text, lang, source, " +
        "cast(n_chars AS string))")
    docs
      .groupBy(pmod(col("doc_id"), lit(segments)).cast("int").as("segment"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"bit_xor($rowHash)").as("checksum"))
      .orderBy(col("segment"))
  }
}

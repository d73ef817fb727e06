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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the most recent right row (same keys,
  * right.time <= left.time). Spark has no native as-of operator; following
  * the preference order (SURVEY §7.3 / spark_guide) this composes built-ins
  * — union + ignore-nulls `last` over one window — rather than a custom
  * physical operator, which keeps the whole plan inside Catalyst/codegen.
  *
  * Mechanics: tag both sides, union, sort each key partition by (time,
  * right-before-left), carry the right payload forward with
  * `last(ignoreNulls)`, keep left rows. At ties (left.time == right.time)
  * the right row sorts first, so matching is inclusive like DuckDB's
  * `ASOF JOIN ON l.t >= r.t` — which the oracle uses, cross-checking this
  * composition against an independent native implementation.
  *
  * Scale: exactly ONE shuffle (hash partition by key) and one sort — same
  * cost as a window aggregate; no join explosion, no range lookup
  * structure. Skewed keys can be range-partitioned within key by time
  * (AQE skew handling applies to the exchange).
  */
object AsOfJoin {

  /** Generic as-of join.
    * @param left       probe side; all its columns pass through
    * @param right      quote side; must be unique per (keys, timeCol) —
    *                   pre-aggregate if not
    * @param keys       equi-join key columns (present in both)
    * @param timeCol    orderable time column (present in both)
    * @param rightVal   right column carried to matched left rows (renamed
    *                   `asofPrefix + rightVal`)
    * @param inner      drop left rows with no prior right row (like ASOF
    *                   [INNER] JOIN); false keeps them with null
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightVal: String, asofPrefix: String = "asof_",
      inner: Boolean = true): DataFrame = {
    val leftPayload = left.columns.filterNot(c =>
      keys.contains(c) || c == timeCol).toSeq
    val asofCol = asofPrefix + rightVal

    val l = left.select(
      (keys :+ timeCol).map(col) ++
        leftPayload.map(col) :+
        lit(null).cast(right.schema(rightVal).dataType).as(asofCol) :+
        lit(0).as("__side"): _*)
    val r = right.select(
      (keys :+ timeCol).map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightVal).as(asofCol) :+
        lit(1).as("__side"): _*)

    // right (__side=1) sorts before left (__side=0) at equal time → ties
    // match inclusively
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = r.unionByName(l)
      .withColumn(asofCol, last(col(asofCol), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side")
    if (inner) matched.filter(col(asofCol).isNotNull) else matched
  }

  /** Harness query: each holdout event (V split) matched to the latest
    * prior training event (I split) of the same user; oracle = DuckDB's
    * native ASOF JOIN. Right side deduped to one row per (user, ts) via
    * max_by so tie-winners are well-defined in both engines. */
  def eventsAsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir) // ts = BIGINT epoch-nanos
    val right = ev.filter(pmod(col("event_id"), lit(10)) < 8)
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("prior_value"))
    val left = ev.filter(pmod(col("event_id"), lit(10)) >= 8)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asofJoin(left, right, Seq("user_id"), "ts", "prior_value")
      .select(col("event_id"), col("user_id"), col("value"),
        col("asof_prior_value"),
        round(col("value") - col("asof_prior_value"), 4).as("drift"))
      .orderBy(col("event_id"))
  }

  /** The same query through the NATIVE as-of operator (custom LogicalPlan →
    * SparkStrategy → merge-pass SparkPlan, graft.plans.AsOfJoinNative) —
    * identical output contract, so it shares q_asof_join's DuckDB oracle:
    * one operator, three independent implementations agreeing bit-for-bit
    * (window composition, native merge, DuckDB ASOF JOIN). */
  def eventsAsOfNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val right = ev.filter(pmod(col("event_id"), lit(10)) < 8)
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("prior_value"))
    val left = ev.filter(pmod(col("event_id"), lit(10)) >= 8)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsOfJoinNative
      .asofJoin(left, right, "user_id", "ts", Seq("prior_value"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("prior_value").as("asof_prior_value"),
        round(col("value") - col("prior_value"), 4).as("drift"))
      .orderBy(col("event_id"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregation.
  *
  * A plain groupBy on a skewed key sends every row of the hot key to one
  * reducer. Salting splits each key into `buckets` sub-keys, aggregates
  * partially per (key, salt) — spreading the hot key across `buckets`
  * reducers — then combines the partials in a second, tiny aggregation.
  * The result is identical to the unsalted aggregate (the oracle for
  * q_salted_agg is the plain SQL GROUP BY), only the shuffle layout
  * changes.
  *
  * Note: Spark's map-side partial aggregation already handles *moderate*
  * skew; explicit salting matters when the distinct-value state per key is
  * large (collect_set-like aggregates) or when AQE skew handling cannot
  * split a single reducer's hash group — this utility is the pattern for
  * those cases, kept correct by construction (sum/count decomposition).
  */
object Skew {

  /** Two-phase salted sum/count/avg per key. Deterministic salt (hash of a
    * row-unique column mod buckets) so results are replayable. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      uniqueCol: String, buckets: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(uniqueCol)), lit(buckets)))
    // float-sum rule: per-row micro-units sum exactly in BIGINT, so the
    // salted two-phase accumulation is bit-identical to ANY grouping order
    // — the earlier round-the-double-sum-first trick still drifted from
    // DuckDB at the ×10 replica (rounding can't fix a sum whose ulps
    // already differ); exact integers can
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(sum(floor(col(valueCol) * 1e6).cast("bigint")).as("__pmicro"),
        count(lit(1)).as("__pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("__pmicro")).as("__micro"), sum(col("__pcnt")).as("n"))
      .select(col(key), col("n"),
        round(col("__micro") / 1e6, 2).as("total"),
        round(col("__micro") / (col("n") * 1e6), 4).as("mean"))
  }

  /** Harness query: salted per-user aggregate over events; oracle is the
    * plain GROUP BY — identical results prove salting is transparent. */
  def saltedUserAgg(s: SparkSession, dir: String): DataFrame =
    saltedAgg(Tables.events(s, dir), "user_id", "value", "event_id")
      .orderBy(col("user_id"))

  /** Salted equi-join for hot join keys: the skewed (fact) side gets a
    * deterministic salt from a row-unique column; the dimension side is
    * replicated once per salt bucket (explode over 0..buckets), so the hot
    * key's rows spread over `buckets` reducers instead of hammering one.
    * Output ≡ the plain join — only the shuffle layout changes. AQE's
    * skew-join splitter handles the sort-merge case automatically at
    * runtime; explicit salting is the portable pattern for when it can't
    * (broadcast-ineligible dims with extreme single-key skew, pre-Spark-3
    * engines, or deterministic replay requirements). Replication cost:
    * |dim| × buckets rows through the dim-side shuffle — use only when the
    * dim is much smaller than the fact's hot-key mass. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, uniqueCol: String, buckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(uniqueCol)), lit(buckets)))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until buckets).map(lit(_)): _*)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Harness query: salted events⋈customer join, aggregated per segment ×
    * event type. The aggregated measure is integral (floor cents) so the
    * result is independent of the addition order salting introduces; the
    * oracle is the plain unsalted join + GROUP BY. */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame =
    saltedJoin(Tables.events(s, dir), Tables.customer(s, dir),
        "user_id", "c_custkey", "event_id")
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
      .orderBy(col("c_mktsegment"), col("event_type"))
}

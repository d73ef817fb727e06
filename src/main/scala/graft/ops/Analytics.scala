package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the `events` table: cohort retention
  * and ordered conversion funnels — the two standard event-log rollups an
  * analytics engine is expected to ship.
  *
  * `ts` is BIGINT epoch-nanoseconds (see Tables.events); days are floor
  * divisions by 86400e9, identical in the DuckDB oracle via epoch_ns.
  *
  * Scale design: both operators reduce events to per-user scalars first
  * (min timestamps / distinct active days) — the classic two-phase shape
  * where the big fact table is aggregated with map-side partials before any
  * join, so what shuffles is O(users), not O(events). The per-stage joins
  * are user-keyed equi-joins AQE will broadcast when the reduced side is
  * small; no driver-side collection anywhere.
  */
object Analytics {
  val NsPerDay = 86400000000000L

  /** Classic cohort-retention triangle: users are cohorted by their first
    * active day; for each (cohort day, day offset) the count of cohort
    * members active on cohort_day + offset. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // integer division: `/` on bigint routes through double, and ts values
    // near 2^60 lose ns precision there — a midnight-adjacent event could
    // land on the wrong day
    val active = Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts div $NsPerDay").as("day"))
      .distinct()
    val cohorts = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Time-series gap fill with last-observation-carried-forward: per user,
    * the daily event count over the user's own [first, last] active-day
    * span, with missing days materialized (sequence explode — partition-
    * local row generation, no shuffle) and filled by the previous observed
    * value (one ignore-nulls window). The regularization step every
    * downstream time-series consumer (forecasting, retention curves)
    * assumes has already happened. Generated rows ∝ span-days, not
    * events²; one shuffle keys the window by user. */
  def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts div $NsPerDay").as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val days = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_filled", col("n_events").isNull)
      .withColumn("n_events", last(col("n_events"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("n_events"), col("is_filled"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Strictly-ordered 3-stage conversion funnel (view → click → purchase):
    * a user converts stage n only with an event strictly after their
    * earliest stage-(n-1) conversion time. Computed as successive
    * conditional min-aggregates over the per-user event set — each stage is
    * one groupBy + one user-keyed join, never a per-event self-join. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = Seq(
      ("1_view", t1), ("2_click", t2), ("3_purchase", t3))
    counts.map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
      }
      .reduce(_.union(_))
      .orderBy(col("stage"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for every (src → dst) event-type bigram, its observed count and
    * conditional probability. The per-row transition-probability feature
    * behind session-behavior models and bot/anomaly heuristics (an
    * improbable transition chain flags scripted traffic).
    *
    * Probabilities are emitted in integer micro-units via floor division
    * (n·1e6 // Σn), so the result is partition-invariant and
    * bit-identical in the oracle — the float-sum rule. Scale shape: one
    * window shuffle keyed by user_id (sequences form where the user's
    * events already sit), then a bigram count whose cardinality is
    * |event_type|² — broadcast-tiny regardless of corpus size. */
  def transitions(s: SparkSession, dir: String): DataFrame =
    transitionsOf(Tables.events(s, dir))

  /** Core of [[transitions]] over any (user_id, event_id, ts, event_type)
    * frame. */
  def transitionsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val grand = Window.partitionBy(col("src"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(grand))
      // `div` is exact BIGINT division (DuckDB `//`) — a double divide +
      // cast could land one ulp below the true quotient and floor wrong
      .withColumn("p_micro", expr("(n * 1000000) div tot"))
      .drop("tot")
      .orderBy(col("src"), col("dst"))
  }

  /** Last-touch attribution: each purchase credits the user's most recent
    * non-purchase event strictly before it (the marketing-analytics
    * staple; first-touch is the same window with `first`). One window pass
    * per user — `last(..., ignoreNulls)` over rows [unbounded, -1] carries
    * the latest touch WITHOUT a self-join or as-of join against the
    * purchase stream; revenue rides along in exact micro-units.
    *
    * Scale shape: one shuffle keyed by user_id (same exchange the
    * sessionize/funnel family uses); output is purchase-count-sized. */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame =
    lastTouchOf(Tables.events(s, dir))

  /** Core of [[lastTouchAttribution]]. */
  def lastTouchOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("touch_id", last(
        when(col("event_type") =!= "purchase", col("event_id")),
        ignoreNulls = true).over(w))
      .withColumn("touch_type", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("touch_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("touch_id"), col("touch_type"),
        expr("CAST(round(value * 1e6, 0) AS BIGINT)").as("revenue_micro"))
      .orderBy(col("purchase_id"))
  }

  /** Type-2 slowly-changing-dimension history: collapse a batch-stamped
    * changelog of observed attribute states into validity intervals
    * (valid_from, valid_to, is_current) — the warehouse-standard dimension
    * versioning that pairs with [[Upsert]]'s snapshot maintenance (MERGE
    * keeps only the latest state; SCD2 keeps when each state held).
    *
    * Two windows over the same (key, batch) ordering: lag() drops
    * no-change observations (idempotent re-observations collapse into the
    * open interval), lead() closes each interval at the next change.
    *
    * Scale shape: everything is per-key windowing — ONE shuffle keyed by
    * the dimension key covers both window passes (same partitioning, no
    * re-exchange between them), and changelog rows are (key, value,
    * batch) triples, never wide dimension payloads.
    */
  def scd2History(versions: DataFrame, key: String, value: String,
      batch: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBatch = Window.partitionBy(col(key)).orderBy(col(batch))
    val changes = versions
      .withColumn("__prev", lag(col(value), 1).over(byBatch))
      .filter(col("__prev").isNull || col(value) =!= col("__prev"))
      .select(col(key), col(value), col(batch).as("valid_from"))
    val byFrom = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom) - 1)
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col(key), col("valid_from"))
  }

  /** Harness query: a deterministic 3-batch changelog over documents
    * (batch 1 re-observes every doc_id % 5 == 0 with n_chars+10, batch 2
    * every doc_id % 7 == 0 with n_chars+20 — pure integer arithmetic the
    * oracle restates verbatim), collapsed by [[scd2History]]. */
  def scd2Documents(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val versions = docs
      .select(col("doc_id"), col("n_chars").as("val"), lit(0).as("batch"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id"), (col("n_chars") + 10).as("val"), lit(1).as("batch")))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id"), (col("n_chars") + 20).as("val"), lit(2).as("batch")))
    scd2History(versions, "doc_id", "val", "batch")
  }
}

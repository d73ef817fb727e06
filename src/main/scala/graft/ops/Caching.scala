package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache lifecycle for multi-consumer pipelines.
  *
  * Two rules this codebase learned the hard way (BENCH.md round 1/2):
  *   1. A cached-but-unmaterialized frame consumed by 2+ branches of one job
  *      (union branches, self-joins) recomputes its upstream per branch —
  *      force with count() right after cache().
  *   2. Caches that outlive their operator leak blocks across a session;
  *      ~50 leaked caches cause eviction thrash that doubled bench time.
  *      Operators whose result is small relative to the corpus materialize
  *      it and release their upstream caches before returning.
  */
object Caching {

  /** Materialize `out` eagerly (localCheckpoint pins the computed partitions
    * and truncates lineage), then release the upstream caches it consumed.
    * Only for results that are small by construction (pair sets ∝ duplicate
    * density, per-doc scalars — never full-corpus frames): the caller gets a
    * self-contained frame and owns no cleanup. */
  def materializeAndRelease(out: DataFrame, caches: DataFrame*): DataFrame = {
    val r = out.localCheckpoint()
    caches.foreach(_.unpersist())
    r
  }

  /** Session-scoped memo of EXPENSIVE GROUND-TRUTH frames the recall
    * dashboards embed (brute-force top-k, the exact prefix-join pair
    * set): within one session a user — and the bench — runs the member
    * query AND the dashboards that grade against it, and recomputing the
    * identical deterministic frame per consumer is pure waste (r13
    * verdict #1b). Only localCheckpointed, small-by-construction results
    * may be memoized (pair sets ∝ k·queries or duplicate density). Keyed
    * by (session, operator, dir); entries die with the session (weak
    * keys on the SparkSession). Thread-safe via computeIfAbsent. */
  private val memoTable =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def memo(s: org.apache.spark.sql.SparkSession, key: String)(
      compute: => DataFrame): DataFrame = {
    val perSession = memoTable.synchronized {
      var m = memoTable.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        memoTable.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => compute.localCheckpoint())
  }
}

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
    * self-contained frame and owns no cleanup — [[releaseStrays]] reclaims
    * the pinned blocks when the NEXT query starts (r15: the r14 bench
    * regression's mechanism — see below). */
  def materializeAndRelease(out: DataFrame, caches: DataFrame*): DataFrame = {
    val r = out.localCheckpoint()
    caches.foreach(_.unpersist())
    r
  }

  /** RDD ids whose blocks must SURVIVE [[releaseStrays]]: everything a
    * [[memo]] entry pinned (the memoized frame itself plus any checkpoint
    * its compute created internally — a memoized frame is a truncated-
    * lineage localCheckpoint, so dropping its blocks would make every
    * later dashboard reuse fail, not recompute). Bounded by the memo set
    * (~15 small frames). */
  private val protectedIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.Set[Int]]()

  private def protectedFor(s: org.apache.spark.sql.SparkSession)
      : java.util.Set[Int] = protectedIds.synchronized {
    var ids = protectedIds.get(s)
    if (ids == null) {
      ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      protectedIds.put(s, ids)
    }
    ids
  }

  /** Release every persisted RDD the session has accumulated EXCEPT the
    * memo-protected set — the r14→r15 measured fix: localCheckpointed
    * frames (query results via [[materializeAndRelease]], memo ground
    * truths) are not tracked by the CacheManager, so `clearCache()` never
    * frees them; across a 200-query bench session the pinned blocks grew
    * past the block manager's eviction-free region and the two biggest
    * shuffle queries paid for it (dedup_prefix_join 2.6 s fresh-JVM vs
    * 5.3 s in-session, stable across passes — BENCH.md round 15 A/B).
    * Runs at query construction ([[graft.SparkEntry]]'s `fresh`), when
    * nothing from the previous query is still consuming its result. */
  def releaseStrays(s: org.apache.spark.sql.SparkSession): Unit = {
    val keep = protectedFor(s)
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking = false)
    }
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
    perSession.computeIfAbsent(key, _ => {
      // snapshot-diff the persisted-RDD set around the compute so the
      // memoized checkpoint (and anything it pinned internally) survives
      // releaseStrays — over-protecting a compute-internal stray is
      // bounded by the memo count and beats breaking a truncated-lineage
      // frame the dashboards will reuse
      val before = s.sparkContext.getPersistentRDDs.keySet
      val f = compute.localCheckpoint()
      val ids = protectedFor(s)
      (s.sparkContext.getPersistentRDDs.keySet -- before)
        .foreach(id => ids.add(id))
      f
    })
  }
}

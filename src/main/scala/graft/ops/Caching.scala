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
}

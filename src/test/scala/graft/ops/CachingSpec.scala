package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r15 session-hygiene contract: stray localCheckpoints (invisible
  * to clearCache — the r14 pair-family bench regression's mechanism)
  * are released between queries, while memoized dashboard ground truths
  * survive and stay usable (their lineage is truncated, so dropping
  * their blocks would break reuse, not trigger recompute). */
class CachingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("releaseStrays drops materializeAndRelease blocks but keeps the " +
      "memo set alive and byte-identical") {
    import spark.implicits._
    // a stray: the shape every operator result takes
    val stray = Caching.materializeAndRelease(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(stray.count() === 2L)
    // a memoized ground truth computed AFTER the stray exists
    val memoKey = s"cachingSpec:${System.nanoTime()}"
    val memod = Caching.memo(spark, memoKey)(
      Tables.documents(spark, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n")))
    val before = memod.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(persistedBefore > 0, "checkpoints must be pinned before release")

    Caching.releaseStrays(spark)

    assert(spark.sparkContext.getPersistentRDDs.size < persistedBefore,
      "stray blocks must be released")
    // the memo survives: same handle returns, contents intact
    val again = Caching.memo(spark, memoKey)(
      sys.error("memo must not recompute"): org.apache.spark.sql.DataFrame)
    val after = again.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(after === before, "memoized frame must stay readable after release")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL surface setup: registers every custom expression /
  * aggregate plus the native as-of-join planner strategy on an
  * already-built session, so literal SQL text (`spark.sql(...)`) reaches
  * the custom tier:
  *
  * {{{
  *   graft.functions.GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT rolling_hash64(text), zorder2(a, b), " +
  *     "misra_gries(tok, 40), vec_dot(x, y) FROM t")
  * }}}
  *
  * For config-time wiring (e.g. a cluster-wide default) use
  * `spark.sql.extensions=graft.plans.GraftExtensions`, which injects the
  * same set at session build. Each register is idempotent
  * (createOrReplaceTempFunction / duplicate-strategy guard). */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    MisraGries.register(spark)
    CountMin.register(spark)
    HllRegs.register(spark)
    GramAgg.register(spark)
    TopKBy.register(spark)
    MinHashSigs.register(spark)
    ShingleHashes.register(spark)
    RollingHash64.register(spark)
    SimHash64.register(spark)
    ZOrder2.register(spark)
    VecDot.register(spark)
    BloomFilterFns.register(spark)
    graft.plans.AsOfJoinNative.register(spark)
  }
}

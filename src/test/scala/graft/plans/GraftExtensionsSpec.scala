package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Build-time wiring: a session built with the GraftExtensions
  * configurator reaches the custom expression tier from literal SQL text
  * with no register calls. Applied via `builder.withExtensions` — the
  * same injection path `spark.sql.extensions=graft.plans.GraftExtensions`
  * takes, but testable against a pre-existing SparkContext (the config
  * form is a static conf read from the CONTEXT's conf, so it only takes
  * effect when the session builder also creates the context). The new
  * session shares the test SparkContext, so it is never stopped here —
  * only the active/default session slots are swapped and restored. */
class GraftExtensionsSpec extends SparkSpec {

  test("a GraftExtensions-built session exposes the custom functions " +
      "to SQL text (the spark.sql.extensions injection path)") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT rolling_hash64('ab') AS h, " +
          "zorder2(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS z, " +
          "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head()
      assert(r.getLong(0) === graft.functions.RollingHashImpl.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString("ab")))
      assert(r.getLong(1) === graft.functions.ZOrderImpl.interleave(5L, 3L))
      assert(math.abs(r.getDouble(2) - 11.0) < 1e-9)
      // the aggregate injects too
      import s2.implicits._
      val hh = Seq("a", "b", "a", "a").toDF("t")
      hh.createOrReplaceTempView("hh_ext")
      val cand = s2.sql("SELECT misra_gries(t, 2) AS c FROM hh_ext")
        .head().getSeq[String](0)
      assert(cand.contains("a"))
      // the optimizer rules inject too: a filter above the as-of join
      // pushes through the node on the config-time path as well
      val l = Seq((1L, 10L, "x"), (60L, 10L, "y")).toDF("k", "t", "p")
      val r2 = Seq((1L, 5L, 1.0), (60L, 5L, 2.0)).toDF("k", "t", "v")
      val filtered = AsOfJoinNative.asofJoin(l, r2, "k", "t", Seq("v"))
        .filter($"k" < 50)
      // pushed below the join, the filter lands over LocalRelations and
      // constant-folds away entirely — success is NO Filter above the node
      val opt = filtered.queryExecution.optimizedPlan.toString
      assert(opt.trim.startsWith("AsOfJoinPlan"),
        s"extensions-injected rule must push the filter below the join:\n$opt")
      assert(filtered.collect().map(_.getLong(0)).toSeq === Seq(1L))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}

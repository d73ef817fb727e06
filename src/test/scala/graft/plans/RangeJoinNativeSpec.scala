package graft.plans

import graft.SparkSpec
import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed windows: multi-match, empty window, inclusive bounds, key change") {
    val left = Seq((1L, 100L, "a"), (1L, 110L, "b"), (1L, 200L, "c"),
      (2L, 100L, "d"), (3L, 50L, "e"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 901L), (1L, 95L, 951L), (1L, 100L, 1001L),
      (1L, 105L, 1051L), (1L, 111L, 1111L), (2L, 95L, 851L), (9L, 100L, 991L))
      .toDF("k", "t", "v")
    // window [t-10, t]: right rows with rt in [t-10, t], same k
    val out = RangeJoinNative.rangeJoin(left, right, "k", "t", -10L, 0L, Seq("v"))
      .select(col("tag"), col("v")).as[(String, Long)].collect().toSeq.sorted
    assert(out === Seq(
      ("a", 901L), ("a", 951L), ("a", 1001L), // [90,100] inclusive both ends
      ("b", 1001L), ("b", 1051L),             // [100,110]: 90/95 evicted, 111 beyond
      ("d", 851L)).sorted,                    // key 2; c/e empty windows; key 9 unprobed
      "window membership, inclusivity, eviction, and key boundaries")
  }

  test("native range join equals the composed binned implementation row for row") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.Tables.events(spark, dir)
    val fiveMinNs = 5L * 60L * 1000000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val context = ev.select(col("user_id"), col("ts"),
      col("event_id").as("c_id"), col("value").as("c_value"))
    val composed = RangeJoin.rangeJoin(errors, context, Seq("user_id"), "ts",
      -fiveMinNs, 0L).select("event_id", "user_id", "ts", "c_id", "c_value")
    val native = RangeJoinNative.rangeJoin(errors, context, "user_id", "ts",
      -fiveMinNs, 0L, Seq("c_id", "c_value"))
      .select("event_id", "user_id", "ts", "c_id", "c_value")
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
    assert(native.count() === composed.count())
  }

  test("plans as RangeJoinExec with one exchange + sort per side") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L, 1L)).toDF("k", "t", "v")
    val df = RangeJoinNative.rangeJoin(l, r, "k", "t", -5L, 5L, Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin "), plan) // nodeName strips the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2,
      "exactly one hash exchange per side")
    assert("\\bSort \\[".r.findAllIn(plan).length === 2,
      "exactly one sort per side")
  }

  test("errorContextNative equals the composed harness query byte for byte") {
    val dir = "/root/testdata/sf0.001"
    val a = RangeJoin.errorContext(spark, dir).collect().toSeq
    val b = RangeJoinNative.errorContextNative(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("key-filter pushdown rule: the predicate reaches BOTH parquet scans; " +
      "results unchanged; match-dependent predicates stay above") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.Tables.events(spark, dir)
    val base = s"${java.nio.file.Files.createTempDirectory("rjpd")}"
    ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts")).write.parquet(s"$base/l")
    ev.select(col("user_id"), col("ts"), col("value").as("rv"))
      .write.parquet(s"$base/r")
    val l = spark.read.parquet(s"$base/l")
    val r = spark.read.parquet(s"$base/r")
    val fiveMinNs = 5L * 60L * 1000000000L

    val joined = RangeJoinNative.rangeJoin(l, r, "user_id", "ts",
      -fiveMinNs, 0L, Seq("rv"))
    val filtered = joined.filter(col("user_id") < 50)
    val phys = filtered.queryExecution.executedPlan.toString
    val pushes = "PushedFilters: \\[[^\\]]*LessThan\\(user_id,50\\)".r
      .findAllIn(phys).length
    assert(pushes === 2, s"key predicate must reach both scans:\n$phys")

    val expected = joined.collect().map(_.toSeq)
      .filter(row => row(1).asInstanceOf[Long] < 50)
    assert(filtered.collect().map(_.toSeq).toSet === expected.toSet)
    assert(expected.nonEmpty, "fixture must exercise the filter")

    // the rule is left-only by design: a right-value predicate (pushable
    // in principle for INNER range semantics, unlike as-of) stays above
    val above = joined.filter(col("rv") > 0.5)
    val physAbove = above.queryExecution.executedPlan.toString
    assert(!"PushedFilters: \\[[^\\]]*GreaterThan\\(rv,0.5\\)".r
      .findAllIn(physAbove).exists(_ => true),
      s"rv predicate must stay above the join:\n$physAbove")
  }

  test("null keys and times never match; randomized agreement with brute force") {
    val rnd = new scala.util.Random(42)
    val lrows = (1 to 300).map(i =>
      (if (i % 37 == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong),
        java.lang.Long.valueOf(rnd.nextInt(100).toLong), i.toLong))
    val rrows = (1 to 300).map(i =>
      (java.lang.Long.valueOf(rnd.nextInt(5).toLong),
        if (i % 41 == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong),
        i.toLong * 10))
    val l = lrows.toDF("k", "t", "lid")
    val r = rrows.toDF("k", "t", "rv")
    val native = RangeJoinNative.rangeJoin(l, r, "k", "t", -7L, 3L, Seq("rv"))
      .select("lid", "rv").as[(Long, Long)].collect().sorted.toSeq
    val brute = (for {
      (lk, lt, lid) <- lrows if lk != null && lt != null
      (rk, rt, rv) <- rrows if rk != null && rt != null
      if rk == lk && rt >= lt - 7L && rt <= lt + 3L
    } yield (lid, rv)).sorted
    assert(native === brute)
  }
}

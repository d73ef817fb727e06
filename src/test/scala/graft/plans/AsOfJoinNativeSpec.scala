package graft.plans

import graft.SparkSpec
import graft.ops.{AsOfJoin, Tables}
import org.apache.spark.sql.functions._

/** Specs for the native as-of join operator (custom LogicalPlan →
  * SparkStrategy → merge-pass SparkPlan). Value-level correctness vs DuckDB
  * ASOF JOIN is the oracle gate's job (q_asof_native); these pin the plan
  * shape and cross-implementation agreement. */
class AsOfJoinNativeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("native as-of equals the composed window implementation row for row") {
    val native = AsOfJoin.eventsAsOfNative(spark, dir).collect().map(_.toSeq)
    val composed = AsOfJoin.eventsAsOf(spark, dir).collect().map(_.toSeq)
    assert(native.length === composed.length)
    assert(native.toSeq === composed.toSeq)
  }

  test("native as-of plans as AsOfJoinExec with one exchange + sort per side") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (2L, 50L, 3.0))
      .toDF("k", "t", "v")
    val df = AsOfJoinNative.asofJoin(left, right, "k", "t", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in treeString
    assert(plan.contains("AsOfJoin"), plan.take(600))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected one hash exchange per side:\n$plan")
    // behavior on the fixture: inclusive <= match, last-wins, inner drop
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getDouble(3))).sortBy(x => (x._1, x._2))
    assert(rows.toSeq === Seq(
      (1L, 10L, "a", 1.0),   // t=10 matches r t=5
      (1L, 20L, "b", 2.0)))  // t=20 matches r t=15; k=2 l.t=10 < r.t=50 drops
  }

  test("key-filter pushdown rule: the filter lands below the join on BOTH " +
      "sides and reaches the parquet scans; results are unchanged") {
    val ev = Tables.events(spark, dir)
    val base = s"${java.nio.file.Files.createTempDirectory("asofpd")}"
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("t"), col("value"))
      .write.parquet(s"$base/l")
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("t"),
        col("value").as("rv"))
      .groupBy(col("user_id"), col("t")).agg(max(col("rv")).as("rv"))
      .write.parquet(s"$base/r")
    val l = spark.read.parquet(s"$base/l")
    val r = spark.read.parquet(s"$base/r")

    val joined = AsOfJoinNative.asofJoin(l, r, "user_id", "t", Seq("rv"))
    val filtered = joined.filter(col("user_id") < 50)

    // optimized plan: the Filter sits below AsOfJoinPlan, and the key
    // predicate reaches BOTH parquet scans as a pushed filter
    val phys = filtered.queryExecution.executedPlan.toString
    val pushes = "PushedFilters: \\[[^\\]]*LessThan\\(user_id,50\\)".r
      .findAllIn(phys).length
    assert(pushes === 2, s"key predicate must reach both scans:\n$phys")

    // unchanged semantics vs filtering after the (unpushed) join
    val expected = joined.collect().map(_.toSeq)
      .filter(row => row.head.asInstanceOf[Long] < 50)
    assert(filtered.collect().map(_.toSeq).toSet === expected.toSet)
    assert(expected.nonEmpty, "fixture must exercise the filter")
  }

  test("column-pruning rule: a narrow projection above the join narrows " +
      "BOTH parquet ReadSchemas") {
    val ev = Tables.events(spark, dir)
    val base = s"${java.nio.file.Files.createTempDirectory("asofcp")}"
    // left carries two EXTRA payload columns the query never touches
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("t"), col("value"),
        col("event_type").as("extra1"), col("event_id").as("extra2"))
      .write.parquet(s"$base/l")
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("t"), col("value").as("rv"),
        col("event_id").as("r_extra"))
      .groupBy(col("user_id"), col("t"))
      .agg(max(col("rv")).as("rv"), max(col("r_extra")).as("r_extra"))
      .write.parquet(s"$base/r")
    val l = spark.read.parquet(s"$base/l")
    val r = spark.read.parquet(s"$base/r")

    val narrow = AsOfJoinNative.asofJoin(l, r, "user_id", "t", Seq("rv"))
      .select(col("user_id"), col("rv"))
    val phys = narrow.queryExecution.executedPlan.toString
    assert(!phys.contains("extra1") && !phys.contains("extra2"),
      s"unused left columns must not be read:\n$phys")
    assert(!phys.contains("r_extra"),
      s"right columns outside key/time/rightVals must not be read:\n$phys")
    assert(narrow.count() > 0)
  }

  test("pushdown rule leaves match-dependent predicates above the join") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (2L, 10L, "c")).toDF("k", "t", "payload")
    val right = Seq((1L, 5L, 1.0), (2L, 5L, 9.0)).toDF("k", "t", "v")
    val df = AsOfJoinNative.asofJoin(left, right, "k", "t", Seq("v"))
      .filter(col("v") > 2.0)
    val opt = df.queryExecution.optimizedPlan.toString
    // the rightVals predicate must stay ABOVE the as-of join node
    assert(opt.indexOf("Filter") < opt.indexOf("AsOfJoin"),
      s"match-dependent filter must not push below:\n$opt")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("outer variant keeps unmatched left rows with null") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 7.5)).toDF("k", "t", "v")
    val rows = AsOfJoinNative
      .asofJoin(left, right, "k", "t", Seq("v"), inner = false)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(rows.toSeq === Seq((1L, Some(7.5)), (2L, None)))
  }

  test("ties match inclusively and duplicate left times reuse the match") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 10L), (1L, 11L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1.0), (1L, 11L, 2.0)).toDF("k", "t", "v")
    val rows = AsOfJoinNative.asofJoin(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((10L, 1.0), (10L, 1.0), (11L, 2.0)))
  }

  test("null keys never match (not even key 0) and outer keeps them " +
      "with null values") {
    import spark.implicits._
    val left = Seq((Some(0L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val right = Seq((0L, 5L, 9.9)).toDF("k", "t", "v")
    val inner = AsOfJoinNative.asofJoin(left, right, "k", "t", Seq("v"))
      .collect()
    assert(inner.length === 1 && inner.head.getLong(0) === 0L,
      "only the real key-0 row matches; null must not read as 0")
    val outer = AsOfJoinNative
      .asofJoin(left, right, "k", "t", Seq("v"), inner = false)
      .collect()
    assert(outer.length === 3)
    assert(outer.count(_.isNullAt(2)) === 2, "null-keyed rows keep null v")
  }

  test("randomized agreement with a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val right = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
    val got = AsOfJoinNative.asofJoin(
        left.toDF("k", "t"), right.toDF("k", "t", "v"), "k", "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.toSeq.sorted).toMap
    val byKey = right.groupBy(_._1)
    val expect = left.flatMap { case (k, t) =>
      byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(m => (k, t, m._3))
    }.groupBy(x => (x._1, x._2)).view.mapValues(_.toSeq.sorted).toMap
    assert(got === expect)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The harness tables are dense, so SQL null semantics get pinned here on
  * synthetic frames — the engine must behave standardly when real data has
  * gaps. */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1, Some(10.0)), (2, None), (3, Some(30.0)), (4, None))
    .toDF("k", "v")

  test("count(*) counts nulls; count(col) and aggregates skip them") {
    val r = frame.agg(count(lit(1)).as("all"), count($"v").as("vs"),
      sum($"v").as("sum"), avg($"v").as("avg")).head()
    assert(r.getLong(0) === 4)
    assert(r.getLong(1) === 2)
    assert(r.getDouble(2) === 40.0)
    assert(r.getDouble(3) === 20.0, "avg divides by non-null count")
  }

  test("join on null keys never matches; null-safe equality does") {
    val a = Seq((Some(1), "a1"), (None, "a2")).toDF("k", "va")
    val b = Seq((Some(1), "b1"), (None, "b2")).toDF("k", "vb")
    assert(a.join(b, a("k") === b("k")).count() === 1)
    assert(a.join(b, a("k") <=> b("k")).count() === 2,
      "<=> matches null to null")
    assert(a.join(b, Seq("k"), "left_anti").count() === 1,
      "anti join keeps the null-key row (no match possible)")
  }

  test("group-by treats null as one group; asc sort order is nulls first") {
    val g = Seq((Some("x"), 1), (None, 2), (None, 3))
      .toDF("k", "v").groupBy($"k").agg(sum($"v").as("s"))
    assert(g.count() === 2)
    assert(g.filter($"k".isNull).head().getLong(1) === 5)
    val sorted = g.orderBy($"k".asc).collect()
    assert(sorted(0).isNullAt(0), "Spark default: NULLS FIRST on asc " +
      "(why oracle-compared sort keys are always non-null by construction)")
  }

  test("window functions skip nulls in ignoreNulls mode (asof dependency)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, 0)
    val df = Seq((1, Some("a")), (2, None), (3, None), (4, Some("b")))
      .toDF("k", "v")
      .withColumn("filled", last($"v", ignoreNulls = true).over(w))
    val filled = df.orderBy($"k").collect().map(_.getString(2))
    assert(filled.toSeq === Seq("a", "a", "a", "b"))
  }
}

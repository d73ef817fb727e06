package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join strategy selection and hints — the knobs a 100 TB plan is tuned
  * with when Catalyst's size estimates miss. */
class JoinStrategySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  test("small dimension auto-broadcasts; hints override the strategy") {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)

    val auto = li.join(o, col("l_orderkey") === col("o_orderkey"))
    assert(planOf(auto).contains("BroadcastHashJoin"),
      "orders under the threshold should broadcast")

    val merge = li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    assert(planOf(merge).contains("SortMergeJoin"), "merge hint forces SMJ")

    val shuffleHash = li.join(o.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"))
    assert(planOf(shuffleHash).contains("ShuffledHashJoin"),
      "shuffle_hash hint forces SHJ")

    // identical results regardless of physical strategy
    assert(auto.count() === merge.count())
    assert(auto.count() === shuffleHash.count())
  }

  test("star join: date filter pushes into the orders scan, dims " +
      "broadcast, and revenue matches a collected recomputation") {
    val df = Relational.starJoinRevenue(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderdate"), "date range must reach the orders scan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      "nation and region must broadcast")
    // value check against a driver-side recomputation of one nation
    val rows = df.collect()
    if (rows.nonEmpty) {
      val top = rows.head
      val li = Tables.lineitem(spark, dir)
      val expect = Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir)
            .filter(col("o_orderdate") >= "1996-01-01" &&
              col("o_orderdate") < "1998-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(Tables.nation(spark, dir).filter(col("n_name") === top.getString(0)),
          col("c_nationkey") === col("n_nationkey"))
        .select(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("bigint").as("c"))
        .collect().map(_.getLong(0)).sum
      assert(top.getLong(2) === expect)
    }
  }

  test("correlated subqueries decorrelate into joins (no per-row execution)") {
    val df = Relational.correlatedSubqueries(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"),
      "EXISTS + scalar subqueries must plan as joins")
    assert(!plan.contains("InSubqueryExec") && !plan.contains("ScalarSubquery"),
      s"no residual per-row subquery nodes expected:\n$plan")
    assert(df.count() > 0)
  }

  test("exact-dedup keep plans as narrow-digest window + anti-join " +
      "(document bodies never enter an exchange)") {
    val plan = Dedup.exactKeep(spark, dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // every data exchange carries only slim columns: the digest window's
    // (doc_id, fp[, keeper]) or the final presentation sort's projection —
    // never the text body
    exchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(!cols.contains("text"),
        s"document body must not shuffle, but exchange outputs $cols")
    }
    assert(plan.toString.contains("LeftAnti"), "survivors come from an anti-join")
  }

  test("explicit broadcast() wins over a disabled auto-threshold") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(!planOf(plain).contains("BroadcastHashJoin"))
      val hinted = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      assert(planOf(hinted).contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

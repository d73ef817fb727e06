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

  test("AQE skew join splits a 95%-hot-key sort-merge join at runtime; " +
      "results identical to the un-split join (the automatic alternative " +
      "to Skew.saltedJoin)") {
    import spark.implicits._
    // the Skew fixture shape: one key owns 95% of the fact rows, with
    // enough payload bytes that its single hash group dwarfs the others.
    // Payloads must be HIGH-ENTROPY: the skew detector reads compressed
    // shuffle-block sizes, and a constant pad deflates below any
    // threshold
    def noise(i: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 6).map(r => md.digest(s"$i/$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    }
    val fact = (0 until 20000).map { i =>
      (i.toLong, if (i % 20 != 0) 0L else (i % 97).toLong + 1L, noise(i))
    }.toDF("row_id", "k", "payload")
    val dim = (0L to 97L).map(k => (k, s"dim_$k")).toDF("k2", "attr")

    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the skew detector to fixture scale: a partition is skewed
      // if > factor × median AND > threshold bytes; split to ~64 KiB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep AQE from first collapsing the small shuffle to 1 partition
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the output must (a) use payload AFTER the join — a fact-only
      // projection would be pushed below the SMJ and pruned to longs,
      // deflating the skewed partition — and (b) avoid a downstream
      // keyed aggregate, whose partitioning requirement vetoes the
      // split (splitting duplicates partitions; AQE won't add the
      // re-shuffle unless forceOptimizeSkewedJoin)
      val joined = fact.join(dim, col("k") === col("k2"))
        .select(col("k"), col("attr"),
          length(concat(col("payload"), col("attr"))).as("plen"))
      val rows = joined.collect() // materialize → AQE finalizes the plan
      val finalPlan = planOf(joined)
      assert(finalPlan.contains("SortMergeJoin") &&
        finalPlan.contains("skew=true"),
        s"expected a skew-split SMJ in the adaptive final plan:\n$finalPlan")

      // correctness is unchanged by the runtime split: the hot key keeps
      // every row, each matched to exactly its one dim row
      assert(rows.length === 20000)
      val byKey = rows.groupBy(_.getLong(0))
      assert(byKey(0L).length === 19000, "hot key keeps 95% of the rows")
      assert(byKey.size === 98)
      rows.foreach { r =>
        assert(r.getString(1) === s"dim_${r.getLong(0)}")
        assert(r.getInt(2) === 192 + r.getString(1).length)
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

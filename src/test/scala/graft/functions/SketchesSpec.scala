package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Sketches

class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tokenHashes = {
    GraftFunctions.registerAll(spark)
    sf("documents", dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .selectExpr("token", s"${SharedHash.spark48("token")} AS h48")
  }

  test("count_min: estimate >= exact count for EVERY distinct token (one-sided error)") {
    val t = tokenHashes.cache()
    val sk = t.agg(expr("count_min(h48, 4, 1024)").as("cells"))
    val ests = SharedHash.seeds(4).zipWithIndex.map { case ((a, b), j) =>
      s"element_at(cells, CAST($j * 1024 + (($a * (h48 % ${SharedHash.P}) + $b) % ${SharedHash.P}) % 1024 + 1 AS INT))"
    }
    val under = t.groupBy("token", "h48").count()
      .crossJoin(broadcast(sk))
      .filter(expr(s"least(${ests.mkString(", ")}) < count"))
      .count()
    t.unpersist()
    assert(under === 0L)
  }

  test("count_min: cell matrix is identical under 1-partition vs 32-partition merge orders") {
    val t = tokenHashes.cache()
    def cells(parts: Int): Seq[Long] =
      t.repartition(parts).agg(expr("count_min(h48, 4, 1024)").as("cells"))
        .head.getSeq[Long](0)
    val one = cells(1)
    val many = cells(32)
    t.unpersist()
    assert(one === many)
    assert(one.sum === t.count() * 4) // every token lands in exactly one cell per row
  }

  test("hll_regs: register vector is identical under 1-partition vs 32-partition merge orders") {
    val t = tokenHashes.cache()
    def regs(parts: Int): Seq[Int] =
      t.repartition(parts).agg(expr("hll_regs(h48, 10)").as("regs"))
        .head.getSeq[Int](0)
    val a = regs(1)
    val b = regs(32)
    t.unpersist()
    assert(a === b)
    assert(a.length === 1024 && a.forall(r => r >= 0 && r <= 39))
  }

  test("hll estimate lands within 10% of exact distinct on the real corpus (1.04/sqrt(1024) ~ 3% expected)") {
    val rows = Sketches.hllDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(_, exact: Long, est: Double) =>
      assert(math.abs(est - exact) <= 0.10 * exact,
        s"estimate $est vs exact $exact drifts > 10%")
    }
  }

  test("hll rho edge: remainder 0 maps to maxRho+0 (39), a zero register means an empty bucket") {
    // h = bucket alone (remainder 0) must set rho = 39
    val df = spark.range(1).selectExpr("CAST(5 AS BIGINT) AS h") // bucket 5, r = 0
    GraftFunctions.registerAll(spark)
    val regs = df.agg(expr("hll_regs(h, 10)")).head.getSeq[Int](0)
    assert(regs(5) === 39)
    assert(regs.count(_ != 0) === 1)
  }

  test("count_min runs state-store-backed in a streaming query: cells after two batches equal the batch sketch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    GraftFunctions.registerAll(spark)
    val b1 = Seq.fill(40)(7L) ++ (1L to 30L)
    val b2 = Seq.fill(25)(9L) ++ (31L to 60L)
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("h48")
      .agg(expr("count_min(h48, 4, 64)").as("cells"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.sql("SELECT cells FROM cm_stream").head.getSeq[Long](0)
      val batch = (b1 ++ b2).toDF("h48")
        .agg(expr("count_min(h48, 4, 64)")).head.getSeq[Long](0)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("count_min SQL twin: harness query output re-derives exact top-30 (est equals n when cells are unsaturated at tiny SF)") {
    val out = Sketches.countMinProbes(spark, dir).collect()
    assert(out.length === 30)
    out.foreach { case Row(_, n: Long, est: Long) => assert(est >= n) }
  }

  test("quantile sketch: estimates land within the expected rank error of " +
      "the exact quantiles, and the sample is partition-invariant") {
    val ests = Sketches.quantileSketch(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ests.keySet === Sketches.QsQuantiles.map(_._1).toSet)
    // rank of each estimate in the FULL value distribution must sit within
    // ~4/sqrt(k) of the target quantile (bottom-k-by-hash is a uniform
    // sample; 4σ at k=512 is ±0.177 — loose enough to be deterministic in
    // effect while still catching a broken sample or estimator)
    val values = graft.ops.Tables.events(spark, dir)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val n = values.length.toDouble
    val tol = 4.0 / math.sqrt(Sketches.QsK.toDouble)
    Sketches.QsQuantiles.foreach { case (label, q) =>
      val est = ests(label)
      val rank = values.count(_ <= est) / n
      assert(math.abs(rank - q) <= tol,
        s"$label: estimate $est sits at rank $rank, target $q ± $tol")
    }
    // the kept sample is a pure function of the input SET: any partitioning
    // (update/merge schedule) yields identical estimates
    val ev = graft.ops.Tables.events(spark, dir)
    def estsOf(parts: Int) = Sketches.quantileSketchOf(ev.repartition(parts))
      .collect().map(_.toString).toSeq
    assert(estsOf(1) === estsOf(13))
  }

  test("quantile rollup: per-group partial sketches merge into EXACTLY the " +
      "direct global sketch (the mergeable-summary property)") {
    val direct = Sketches.quantileSketch(spark, dir)
      .collect().map(_.toString).toSeq
    val rolled = Sketches.quantileRollup(spark, dir)
      .collect().map(_.toString).toSeq
    assert(rolled === direct,
      "bottom-k(∪ per-group bottom-ks) must equal bottom-k(corpus)")
  }
}

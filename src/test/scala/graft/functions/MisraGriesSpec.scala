package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the Misra-Gries typed aggregate. The harness query's values
  * are the oracle gate's job (text_heavy_hitters); these pin the sketch
  * guarantee itself — candidate superset under skew, bounded buffer — on
  * streams where the decrement path actually fires (the corpus vocabulary
  * is smaller than k, so the oracle query alone never exercises it). */
class MisraGriesSpec extends SparkSpec {

  private def runMg(tokens: Seq[String], k: Int): Seq[String] = {
    import spark.implicits._
    MisraGries.register(spark)
    tokens.toDF("token")
      .repartition(7) // force multiple partial buffers + merges
      .agg(expr(s"misra_gries(token, $k)"))
      .head().getSeq[String](0)
  }

  test("candidates contain every item with frequency > n/(k+1), buffer " +
      "stays <= k, on skewed random streams") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val k = 2 + rnd.nextInt(6)
      // zipf-ish: item i gets weight ~ 1/i over 50 distinct items
      val items = (1 to 50).flatMap(i => Seq.fill(1 + 600 / i)(s"item_$i"))
      val stream = rnd.shuffle(items)
      val n = stream.size
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val trueHitters = exact.filter(_._2 * (k + 1) > n).keySet
      val cands = runMg(stream, k)
      assert(cands.size <= k, s"trial $trial: ${cands.size} > k=$k")
      assert(trueHitters.subsetOf(cands.toSet),
        s"trial $trial (k=$k): missing ${trueHitters -- cands.toSet}")
    }
  }

  test("single dominant item survives any k") {
    val stream = scala.util.Random.shuffle(
      Seq.fill(500)("whale") ++ (1 to 400).map(i => s"minnow_$i"))
    for (k <- Seq(1, 3, 10))
      assert(runMg(stream, k).contains("whale"), s"k=$k lost the majority item")
  }

  test("the same aggregate runs in a streaming query: candidates after " +
      "two batches cover the stream's true hitters") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    MisraGries.register(spark)
    val k = 5
    val b1 = Seq.fill(60)("alpha") ++ (1 to 40).map(i => s"rare_$i")
    val b2 = Seq.fill(80)("beta") ++ (41 to 80).map(i => s"rare_$i")
    val input = MemoryStream[String]
    val q = input.toDF().toDF("token")
      .agg(expr(s"misra_gries(token, $k)").as("cand"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val cands = spark.sql("SELECT cand FROM mg_stream")
        .head().getSeq[String](0)
      val all = b1 ++ b2
      val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val hitters = exact.filter(_._2 * (k + 1) > all.size).keySet
      assert(cands.size <= k)
      assert(hitters.subsetOf(cands.toSet),
        s"stream candidates missing ${hitters -- cands.toSet}")
    } finally q.stop()
  }

  test("harness heavy-hitters equals the exact group-by threshold") {
    val dir = "/root/testdata/sf0.001"
    val k = graft.ops.TextAnalysis.HeavyHitterK
    val got = graft.ops.TextAnalysis.heavyHitters(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val toks = graft.ops.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t")).collect()
      .map(_.getString(0))
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val expect = exact.filter(_._2 * (k + 1) > toks.length)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got === expect)
  }
}

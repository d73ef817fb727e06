package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off calibration for [[graft.ops.AudioDedup.AudioL1Eps]], the same
  * method that set MmDupL1Eps: over the bounded recall domain, print the
  * nearest-neighbor L1 distribution vs the random-pair distribution and
  * the pair count at candidate thresholds — the threshold should sit
  * between the true-duplicate NN mass and the unrelated-pair floor.
  * `sbt "runMain graft.tools.AudioEpsCalib [sfDir] [maxId]"` */
object AudioEpsCalib {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val maxId = if (args.length > 1) args(1).toLong else 300L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId)
    val base = graft.ops.AudioDedup
      .audioSigOf(graft.ops.AudioDedup.wavAssetsOf(docs)).cache()
    println(s"assets: ${base.count()}")
    val l1 = "aggregate(zip_with(ga, gb, (x, y) -> abs(x - y)), " +
      "cast(0 AS BIGINT), (acc, x) -> acc + x)"
    val pairs = base.select(col("asset_id").as("id_a"), col("g").as("ga"))
      .join(base.select(col("asset_id").as("id_b"), col("g").as("gb")),
        col("id_a") < col("id_b"))
      .withColumn("l1", expr(l1)).select("id_a", "id_b", "l1").cache()
    val nn = pairs.groupBy(col("id_a")).agg(min(col("l1")).as("nn"))
    println("NN percentiles (5,25,50,75,95): " + nn.agg(
      expr("percentile(nn, array(0.05,0.25,0.5,0.75,0.95))")).first())
    println("ALL-pair percentiles (1,5,25,50): " + pairs.agg(
      expr("percentile(l1, array(0.01,0.05,0.25,0.5))")).first())
    for (eps <- Seq(0L, 500L, 1000L, 2000L, 4000L, 8000L, 16000L, 32000L))
      println(s"pairs at eps=$eps: " +
        pairs.filter(col("l1") <= eps).count())
    // probe-window coverage: of pairs under eps, how many are reachable
    // through the exact-or-one-bin-±1 key neighborhood (= family recall)
    val probed = graft.ops.AudioDedup.audioDupPairs(spark, dir,
      maxId = Some(maxId))
    println(s"probe-reachable pairs at AudioL1Eps: ${probed.count()}")
    // quantization-scheme sweep: for (energyQuant, crossQuant) candidates,
    // report probe-window recall over the eps-true pairs plus bucket-size
    // stats (collision-floor check) — pick the scheme whose window covers
    // the true pairs without degenerate exact-key buckets
    for (eps <- Seq(2000L, 4000L);
         (qe, qc) <- Seq((2000, 125), (4000, 125), (4000, 250),
           (4000, 500), (8000, 250))) {
      val lv = s"transform(sequence(0, 15), i -> cast(element_at(g, i + 1)" +
        s" div (CASE WHEN i < 8 THEN $qe ELSE $qc END) AS INT))"
      val q = base.withColumn("lvq", expr(lv))
      val diff = q.select(col("asset_id").as("id_a"), col("lvq").as("la"))
        .join(q.select(col("asset_id").as("id_b"), col("lvq").as("lb")),
          col("id_a") < col("id_b"))
        .join(pairs.filter(col("l1") <= eps), Seq("id_a", "id_b"))
        .withColumn("nbinsdiff",
          expr("size(filter(zip_with(la, lb, (x, y) -> abs(x - y)), d -> d > 0))"))
        .withColumn("maxd",
          expr("array_max(zip_with(la, lb, (x, y) -> abs(x - y)))"))
      val inWin = diff.filter(col("nbinsdiff") <= 1 &&
        coalesce(col("maxd"), lit(0)) <= 1).count()
      val truth = diff.count()
      val buckets = q.withColumn("k2", expr(
          "array_join(transform(lvq, l -> lpad(cast(l AS string), 3, '0')), '')"))
        .groupBy("k2").count()
      val mx = buckets.agg(max("count")).first().getLong(0)
      val nb = buckets.count()
      println(s"eps=$eps qe=$qe qc=$qc: window-recall $inWin/$truth, " +
        s"buckets=$nb maxBucket=$mx")
    }
    // full-corpus (no maxId) bucket economics per scheme: exact-key pair
    // bound Σ c(c−1)/2 — the quantity that must stay duplicate-shaped,
    // not corpus-quadratic, for the default query to be scale-safe
    val full = graft.ops.AudioDedup
      .audioSigOf(graft.ops.AudioDedup.wavAssetsOf(
        graft.ops.Tables.documents(spark, dir))).cache()
    println(s"full corpus assets: ${full.count()}")
    for ((qe, qc) <- Seq((4000, 125), (4000, 250), (4000, 500), (8000, 250))) {
      val lv = s"transform(sequence(0, 15), i -> cast(element_at(g, i + 1)" +
        s" div (CASE WHEN i < 8 THEN $qe ELSE $qc END) AS INT))"
      val b = full.withColumn("k2", expr(
          s"array_join(transform($lv, l -> lpad(cast(l AS string), 3, '0')), '')"))
        .groupBy("k2").count()
      val r = b.agg(max("count").as("mx"), count(lit(1)).as("nb"),
        sum(expr("count * (count - 1) div 2")).as("bound")).first()
      println(s"full qe=$qe qc=$qc: buckets=${r.getLong(1)} " +
        s"maxBucket=${r.getLong(0)} exactPairBound=${r.getLong(2)}")
    }
    spark.stop()
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA correctness: the Jacobi eigensolver against known eigenpairs, and
  * end-to-end recovery of a planted dominant direction. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobi eigensolver: known 2x2 and diagonal matrices") {
    val (eig, vecs) = EmbeddingStats.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = eig.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector rows: for eigenvalue 3 the direction is (1,1)/sqrt(2)
    val i3 = eig.indexWhere(e => math.abs(e - 3.0) < 1e-9)
    val v3 = vecs(i3)
    assert(math.abs(math.abs(v3(0)) - math.abs(v3(1))) < 1e-12)
    assert(math.abs(v3(0) * v3(0) + v3(1) * v3(1) - 1.0) < 1e-12, "unit norm")

    val (deig, _) = EmbeddingStats.jacobiEigen(
      Array(Array(5.0, 0.0), Array(0.0, -2.0)))
    assert(deig.sorted.sameElements(Array(-2.0, 5.0)))
  }

  test("pcaProject recovers a planted dominant direction and centers it") {
    val dim = VectorOps.Dim
    // 60 vectors along u = (1,1,0,...)/sqrt(2), spread t = -30..29, plus a
    // small deterministic wobble in dim 2 so the covariance isn't rank-1
    val tmp = java.nio.file.Files.createTempDirectory("pca").toString
    val rows = (0 until 60).map { i =>
      val t = (i - 30).toDouble
      val e = new Array[Float](dim)
      e(0) = (t / math.sqrt(2)).toFloat
      e(1) = (t / math.sqrt(2)).toFloat
      e(2) = (math.sin(i.toDouble) * 0.01).toFloat
      (i.toLong, e)
    }
    rows.toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/embeddings.parquet")

    val out = EmbeddingStats.pcaProject(spark, tmp, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // pc_0 tracks t: spacing between consecutive ids is the unit step
    val p = (0 until 60).map(i => out(i.toLong)._1)
    val diffs = p.sliding(2).map(w => w(1) - w(0)).toSeq
    assert(diffs.forall(d => math.abs(math.abs(d) - 1.0) < 1e-3),
      s"pc_0 steps should be ±1, got ${diffs.take(3)}")
    // centered: corpus mean of each coordinate ~ 0
    assert(math.abs(p.sum / p.length) < 1e-3)
    val p1 = (0 until 60).map(i => out(i.toLong)._2)
    assert(math.abs(p1.sum / p1.length) < 1e-3)
    // variance concentrates on the first component
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(variance(p) > 100 * variance(p1))
  }

  test("pcaWhiten: whitened coordinates have ~unit variance per component " +
      "and zero mean") {
    val dir = "/root/testdata/sf0.001"
    val rows = EmbeddingStats.pcaWhiten(spark, dir).collect()
    val k = rows.head.length - 1
    (1 to k).foreach { c =>
      val xs = rows.map(_.getDouble(c))
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(m) < 1e-3, s"component $c mean")
      assert(math.abs(v - 1.0) < 0.05, s"component $c variance $v")
    }
  }

  test("pcaProject is deterministic across invocations") {
    val dir = "/root/testdata/sf0.001"
    val a = EmbeddingStats.pcaProject(spark, dir).collect().map(_.toString)
    val b = EmbeddingStats.pcaProject(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("single-pass fit means (dim_sum_agg) are bit-identical to dimStats " +
    "mean_v (r16 pcaFit one-pass optimization)") {
    val dir = "/root/testdata/sf0.001"
    graft.functions.DimSumAgg.register(spark)
    val d = VectorOps.Dim
    val fitMeans = Tables.embeddings(spark, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .agg(count(lit(1)).as("n"), expr(s"dim_sum_agg(e, $d)").as("ms"))
      .select(expr("transform(ms, s -> round(s / (n * 1e6), 6))"))
      .collect()(0).getSeq[Double](0)
    val dimMeans = EmbeddingStats.dimStats(spark, dir).collect()
      .sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(fitMeans.length == d)
    // bit-identical, not approximately equal: the fit's covariance (and so
    // the projected output the oracle hashes) depends on these exact values
    assert(fitMeans.zip(dimMeans).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    }, s"fit means diverge from dimStats: ${fitMeans.zip(dimMeans).filter(p => p._1 != p._2).take(3)}")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, expressed with
  * codegen'd higher-order functions (zip_with/transform/aggregate) — no
  * UDFs, no driver-side loops. Floats are cast to double before any math so
  * results are bit-identical to the left-associated DuckDB oracle chains. */
object VectorOps {
  val Dim = 64

  /** Left-fold dot product of two array<double> columns. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 AS DOUBLE), (acc, x) -> acc + x)"

  /** Left-fold squared L2 norm. */
  def norm2Expr(a: String): String =
    s"aggregate(transform($a, x -> x * x), cast(0 AS DOUBLE), (acc, x) -> acc + x)"
}

/** Similarity search over the `embeddings` table.
  *
  * Scale design: brute-force cosine top-k is the exact baseline — O(|Q|·N)
  * with the query side broadcast, so the big side streams once with no
  * shuffle. The LSH path (random hyperplane signatures, banded buckets)
  * turns all-pairs search into bucket joins: candidates ∝ collisions, not
  * N², and the verify step only scores collisions. An IVF variant would
  * replace the hyperplanes with k-means centroids (ml.KMeans) + nprobe.
  */
object Similarity {
  import VectorOps._

  val NumPlanes = 16
  val NumBands = 4
  val BitsPerBand: Int = NumPlanes / NumBands

  /** Seeded random hyperplanes (deterministic: java.util.Random spec). */
  val planes: IndexedSeq[Array[Double]] = {
    val rnd = new java.util.Random(7L)
    IndexedSeq.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  private def embedded(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", expr(norm2Expr("e")))

  /** Exact cosine top-k: for each query vector (vec_id < numQueries), the k
    * nearest neighbors by cosine similarity. The query side is broadcast;
    * ordering uses the rounded similarity so ties break identically in the
    * oracle. */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = 5,
      numQueries: Int = 5): DataFrame = {
    val e = embedded(s, dir)
    val q = e.select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
      .filter(col("q_id") < numQueries)
    val c = e.select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("sim", round(
        expr(dotExpr("qe", "ce")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** doc-side LSH signature: bucket int from the sign bits of plane dots. */
  private def withBuckets(e: DataFrame): DataFrame = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(expr(dotExpr("e", s"pl_$i")) > 0, 1 << i).otherwise(0)
    }
    val withPlanes = planes.zipWithIndex.foldLeft(e) { case (df, (p, i)) =>
      df.withColumn(s"pl_$i", array(p.map(v => lit(v)): _*))
    }
    withPlanes
      .withColumn("bucket", bitCols.reduce(_ + _))
      .drop(planes.indices.map(i => s"pl_$i"): _*)
  }

  /** Approximate cosine top-k: hyperplane-LSH candidates (any shared band)
    * verified by exact cosine. Same output shape as bruteForceTopK so
    * recall is directly measurable (see SimilaritySpec). */
  def lshTopK(s: SparkSession, dir: String, k: Int = 5,
      numQueries: Int = 5): DataFrame = {
    val e = withBuckets(embedded(s, dir))
    val bandStructs = (0 until NumBands).map { j =>
      struct(lit(j).as("band"),
        expr(s"(bucket >> ${j * BitsPerBand}) & ${(1 << BitsPerBand) - 1}").as("key"))
    }
    val bands = e.select(col("vec_id"), col("e"), col("nrm"),
        explode(array(bandStructs: _*)).as("b"))
      .select(col("vec_id"), col("e"), col("nrm"),
        col("b.band").as("band"), col("b.key").as("key"))

    val q = bands.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("band"), col("key"))
    val c = bands.select(col("vec_id").as("c_id"), col("e").as("ce"),
      col("nrm").as("cn"), col("band"), col("key"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id").asc)
    broadcast(q).join(c, Seq("band", "key"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("qe"), col("qn"), col("c_id"), col("ce"), col("cn"))
      .distinct()
      .withColumn("sim", round(
        expr(dotExpr("qe", "ce")) / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs over a bounded id range (exact,
    * oracle-able); the scale path reuses the LSH buckets. */
  def cosineDupPairs(s: SparkSession, dir: String, maxId: Long = 300,
      threshold: Double = 0.35): DataFrame = {
    val e = embedded(s, dir).filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("e"), col("nrm"))
    e.toDF("id_a", "e_a", "n_a").join(e.toDF("id_b", "e_b", "n_b"),
        col("id_a") < col("id_b"))
      .withColumn("sim", round(
        expr(dotExpr("e_a", "e_b")) / (sqrt(col("n_a")) * sqrt(col("n_b"))), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

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

  /** All vector math below uses the native codegen vec_dot expression; its
    * accumulation order is bit-identical to the HOF fold and the oracle's
    * term chain (see VecDotImpl), so oracle hash-matches are preserved. */
  private def embedded(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VecDot.register(s)
    Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", expr("vec_dot(e, e)"))
  }

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
        expr("vec_dot(qe, ce)") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** doc-side LSH signature: bucket int from the sign bits of plane dots. */
  private def withBuckets(e: DataFrame): DataFrame = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      when(expr(s"vec_dot(e, pl_$i)") > 0, 1 << i).otherwise(0)
    }
    val withPlanes = planes.zipWithIndex.foldLeft(e) { case (df, (p, i)) =>
      df.withColumn(s"pl_$i", array(p.map(v => lit(v)): _*))
    }
    withPlanes
      .withColumn("bucket", bitCols.reduce(_ + _))
      .drop(planes.indices.map(i => s"pl_$i"): _*)
  }

  /** The deterministic LSH bucket assignment (vec_id → 16-bit hyperplane
    * sign bucket) — the candidate-generation stage of [[lshTopK]] exposed
    * as its own query. The hyperplanes are seeded constants and vec_dot is
    * a left fold, so the bucket math is exactly SQL-expressible: the DuckDB
    * oracle recomputes every sign bit from literal plane coefficients,
    * hash-checking the stage that makes the ANN path approximate. */
  def lshBuckets(s: SparkSession, dir: String): DataFrame =
    withBuckets(embedded(s, dir))
      .select(col("vec_id"), col("bucket"))
      .orderBy(col("vec_id"))

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
        expr("vec_dot(qe, ce)") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** IVF (inverted-file) approximate top-k: k-means coarse quantizer (seeded
    * ml.KMeans), vectors assigned to their nearest centroid, queries probe
    * the `nProbe` nearest cells and score only those candidates. The
    * centroid count scales with √N; candidates per query drop from N to
    * ~N·nProbe/nCells — the standard billion-vector recipe. */
  def ivfTopK(s: SparkSession, dir: String, k: Int = 5, numQueries: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = embedded(s, dir)
      .withColumn("fv", array_to_vector(col("e")))
      .cache()
    // a coarse quantizer needs rough cells, not convergence — cap sweeps
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))

    // tiny centroid table, broadcast into the probe ranking
    import s.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2").asc, col("cell").asc)
    val probes = broadcast(q).crossJoin(broadcast(centroids))
      .withColumn("dist2",
        expr("vec_dot(qe, qe) - 2 * vec_dot(qe, centroid) + vec_dot(centroid, centroid)"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("qe"), col("qn"), col("cell"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id").asc)
    val out = broadcast(probes)
      .join(assigned.withColumnRenamed("vec_id", "c_id")
        .withColumnRenamed("e", "ce").withColumnRenamed("nrm", "cn"), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", round(
        expr("vec_dot(qe, ce)") / (sqrt(col("qn")) * sqrt(col("cn"))), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
    e.unpersist()
    out
  }

  /** Embedding near-dup pairs at scale: hyperplane-LSH band buckets gate
    * the exact cosine verify, so candidates ∝ bucket collisions instead of
    * n² — the scale path [[cosineDupPairs]]'s doc promises. Unlike the
    * top-k ANN path this whole operator is deterministic: the bucket bits
    * are seeded constants, so the DuckDB oracle recomputes them from
    * literal plane coefficients and applies the same ≥1-shared-band gate —
    * the emitted pair set is hash-checked end to end. (Recall vs the
    * ungated exact scan is a measured property in SimilaritySpec, not part
    * of the correctness contract.) */
  def cosineDupLsh(s: SparkSession, dir: String,
      threshold: Double = 0.35): DataFrame = {
    val e = withBuckets(embedded(s, dir))
      .select(col("vec_id"), col("e"), col("nrm"), col("bucket")).cache()
    e.count() // force: the bands scan + two verify joins are concurrent
              // consumers — unmaterialized, each would recompute the
              // embed+16-plane-dot pipeline itself
    val bandStructs = (0 until NumBands).map { j =>
      struct(lit(j).as("band"),
        expr(s"(bucket >> ${j * BitsPerBand}) & ${(1 << BitsPerBand) - 1}").as("key"))
    }
    val bands = e.select(col("vec_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.key").as("key"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    val pairs = cands
      .join(e.select(col("vec_id").as("id_a"), col("e").as("e_a"),
        col("nrm").as("n_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("e").as("e_b"),
        col("nrm").as("n_b")), "id_b")
      .withColumn("sim", round(
        expr("vec_dot(e_a, e_b)") / (sqrt(col("n_a")) * sqrt(col("n_b"))), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
    graft.ops.Caching.materializeAndRelease(pairs, e)
  }

  /** Embedding-cosine near-duplicate pairs over a bounded id range (exact,
    * oracle-able baseline); [[cosineDupLsh]] is the banded scale path. */
  def cosineDupPairs(s: SparkSession, dir: String, maxId: Long = 300,
      threshold: Double = 0.35): DataFrame = {
    val e = embedded(s, dir).filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("e"), col("nrm"))
    e.toDF("id_a", "e_a", "n_a").join(e.toDF("id_b", "e_b", "n_b"),
        col("id_a") < col("id_b"))
      .withColumn("sim", round(
        expr("vec_dot(e_a, e_b)") / (sqrt(col("n_a")) * sqrt(col("n_b"))), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup by clustering the
    * embedding space with a coarse k-means quantizer, then deduplicating
    * WITHIN each cluster — cosine pairs above `eps` form groups (connected
    * components, reusing the MinHash clusters' machinery) and only each
    * group's min-id survives. The third member of the near-dup family:
    * lexical ([[graft.ops.Dedup]] MinHash), bucketed-exact
    * ([[cosineDupLsh]] hyperplanes), semantic (this — centroids adapt to
    * the data where hyperplanes are oblivious).
    *
    * Scale shape: IVF economics — pair generation is per-cell
    * (O(Σ|cell|²), the SemDeDup paper's own trick for web scale), the
    * centroid model is driver-small and broadcast by ml's transform, and
    * the CC runs on the sparse above-eps graph only. Seeded KMeans makes
    * the run deterministic, but the quantizer isn't SQL-expressible →
    * rows-only harness check; the semantic invariants (keeper closure,
    * within-cell recall vs the exact scan) are spec-asserted instead.
    */
  def semDedup(s: SparkSession, dir: String, nCells: Int = 16,
      eps: Double = 0.35): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = embedded(s, dir)
      .withColumn("fv", array_to_vector(col("e"))).cache()
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("e"), col("nrm"), col("cell")).cache()
    assigned.count() // multi-consumer: both pair sides + the final join

    val pairs = assigned.select(col("vec_id").as("id_a"), col("e").as("e_a"),
        col("nrm").as("n_a"), col("cell"))
      .join(assigned.select(col("vec_id").as("id_b"), col("e").as("e_b"),
        col("nrm").as("n_b"), col("cell")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(
        expr("vec_dot(e_a, e_b)") / (sqrt(col("n_a")) * sqrt(col("n_b"))), 6))
      .filter(col("sim") >= eps)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comps = Dedup.connectedComponents(pairs) // (doc_id, cluster=min id)
    val out = assigned.select(col("vec_id"), col("cell"))
      .join(comps, assigned("vec_id") === comps("doc_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("cluster"), col("vec_id")).as("keeper"))
      .withColumn("kept", col("keeper") === col("vec_id"))
      .orderBy(col("vec_id"))
    Caching.materializeAndRelease(out, e, assigned)
  }
}

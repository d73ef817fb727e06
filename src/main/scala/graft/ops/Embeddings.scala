package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column statistics over the `embeddings` vector column — the
  * normalization pre-pass an ANN index build runs first (per-dimension
  * mean/spread feed mean-centering, whitening, and the PQ/IVF codebook
  * training in [[Similarity]]).
  *
  * Float-sum rule: a double-sum over floats is order-dependent, so a
  * distributed aggregate would not be bit-stable across partitionings.
  * Values are quantized to integer micro-units (round(v·1e6) as BIGINT)
  * and summed exactly — the same trick BM25 uses (TermScoring) — then the
  * mean is derived from the exact integer sum. min/max are order-free.
  *
  * Scale shape: posexplode multiplies rows ×64 but projects only
  * (dim, micro) — a ~12-byte row into a 64-group hash aggregate with
  * map-side partials, so the shuffle carries 64 rows per input partition
  * regardless of corpus size; the vector bytes themselves never shuffle.
  */
object EmbeddingStats {

  /** Per-dimension n / exact-micro mean / min / max over the corpus. */
  def dimStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(
        col("dim"),
        round(col("v").cast("double") * lit(1e6), 0).cast("long").as("micro"),
        col("v").cast("double").as("vd"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("micro")) / (count(lit(1)) * lit(1e6)), 6).as("mean_v"),
        round(min(col("vd")), 6).as("min_v"),
        round(max(col("vd")), 6).as("max_v"))
      .orderBy(col("dim"))

  /** Fitted PCA constants (means, components, mean·component offsets),
    * stashed when emb_pca runs so the oracle generator replays the
    * projection from literals — same capture-at-query-time trick as the
    * ANN centroids ([[graft.ops.Similarity]]). */
  @volatile private[graft] var fittedPca: Option[(Array[Double], IndexedSeq[Array[Double]], IndexedSeq[Double])] = None
  @volatile private[graft] var fittedWhiten: Option[(IndexedSeq[Array[Double]], IndexedSeq[Double], IndexedSeq[Double])] = None

  /** Deterministic cyclic-Jacobi eigensolver for a symmetric matrix —
    * fixed sweep count and fixed (p, q) visiting order, no data-dependent
    * branching beyond the rotation-skip on exact zeros, so the same input
    * always yields the same eigenpairs (the determinism the oracle replay
    * needs). Returns (eigenvalues, eigenvectors as rows), unsorted. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]],
      sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - sn * vqk
              v(q)(k) = sn * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** PCA over the embedding corpus: the distributed work is exactly
    * [[gramMatrix]] + [[dimStats]]'s micro sums (both driver-small
    * results); the covariance assembly and the Jacobi eigensolve are
    * driver-side numerics on a 64×64 matrix — the standard split for
    * billion-row PCA (the data-sized passes are the two aggregates and
    * the final projection, everything else is O(D²)). The projection of
    * every vector onto the top-k components runs as ONE codegen
    * projection over literal component arrays: (e − mean)·v = e·v − mean·v
    * with the mean·v offset precomputed in vec_dot's own fold order, so
    * the DuckDB oracle replays it exactly from the stashed literals.
    *
    * Determinism end to end: the covariance comes from exact integer
    * micro sums, the eigensolver is branch-free cyclic Jacobi, component
    * sign is fixed (largest-|entry| coordinate made positive), ties on
    * eigenvalues break by dimension index. */
  def pcaProject(s: SparkSession, dir: String, k: Int = PcaK): DataFrame = {
    val (means, top, offsets, _) = pcaFit(s, dir, k)
    fittedPca = Some((means, top, offsets))
    projectOnto(s, dir, top, offsets, top.map(_ => 1.0), "pc_")
  }

  /** PCA WHITENING — the embedding post-processing pass (Su et al. 2021's
    * "whitening sentence representations" recipe): the centered projection
    * scaled per component by 1/√(λ + ε), so downstream cosine geometry is
    * isotropic across the kept components. Identical distributed shape to
    * [[pcaProject]] — the scales are two more literals per component, so
    * the oracle replay stays exact. */
  def pcaWhiten(s: SparkSession, dir: String, k: Int = PcaK,
      eps: Double = 1e-9): DataFrame = {
    val (_, top, offsets, eig) = pcaFit(s, dir, k)
    val scales = eig.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    fittedWhiten = Some((top, offsets, scales))
    projectOnto(s, dir, top, offsets, scales, "wc_")
  }

  /** The shared driver-side fit: ONE distributed pass computing n, the
    * Gram triangle AND the per-dim means (r16 optimization, guide
    * §1.2/§2.4 — this used to be two full corpus passes: gramMatrix plus
    * dimStats' posexplode → 64-group hash aggregate with its own
    * exchange; now `agg(count, gram_agg, dim_sum_agg)` reads the vectors
    * once and shuffles only the two fixed Long buffers). The means are
    * derived with Spark's own `round(sum/(n·1e6), 6)` expression —
    * bit-identical to [[dimStats]]'s mean_v column (EmbeddingsSpec
    * asserts it), so the fitted components and the projected output are
    * unchanged. Then covariance assembly and the Jacobi solve on the
    * tiny result. Returns (means, top-k components, mean·v offsets,
    * top-k eigenvalues). */
  private def pcaFit(s: SparkSession, dir: String,
      k: Int): (Array[Double], IndexedSeq[Array[Double]], IndexedSeq[Double], IndexedSeq[Double]) = {
    graft.functions.VecDot.register(s)
    graft.functions.GramAgg.register(s)
    graft.functions.DimSumAgg.register(s)
    val d = graft.ops.VectorOps.Dim
    val row = Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .agg(count(lit(1)).as("n"), expr(s"gram_agg(e, $d)").as("g"),
        expr(s"dim_sum_agg(e, $d)").as("ms"))
      // mean per dim with the exact dimStats expression shape:
      // round(micro_sum / (n * 1e6), 6) — n is the same count, the
      // division and rounding evaluate in Spark, not the driver
      .select(col("n"), col("g"),
        expr("transform(ms, s -> round(s / (n * 1e6), 6))").as("means"))
      .collect()(0)
    val n = row.getLong(0).toDouble
    require(n > 0, "PCA needs a non-empty corpus")
    val tri = row.getSeq[Long](1)
    val means = row.getSeq[Double](2).toArray
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      // row-major upper-triangle index of (lo, hi), as GramAgg packs it
      val idx = lo * d - lo * (lo - 1) / 2 + (hi - lo)
      tri(idx) / 1e6 / n - means(i) * means(j)
    }
    val (eig, vecRows) = jacobiEigen(cov)
    val picked = eig.zipWithIndex
      .sortBy { case (ev, i) => (-ev, i) }
      .take(k)
    val top = picked.map { case (_, i) =>
      val row = vecRows(i)
      // sign convention: the largest-|entry| coordinate is positive
      val m = row.indices.maxBy(j => (math.abs(row(j)), -j))
      if (row(m) < 0) row.map(x => -x) else row
    }.toIndexedSeq
    // mean·v in vec_dot's own left-fold order so both engines match
    val offsets = top.map { row =>
      var acc = 0.0; var i = 0
      while (i < d) { acc += means(i) * row(i); i += 1 }
      acc
    }
    (means, top, offsets, picked.map(_._1).toIndexedSeq)
  }

  /** One codegen pass projecting every vector onto literal components:
    * round((e·v_i − offset_i) · scale_i, 6) per component. */
  private def projectOnto(s: SparkSession, dir: String,
      comps: IndexedSeq[Array[Double]], offsets: IndexedSeq[Double],
      scales: IndexedSeq[Double], prefix: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .select(
        col("vec_id") +:
          comps.indices.map(i =>
            round((call_function("vec_dot", col("e"),
              array(comps(i).map(x => lit(x)): _*)) - offsets(i)) * scales(i), 6)
              .as(s"$prefix$i")): _*)
      .orderBy(col("vec_id"))

  val PcaK = 8

  /** Upper-triangle second-moment (Gram) matrix Σ xᵢxⱼ over the corpus —
    * the distributed accumulation that feeds PCA / ZCA whitening / OPQ
    * rotation: the D×D matrix is tiny (2,080 upper-triangle entries at
    * D=64), so the only distributed work is the sum, and the eigensolve
    * is driver-side numerics on the result.
    *
    * Scale shape: ONE native typed aggregate ([[graft.functions.GramAgg]])
    * holds the full D(D+1)/2 triangle as a fixed 16 KiB Long buffer per
    * partial, updated in a tight primitive loop per row and merged
    * tree-wise — the vector stream never shuffles, only the ~2k-entry
    * buffers do. (The first formulation exploded N·D(D+1)/2 struct rows
    * into a hash aggregate — 10M shuffled rows at sf0.1 to fill 2,080
    * groups; measured 3.6 s vs ~0.4 s for the aggregate.) Per the
    * float-sum rule, each product is quantized to integer micro-units
    * BEFORE the order-dependent sum, so the result is bit-stable across
    * partitionings and hash-checkable in DuckDB. */
  def gramMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GramAgg.register(s)
    val d = graft.ops.VectorOps.Dim
    val agg = Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .agg(count(lit(1)).as("n"), expr(s"gram_agg(e, $d)").as("g"))
    // unfold the row-major triangle buffer into (i, j) rows via a tiny
    // broadcast mapping — 2,080 rows however large the corpus
    val mapping = (for (i <- 0 until d; j <- i until d) yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
      .toDF("k", "i", "j")
    agg.select(col("n"), posexplode(col("g")).as(Seq("k", "s_xy_micro")))
      .join(broadcast(mapping), "k")
      .select(col("i"), col("j"), col("n"), col("s_xy_micro"))
      .orderBy(col("i"), col("j"))
  }
}

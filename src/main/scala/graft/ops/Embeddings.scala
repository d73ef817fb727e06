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

  /** Upper-triangle second-moment (Gram) matrix Σ xᵢxⱼ over the corpus —
    * the distributed accumulation that feeds PCA / ZCA whitening / OPQ
    * rotation: the D×D matrix is tiny (2,080 upper-triangle entries at
    * D=64), so the only distributed work is the sum, and the eigensolve
    * is driver-side numerics on the result.
    *
    * Scale shape: each row expands to its (i ≤ j) term list in ONE codegen
    * projection (no self-join of the exploded frame — that would shuffle
    * N·D rows twice), then a hash aggregate with map-side partials reduces
    * to 2,080 groups per partition before the shuffle. Per the float-sum
    * rule, each product is quantized to integer micro-units BEFORE the
    * order-dependent sum, so the result is bit-stable across partitionings
    * and hash-checkable in DuckDB. */
  def gramMatrix(s: SparkSession, dir: String): DataFrame = {
    val d = graft.ops.VectorOps.Dim
    Tables.embeddings(s, dir)
      .withColumn("e", expr("cast(embedding AS ARRAY<DOUBLE>)"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
           |  transform(sequence(i, ${d - 1}), j -> struct(
           |    i AS i, j AS j,
           |    CAST(round(element_at(e, i + 1) * element_at(e, j + 1) * 1e6, 0)
           |      AS BIGINT) AS t))))""".stripMargin)).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("s.t")).as("s_xy_micro"))
      .orderBy(col("i"), col("j"))
  }
}

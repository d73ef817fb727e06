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
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque multimodal asset: binary payload + typed metadata. */
final case class Asset(asset_id: Long, mime: String, n_bytes: Long,
    content: Array[Byte])

/** Extracted features for an asset (decode STUBBED — see Multimodal). */
final case class AssetFeatures(asset_id: Long, n_bytes: Long,
    features: Array[Float])

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus decode / feature-extract / frame-sample plumbing.
  *
  * The decode step is a STUB: the real pipeline would hand each partition's
  * batch of byte arrays to a native decoder (image/audio libs are not in
  * this container). The Spark-side contract is real and tested — schema
  * (binary + metadata), partition-batched iteration via mapPartitions (the
  * Scala analog of mapInPandas batches: one decoder init per partition, not
  * per row), and the output feature shape.
  *
  * Scale notes: content bytes never shuffle — features are extracted in a
  * narrow pass and only the (id, features) projection flows downstream.
  * Partition sizing is controlled upstream via files.maxPartitionBytes so a
  * batch of payloads fits executor memory.
  */
object Multimodal {

  /** Synthesize binary assets from the documents table (deterministic:
    * payload = utf-8 bytes of text). Stands in for reading a real
    * binary-file source (`spark.read.format("binaryFile")`). */
  def synthesizeAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("asset_id"),
        lit("application/octet-stream").as("mime"),
        col("n_chars").as("n_bytes"),
        col("text").cast("binary").as("content"))
      .as[Asset]
  }

  /** STUB decode: a real implementation calls the codec here. The fake is
    * deterministic — a 16-bin byte histogram normalized by length — so the
    * plumbing (batching, shape, determinism) is testable. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) >> 4) += 1f
      i += 1
    }
    if (content.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= content.length; j += 1 }
    }
    hist
  }

  /** Feature extraction: one decoder "session" per partition, batch loop
    * inside — the mapPartitions shape a native decoder needs. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map(a => AssetFeatures(a.asset_id, a.n_bytes, decodeStub(a.content)))
    }
  }

  /** Frame sampling: keep every `stride`-th fixed-size chunk of the payload
    * (video-frame-sampling plumbing on opaque bytes). */
  def frameSample(assets: Dataset[Asset], chunkBytes: Int = 64,
      stride: Int = 4): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val out = a.content.grouped(chunkBytes).zipWithIndex
          .collect { case (chunk, i) if i % stride == 0 => chunk }
          .flatten.toArray
        a.copy(content = out, n_bytes = out.length.toLong)
      }
    }
  }

  /** Multimodal → similarity integration: nearest assets by cosine over
    * the (stub-)decoded features, reusing the engine's ANN machinery
    * (vec_dot + broadcast query side). Binary payloads never shuffle —
    * only the 16-dim feature vectors flow into the search. */
  def assetAnn(s: SparkSession, dir: String, k: Int = 3,
      numQueries: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecDot.register(s)
    val feats = extractFeatures(synthesizeAssets(s, dir)).toDF()
      .withColumn("e", expr("cast(features AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", expr("vec_dot(e, e)"))
      .filter(col("nrm") > 0)
      .select(col("asset_id"), col("e"), col("nrm"))
    val q = feats.filter(col("asset_id") < numQueries)
      .select(col("asset_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = feats.select(col("asset_id").as("c_id"), col("e").as("ce"),
      col("nrm").as("cn"))
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

  /** Query surface: per-asset feature summary (rows-only check — the
    * feature math is stubbed, not an oracle-able public semantic). */
  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    extractFeatures(synthesizeAssets(s, dir)).toDF()
      .select(col("asset_id"), col("n_bytes"),
        round(expr("aggregate(features, cast(0 AS DOUBLE), (acc, x) -> acc + x)"), 4)
          .as("feature_sum"),
        expr("array_position(features, array_max(features))").as("argmax_bin"))
      .orderBy(col("asset_id"))
}

package graft.collab

import org.apache.spark.ml.recommendation.ALSModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Batch prediction (ref: CollabFilterCassandra8.java:39-43 —
  * model.predict over all (user, product) validation pairs).
  *
  * `ml` predictions are FloatType; we cast to double before any RMSE math so
  * aggregate results hash-match double-precision oracles (SURVEY §7.4.5).
  */
object Scoring {
  /** Score all (user, product) pairs of `pairs`; extra columns pass through.
    * Output adds `prediction: Double`. */
  def predict(model: ALSModel, pairs: DataFrame): DataFrame =
    model.transform(pairs)
      .withColumn(Schemas.PredictionCol, col(Schemas.PredictionCol).cast(DoubleType))
}

package graft.collab

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Human-readable results report (ref: CollabFilterCassandra8.java:59-77):
  * header, one line per prediction sorted by (user, product) with predicted
  * and actual rounded to 1 decimal and an ERR/OK flag (|actual − predicted|
  * ≥ 1 → ERR), footer `RMSE = x.xx`.
  *
  * Unlike the reference — which collects predictions AND validations to the
  * driver and re-joins them in a Java HashMap (8.java:63-69) — the rows are
  * formatted distributed from the already-joined frame; only final display
  * strings are collected. Report size = |validation|, which for a report a
  * human reads is bounded by construction.
  */
object Report {
  import Schemas._

  val Header = "User\tProduct\tPredicted\tActual\tError?"

  /** Per-row formatting (≙ P7 + F2 + C1 + O1 — SURVEY §2.3).
    * round() is half-up like Java's Math.round for the positive rating
    * domain (SURVEY §2.8 C1). */
  def formatted(joined: DataFrame): DataFrame =
    joined
      .withColumn("flag",
        when(abs(col(RatingCol) - col(PredictionCol)) >= 1, "ERR").otherwise("OK"))
      .select(
        col(UserCol), col(ProductCol),
        format_string("%d\t%d\t%s\t\t%s\t%s",
          col(UserCol), col(ProductCol),
          round(col(PredictionCol), 1).cast("string"),
          round(col(RatingCol), 1).cast("string"),
          col("flag")).as("line"))
      .orderBy(col(UserCol).asc, col(ProductCol).asc)

  /** Full report string (≙ resultsReport, 8.java:59-77). */
  def resultsReport(joined: DataFrame, rmse: Double): String = {
    val lines = formatted(joined).select("line")
      .collect().map(_.getString(0))
    val rmseLine = f"RMSE = ${Util.round(rmse, 2)}%s"
    (Header +: lines :+ rmseLine).mkString("\n")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.collab.{Scoring, Training, Validation}

/** The reference's ALS pipeline applied to the harness `events` table
  * (user_id × event_type × value ≙ user × product × rating, per
  * FIXTURES.md §4). Train/holdout split is value-derived (event_id mod 10)
  * like the reference's I/V row tags.
  *
  * Not oracle-able (ALS is not SQL-expressible — SURVEY §7.4.6); gated by
  * rows-only checks here and threshold/seeded tests in CollabEventsSpec.
  */
object CollabEvents {

  /** events → typed ratings: int user, dense int product id per event_type
    * (deterministic alphabetical indexing), double rating. */
  def ratingsFromEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val typeIds = ev.select(col("event_type")).distinct()
      .withColumn("product",
        (row_number().over(Window.orderBy(col("event_type"))) - 1))
    ev.join(broadcast(typeIds), "event_type")
      .select(col("event_id"),
        col("user_id").cast("int").as("user"),
        col("product"),
        col("value").as("rating"))
  }

  /** Train on the I split, score the V split, return one summary row:
    * (rmse, n_train, n_valid, n_scored). */
  def alsRmse(s: SparkSession, dir: String, maxIter: Int = 10): DataFrame = {
    import s.implicits._
    val ratings = ratingsFromEvents(s, dir).cache()
    val train = ratings.filter(pmod(col("event_id"), lit(10)) < 8)
      .select("user", "product", "rating")
    val valid = ratings.filter(pmod(col("event_id"), lit(10)) >= 8)
      .select("user", "product", "rating").cache()

    val model = Training.train(train, maxIter = maxIter)
    // score each distinct pair once — events repeat (user, product), and a
    // duplicate-keyed join would fan out m×n (unlike the reference's
    // unique-keyed validation table)
    val scored = Scoring.predict(model,
      valid.select("user", "product").distinct())
    val joined = Validation.joined(valid, scored.select("user", "product", "prediction"))
      .cache()
    val rmse = Validation.rmse(joined)
    val out = Seq((rmse, train.count(), valid.count(), joined.count()))
      .toDF("rmse", "n_train", "n_valid", "n_scored")
    ratings.unpersist(); valid.unpersist(); joined.unpersist()
    out
  }

  /** Top-N recommendations per user via ALSModel.recommendForAllUsers —
    * the one ALS surface the modern DataFrame API adds over the
    * reference's predict-known-pairs-only API (ref:
    * ICollabFilterCassandra.java:14-18 exposes predict but no top-N).
    * Internally a blocked factor cross-product with per-user top-k — the
    * recommend-to-everyone batch job of a real recsys. Rows-only in the
    * harness (ALS is not SQL-expressible); ranking invariants are
    * spec-gated in CollabEventsSpec. */
  def alsRecommend(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ratings = ratingsFromEvents(s, dir).cache()
    val train = ratings.filter(pmod(col("event_id"), lit(10)) < 8)
      .select("user", "product", "rating")
    val model = Training.train(train, maxIter = 10)
    val out = model.recommendForAllUsers(k)
      .select(col("user"), posexplode(col("recommendations")))
      .select(col("user"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.product").as("product"),
        col("col.rating").cast("double").as("score"))
      .orderBy(col("user"), col("rnk"))
    ratings.unpersist()
    out
  }

  /** Flagship entry frame: scored validation pairs with actual + predicted
    * (driver smoke-checks rows > 0). */
  def entryFrame(s: SparkSession, dir: String): DataFrame = {
    val ratings = ratingsFromEvents(s, dir).cache()
    val train = ratings.filter(pmod(col("event_id"), lit(10)) < 8)
      .select("user", "product", "rating")
    val valid = ratings.filter(pmod(col("event_id"), lit(10)) >= 8)
      .select("user", "product", "rating")
    val model = Training.train(train, maxIter = 10)
    val scored = Scoring.predict(model,
      valid.select("user", "product").distinct())
    Validation.joined(valid, scored.select("user", "product", "prediction"))
      .orderBy(col("user"), col("product"))
  }
}

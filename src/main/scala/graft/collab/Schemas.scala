package graft.collab

import org.apache.spark.sql.types._

/** A rating event: the single entity of the reference's data model
  * (ref: RatingDO.java:17-20, collab_filter_setup.sql:4).
  *
  * The reference leaks `product` through a `double` bean getter on the write
  * path (RatingDO.java:41-43); we keep it integral end-to-end (SURVEY §1.3).
  */
final case class Rating(user: Int, product: Int, rating: Double)

/** A stored rating row: analytics schema + opaque row identity
  * (≙ TIMEUUID PK, collab_filter_setup.sql:4 — never read by any query). */
final case class StoredRating(id: String, user: Int, product: Int, rating: Double)

/** Names and schemas of the reference data model
  * (ref: RatingDO.java:8-15, collab_filter_setup.sql:2-5). */
object Schemas {
  val Keyspace = "employerratings"
  val RatingsTable = "ratings"
  val ValidationTable = "validation"

  val UserCol = "user"
  val ProductCol = "product"
  val RatingCol = "rating"
  val IdCol = "id"
  val PredictionCol = "prediction"

  /** Row-level train/validation split tags in the CSV first column
    * (ref: RatingDO.java:14-15, data/csv/readme.txt:3). */
  val TrainTag = "I"
  val ValidationTag = "V"

  val ratingSchema: StructType = StructType(Seq(
    StructField(UserCol, IntegerType, nullable = false),
    StructField(ProductCol, IntegerType, nullable = false),
    StructField(RatingCol, DoubleType, nullable = false)))

  val storedRatingSchema: StructType =
    StructType(StructField(IdCol, StringType, nullable = false) +: ratingSchema.fields)
}

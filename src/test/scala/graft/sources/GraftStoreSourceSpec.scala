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

  test("store writes (append/truncate) are immediately visible to " +
      "format(\"graft\") reads — the documented write seam") {
    // Spark routes ALL FileDataSourceV2 writes through the V1 fallback,
    // which requires a physical `path` option — so the logical-name write
    // API is the TableStore (as the source's scaladoc states); this pins
    // the read-after-write visibility contract across that seam.
    val root = java.nio.file.Files.createTempDirectory("graft-w").toString
    val store = new ParquetTableStore(spark, root)
    store.create("ratings", Schemas.ratingSchema)
    def readBack() = spark.read.format("graft")
      .option("root", root).option("table", "ratings").load()
    store.append("ratings", Seq(Rating(1, 1, 4.0), Rating(2, 3, 5.0)).toDF())
    assert(readBack().count() === 2)
    store.append("ratings", Seq(Rating(9, 9, 2.0)).toDF())
    assert(readBack().count() === 3)
    assert(readBack().filter(col("user") === 9).head().getDouble(2) === 2.0)
    store.truncate("ratings")
    assert(readBack().count() === 0)
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

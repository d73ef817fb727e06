package graft.collab

import graft.SparkSpec
import org.apache.spark.sql.types._

/** ParquetTableStore edge cases around the empty-table fallback: a truncated
  * table reads as empty, but a CORRUPTED table must raise — the fallback is
  * scoped to analysis-time "nothing there" failures only. */
class TableStoreRobustnessSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("user", IntegerType, nullable = false),
    StructField("rating", DoubleType, nullable = false)))

  private def freshStore(): (ParquetTableStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-store").toString
    (new ParquetTableStore(spark, root), root)
  }

  test("scan of a just-truncated table is empty with the declared schema") {
    val (store, _) = freshStore()
    store.create("ratings", schema)
    val df = store.scan("ratings")
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() === 0)
  }

  test("scan of a created table whose directory vanished falls back to empty") {
    val (store, root) = freshStore()
    store.create("ratings", schema)
    val path = new org.apache.hadoop.fs.Path(s"$root/ratings")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
    assert(store.scan("ratings").count() === 0)
  }

  test("corrupted parquet file raises instead of reading as empty") {
    val (store, root) = freshStore()
    store.create("ratings", schema)
    import spark.implicits._
    store.append("ratings", Seq((1, 4.0), (2, 5.0)).toDF("user", "rating"))
    // clobber the table with a file that is not parquet
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/ratings/part-corrupt.parquet"),
      "this is not a parquet file".getBytes)
    val ex = intercept[Exception] { store.scan("ratings").count() }
    assert(!ex.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"corruption must not be swallowed as analysis-time emptiness: $ex")
  }

  test("scan of an unknown (never-created) table propagates the failure") {
    val (store, _) = freshStore()
    intercept[Exception] { store.scan("nope").count() }
  }
}

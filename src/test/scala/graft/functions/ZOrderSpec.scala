package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the Z-order clustering expression: bit-level correctness vs an
  * independent reference, SQL registration, and the layout property the
  * curve exists for — files written in zkey order bound BOTH dimensions. */
class ZOrderSpec extends SparkSpec {

  private def referenceInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches a bit-by-bit reference on random inputs") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong() & 0x7FFFFFFFL
      val b = rnd.nextLong() & 0x7FFFFFFFL
      assert(ZOrderImpl.interleave(a, b) === referenceInterleave(a, b),
        s"mismatch at a=$a b=$b")
    }
    // truncation: bits above 32 are ignored
    assert(ZOrderImpl.interleave(1L << 40, 0) === 0L)
  }

  test("registered SQL expression evaluates inside codegen and matches " +
      "the reference") {
    import spark.implicits._
    ZOrder2.register(spark)
    val rows = Seq((3L, 5L), (0L, 0L), (1L, 2L), (123456L, 654321L))
      .toDF("a", "b")
      .withColumn("z", expr("zorder2(a, b)"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === referenceInterleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("zkey-ordered files bound both dimensions; a leading-column sort " +
      "does not") {
    val dir = "/root/testdata/sf0.001"
    val keyed = graft.ops.CorpusLayout.zorderKeys(spark, dir)

    def fileSpans(sortCol: String): Seq[(Long, Long)] = {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-z-$sortCol").toString + "/t"
      keyed.repartition(1).sortWithinPartitions(col(sortCol))
        .write.option("maxRecordsPerFile", 100).parquet(out)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("user_id")), max(col("user_id")),
            min(col("bucket")), max(col("bucket"))).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
    }

    val zSpans = fileSpans("zkey")
    val uSpans = fileSpans("user_id")
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    val (zU, zB) = (avg(zSpans.map(_._1)), avg(zSpans.map(_._2)))
    val (uU, uB) = (avg(uSpans.map(_._1)), avg(uSpans.map(_._2)))
    // user_id sort perfectly bounds user_id but leaves bucket unbounded;
    // zorder must bound bucket far better while keeping user_id bounded
    assert(zB < uB / 2,
      s"zorder bucket span $zB not better than leading-col sort $uB")
    assert(zU < uB,
      s"zorder user span $zU should stay clustered too (vs full range $uB)")
  }
}

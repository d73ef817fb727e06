package graft.collab

import org.apache.spark.sql.SparkSession

/** CLI entry (ref: CollabFilterCassandraDriver.java:33-48). The reference
  * dispatches between two byte-identical impls via args[0] ∈ {7,8} and reads
  * args[0] before its length guard; we validate first and keep a single
  * impl — the version argument is accepted and ignored for parity
  * (SURVEY §2.10 L2, §1.3).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val csvPath = args.headOption.getOrElse("src/test/resources/ratings.csv")
    val warehouse = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-store").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-collab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val modelDir = if (args.length > 2) Some(args(2)) else None
      val result = Pipeline.run(spark, new ParquetTableStore(spark, warehouse),
        csvPath, modelDir = modelDir)
      println(result.report)
      modelDir.foreach(d => println(s"model saved to $d"))
    } finally spark.stop()
  }
}

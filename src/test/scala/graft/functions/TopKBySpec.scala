package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregate must be an exact, schedule-independent
  * replacement for the window row_number idiom. */
class TopKBySpec extends SparkSpec {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    TopKBy.register(spark)
    df.groupBy($"g")
      .agg(expr(s"topk_by(v, tag, $k)").as("top"))
      .select($"g", expr("transform(top, x -> x.tag)").as("tags"),
        expr("transform(top, x -> x.value)").as("vals"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[Long](1).toList, r.getSeq[Double](2).toList)))
      .toMap
  }

  test("topk_by equals the window row_number idiom on real data (sf0.001 " +
      "events, per event_type top-7 by value desc / id asc)") {
    TopKBy.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = sf("events").select($"event_type".as("g"),
      $"value".as("v"), $"event_id".as("tag"))
    val agg = viaAgg(ev, 7)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"tag".asc)
    val win = ev.withColumn("rn", row_number().over(w)).filter($"rn" <= 7)
      .orderBy($"g", $"rn").collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getLong(2)).toList }
    assert(agg.keySet === win.keySet)
    win.foreach { case (g, tags) => assert(agg(g)._1 === tags, s"group $g") }
  }

  test("schedule independence: 1 partition vs 13 partitions produce the " +
      "identical kept set and order (merge path exercised)") {
    val df = (1 to 500).map(i => ("g" + i % 3, (i % 17).toDouble, i.toLong))
      .toDF("g", "v", "tag")
    assert(viaAgg(df.repartition(1), 5) === viaAgg(df.repartition(13), 5))
  }

  test("ties on value break by tag ascending; k larger than the group " +
      "returns the whole group sorted") {
    val df = Seq(("a", 1.0, 30L), ("a", 1.0, 10L), ("a", 2.0, 20L))
      .toDF("g", "v", "tag")
    val (tags, vals) = viaAgg(df, 10)("a")
    assert(tags === List(20L, 10L, 30L))
    assert(vals === List(2.0, 1.0, 1.0))
  }

  test("null values and null tags are skipped, not kept as zeros") {
    val df = Seq(("a", Some(5.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(7.0), None), ("a", Some(3.0), Some(4L)))
      .toDF("g", "v", "tag")
    assert(viaAgg(df, 10)("a") === ((List(1L, 4L), List(5.0, 3.0))))
  }
}

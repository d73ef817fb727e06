package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** DataQuality expectations + SCD2 dimension history. */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("pristine testdata passes the whole expectation suite") {
    val rows = DataQuality.qualityReport(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"check ${r.getString(0)} unexpectedly failed")
      assert(r.getLong(3) === 0L)
      assert(r.getLong(2) > 0L)
    }
  }

  test("iqrOutliers: fences bracket the quartiles, counts match a driver-side recount") {
    val dir = "/root/testdata/sf0.001"
    val out = DataQuality.iqrOutliers(spark, dir).collect()
    assert(out.nonEmpty)
    // recount in the same integer micro-units the operator compares in
    // (HALF_UP = away-from-zero, matching Spark's round and DuckDB's)
    def micro(v: Double): Long =
      BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> micro(r.getDouble(1)))
    out.foreach { r =>
      val (et, n, nOut, lo, hi) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo < hi)
      val vals = ev.filter(_._1 == et).map(_._2)
      assert(n === vals.length)
      assert(nOut === vals.count(v => v < lo || v > hi))
    }
  }

  test("scd2History: re-observing the SAME value collapses into the open interval (no new row)") {
    val versions = Seq(
      (1L, 100L, 0), (1L, 100L, 1), (1L, 200L, 2), // re-observe then change
      (2L, 50L, 0), (2L, 50L, 1), (2L, 50L, 2) // never changes
    ).toDF("doc_id", "val", "batch")
    val got = Analytics.scd2History(versions, "doc_id", "val", "batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
    assert(got === Array(
      (1L, 100L, 0, 1, false), // closed at batch 2's change, NOT at the re-observation
      (1L, 200L, 2, -1, true),
      (2L, 50L, 0, -1, true)))
  }

  test("scd2History: a value flapping A->B->A yields three intervals, only the last current") {
    val versions = Seq((9L, 1L, 0), (9L, 2L, 1), (9L, 1L, 2))
      .toDF("doc_id", "val", "batch")
    val got = Analytics.scd2History(versions, "doc_id", "val", "batch")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getBoolean(4)))
    assert(got === Array((1L, 0, false), (2L, 1, false), (1L, 2, true)))
  }

  test("scd2 plan: both window passes ride ONE exchange (same key partitioning, no re-shuffle)") {
    val versions = Seq((1L, 100L, 0), (1L, 200L, 1)).toDF("doc_id", "val", "batch")
    val plan = Analytics.scd2History(versions, "doc_id", "val", "batch")
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    // one hash exchange for the windows + the final presentation sort's
    // range exchange — lag and lead must NOT add a third
    assert(exchanges.length <= 2, s"unexpected re-shuffle:\n$plan")
  }

  test("every interval chain tiles [0, 2] with no gaps or overlaps on the real corpus") {
    val rows = Analytics.scd2Documents(spark, "/root/testdata/sf0.001").collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (id, ivs) =>
      val sorted = ivs.sortBy(_.getInt(2))
      assert(sorted.head.getInt(2) === 0, s"doc $id history must open at batch 0")
      assert(sorted.last.isNullAt(3) && sorted.last.getBoolean(4),
        s"doc $id must end with an open current interval")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getInt(3) + 1 === b.getInt(2), s"doc $id gap/overlap")
          assert(!a.getBoolean(4))
        case _ =>
      }
    }
  }
}

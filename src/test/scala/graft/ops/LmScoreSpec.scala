package graft.ops

import org.apache.spark.sql.Row

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lm score matches a driver-side exact recomputation on the real corpus") {
    val docs = sf("documents", dir).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = docs.toSeq.flatMap { case (id, t) =>
      t.sliding(2).collect { case Seq(a, b) => (id, a, b) }
    }
    val c2 = bigrams.groupBy(x => (x._2, x._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, a, b) =>
        math.floor(math.log(c2((a, b)).toDouble / c1(a)) * 1e6).toLong
      }.sum
      val score = BigDecimal(s / (bs.size * 1e6))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> (bs.size.toLong, score)
    }
    val got = TermScoring.lmScore(spark, dir).collect().map {
      case Row(id: Long, n: Long, sc: Double) => id -> (n, sc)
    }.toMap
    assert(got === expect)
  }

  test("scores are non-positive (log-probabilities) and more-typical docs score higher") {
    val rows = TermScoring.lmScore(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { case Row(_, n: Long, sc: Double) =>
      assert(n >= 1L)
      assert(sc <= 0.0, s"ln p must be <= 0, got $sc")
    }
    // the corpus isn't degenerate: scores spread over a real range
    val scores = rows.map(_.getDouble(2))
    assert(scores.max > scores.min)
  }
}

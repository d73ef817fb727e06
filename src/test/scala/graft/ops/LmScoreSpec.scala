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

  test("backoff LM: train docs never back off; the backoff chain orders scores sanely") {
    import org.apache.spark.sql.functions._
    val out = TermScoring.lmBackoff(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "n_trigrams", "n_backoff", "lm_score"))
    val evalIds = sf("documents", dir)
      .filter(expr(s"pmod(${graft.functions.SharedHash.spark48("cast(doc_id AS STRING)")}, 10)") === 9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    rows.foreach { r =>
      val (id, n, bo, sc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sc <= 0.0, s"ln p must be <= 0 for doc $id")
      assert(bo >= 0L && bo <= n)
      if (!evalIds.contains(id))
        assert(bo === 0L, s"train doc $id has all its trigrams in the model")
    }
    // held-out docs exist in the scored output and at least one backs off
    val evalRows = rows.filter(r => evalIds.contains(r.getLong(0)))
    assert(evalRows.nonEmpty)
    assert(evalRows.exists(_.getLong(2) > 0L),
      "some held-out doc must hit an unseen trigram")
  }
}

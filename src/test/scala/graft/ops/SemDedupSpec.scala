package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val out = Similarity.semDedup(spark, dir).collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))

  test("every vector appears once; keepers are self-kept fixpoints; keeper <= member id") {
    val n = sf("embeddings", dir).count()
    assert(out.length === n)
    assert(out.map(_._1).distinct.length === out.length)
    val keeperOf = out.map(x => x._1 -> x._3).toMap
    out.foreach { case (id, _, keeper, kept) =>
      assert(kept === (keeper === id))
      assert(keeper <= id) // group label is the component min
      assert(keeperOf(keeper) === keeper, s"keeper $keeper of $id is itself dropped")
    }
  }

  test("dropped vectors really have an above-eps semantic neighbor in their cell (no false drops)") {
    // exact pairwise cosine, driver-side, per cell
    val vecs = sf("embeddings", dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val cellOf = out.map(x => x._1 -> x._2).toMap
    out.filter(!_._4).foreach { case (id, cell, _, _) =>
      val hasNeighbor = out.exists { case (other, oCell, _, _) =>
        other != id && oCell == cell &&
          cos(vecs(id), vecs(other)) >= 0.35 - 1e-9
      }
      assert(hasNeighbor, s"vec $id dropped without an above-eps neighbor in cell $cell")
    }
  }

  test("within-cell recall vs the exact ungated scan: cell-local above-eps pairs are all found") {
    // the approximation loses only CROSS-cell pairs by design; within a
    // cell the pair scan is exact, so grouping must match a driver-side
    // recomputation restricted to cells
    val vecs = sf("embeddings", dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val byCell = out.groupBy(_._2)
    var pairsChecked = 0
    byCell.values.foreach { members =>
      val ids = members.map(_._1).sorted
      val keeperOf = members.map(x => x._1 -> x._3).toMap
      for {
        i <- ids.indices; j <- (i + 1) until ids.length
        a = ids(i); b = ids(j)
        // round like the operator (6 dp) before comparing to eps
        if BigDecimal(cos(vecs(a), vecs(b))).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.35")
      } {
        pairsChecked += 1
        assert(keeperOf(a) === keeperOf(b),
          s"within-cell above-eps pair ($a, $b) split across groups")
      }
    }
    assert(pairsChecked > 0, "testdata has no above-eps within-cell pair — spec is vacuous")
  }

  test("determinism: two runs produce identical assignments (seeded quantizer)") {
    val again = Similarity.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(again === out)
  }
}

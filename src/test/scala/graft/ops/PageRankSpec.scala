package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same integer trajectory, plain Scala. */
  private def reference(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val base = PageRank.TotalMass / nodes.size
    var ranks = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => ranks(src) / deg(src) }.sum).toMap
      ranks = nodes.map(v =>
        v -> (PageRank.BaseNum * base + PageRank.DampNum * s.getOrElse(v, 0L)) / 100).toMap
    }
    ranks
  }

  private val star = Seq[(Long, Long)](
    (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), // hub 1
    (6L, 7L), (7L, 8L)) // chain

  test("integer PageRank matches a driver-side exact recomputation, rank for rank") {
    val pairs = star.toDF("doc_a", "doc_b")
    val got = PageRank.pageRank(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(star, PageRank.Iters))
  }

  test("the hub outranks its leaves; total mass is conserved up to floor loss") {
    val pairs = star.toDF("doc_a", "doc_b")
    val ranks = PageRank.pageRank(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) === ranks(3L)) // symmetric leaves tie exactly
    val total = ranks.values.sum
    assert(total <= PageRank.TotalMass)
    // floor losses: <= 1 unit per div, 2 divs per node per round, 10 rounds
    assert(total >= PageRank.TotalMass - 8 * 2 * PageRank.Iters - 8)
  }

  test("edge budget: capped trajectory equals the exact trajectory of the " +
      "deterministically truncated graph; default is the exact graph") {
    val pairs = star.toDF("doc_a", "doc_b")
    val cap = 2
    val got = PageRank.pageRank(pairs, maxDegree = Some(cap)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // no node keeps more than `cap` out-edges
    assert(got.forall(_._3 <= cap), s"degree over budget: ${got.toSeq}")
    // the capped run IS exact PageRank on the truncated graph: replay the
    // same first-c-by-ascending-dst rule driver-side and compare ranks
    val tEdges = star.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(_._2).take(cap) }
    val tDeg = tEdges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = PageRank.TotalMass / tDeg.size
    var ranks = tDeg.keySet.map(_ -> base).toMap
    for (_ <- 1 to PageRank.Iters) {
      val s = tEdges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => ranks(src) / tDeg(src) }.sum).toMap
      ranks = tDeg.keySet.map(v =>
        v -> (PageRank.BaseNum * base + PageRank.DampNum * s.getOrElse(v, 0L)) / 100).toMap
    }
    assert(got.map(r => r._1 -> r._2).toMap === ranks)
    // deterministic: a different physical layout replays the same subset
    val again = PageRank.pageRank(pairs.repartition(7), maxDegree = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq === got.sorted.toSeq)
    // the default (None) path is untouched by the knob
    assert(PageRank.pageRank(pairs).collect().map(_.getLong(1)).sorted ===
      reference(star, PageRank.Iters).values.toArray.sorted)
  }

  test("trajectory is partitioning-invariant (1 vs 32 shuffle partitions)") {
    val pairs = star.toDF("doc_a", "doc_b")
    def run(parts: Int) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try PageRank.pageRank(pairs.repartition(parts)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run(1) === run(32))
  }

  test("harness query runs on the real dup graph: positive ranks, conserved mass, sorted output") {
    // NOTE: dup graphs are mostly cliques, and on a regular component the
    // stationary distribution is uniform (every member ends at ~base mass)
    // — so rank does NOT track degree here; the meaningful invariants are
    // positivity, mass conservation, and ordering.
    val out = PageRank.dupGraphRank(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0L))
    assert(out.map(_.getLong(1)).sum <= PageRank.TotalMass)
    val ranks = out.map(_.getLong(1)).toSeq
    assert(ranks === ranks.sorted(Ordering[Long].reverse))
  }
}

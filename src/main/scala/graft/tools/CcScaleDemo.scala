package graft.tools

import org.apache.spark.sql.SparkSession

/** Exercises the DISTRIBUTED connected-components path (label propagation
  * + pointer doubling) at a size where the driver union-find escape hatch
  * would normally take over, and cross-checks it against the union-find
  * result. `sbt "runMain graft.tools.CcScaleDemo [nEdges]"` */
object CcScaleDemo {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // adversarial mix: one long chain (deep diameter) + random clutter
    val rnd = new java.util.Random(7)
    val chainLen = 2000
    val chain = (0 until chainLen).map(i => (i.toLong, (i + 1).toLong))
    val nNodes = nEdges / 3
    val random = (1 to nEdges).map { _ =>
      val a = chainLen.toLong + rnd.nextInt(nNodes)
      val b = chainLen.toLong + rnd.nextInt(nNodes)
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)
    val edges = (chain ++ random).distinct.toDF("doc_a", "doc_b").cache()
    println(s"edges: ${edges.count()} (incl. a $chainLen-node chain)")

    def run(label: String, threshold: Long): Map[Long, Long] = {
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.connectedComponents(edges, threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rounds = if (threshold == 0L)
        s", ${graft.ops.Dedup.lastDistributedRounds} rounds" else ""
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        s"${out.values.toSet.size} components over ${out.size} nodes$rounds")
      out
    }
    val uf = run("union-find (driver)", Long.MaxValue)
    val lp = run("label-propagation + doubling (distributed)", 0L)
    require(lp == uf, "distributed result must equal union-find")
    println("MATCH: distributed path agrees with union-find")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling (Corpus.dsirSelect): the fit is re-derived
  * by INDEPENDENT plain-Scala arithmetic (own md5 path, own tokenizer, own
  * counting), the selection cutoff is checked against exact per-source
  * rank math, and the model must actually separate target from raw. */
class DsirSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = Corpus.dsirSelect(spark, dir).collect()
  private lazy val lam = Corpus.fittedDsirLam.get

  /** Plain-Scala twin of the SharedHash bucket: md5 hex → first 12 chars
    * → mod P → a·x+b mod P → mod B. No Spark expressions involved. */
  private def bucketOf(g: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h48 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    val (a, b) = Corpus.DsirSeed
    val p = graft.functions.SharedHash.P
    (((a * (h48 % p) + b) % p) % Corpus.DsirBuckets).toInt
  }

  private def gramsOf(text: String): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    toks ++ (if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
             else Seq.empty)
  }

  test("fitted lam replays from independent driver arithmetic") {
    out // force the query (and the stash)
    val docs = sf("documents", dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val target = graft.sources.IndexStore.standingCurationVerdicts(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val t = new Array[Long](Corpus.DsirBuckets)
    val r = new Array[Long](Corpus.DsirBuckets)
    for ((id, text) <- docs; g <- gramsOf(text)) {
      val b = bucketOf(g)
      r(b) += 1
      if (target(id)) t(b) += 1
    }
    val tTot = (t.sum + Corpus.DsirBuckets).toDouble
    val rTot = (r.sum + Corpus.DsirBuckets).toDouble
    val expect = Array.tabulate(Corpus.DsirBuckets) { b =>
      math.round((math.log((t(b) + 1.0) / tTot) -
        math.log((r(b) + 1.0) / rTot)) * 1e6)
    }
    assert(lam.toSeq == expect.toSeq)
  }

  test("per-source selection count is exactly floor(n/5)") {
    val bySrc = out.groupBy(_.getString(1))
    for ((_, rows) <- bySrc) {
      val nSel = rows.count(_.getInt(3) == 1)
      assert(nSel == rows.length / 5)
    }
    assert(out.map(_.getString(1)).distinct.length >= 2)
  }

  test("scores replay from the stashed lam and separate target from raw") {
    out
    val docs = sf("documents", dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((id, text) <- docs) {
      val expect = gramsOf(text).map(g => lam(bucketOf(g))).sum
      assert(scores(id) == expect, s"doc $id")
    }
    // separation: the curated target's mean importance weight must exceed
    // the non-target mean — the model prefers docs that look curated
    val target = graft.sources.IndexStore.standingCurationVerdicts(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // per-token normalization: logw is length-additive, so compare means
    // of the per-gram average, not raw sums
    def avg(ids: Iterable[Long]) = {
      val xs = ids.map(id => scores(id).toDouble / gramsOf(docs(id)).length)
      xs.sum / xs.size
    }
    val (tgt, rest) = docs.keys.partition(target)
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(avg(tgt) > avg(rest))
  }
}

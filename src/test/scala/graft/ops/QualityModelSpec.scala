package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distilled quality classifier — determinism (the float-sum rule applied
  * to gradients), training-loss descent, and distillation fidelity
  * against the curation verdicts it was fit on. */
class QualityModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fixture() = {
    val docs = Tables.documents(spark, dir)
    val curated = Corpus.curate(docs).select(col("doc_id"))
    (docs, curated)
  }

  test("fit is bit-identical under repartitioning (exact integer gradient sums)") {
    val (docs, curated) = fixture()
    val f1 = QualityModel.featureFrame(docs, curated)
    val f2 = QualityModel.featureFrame(docs.repartition(7), curated)
    val (w1, l1) = QualityModel.fitOn(f1, iters = 6)
    val (w2, l2) = QualityModel.fitOn(f2, iters = 6)
    assert(w1.toSeq === w2.toSeq, "weights must not depend on partitioning")
    assert(l1 === l2, "loss trajectory must not depend on partitioning")
  }

  test("training loss decreases and the fit separates the curation verdicts") {
    val (docs, curated) = fixture()
    val f = QualityModel.featureFrame(docs, curated).cache()
    val (_, losses) = QualityModel.fitOn(f)
    assert(losses.head > losses.last, s"loss must descend: $losses")
    assert(losses.last < 0.693, "must beat the w=0 starting point (ln 2)")
    f.unpersist()
  }

  test("standing curation verdicts: the persisted artifact equals a direct " +
      "curate run (distill trains on stored labels, not a refit)") {
    val direct = Corpus.curate(Tables.documents(spark, dir))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val stored = graft.sources.IndexStore.standingCurationVerdicts(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(stored === direct)
  }

  test("distill query: schema, determinism, and accuracy over the labels") {
    val out = QualityModel.distill(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "label", "pred", "margin"))
    val rows = out.collect()
    assert(rows.length === 500)
    val acc = rows.count(r => r.getInt(1) == r.getInt(2)) / 500.0
    assert(acc >= 0.8, s"distillation accuracy $acc below 0.8")
    // the stash exists and matches the published margins' weight count
    assert(QualityModel.fittedWeights.exists(_.length === QualityModel.NumFeatures))
  }
}

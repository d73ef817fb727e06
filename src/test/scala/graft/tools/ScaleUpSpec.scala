package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replica-generator fidelity: the scale sweeps are only as honest as the
  * data ScaleUp derives, so the invariants the base testdata guarantees
  * must survive replication — regression for the copy-10 off-by-one the
  * first full ×30 sweep caught (n_chars drifted from length(text) because
  * the increment assumed a one-digit copy index). */
class ScaleUpSpec extends SparkSpec {

  test("documentsCopy preserves n_chars == length(text) at one- AND " +
    "two-digit copy indexes") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta", 10L), (2L, "x", 1L))
      .toDF("doc_id", "text", "n_chars")
    for (i <- Seq(0, 1, 9, 10, 11, 29)) {
      val rows = ScaleUp.documentsCopy(base, i)
        .select(col("doc_id"), length(col("text")).cast("long"), col("n_chars"))
        .collect()
      for (r <- rows)
        assert(r.getLong(1) == r.getLong(2),
          s"copy $i doc ${r.getLong(0)}: length(text)=${r.getLong(1)} " +
            s"n_chars=${r.getLong(2)}")
    }
  }

  test("documentsCopy keeps copies textually distinct and id-disjoint") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta", 10L)).toDF("doc_id", "text", "n_chars")
    val texts = Seq(0, 1, 10).map(i =>
      ScaleUp.documentsCopy(base, i).select("text").head().getString(0))
    assert(texts.distinct.length == 3)
    val ids = Seq(0, 1, 10).map(i =>
      ScaleUp.documentsCopy(base, i).select("doc_id").head().getLong(0))
    assert(ids.distinct.length == 3)
  }
}

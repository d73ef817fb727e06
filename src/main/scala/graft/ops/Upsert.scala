package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot maintenance: apply an insert/update/delete changeset to a
  * keyed snapshot — the MERGE INTO shape every curated-corpus store needs
  * once the corpus is maintained incrementally rather than rebuilt.
  *
  * Dataflow: ONE full-outer equi-join on the key (full outer because every
  * disposition needs both sides: update/delete must see the matched
  * snapshot row, insert must see the unmatched change, keep must pass
  * snapshot rows through). This is the copy-on-write variant — the
  * rewritten snapshot is the output. At 100 TB the standard refinements
  * keep the same dataflow: partition-prune the rewrite to partitions that
  * contain change keys (changes ∝ delta, so most partitions pass through
  * untouched), or go merge-on-read by writing the changeset as a delta
  * file and folding this join into the scan.
  */
object Upsert {

  /** Apply `changes` (key, op ∈ insert|update|delete, payload) to
    * `snapshot`. Update/delete against a missing key is a no-op; insert of
    * an existing key behaves as update (upsert). `status` records each
    * output row's disposition: kept / updated / inserted. */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
      payload: String): DataFrame = {
    val s = snapshot.select(col(key), col(payload).as("__s_payload"))
    val c = changes.select(col(key), col("op"), col(payload).as("__c_payload"))
    s.join(c, Seq(key), "full_outer")
      // matched deletes drop the row; an unmatched delete row has no
      // snapshot side and vanishes with the same predicate
      .filter(coalesce(col("op"), lit("")) =!= "delete")
      // unmatched non-insert changes (update of a missing key) are no-ops
      .filter(col("__s_payload").isNotNull || col("op") === "insert")
      .select(col(key),
        coalesce(col("__c_payload"), col("__s_payload")).as(payload),
        when(col("__s_payload").isNull, "inserted")
          .when(col("op").isNotNull, "updated")
          .otherwise("kept").as("status"))
  }

  /** Harness query: deterministic changeset over the documents snapshot.
    * Rows with doc_id % 10 == 9 form the changeset (the rest is the
    * snapshot); their disposition cycles by doc_id % 30: 9 → delete the
    * neighbor doc_id-1, 19 → rewrite the neighbor doc_id-2's text, 29 →
    * insert themselves as new. Everything is integer arithmetic, so the
    * DuckDB oracle restates it verbatim. */
  def documentsUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val snapshot = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      .select(col("doc_id"), col("text"))
    val changes = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .select(
        when(pmod(col("doc_id"), lit(30)) === 9, col("doc_id") - 1)
          .when(pmod(col("doc_id"), lit(30)) === 19, col("doc_id") - 2)
          .otherwise(col("doc_id")).as("doc_id"),
        when(pmod(col("doc_id"), lit(30)) === 9, "delete")
          .when(pmod(col("doc_id"), lit(30)) === 19, "update")
          .otherwise("insert").as("op"),
        concat(lit("rev2 "), col("text")).as("text"))
    merge(snapshot, changes, "doc_id", "text")
      .select(col("doc_id"), col("status"),
        length(col("text")).as("n_chars_new"))
      .orderBy(col("doc_id"))
  }
}

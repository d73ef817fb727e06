package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows to right rows of the same key
  * whose time lies in [left.t + lo, left.t + hi].
  *
  * Spark plans a naive time-range theta join as BroadcastNestedLoop (or a
  * full cartesian per key) — O(|L|·|R|) comparisons. The standard scale
  * fix, used here: bin time by the window span, join on (key, bin) with
  * the probe side exploded to the (at most 2) bins its window can touch,
  * then apply the exact range predicate. The equi-join on (key, bin) hash
  * shuffles and prunes candidates to adjacent bins, making work
  * proportional to true matches — the same trick engines implement
  * natively, so the oracle cross-checks this composition against an
  * independent native inequality-join implementation (DuckDB IEJoin).
  *
  * A probe row meets a candidate in exactly one bin (candidates carry one
  * bin; the probe's exploded bins are distinct), so no dedup is needed.
  */
object RangeJoin {

  /** Both sides must carry `timeCol`; in the output the left's keeps its
    * name and the right's is renamed to `<timeCol>_right`.
    * @param lo,hi window bounds relative to the left time (lo <= hi),
    *              in the units of `timeCol` */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"lo ($lo) must be <= hi ($hi)")
    val span = math.max(hi - lo, 1L)
    val lt = col("__lt")
    val rt = col(s"${timeCol}_right")
    // integer floor-division: epoch-nano values exceed double's 2^53 exact
    // range, so float division would misplace bins near boundaries
    def bin(x: String) = expr(s"((($x) - pmod(($x), ${span}L)) div ${span}L)")

    val l = left.withColumnRenamed(timeCol, "__lt")
      .withColumn("__bin", explode(array_distinct(array(
        bin(s"__lt + ${lo}L"), bin(s"__lt + ${hi}L")))))
    val r = right.withColumnRenamed(timeCol, s"${timeCol}_right")
      .withColumn("__bin", bin(s"${timeCol}_right"))

    l.join(r, keys :+ "__bin")
      .filter(rt >= lt + lit(lo) && rt <= lt + lit(hi))
      .drop("__bin")
      .withColumnRenamed("__lt", timeCol)
  }

  /** Harness query: for each error event, how much activity (count, value)
    * the same user generated in the preceding 5 minutes. Inner semantics:
    * errors with no context drop (same on the oracle side). */
  def errorContext(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir) // ts = BIGINT epoch-nanos
    val fiveMinNs = 5L * 60L * 1000000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val context = ev.select(col("user_id"), col("ts"),
      col("event_id").as("c_id"), col("value").as("c_value"))

    rangeJoin(errors, context, Seq("user_id"), "ts", -fiveMinNs, 0L)
      .filter(col("c_id") =!= col("event_id"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_context"),
        round(sum(col("c_value")), 2).as("context_value"))
      .orderBy(col("event_id"))
  }
}

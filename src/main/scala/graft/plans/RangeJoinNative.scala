package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native range (interval) join — the second whole-operator Catalyst node
  * (after [[AsOfJoinPlan]]). Spark plans `l.key = r.key AND r.t BETWEEN
  * l.t + lo AND l.t + hi` as a hash join on key with the range as a
  * post-filter — correct, but every same-key pair is materialized before
  * the filter; with a hot key that is O(|L_k|·|R_k|). ops.RangeJoin
  * composes the standard binning fix; this node is the native
  * alternative engines implement (DuckDB IEJoin / Postgres merge-join
  * family): hash-partition both sides by key, sort (key, time), then one
  * forward merge pass per partition with a sliding window of right rows.
  *
  * Per-partition state is the current window [lt+lo, lt+hi] of right
  * rows — bounded by the rows actually inside one span (the inherent
  * output working set), not by the key's total row count. Advancing the
  * left pointer only ever appends (rt <= lt+hi) at the tail and evicts
  * (rt < lt+lo) at the head, because lt is non-decreasing within a key —
  * each right row is buffered and evicted exactly once: O(|L| + |R| +
  * output) per partition.
  *
  * Inner semantics; null keys/times never match and are filtered before
  * the merge (the primitive-long compare would read null as 0).
  */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute], lo: Long, hi: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightVals
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, lt, rt, rv, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, lo, hi) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute], lo: Long, hi: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightVals

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    val outAttrs = output
    val (loB, hiB) = (lo, hi)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      // saturating add: a window bound past Long range means "no cutoff on
      // that side", so clamping keeps the merge correct where a wrapped
      // add would silently drop or admit rows
      def satAdd(a: Long, b: Long): Long = {
        val s = a + b
        if (((a ^ s) & (b ^ s)) < 0) { if (a > 0) Long.MaxValue else Long.MinValue }
        else s
      }
      new Iterator[InternalRow] {
        // sliding window of right rows for the current key, time-sorted;
        // `head` is a lazy eviction pointer (compacted when it dominates)
        private val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
        private var head = 0
        private var bufKey = 0L
        private var bufValid = false
        private var rPending: InternalRow = _ // next right row, unconsumed
        private var curLeft: InternalRow = _  // left row currently emitting
        private var idx = 0
        private var out: InternalRow = _
        private var ready = false

        private def compute(): Unit = {
          out = null
          while (out == null) {
            if (curLeft != null && idx < buf.length) {
              out = proj(joined(curLeft, buf(idx)))
              idx += 1
            } else if (!lIter.hasNext) { ready = true; return }
            else {
              val l = lIter.next()
              val lk = l.getLong(lKeyOrd)
              val lt = l.getLong(lTimeOrd)
              val winHi = satAdd(lt, hiB)
              val winLo = satAdd(lt, loB)
              if (!bufValid || bufKey != lk) {
                buf.clear(); head = 0; bufKey = lk; bufValid = true
              }
              // append right rows of this key with rt <= lt + hi
              var scanning = true
              while (scanning) {
                if (rPending == null && rIter.hasNext)
                  rPending = rIter.next().copy() // child iterator reuses the row
                if (rPending == null) scanning = false
                else {
                  val rk = rPending.getLong(rKeyOrd)
                  if (rk < lk) rPending = null // behind every remaining left key's rows
                  else if (rk == lk && rPending.getLong(rTimeOrd) <= winHi) {
                    buf += rPending; rPending = null
                  } else scanning = false
                }
              }
              // evict rows below the window; lt is non-decreasing per key
              while (head < buf.length &&
                buf(head).getLong(rTimeOrd) < winLo) head += 1
              if (head > 256 && head * 2 > buf.length) {
                buf.remove(0, head); head = 0
              }
              curLeft = l.copy() // emitted across multiple next() calls
              idx = head
            }
          }
          ready = true
        }

        override def hasNext: Boolean = { if (!ready) compute(); out != null }
        override def next(): InternalRow = {
          if (!ready) compute()
          ready = false
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Filter pushdown through the native range join — same soundness shape
  * as [[AsOfJoinKeyPushdown]]: every output row carries exactly one left
  * row's columns, so a deterministic left-only predicate commutes with
  * the join (it drops whole left rows and all their matches — which is
  * what running it above the join does too). A predicate over the left
  * KEY mirrors to the right side (output rows satisfy leftKey =
  * rightKey), pruning the right scan before the exchange+sort. Without
  * the rule, Catalyst leaves ANY filter above the unknown node and the
  * merge runs over the full table. Left-only by design: a rightVals
  * predicate would also be sound to push under INNER range semantics
  * (dropping a right row only removes its own output rows — it cannot
  * change which rows match, unlike the as-of join's last-before rule),
  * but it is left above for symmetry with the as-of rule; the planner
  * still evaluates it before the aggregate. Idempotent at fixpoint. */
object RangeJoinKeyPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rj: RangeJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(rj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val mirrored = leftOnly
          .filter(_.references.subsetOf(AttributeSet(rj.leftKey)))
          .map(_.transform {
            case a: Attribute if a.exprId == rj.leftKey.exprId => rj.rightKey
          })
        val pushed = rj.copy(
          left = Filter(leftOnly.reduce(And), rj.left),
          right =
            if (mirrored.isEmpty) rj.right
            else Filter(mirrored.reduce(And), rj.right))
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Public API over the native range join. */
object RangeJoinNative {

  /** Register the planner strategy + pushdown rule on an already-built
    * session (the config-time path is [[GraftExtensions]]). Idempotent. */
  def register(spark: SparkSession): Unit = {
    GraftSqlShim.addStrategy(spark, RangeJoinStrategy)
    if (!spark.experimental.extraOptimizations.contains(RangeJoinKeyPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinKeyPushdown
  }

  private def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))

  /** Inner-join `left` to every `right` row with the same `key` and
    * right.`time` in [left.`time` + lo, left.`time` + hi]. Key and time
    * must be LongType on both sides; `rightVals` are carried to the
    * output and must not collide with left's column names. Same contract
    * as ops.RangeJoin.rangeJoin minus the right time column (project it
    * into rightVals under another name if needed). */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      lo: Long, hi: Long, rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(lo <= hi, s"lo ($lo) must be <= hi ($hi)")
    val spark = left.sparkSession
    register(spark)
    val lp = left.filter(col(key).isNotNull && col(time).isNotNull)
      .queryExecution.analyzed
    // fresh right-side aliases survive DeduplicateRelations (see
    // AsOfJoinNative.asofJoin for the full rationale)
    val r0 = right.filter(col(key).isNotNull && col(time).isNotNull)
    val rp = r0.select(r0.columns.toSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    val (lk, lt) = (attr(lp, key), attr(lp, time))
    val (rk, rt) = (attr(rp, key), attr(rp, time))
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      "range-join key and time columns must be LongType on both sides")
    val rv = rightVals.map(attr(rp, _))
    require(rv.map(_.name).intersect(lp.output.map(_.name)).isEmpty,
      "rightVals must not collide with left column names")
    GraftSqlShim.ofRows(spark, RangeJoinPlan(lp, rp, lk, rk, lt, rt, rv, lo, hi))
  }

  /** q_range_join's error-context query on the native operator — output
    * contract identical to ops.RangeJoin.errorContext, so the two share
    * one oracle and the hash match is native-vs-composed-vs-DuckDB
    * three-way agreement. */
  def errorContextNative(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Tables.events(s, dir)
    val fiveMinNs = 5L * 60L * 1000000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val context = ev.select(col("user_id"), col("ts"),
      col("event_id").as("c_id"), col("value").as("c_value"))
    rangeJoin(errors, context, "user_id", "ts", -fiveMinNs, 0L,
      Seq("c_id", "c_value"))
      .filter(col("c_id") =!= col("event_id"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_context"),
        round(sum(col("c_value")), 2).as("context_value"))
      .orderBy(col("event_id"))
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the custom-operator tier of the preference order
  * (SURVEY §7.3): Spark has no point-in-time join, and while ops.AsOfJoin
  * composes one from built-ins (union + ignore-nulls last over a window),
  * the composed plan must materialize the unioned frame through the window
  * buffer. This is the whole-operator alternative: a LogicalPlan node, a
  * SparkStrategy, and a SparkPlan that streams both sorted sides once with
  * zero per-row buffering — registered through SparkSessionExtensions
  * (config-time) or GraftSqlShim.addStrategy (runtime).
  *
  * Semantics (matching ops.AsOfJoin and DuckDB `ASOF JOIN ... ON l.t >= r.t`):
  * each left row matches the LAST right row with the same key and
  * right.time <= left.time (inclusive); `inner` drops unmatched left rows.
  * The right side must be unique per (key, time) — pre-aggregate if not.
  *
  * Scale shape: EnsureRequirements hash-partitions both sides by key and
  * sorts (key, time) — one exchange + one sort per side, the same cost as
  * a sort-merge join, after which doExecute is a single forward merge pass
  * per partition: O(1) state (the current match), no join explosion, no
  * window buffer. Keys and times are restricted to LongType (the engine's
  * id/epoch-ns types) so the merge compares primitives without an
  * interpreted ordering in the inner loop.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute], inner: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(!inner))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, inner) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, inner) :: Nil
    case _ => Nil
  }
}

/** Filter pushdown through the native as-of join — the `Rule[LogicalPlan]`
  * tier of SURVEY §7.3's preference order. Catalyst's own
  * PushDownPredicates cannot see through a plan node it doesn't know, so
  * without this rule ANY filter above an as-of join runs after the merge —
  * at 100 TB that's the difference between scanning one key's partition
  * and merging the whole table first.
  *
  * Soundness: every output row corresponds 1:1 to a left row (matched or,
  * for outer, null-extended), so a deterministic predicate over left-side
  * columns commutes with the join. A predicate over the left KEY
  * additionally mirrors to the right side (output rows satisfy
  * leftKey = rightKey), pruning the right scan — right rows whose key
  * can't survive the filter can never be anyone's match. Predicates
  * touching rightVals stay above (they're match-dependent, and null-
  * extended under outer).
  *
  * The rewrite leaves the pushed Filters directly over their child scans,
  * where the normal datasource pushdown turns them into `PushedFilters`
  * at planning time — the rule composes with, not replaces, the built-in
  * machinery. Idempotent: after one application the residual filter has
  * no left-only conjuncts, so the rule no-ops at fixpoint. */
object AsOfJoinKeyPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val mirrored = leftOnly
          .filter(_.references.subsetOf(AttributeSet(aj.leftKey)))
          .map(_.transform {
            case a: Attribute if a.exprId == aj.leftKey.exprId => aj.rightKey
          })
        val pushed = aj.copy(
          left = Filter(leftOnly.reduce(And), aj.left),
          right =
            if (mirrored.isEmpty) aj.right
            else Filter(mirrored.reduce(And), aj.right))
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute], inner: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(!inner))

  /** Both sides cluster by key; EnsureRequirements makes the two hash
    * partitionings compatible (same function, same partition count), the
    * identical contract sort-merge join relies on. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, time) ascending on both sides — the merge's only precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Rows stream out in the left child's partitioning and order. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyOrd = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = rOut.indexWhere(_.exprId == rightTime.exprId)
    val outAttrs = output
    val emitUnmatched = !inner

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // right inputs bind as nullable: the unmatched-left path feeds an
      // all-null row, and a non-nullable binding would skip the null check
      // and read 0/0.0 instead
      val proj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        // single-row merge state: the last right row at or before the
        // current left row's time, for the current key
        private var rPending: InternalRow = _ // next right row, unconsumed
        private var matchRow: InternalRow = _
        private var matchKey = 0L
        private var out: InternalRow = _
        private var ready = false

        private def compute(): Unit = {
          out = null
          while (out == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = l.getLong(lKeyOrd)
            val lt = l.getLong(lTimeOrd)
            if (matchRow != null && matchKey != lk) matchRow = null
            var scanning = true
            while (scanning) {
              if (rPending == null && rIter.hasNext)
                rPending = rIter.next().copy() // row object is reused by the
                                               // child iterator — keep a copy
              if (rPending == null) scanning = false
              else {
                val rk = rPending.getLong(rKeyOrd)
                val rt = rPending.getLong(rTimeOrd)
                if (rk < lk || (rk == lk && rt <= lt)) {
                  if (rk == lk) { matchRow = rPending; matchKey = lk }
                  rPending = null
                } else scanning = false
              }
            }
            if (matchRow != null && matchKey == lk)
              out = proj(joined(l, matchRow))
            else if (emitUnmatched)
              out = proj(joined(l, nullRight))
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
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Config-time registration: `spark.sql.extensions=graft.plans.GraftExtensions`
  * wires the full custom tier — the as-of-join planner strategy plus every
  * custom expression/aggregate — into each session at build time, so SQL
  * text reaches them with no per-session register calls. (Runtime
  * equivalent for an already-built session:
  * `graft.functions.GraftFunctions.registerAll`.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.{MinHashSigs, MisraGries, RollingHash64, ShingleHashes, SimHash64, VecDot, ZOrder2}

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfJoinKeyPushdown)
    ext.injectOptimizerRule(_ => AsOfJoinColumnPruning)
    ext.injectOptimizerRule(_ => RangeJoinKeyPushdown)
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", "rolling_hash64(str) - 64-bit polynomial rolling hash"),
      (exprs: Seq[Expression]) => RollingHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(tokens, text) - 3-token shingle base hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(hashes) - full MinHash signature array in one pass"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash signature of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("zorder2"),
      info("zorder2", "zorder2(a, b) - bit-interleaved Z-order key of two 32-bit ints"),
      (exprs: Seq[Expression]) => ZOrder2(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries", "misra_gries(col, k) - heavy-hitter candidate sketch"),
      (exprs: Seq[Expression]) => MisraGries(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("count_min"),
      info("count_min", "count_min(h48, depth, width) - Count-Min counter matrix over SharedHash values"),
      (exprs: Seq[Expression]) => graft.functions.CountMin(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("hll_regs"),
      info("hll_regs", "hll_regs(h48, p) - HyperLogLog register maxima over SharedHash values"),
      (exprs: Seq[Expression]) => graft.functions.HllRegs(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("topk_by"),
      info("topk_by", "topk_by(value, tag, k) - exact bounded-heap top-k (value DESC, tag ASC) per group"),
      (exprs: Seq[Expression]) => graft.functions.TopKBy(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("gram_agg"),
      info("gram_agg", "gram_agg(vec, dim) - exact-micro upper-triangle Gram accumulation"),
      (exprs: Seq[Expression]) => graft.functions.GramAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(hash, bits, k) - bloom filter over pre-hashed keys"),
      (exprs: Seq[Expression]) => graft.functions.BloomAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("bloom_contains"),
      info("bloom_contains", "bloom_contains(bf, hash) - bloom membership probe"),
      (exprs: Seq[Expression]) => graft.functions.BloomContains(exprs(0), exprs(1))))
  }
}

/** Column pruning through the native as-of join — the second
  * `Rule[LogicalPlan]`: Catalyst's ColumnPruning cannot narrow a scan
  * through a node it doesn't know, so a consumer selecting two columns
  * above an as-of join would still read EVERY left column from disk. For
  * a Project above the join, the left child is narrowed to the referenced
  * left attributes plus the join's own key/time (order preserved, so the
  * node's `output` contract stays consistent), and the right child is
  * always narrowable to exactly {rightKey, rightTime} ∪ rightVals. The
  * injected Projects land over the scans where the datasource turns them
  * into `ReadSchema` pruning. Fires only when it strictly shrinks a side,
  * so it's a fixpoint no-op afterwards. */
object AsOfJoinColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(exprs, aj: AsOfJoinPlan) =>
      val needed = AttributeSet(exprs.flatMap(_.references)) ++
        AttributeSet(Seq(aj.leftKey, aj.leftTime))
      val newLeft =
        if (aj.left.output.forall(needed.contains)) aj.left
        else Project(aj.left.output.filter(needed.contains), aj.left)
      val rightNeeded = AttributeSet(
        Seq(aj.rightKey, aj.rightTime) ++ aj.rightVals)
      val newRight =
        if (aj.right.output.forall(rightNeeded.contains)) aj.right
        else Project(aj.right.output.filter(rightNeeded.contains), aj.right)
      if ((newLeft eq aj.left) && (newRight eq aj.right)) p
      else p.copy(child = aj.copy(left = newLeft, right = newRight))
  }
}

/** Public API over the native operator. */
object AsOfJoinNative {

  /** Register the planner strategy + pushdown rule on an already-built
    * session (the harness builds sessions without `spark.sql.extensions`).
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    GraftSqlShim.addStrategy(spark, AsOfJoinStrategy)
    for (rule <- Seq(AsOfJoinKeyPushdown, AsOfJoinColumnPruning))
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
  }

  private def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))

  /** As-of join `left` to the most recent `right` row per `key` with
    * right.`time` <= left.`time`. Key and time must be LongType on both
    * sides; `rightVals` are carried to the output (names must not collide
    * with left's).
    *
    * Null semantics (SQL equi-join): a null key or time never matches.
    * The merge compares primitive longs, so null rows are filtered before
    * the operator — a null would otherwise read as 0 and falsely match
    * key 0. Inner drops them outright; outer re-appends null-keyed left
    * rows with null rightVals, preserving outer-join row counts. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[String], inner: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = left.sparkSession
    register(spark)
    val leftNonNull = left.filter(col(key).isNotNull && col(time).isNotNull)
    val right0 = right.filter(col(key).isNotNull && col(time).isNotNull)
    val lp = leftNonNull.queryExecution.analyzed
    // Re-alias every right column: when left and right derive from the same
    // scan, the analyzer's DeduplicateRelations re-numbers the right
    // subtree's attributes, and it cannot remap the Attribute fields stored
    // inside a node type it doesn't know. Alias OUTPUT ids survive that
    // rewrite (only the alias's child reference is remapped), so anchoring
    // the node's attributes to fresh aliases keeps them valid whether or
    // not dedup fires.
    val rp = right0.select(right0.columns.toSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    val (lk, lt) = (attr(lp, key), attr(lp, time))
    val (rk, rt) = (attr(rp, key), attr(rp, time))
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      "as-of key and time columns must be LongType on both sides")
    val rv = rightVals.map(attr(rp, _))
    require(rv.map(_.name).intersect(lp.output.map(_.name)).isEmpty,
      "rightVals must not collide with left column names")
    val matched =
      GraftSqlShim.ofRows(spark, AsOfJoinPlan(lp, rp, lk, rk, lt, rt, rv, inner))
    if (inner) matched
    else {
      // outer keeps null-keyed left rows (which can never match) with
      // null rightVals, so row counts match SQL left-outer semantics
      val nullLeft = rv.foldLeft(
          left.filter(col(key).isNull || col(time).isNull)) {
        case (df, a) => df.withColumn(a.name, lit(null).cast(a.dataType))
      }
      matched.unionByName(nullLeft)
    }
  }
}

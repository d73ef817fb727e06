package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

object VecArgminImpl {
  /** First-minimum argmin of ||v - c_i||² over the centroid rows of `mat`,
    * with each distance computed as (v·v − 2·(v·c_i)) + c_i·c_i and every
    * dot the strict left fold of [[VecDotImpl.dot]] — term-for-term the
    * arithmetic of the `array_position(ds, array_min(ds)) - 1` idiom over
    * `vec_dot` distance columns it replaces, so swapping it in preserves
    * every literal-centroid oracle hash. Strict `<` keeps the FIRST
    * minimum, matching array_position's first-match contract. */
  def argmin(v: ArrayData, mat: ArrayData): Int = {
    val ee = VecDotImpl.dot(v, v)
    val n = mat.numElements()
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < n) {
      val ctr = mat.getArray(c)
      val d = (ee - 2.0 * VecDotImpl.dot(v, ctr)) + VecDotImpl.dot(ctr, ctr)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

/** Native codegen nearest-centroid assignment: `argmin_cells(vec, matrix)`
  * returns the index of the matrix row (a centroid) nearest to `vec` in
  * squared L2.
  *
  * This is the IVF/PQ hot path: quantizer assignment runs once per corpus
  * vector (and per subspace for PQ encode). The composed form — k (or m·k)
  * literal-array columns, k `vec_dot` distance expressions, `array`,
  * `array_min`, `array_position` — materializes a k-wide distance array
  * per row and walks it three times through generic array expressions.
  * This expression is one fused loop in whole-stage codegen with zero
  * per-row allocation (r6 measured the composed form costing ann_ivf
  * ~0.9 s at sf0.1; SURVEY §7.3 preference (b): custom Expression).
  *
  * The centroid matrix must be a literal (foldable): codegen caches the
  * per-centroid self-dots in partition-local state on first row. */
case class VecArgminCells(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmin_cells"

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isDoubleArray(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"argmin_cells requires array<double> vector, got ${left.dataType.sql}")
    else if (!(right.dataType match {
      case ArrayType(inner, _) => isDoubleArray(inner)
      case _ => false
    })) TypeCheckResult.TypeCheckFailure(
      s"argmin_cells requires array<array<double>> centroids, got ${right.dataType.sql}")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      "argmin_cells requires a literal (foldable) centroid matrix")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any, m: Any): Any =
    VecArgminImpl.argmin(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      // centroid self-dots don't vary per row (matrix is foldable) —
      // computed once per partition, they save k·dim FMAs per row
      val selfDots = ctx.addMutableState("double[]", "argminSelfDots")
      val ee = ctx.freshName("ee")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $m.numElements();
         |if ($selfDots == null) {
         |  $selfDots = new double[$n];
         |  for (int $c = 0; $c < $n; $c++) {
         |    $selfDots[$c] = graft.functions.VecDotImpl.dot(
         |      $m.getArray($c), $m.getArray($c));
         |  }
         |}
         |double $ee = graft.functions.VecDotImpl.dot($v, $v);
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $n; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $ctr = $m.getArray($c);
         |  double $d = ($ee - 2.0 * graft.functions.VecDotImpl.dot($v, $ctr))
         |    + $selfDots[$c];
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgminCells =
    copy(left = newLeft, right = newRight)
}

object VecArgmin {
  /** Register for SQL/`call_function` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_cells", exprs => VecArgminCells(exprs(0), exprs(1)), "built-in")
}

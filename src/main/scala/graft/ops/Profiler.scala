package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality pass a pipeline runs before trusting
  * a new drop of data: per-column row/null/distinct counts and min/max,
  * emitted as one row per column.
  *
  * Shape: ONE aggregate pass over the table computes every column's stats
  * simultaneously (count/min/max are partial-aggregated map-side;
  * count(distinct …) for the profiled columns rides the same job as
  * Spark expands multi-distinct via a single grouped expand), then the
  * single result row unpivots driver-free into (column, stats) rows via a
  * literal stack. No per-column table scans — at 100 TB the table is read
  * once, and only fixed-width partial aggregates shuffle. Values are
  * rendered to strings so one schema profiles every column type.
  */
object Profiler {

  /** Profile selected columns of `df` (defaults: every column). */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    def s(c: Column): Column = c.cast("string")
    val aggs: Seq[Column] = names.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        s(min(col(c))).as(s"${c}__min"),
        s(max(col(c))).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max"
    }.mkString(", ")
    one.select(expr(
      s"stack(${names.size}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"))
      .orderBy(col("column"))
  }

  /** Harness query: profile lineitem's key/measure/flag/date columns. */
  val LineitemCols: Seq[String] =
    Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

  def lineitemProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(s, dir), LineitemCols)
}

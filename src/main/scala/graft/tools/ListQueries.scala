package graft.tools

/** Prints the full SparkEntry query registry, one `[query-name] <name>`
  * line each — the machine-readable surface inventory tools/scalecheck.py
  * uses to make "full-surface" true by construction (r12 verdict #2: the
  * ×30 sweep silently covered 189/199 because its name list came from a
  * stale base-verify log; deriving the expected set from the registry at
  * run time turns that silence into a hard error). No SparkSession is
  * created: the registry map is pure construction. */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted
      .foreach(n => println(s"[query-name] $n"))
}

package graft.collab

/** Decimal rounding helper (ref: Util.java:8-15 — Math.round(x·10^p)/10^p,
  * half-up toward +∞; default 1 place). Identical results to Spark's
  * half-up `round()` on the positive rating domain (SURVEY §2.8 C1). */
object Util {
  def round(x: Double, places: Int = 1): Double = {
    val factor = math.pow(10, places)
    math.round(x * factor) / factor
  }
}

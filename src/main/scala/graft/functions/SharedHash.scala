package graft.functions

/** A deterministic hash family expressible identically in Spark SQL and in
  * the DuckDB oracle dialect, so sketch operators (MinHash, SimHash, LSH)
  * are hash-checkable rather than rows-only.
  *
  * Base hash: the first 12 hex chars of md5 (48 bits, always positive in a
  * 64-bit long) — md5 produces identical lowercase hex in both engines.
  * Family member k: h_k(x) = (a_k * (h48(x) mod P) + b_k) mod P with
  * P = 2^31 − 1 and seeded (a_k, b_k); products stay < 2^62, no overflow.
  *
  * Both dialect generators live here so the constants can never drift
  * between the Spark implementation and the oracle SQL.
  */
object SharedHash {
  val P: Long = 2147483647L // 2^31 - 1, prime

  /** Seeded (a, b) pairs; java.util.Random's algorithm is specified by the
    * JDK, so these are stable across runs and machines. */
  def seeds(n: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(42L)
    IndexedSeq.fill(n)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  // --- Spark SQL dialect ---------------------------------------------------
  /** 48-bit positive base hash of expression `e` (Spark dialect). */
  def spark48(e: String): String =
    s"cast(conv(substring(md5($e), 1, 12), 16, 10) as bigint)"

  /** Second independent 48-bit base hash: hex chars 13–24 of the same md5.
    * Lets 64-bit sketches (SimHash64) draw bits 48–63 without a second
    * digest pass; independence comes from md5's avalanche across its
    * output, the same assumption spark48 already makes. */
  def spark48b(e: String): String =
    s"cast(conv(substring(md5($e), 13, 12), 16, 10) as bigint)"

  /** Family member k applied to expression `e` (Spark dialect). */
  def sparkK(e: String, a: Long, b: Long): String =
    s"pmod($a * pmod(${spark48(e)}, $P) + $b, $P)"

  // --- DuckDB oracle dialect ----------------------------------------------
  /** 48-bit positive base hash of expression `e` (DuckDB dialect). */
  def duck48(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 12)) AS BIGINT)"

  /** Second 48-bit base hash (DuckDB dialect), twin of [[spark48b]]. */
  def duck48b(e: String): String =
    s"CAST(('0x' || substr(md5($e), 13, 12)) AS BIGINT)"

  /** Family member k applied to expression `e` (DuckDB dialect). */
  def duckK(e: String, a: Long, b: Long): String =
    s"(($a * (${duck48(e)} % $P) + $b) % $P)"
}

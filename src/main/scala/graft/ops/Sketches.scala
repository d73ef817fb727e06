package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.SharedHash

/** Sketch-powered summary queries whose OUTPUTS are hash-checked against
  * DuckDB — possible because both sketches ([[graft.functions.CountMin]],
  * [[graft.functions.HllRegs]]) are built on the cross-engine
  * [[SharedHash]] family and commute under merge (integer sums / maxima),
  * unlike Spark's built-in Murmur/xxHash sketches which are rows-only
  * checkable.
  *
  * Scale shape shared by both: ONE narrow scan of the token stream feeds
  * a fixed-size aggregate state (KiB per partial buffer, merged
  * tree-wise); the stream itself never shuffles. The exact-count side each
  * query carries exists only to verify the estimates — a production run
  * drops it and keeps the sketch-only cost.
  */
object Sketches {

  val CmDepth = 4
  val CmWidth = 1024
  val CmProbes = 30

  val HllP = 10
  private val HllM = 1 << HllP // 1024
  private val HllMaxRho = 48 - HllP + 1 // 39
  // shift base keeping 2^(Q - rho) integral for rho in [0, 39]; sums of
  // 1024 terms ≤ 2^50 stay < 2^63 (exact, order-independent)
  private val HllQ = 50

  // The estimator body (identical TEXT in both dialects so IEEE folding
  // agrees): alpha_m * m^2 * 2^Q / isum, with linear-counting fallback
  // below 2.5m when empty registers remain.
  private def hllEstimateSql(isum: String, v: String): String =
    s"""round(CASE WHEN (0.7213 / (1 + 1.079 / $HllM.0)) * $HllM * $HllM * 1125899906842624 / $isum <= 2.5 * $HllM AND $v > 0
       |  THEN $HllM * ln($HllM.0 / $v)
       |  ELSE (0.7213 / (1 + 1.079 / $HllM.0)) * $HllM * $HllM * 1125899906842624 / $isum END, 4)""".stripMargin

  /** Count-Min frequency estimates for the corpus's top-[[CmProbes]]
    * tokens, next to their exact counts (est ≥ n always; equality in the
    * common unsaturated case). The sketch is ONE 4×1024 Long matrix for
    * the whole corpus. */
  def countMinProbes(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CountMin.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    val ests = SharedHash.seeds(CmDepth).zipWithIndex.map { case ((a, b), j) =>
      s"element_at(cells, CAST($j * $CmWidth + (($a * (h48 % ${SharedHash.P}) + $b) % ${SharedHash.P}) % $CmWidth + 1 AS INT))"
    }
    s.sql(
      s"""WITH t AS (SELECT explode(split(text, ' ')) AS token FROM documents),
         |h AS (SELECT token, ${SharedHash.spark48("token")} AS h48 FROM t),
         |sk AS (SELECT count_min(h48, $CmDepth, $CmWidth) AS cells FROM h),
         |probes AS (
         |  SELECT token, h48, count(*) AS n FROM h GROUP BY token, h48
         |  ORDER BY n DESC, token ASC LIMIT $CmProbes)
         |SELECT token, n, least(${ests.mkString(", ")}) AS est
         |FROM probes CROSS JOIN sk
         |ORDER BY n DESC, token ASC""".stripMargin)
  }

  /** DuckDB twin of [[countMinProbes]]: the cell matrix is recomputed as a
    * plain GROUP BY over the same hash family (sums commute — the sketch
    * IS this aggregation), probes re-derive their 4 buckets and take the
    * min cell. */
  def countMinOracle: String = {
    val P = SharedHash.P
    val bucketCase = SharedHash.seeds(CmDepth).zipWithIndex.map { case ((a, b), j) =>
      s"WHEN $j THEN (($a * (h48 % $P) + $b) % $P) % $CmWidth"
    }.mkString(" ")
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |h AS (SELECT token, ${SharedHash.duck48("token")} AS h48 FROM t),
       |js AS (SELECT unnest(range(0, $CmDepth)) AS j),
       |cells AS (
       |  SELECT j, CASE j $bucketCase END AS bucket, count(*) AS c
       |  FROM h CROSS JOIN js GROUP BY 1, 2),
       |probes AS (
       |  SELECT token, h48, count(*) AS n FROM h GROUP BY token, h48
       |  ORDER BY n DESC, token ASC LIMIT $CmProbes),
       |pj AS (SELECT token, n, j, CASE j $bucketCase END AS bucket
       |  FROM probes CROSS JOIN js)
       |SELECT token, n, min(c) AS est
       |FROM pj JOIN cells USING (j, bucket)
       |GROUP BY token, n
       |ORDER BY n DESC, token ASC""".stripMargin
  }

  /** Per-source distinct-token cardinality: exact count next to the HLL
    * estimate computed FROM THE EMITTED REGISTERS by the shared estimator
    * text. The register vector is 1 KiB per source regardless of corpus
    * size. */
  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HllRegs.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    s.sql(
      s"""WITH t AS (SELECT source, explode(split(text, ' ')) AS token FROM documents),
         |h AS (SELECT source, token, ${SharedHash.spark48("token")} AS h48 FROM t),
         |r AS (SELECT source, hll_regs(h48, $HllP) AS regs FROM h GROUP BY source),
         |ex AS (SELECT source, count(DISTINCT token) AS n_exact FROM h GROUP BY source),
         |e AS (SELECT source,
         |  aggregate(regs, CAST(0 AS BIGINT),
         |    (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), $HllQ - x)) AS isum,
         |  size(filter(regs, x -> x = 0)) AS v
         |  FROM r)
         |SELECT ex.source, ex.n_exact, ${hllEstimateSql("isum", "v")} AS hll_est
         |FROM ex JOIN e ON ex.source = e.source
         |ORDER BY ex.source""".stripMargin)
  }

  /** Sketch RE-AGGREGATION — the property that makes sketches useful in a
    * warehouse: per-source register vectors MERGE (elementwise max) into
    * exactly the sketch a direct global pass would build, so rollups are
    * answered from pre-aggregated KiB summaries without touching the
    * stream again. The query emits the estimate from BOTH paths — the
    * merged per-source sketches and the direct global sketch — and the
    * hash compare (plus the oracle's independent replay) proves the
    * algebra holds bit-for-bit on both engines. */
  def hllRollup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HllRegs.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    s.sql(
      s"""WITH t AS (SELECT source, explode(split(text, ' ')) AS token FROM documents),
         |h AS (SELECT source, token, ${SharedHash.spark48("token")} AS h48 FROM t),
         |r AS (SELECT source, hll_regs(h48, $HllP) AS regs FROM h GROUP BY source),
         |m AS (SELECT aggregate(collect_list(regs),
         |    array_repeat(0, $HllM),
         |    (acc, x) -> zip_with(acc, x, (a, b) -> greatest(a, b))) AS regs
         |  FROM r),
         |g AS (SELECT hll_regs(h48, $HllP) AS regs FROM h),
         |u AS (SELECT 'direct' AS scope, regs FROM g
         |  UNION ALL SELECT 'merged' AS scope, regs FROM m),
         |e AS (SELECT scope,
         |  aggregate(regs, CAST(0 AS BIGINT),
         |    (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), $HllQ - x)) AS isum,
         |  size(filter(regs, x -> x = 0)) AS v
         |  FROM u)
         |SELECT scope, ${hllEstimateSql("isum", "v")} AS hll_est
         |FROM e ORDER BY scope""".stripMargin)
  }

  /** DuckDB twin of [[hllRollup]]: both branches rebuilt independently —
    * merged = max-of-per-source-maxima per bucket, direct = global max
    * per bucket — through the same scaffold and estimator text. */
  def hllRollupOracle: String =
    s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |h AS (SELECT source, token, ${SharedHash.duck48("token")} AS h48 FROM t),
       |br AS (SELECT source, h48 % $HllM AS bucket,
       |  CASE WHEN h48 // $HllM = 0 THEN $HllMaxRho
       |       ELSE CAST(log2((h48 // $HllM) & -(h48 // $HllM)) AS INT) + 1
       |  END AS rho FROM h),
       |persrc AS (SELECT source, bucket, max(rho) AS rho FROM br GROUP BY 1, 2),
       |merged AS (SELECT bucket, max(rho) AS rho FROM persrc GROUP BY bucket),
       |direct AS (SELECT bucket, max(rho) AS rho FROM br GROUP BY bucket),
       |scaffold AS (SELECT unnest(range(0, $HllM)) AS bucket),
       |u AS (
       |  SELECT 'direct' AS scope, s.bucket, coalesce(d.rho, 0) AS rho
       |  FROM scaffold s LEFT JOIN direct d ON d.bucket = s.bucket
       |  UNION ALL
       |  SELECT 'merged' AS scope, s.bucket, coalesce(m.rho, 0) AS rho
       |  FROM scaffold s LEFT JOIN merged m ON m.bucket = s.bucket),
       |e AS (SELECT scope,
       |  CAST(sum(CAST(1 AS BIGINT) << ($HllQ - rho)) AS BIGINT) AS isum,
       |  CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS INT) AS v
       |  FROM u GROUP BY scope)
       |SELECT scope, ${hllEstimateSql("isum", "v")} AS hll_est
       |FROM e ORDER BY scope""".stripMargin

  /** DuckDB twin of [[hllDistinct]]: registers via GROUP BY bucket →
    * max(rho) (max commutes — the sketch IS this aggregation), empty
    * buckets restored by a range() scaffold, then the identical estimator
    * text. rho uses trailing zeros so `log2(r & -r)` is exact. */
  def hllOracle: String =
    s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       |h AS (SELECT source, token, ${SharedHash.duck48("token")} AS h48 FROM t),
       |br AS (SELECT source, h48 % $HllM AS bucket,
       |  CASE WHEN h48 // $HllM = 0 THEN $HllMaxRho
       |       ELSE CAST(log2((h48 // $HllM) & -(h48 // $HllM)) AS INT) + 1
       |  END AS rho FROM h),
       |mx AS (SELECT source, bucket, max(rho) AS rho FROM br GROUP BY 1, 2),
       |allb AS (SELECT s.source, g.bucket, coalesce(m.rho, 0) AS rho
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  CROSS JOIN (SELECT unnest(range(0, $HllM)) AS bucket) g
       |  LEFT JOIN mx m ON m.source = s.source AND m.bucket = g.bucket),
       |e AS (SELECT source,
       |  CAST(sum(CAST(1 AS BIGINT) << ($HllQ - rho)) AS BIGINT) AS isum,
       |  CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS INT) AS v
       |  FROM allb GROUP BY source),
       |ex AS (SELECT source, count(DISTINCT token) AS n_exact FROM h GROUP BY source)
       |SELECT ex.source, ex.n_exact, ${hllEstimateSql("isum", "v")} AS hll_est
       |FROM ex JOIN e ON ex.source = e.source
       |ORDER BY ex.source""".stripMargin

  val QsK = 512
  val QsQuantiles: Seq[(String, Double)] =
    Seq(("p50", 0.50), ("p90", 0.90), ("p99", 0.99))

  /** Deterministic mergeable quantile sketch — the hash-checkable twin of
    * `approx_percentile` (whose built-in Murmur digest is rows-only): a
    * bottom-[[QsK]]-by-[[SharedHash]] sample is a pure function of the
    * input SET (order/partition-free), kept by the bounded-state
    * [[graft.functions.TopKBy]] aggregate — O(k) per partial buffer,
    * map-side reduction, the value stream never corpus-sorts (the same
    * trade KMV/bottom-k distinct sketches make). Order statistics of the
    * sample estimate the quantiles; the DuckDB oracle replays sample AND
    * estimator exactly, so the ESTIMATES are hash-checked end to end.
    *
    * Scale shape: one narrow aggregate scan → 512-entry state; a broadcast
    * id join fetches sampled values; the rank window runs on 512 rows.
    * Accuracy (±O(1/√k) quantile rank error) is spec-asserted against the
    * exact percentiles, outside the correctness contract. */
  def quantileSketch(s: SparkSession, dir: String, k: Int = QsK): DataFrame =
    quantileSketchOf(Tables.events(s, dir), k)

  /** Core of [[quantileSketch]] over any (event_id, value, …) frame. */
  def quantileSketchOf(events: DataFrame, k: Int = QsK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s = events.sparkSession
    graft.functions.TopKBy.register(s)
    val ev = events.select(col("event_id"), col("value"))
    val h = SharedHash.spark48("cast(event_id AS string)")
    // bottom-k by hash == topk_by of the NEGATED hash (48-bit hashes are
    // exact in DOUBLE, so the double order IS the integer hash order);
    // ties (hash collisions across distinct ids) break by tag = id ASC,
    // mirroring the oracle's ORDER BY hash, event_id
    val picked = ev
      .select(expr(s"topk_by(CAST(-($h) AS DOUBLE), event_id, $k)").as("kept"))
      .select(explode(col("kept")).as("e"))
      .select(col("e.tag").as("event_id"))
    estimateQuantiles(picked, ev)
  }

  /** The warehouse ROLLUP property for the quantile sketch ([[hllRollup]]'s
    * twin): per-group bottom-k partial sketches merge into EXACTLY the
    * direct global sketch, because the global bottom-k of a union is
    * contained in the union of per-group bottom-ks (the postings
    * first-cap argument). The engine computes the MERGED path — one
    * bounded-state aggregate per event_type group, then one k-sized
    * merge — while the oracle recomputes the DIRECT global sample, so the
    * hash match PROVES mergeability rather than assuming it. At 100 TB
    * this is the property that lets per-partition/per-day sketches roll
    * up without rescanning the stream. */
  def quantileRollup(s: SparkSession, dir: String, k: Int = QsK): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.TopKBy.register(s)
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val h = SharedHash.spark48("cast(event_id AS string)")
    // stage 1: one bounded-state partial sketch per group
    val perGroup = ev
      .groupBy(col("event_type"))
      .agg(expr(s"topk_by(CAST(-($h) AS DOUBLE), event_id, $k)").as("kept"))
    // stage 2: merge = bottom-k over the union of the partials (≤ groups·k
    // rows — the merge input never touches the corpus again)
    val picked = perGroup
      .select(explode(col("kept")).as("e"))
      .select(col("e.value").as("negh"), col("e.tag").as("event_id"))
      .select(expr(s"topk_by(negh, event_id, $k)").as("kept"))
      .select(explode(col("kept")).as("e"))
      .select(col("e.tag").as("event_id"))
    estimateQuantiles(picked, ev.select(col("event_id"), col("value")))
  }

  /** Shared estimator tail: join sampled ids back to values, rank, and
    * read the ceil(q·n) order statistics. */
  private def estimateQuantiles(picked: DataFrame, ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sample = broadcast(picked).join(ev, "event_id")
    val w = Window.orderBy(col("value").asc, col("event_id").asc)
    val ranked = sample
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    QsQuantiles.map { case (label, q) =>
      ranked.filter(col("r") === ceil(lit(q) * col("n")))
        .select(lit(label).as("q"), round(col("value"), 6).as("est"))
    }.reduce(_ union _).orderBy(col("q"))
  }

  /** DuckDB twin of [[quantileSketch]]: identical sample (ORDER BY hash,
    * id LIMIT k) and identical ceil(q·n) order-statistic estimator. */
  def quantileSketchOracle(k: Int = QsK): String = {
    val sels = QsQuantiles.map { case (label, q) =>
      s"SELECT '$label' AS q, round(value, 6) AS est FROM r WHERE r = ceil($q * n)"
    }.mkString("\n|", "\n|UNION ALL ", "")
    s"""WITH s AS (SELECT event_id, value FROM events
       |  ORDER BY ${SharedHash.duck48("cast(event_id AS VARCHAR)")} ASC, event_id ASC LIMIT $k),
       |r AS (SELECT value, event_id,
       |  row_number() OVER (ORDER BY value ASC, event_id ASC) AS r,
       |  count(*) OVER () AS n FROM s)
       |SELECT q, est FROM ($sels) ORDER BY q""".stripMargin
  }
}

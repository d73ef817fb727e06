package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-5 advice fixes: intra-batch op ordering
  * in the merge-on-read view, emptied-partition cleanup in the pruned
  * copy-on-write merge, and null/empty-input safety of the native sketch
  * expressions' codegen paths. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- readViewLog intra-batch ordering ------------------------------------

  private def baseDf(rows: (Long, String)*) = rows.toDF("k", "v")

  test("readViewLog: same-key ops inside ONE batch fold in __seq order, " +
      "not alphabetical op order (insert-then-delete dies, " +
      "delete-then-insert survives)") {
    val base = baseDf(1L -> "a")
    // key 5: insert seq 0, delete seq 1 → must NOT survive (alphabetical
    // op order would replay delete first and wrongly keep the insert);
    // key 1: delete seq 0, insert seq 1 → resurrected with the new payload
    val log = Seq(
      (5L, "insert", "e", 0L, 0L),
      (5L, "delete", null, 0L, 1L),
      (1L, "delete", null, 0L, 0L),
      (1L, "insert", "a2", 0L, 1L)
    ).toDF("k", "op", "v", "__batch", "__seq")
    val out = Upsert.readViewLog(base, log, "k", "v")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set(1L -> "a2"))
  }

  test("readView: a log WITHOUT __seq still folds a single local batch in " +
      "arrival (row) order") {
    val base = baseDf(1L -> "a")
    val ch = Seq((5L, "insert", "e"), (5L, "delete", null))
      .toDF("k", "op", "v")
    val out = Upsert.readView(base, Seq(ch), "k", "v")
      .select("k").as[Long].collect().toSet
    assert(out === Set(1L), "insert-then-delete in one batch must not survive")
  }

  test("readViewAsOf: each as-of point reconstructs exactly the state " +
      "after that batch; negative = untouched base; last = live view") {
    val base = baseDf(1L -> "a", 2L -> "b")
    val b0 = Seq((3L, "insert", "c"), (1L, "update", "a2"))
      .toDF("k", "op", "v")
    val b1 = Seq((2L, "delete", null), (4L, "insert", "d"))
      .toDF("k", "op", "v")
    def state(asOf: Int) =
      Upsert.readViewAsOf(base, Seq(b0, b1), "k", "v", asOf)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state(-1) === Set(1L -> "a", 2L -> "b"))
    assert(state(0) === Set(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(state(1) === Set(1L -> "a2", 3L -> "c", 4L -> "d"))
    // the live view agrees with the last as-of point
    val live = Upsert.readView(base, Seq(b0, b1), "k", "v")
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state(1) === live)
  }

  // --- mergePrunedCow emptied partitions -----------------------------------

  test("mergePrunedCow: a changeset that deletes EVERY surviving row of a " +
      "touched partition removes the partition directory (dynamic " +
      "overwrite alone would resurrect the rows)") {
    val tmp = java.nio.file.Files.createTempDirectory("pruned-cow-dead")
      .toString + "/table"
    val snap = Seq(
      (1L, "p1", "one"), (2L, "p1", "two"),
      (3L, "p2", "three"), (4L, "p2", "four")
    ).toDF("k", "part", "v")
    snap.write.partitionBy("part").parquet(tmp)
    // delete both rows of p1; update one row of p2 (so p2 is touched but
    // survives)
    val changes = Seq(
      (1L, "p1", "delete", null),
      (2L, "p1", "delete", null),
      (3L, "p2", "update", "THREE")
    ).toDF("k", "part", "op", "v")
    val touched = Upsert.mergePrunedCow(spark, tmp, changes, "k", "v", "part")
    assert(touched.toSet === Set("p1", "p2"))
    assert(!new java.io.File(s"$tmp/part=p1").exists(),
      "emptied partition directory must be dropped")
    val left = spark.read.parquet(tmp).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(left === Set(3L -> "THREE", 4L -> "four"))
  }

  // --- native sketch expressions: null / empty inputs ----------------------

  test("minhash_sigs(empty array) yields the MaxValue-filled signature " +
      "(fold identity), never a null tagged non-null by codegen") {
    graft.functions.GraftFunctions.registerAll(spark)
    val sig = spark.sql(
      "SELECT minhash_sigs(cast(array() as array<bigint>)) AS s")
      .select(col("s")).as[Seq[Long]].head()
    assert(sig === Seq.fill(graft.functions.MinHashSigsImpl.K)(Long.MaxValue))
    // downstream consumption (the NPE repro from the advice) works
    val e = spark.sql(
      "SELECT element_at(minhash_sigs(cast(array() as array<bigint>)), 1) AS x")
      .select(col("x")).as[Long].head()
    assert(e === Long.MaxValue)
  }

  test("minhash_sigs skips null elements: signature over [h, null] equals " +
      "signature over [h]") {
    graft.functions.GraftFunctions.registerAll(spark)
    val two = spark.sql(
      "SELECT minhash_sigs(array(42L, cast(null as bigint))) AS s")
      .select(col("s")).as[Seq[Long]].head()
    val one = spark.sql("SELECT minhash_sigs(array(42L)) AS s")
      .select(col("s")).as[Seq[Long]].head()
    assert(two === one)
  }

  test("shingle_hashes follows concat_ws's null rule: a null token drops " +
      "with its separator, matching the SQL md5 formulation byte-for-byte") {
    graft.functions.GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT shingle_hashes(array('a', cast(null as string), 'b'), 'txt') AS h")
      .select(col("h")).as[Seq[Long]].head()
    val want = spark.sql(
      "SELECT conv(substring(md5(concat_ws(' ', 'a', cast(null as string), 'b')), 1, 12), 16, 10) AS h")
      .select(col("h").cast("long")).as[Long].head()
    assert(got === Seq(want))
  }

  test("simhash64/simhash32 skip null tokens: [a, null, b] hashes like " +
      "[a, b]") {
    graft.functions.GraftFunctions.registerAll(spark)
    for (fn <- Seq("simhash64", "simhash32")) {
      val withNull = spark.sql(
        s"SELECT $fn(array('a', cast(null as string), 'b')) AS h")
        .select(col("h")).as[Long].head()
      val without = spark.sql(s"SELECT $fn(array('a', 'b')) AS h")
        .select(col("h")).as[Long].head()
      assert(withNull === without, fn)
    }
  }
}

package graft.collab

import graft.SparkSpec

/** Exact-math fixtures from FIXTURES.md §3 — no ML involved. */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, Double)*) =
    rows.toDF("user", "product", "rating")
  private def pred(rows: (Int, Int, Double)*) =
    rows.toDF("user", "product", "prediction")

  test("hand-computed RMSE fixture: join drops unmatched, rmse = sqrt(1/2)") {
    val valid = df((1, 1, 4.0), (1, 2, 2.0), (2, 1, 5.0))
    val preds = pred((1, 1, 3.0), (1, 2, 2.0), (2, 2, 9.9))
    val joined = Validation.joined(valid, preds)
    assert(joined.count() === 2)
    val rmse = Validation.rmse(joined)
    assert(math.abs(rmse - math.sqrt(0.5)) < 1e-12)
  }

  test("RMSE is 0 when predictions equal actuals") {
    val valid = df((1, 1, 4.0), (2, 2, 1.0))
    val preds = pred((1, 1, 4.0), (2, 2, 1.0))
    assert(Validation.validate(preds, valid) === 0.0)
  }

  test("RMSE invariant under row order") {
    val valid = df((1, 1, 4.0), (1, 2, 2.0), (2, 1, 5.0))
    val predsA = pred((1, 1, 3.0), (1, 2, 2.5), (2, 1, 4.0))
    val predsB = pred((2, 1, 4.0), (1, 1, 3.0), (1, 2, 2.5))
    assert(Validation.validate(predsA, valid) === Validation.validate(predsB, valid))
  }

  test("join cardinality bounded by min side (unique keys)") {
    val valid = df((1, 1, 4.0), (1, 2, 2.0), (2, 1, 5.0), (3, 3, 3.0))
    val preds = pred((1, 1, 3.0))
    assert(Validation.joined(valid, preds).count() === 1)
  }
}

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("report formats rows sorted by (user, product) with ERR/OK + RMSE footer") {
    val joined = Seq(
      (2, 1, 5.0, 3.4),  // |5.0-3.4| >= 1 -> ERR
      (1, 2, 2.0, 2.04), // -> OK, pred rounds to 2.0
      (1, 1, 4.0, 3.96)  // -> OK
    ).toDF("user", "product", "rating", "prediction")
    val report = Report.resultsReport(joined, 0.123)
    val lines = report.split("\n")
    assert(lines(0) === "User\tProduct\tPredicted\tActual\tError?")
    assert(lines(1) === "1\t1\t4.0\t\t4.0\tOK")
    assert(lines(2) === "1\t2\t2.0\t\t2.0\tOK")
    assert(lines(3) === "2\t1\t3.4\t\t5.0\tERR")
    assert(lines(4) === "RMSE = 0.12")
  }

  test("Util.round is half-up, 1 place default") {
    assert(Util.round(0.15) === 0.2)
    assert(Util.round(0.14999) === 0.1)
    assert(Util.round(2.345, 2) === 2.35)
    assert(Util.round(0.123, 2) === 0.12)
  }
}

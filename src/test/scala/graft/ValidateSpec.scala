package graft

import graft.etl.{Transform, Validate}
import org.apache.spark.sql.functions._

/** Validation-stage semantics: every rule, ALL-reasons collection, the
  * clean/rejected split conservation property, structural checks. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("transaction_id", "customer_id", "product_name",
    "quantity", "unit_price", "transaction_date", "region", "status")

  private def mk(rows: (String, String, String, String, String, String, String, String)*) =
    rows.toSeq.toDF(cols: _*)

  private val good = ("t1", "1", "w", "2", "5.00", "2024-01-01", "r", "completed")

  test("clean row produces zero reasons") {
    val (clean, rejected) = Validate.split(Transform(mk(good)))
    assert(clean.count() == 1 && rejected.count() == 0)
  }

  test("each rule fires and ALL violations are collected, not just the first") {
    // qty garbage → null quantity → null total_sale, so all 5 rules fire
    val bad = ("  ", "1", "w", "x", "-5.00", "nope", "r", "bogus")
    val (_, rejected) = Validate.split(Transform(mk(bad)))
    val reasons = rejected.select(Validate.reasonString.as("r")).head().getString(0)
    assert(reasons.contains("missing_transaction_id"))
    assert(reasons.contains("transaction date"))
    assert(reasons.contains("unit_price"))
    assert(reasons.contains("invalid status value: bogus"))
    assert(reasons.split(" \\| ").length == 5) // total_sale rule fires too
  }

  test("'unknown' (the null-fill value) is a VALID status — subtle ref rule") {
    val r = ("t2", "1", "w", "2", "5.00", "2024-01-01", "r", null: String)
    val (clean, rejected) = Validate.split(Transform(mk(r)))
    assert(clean.count() == 1 && rejected.count() == 0)
  }

  test("row conservation: clean ∪ rejected ≡ input (never silent-drop)") {
    val rows = (1 to 50).map { i =>
      (if (i % 7 == 0) "" else s"t$i", i.toString, "w", i.toString,
        if (i % 5 == 0) "-1" else "9.99",
        if (i % 3 == 0) "garbage" else "2024-01-02", "r", "pending")
    }
    val df = Transform(mk(rows: _*))
    val (clean, rejected) = Validate.split(df)
    assert(clean.count() + rejected.count() == 50)
  }

  test("structural report: missing columns, emptiness, duplicate PKs") {
    val ok = Validate.validateStructure(mk(good))
    assert(ok.ok && ok.duplicateIds == 0)
    val dup = Validate.validateStructure(mk(good, good))
    assert(dup.duplicateIds == 1) // warn-only, still ok
    assert(dup.ok)
    val missing = Validate.validateStructure(
      Seq(("a", "b")).toDF("transaction_id", "customer_id"))
    assert(!missing.ok && missing.missing.contains("status"))
    val empty = Validate.validateStructure(mk(good).filter(lit(false)))
    assert(!empty.ok && empty.empty)
  }
}

package graft

import graft.etl.{Transform, Validate}
import org.apache.spark.sql.Row

/** Unit tests for the transform stage — exactly the functions the
  * reference names as most testable (docs/documentation.md:216). */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def raw(
      id: String = " t1 ", cust: String = "7", name: String = " Widget ",
      qty: String = "3", price: String = "19.99", date: String = "2024-03-05",
      region: String = " North ", status: String = " Completed ") =
    Seq((id, cust, name, qty, price, date, region, status))
      .toDF("transaction_id", "customer_id", "product_name", "quantity",
        "unit_price", "transaction_date", "region", "status")

  test("happy path: casts, trims, case-normalization, derived total") {
    val r = Transform(raw()).head()
    assert(r.getAs[String]("transaction_id") == "T1")
    assert(r.getAs[Int]("customer_id") == 7)
    assert(r.getAs[String]("product_name") == "Widget")
    assert(r.getAs[Int]("quantity") == 3)
    assert(r.getAs[java.math.BigDecimal]("unit_price").doubleValue() == 19.99)
    assert(r.getAs[java.sql.Date]("transaction_date").toString == "2024-03-05")
    assert(r.getAs[String]("region") == "north")
    assert(r.getAs[String]("status") == "completed")
    assert(r.getAs[java.math.BigDecimal]("total_sale").doubleValue() == 59.97)
  }

  test("numeric coerce: garbage becomes null, never throws (F1)") {
    val r = Transform(raw(qty = "NaNqty", price = "abc", cust = "x")).head()
    assert(r.isNullAt(r.fieldIndex("quantity")))
    assert(r.isNullAt(r.fieldIndex("unit_price")))
    assert(r.isNullAt(r.fieldIndex("customer_id")))
    assert(r.isNullAt(r.fieldIndex("total_sale"))) // null propagates (F7)
  }

  test("multi-format date parse tries all three formats in order (F2)") {
    val dates = Seq("2024-03-05", "05/03/2024", "Mar 05 2024", "not-a-date")
    val out = dates.map(d => Transform(raw(date = d)).head())
    assert(out(0).getAs[java.sql.Date]("transaction_date").toString == "2024-03-05")
    assert(out(1).getAs[java.sql.Date]("transaction_date").toString == "2024-03-05")
    assert(out(2).getAs[java.sql.Date]("transaction_date").toString == "2024-03-05")
    assert(out(3).isNullAt(out(3).fieldIndex("transaction_date")))
  }

  test("status: lowercase THEN fill — null skips lowercasing (F6 order)") {
    val r1 = Transform(raw(status = null)).head()
    assert(r1.getAs[String]("status") == "unknown")
    val r2 = Transform(raw(status = " PENDING ")).head()
    assert(r2.getAs[String]("status") == "pending")
  }

  test("parseDate used standalone matches the reference loop semantics") {
    val df = Seq("1999-12-31", "31/12/1999", "Dec 31 1999", "12/31/1999")
      .toDF("d").select(Transform.parseDate($"d").as("p"))
    val ps = df.collect().map(r => Option(r.getAs[java.sql.Date]("p")).map(_.toString))
    assert(ps(0).contains("1999-12-31"))
    assert(ps(1).contains("1999-12-31"))
    assert(ps(2).contains("1999-12-31"))
    // 12/31/1999 is NOT dd/MM/yyyy (month 31 invalid) → null, as in the
    // reference (it never guesses US format).
    assert(ps(3).isEmpty)
  }

  test("single-digit day/month parse like the reference's strptime (VERDICT r11 #6)") {
    // strptime %d/%m/%Y, %b %d %Y and %Y-%m-%d all accept unpadded
    // fields — "1/2/2020" is Feb 1st, "Mar 5 2020" parses, and so does
    // "2020-1-2"; the old \d{2}/dd-strict spelling nulled all three.
    val df = Seq("1/2/2020", "Mar 5 2020", "2020-1-2", "1/13/2020")
      .toDF("d").select(Transform.parseDate($"d").as("p"))
    val ps = df.collect().map(r => Option(r.getAs[java.sql.Date]("p")).map(_.toString))
    assert(ps(0).contains("2020-02-01"))
    assert(ps(1).contains("2020-03-05"))
    assert(ps(2).contains("2020-01-02"))
    assert(ps(3).isEmpty) // month 13 still invalid — leniency is padding-only
  }
}

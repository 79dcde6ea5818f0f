package graft

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.etl.Main

/** End-to-end CLI pipeline (the reference's `python main.py` run shape):
  * CSV on disk → embedded Derby, audit columns stamped, idempotent
  * re-run, halt → exit code 1. */
class MainSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:maindb;create=true"

  private def q1(sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-main").toString
    val f = Paths.get(dir, "sales.csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("CSV → DB end-to-end: loads, stamps audit columns, re-run is idempotent") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val path = writeCsv(
      "transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region,status",
      "t1,1,Widget,2,3.50,2024-01-05,north,completed",
      "t2,2,Gadget,1,10.00,05/02/2024,south,PENDING",
      ",3,Gizmo,4,2.00,2024-01-07,east,completed") // missing id → dead letter

    assert(Main.runPipeline(spark, path, url) == 0)
    assert(q1("SELECT COUNT(*) FROM sales_transactions") == 2)
    assert(q1("SELECT COUNT(*) FROM sales_transactions WHERE loaded_at IS NOT NULL") == 2)
    assert(q1("SELECT COUNT(*) FROM rejected_rows") == 1)
    assert(q1("SELECT COUNT(*) FROM rejected_rows WHERE id IS NOT NULL AND rejected_at IS NOT NULL") == 1)
    // derived column landed with the reference's rounding
    assert(q1("SELECT CAST(total_sale * 100 AS BIGINT) FROM sales_transactions WHERE transaction_id = 'T1'") == 700)

    // re-run: clean keys upsert (count unchanged), dead letter appends
    assert(Main.runPipeline(spark, path, url) == 0)
    assert(q1("SELECT COUNT(*) FROM sales_transactions") == 2)
    assert(q1("SELECT COUNT(*) FROM rejected_rows") == 2)
  }

  test("halts map to exit code 1: missing file and broken structure") {
    assert(Main.runPipeline(spark, "/no/such/file.csv", url) == 1)
    val bad = writeCsv("transaction_id,customer_id", "t1,1")
    assert(Main.runPipeline(spark, bad, url) == 1)
  }
}

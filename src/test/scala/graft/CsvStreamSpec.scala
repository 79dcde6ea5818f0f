package graft

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import graft.etl.Main
import graft.sinks.JdbcUpsert
import graft.streaming.CsvPipelineStream

/** Streaming twin of the flagship pipeline: CSVs dropped into a watched
  * directory flow through the SHARED Transform/Validate logic into the
  * JDBC sink — incremental arrival, upsert convergence, dead-letter
  * capture. */
class CsvStreamSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:csvstreamdb;create=true"

  private def q1(sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("watched-dir CSVs stream into the upsert sink incrementally") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val dialect = JdbcUpsert.AnsiMerge()
    JdbcUpsert.ensureTable(url, "sales_transactions", Main.CleanSchema,
      Seq("transaction_id"), ifNotExistsSyntax = false,
      auditTimestampCol = Some("loaded_at"), dialect = dialect)
    JdbcUpsert.ensureTable(url, "rejected_rows", Main.RejectSchema, Nil,
      ifNotExistsSyntax = false, identityCol = Some("id"),
      auditTimestampCol = Some("rejected_at"), dialect = dialect)

    val src = Files.createTempDirectory("graft-stream-src").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val header =
      "transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region,status"

    Files.writeString(Paths.get(src, "drop1.csv"), Seq(
      header,
      "t1,1,Widget,2,3.50,2024-01-05,north,completed",
      ",2,Gadget,1,10.00,2024-01-06,south,pending" // no id → dead letter
    ).mkString("\n"))

    val q = CsvPipelineStream.start(spark, src, ckpt, url, dialect)
    try {
      q.processAllAvailable()
      assert(q1("SELECT COUNT(*) FROM sales_transactions") == 1)
      assert(q1("SELECT COUNT(*) FROM rejected_rows") == 1)
      assert(q1("SELECT CAST(total_sale * 100 AS BIGINT) FROM sales_transactions WHERE transaction_id = 'T1'") == 700)

      // second drop: t1 updated (upsert, not duplicate) + t3 new
      Files.writeString(Paths.get(src, "drop2.csv"), Seq(
        header,
        "t1,1,Widget,5,3.50,2024-01-05,north,completed",
        "t3,3,Gizmo,1,2.00,07/01/2024,east,PENDING"
      ).mkString("\n"))
      q.processAllAvailable()
      assert(q1("SELECT COUNT(*) FROM sales_transactions") == 2)
      // t1 converged to the latest quantity (5 * 3.50 = 17.50)
      assert(q1("SELECT CAST(total_sale * 100 AS BIGINT) FROM sales_transactions WHERE transaction_id = 'T1'") == 1750)
      // multi-format date parsed by the shared Transform logic
      assert(q1("SELECT COUNT(*) FROM sales_transactions WHERE transaction_id = 'T3' AND transaction_date = '2024-01-07'") == 1)
      assert(q1("SELECT COUNT(*) FROM rejected_rows") == 1)
    } finally q.stop()
  }
}

package graft

import java.sql.DriverManager

import graft.sinks.JdbcUpsert
import org.apache.spark.sql.types._

/** Integration test of the JDBC upsert sink against embedded Derby
  * (ships with Spark). Exercises the ANSI MERGE dialect end-to-end:
  * DDL bootstrap, initial load, idempotent re-run (the reference's
  * defining property, README.md:150), value update, dead-letter append.
  */
class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def q1(sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  private val schema = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("total_sale", DoubleType)))

  test("upsert is idempotent and updates on conflict (MERGE dialect)") {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    JdbcUpsert.ensureTable(url, "sales", schema, Seq("transaction_id"),
      ifNotExistsSyntax = false)
    JdbcUpsert.ensureTable(url, "sales", schema, Seq("transaction_id"),
      ifNotExistsSyntax = false) // second bootstrap is a no-op

    val df1 = Seq(("t1", 1, 10.0), ("t2", 2, 20.0), ("t3", 3, 30.0))
      .toDF("transaction_id", "customer_id", "total_sale")
    JdbcUpsert.upsert(df1, url, "sales", Seq("transaction_id"),
      JdbcUpsert.AnsiMerge(), batchSize = 2)
    assert(q1("SELECT COUNT(*) FROM sales") == 3)

    // re-run unchanged → identical counts (idempotency)
    JdbcUpsert.upsert(df1, url, "sales", Seq("transaction_id"),
      JdbcUpsert.AnsiMerge())
    assert(q1("SELECT COUNT(*) FROM sales") == 3)

    // conflicting key updates non-key columns, new key inserts
    val df2 = Seq(("t2", 99, 99.5), ("t4", 4, 40.0))
      .toDF("transaction_id", "customer_id", "total_sale")
    JdbcUpsert.upsert(df2, url, "sales", Seq("transaction_id"),
      JdbcUpsert.AnsiMerge())
    assert(q1("SELECT COUNT(*) FROM sales") == 4)
    assert(q1("SELECT customer_id FROM sales WHERE transaction_id = 't2'") == 99)
  }

  test("dead-letter append preserves every rejected row, duplicates included") {
    val dlSchema = StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("raw_data", StringType),
      StructField("rejection_reason", StringType, nullable = false)))
    JdbcUpsert.ensureTable(url, "rejected_rows", dlSchema, Nil,
      ifNotExistsSyntax = false)
    val dl = Seq(("t9", "{...}", "unit_price must be a positive number"),
      ("t9", "{...}", "unit_price must be a positive number"))
      .toDF("transaction_id", "raw_data", "rejection_reason")
    JdbcUpsert.append(dl, url, "rejected_rows")
    assert(q1("SELECT COUNT(*) FROM rejected_rows") == 2)
  }

  test("generated SQL shapes for both dialects") {
    val pg = JdbcUpsert.Postgres.upsertSql("t", schema, Seq("transaction_id"))
    assert(pg.contains("ON CONFLICT (transaction_id) DO UPDATE SET"))
    assert(pg.contains("customer_id = EXCLUDED.customer_id"))
    val mg = JdbcUpsert.AnsiMerge().upsertSql("t", schema, Seq("transaction_id"))
    assert(mg.contains("MERGE INTO t t"))
    assert(mg.contains("CAST(? AS VARCHAR(255))"))
    assert(mg.contains("WHEN NOT MATCHED THEN INSERT"))
  }
}

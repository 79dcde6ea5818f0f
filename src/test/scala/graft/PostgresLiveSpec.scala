package graft

import java.io.File
import java.nio.file.{Files, Paths}

import graft.sinks.JdbcUpsert
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** LIVE PostgreSQL 15 end-to-end for the Postgres dialect — closing the
  * "correct SQL text, but never run against a real postgresql server"
  * gap: the suite boots an actual PostgreSQL server (initdb + pg_ctl on
  * a private unix socket, no TCP) and executes the EXACT statement text
  * the production sink emits — [[JdbcUpsert.createTableSql]],
  * [[JdbcUpsert.Postgres.upsertSql]] (INSERT … ON CONFLICT DO UPDATE),
  * and the dead-letter [[JdbcUpsert.insertSql]] — through psql,
  * asserting DDL acceptance, upsert idempotency, the conflict-update
  * branch, audit-timestamp stamping, and SERIAL dead-letter semantics.
  *
  * The sandbox ships the server but no PostgreSQL JDBC driver jar (and
  * the build adds no dependencies), so the `?`-markers are inlined with
  * literals here; the marker ORDER is the dialect's own
  * [[JdbcUpsert.Postgres.bindOrder]] contract, which the Derby e2e
  * (MainSpec) exercises through real JDBC binds. Skips cleanly
  * (`assume`) on hosts without postgres binaries or the postgres user.
  */
class PostgresLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val root = s"/tmp/graft-pg-live-${java.util.UUID.randomUUID()}"
  private var serverUp = false

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  /** Run a shell command as the postgres user (servers refuse root). */
  private def asPg(cmd: String): (Int, String) =
    run("su", "postgres", "-c", s"cd / && $cmd")

  private def available: Boolean =
    run("bash", "-c", "command -v initdb && command -v pg_ctl && command -v psql")._1 == 0 &&
      run("id", "postgres")._1 == 0

  override def beforeAll(): Unit = {
    if (!available) return
    new File(s"$root/sock").mkdirs()
    run("chown", "-R", "postgres", root)
    val (ic, iout) = asPg(s"initdb -D $root/data -A trust --no-locale -E UTF8")
    if (ic != 0) { System.err.println(s"[pg-live] initdb failed: $iout"); return }
    val (sc, sout) = asPg(
      s"""pg_ctl -D $root/data -l $root/log -w -o "-k $root/sock -c listen_addresses=''" start""")
    if (sc != 0) { System.err.println(s"[pg-live] start failed: $sout"); return }
    serverUp = true
  }

  override def afterAll(): Unit = {
    if (serverUp) asPg(s"pg_ctl -D $root/data -m immediate stop")
    run("rm", "-rf", root)
  }

  /** Execute SQL (may contain multiple statements) and return psql's
    * tuples-only output; any statement error fails the test. */
  private def psql(sql: String): String = {
    val f = Paths.get(root, s"stmt-${System.nanoTime()}.sql")
    Files.write(f, sql.getBytes("UTF-8"))
    run("chmod", "644", f.toString)
    val (c, out) = asPg(
      s"psql -h $root/sock -d postgres -v ON_ERROR_STOP=1 -tA -f $f")
    Files.deleteIfExists(f)
    assert(c == 0, s"psql failed:\n$sql\n--- output ---\n$out")
    out.trim
  }

  /** Inline literal values into the dialect's `?` markers, in marker
    * order (schema field order for the Postgres dialect). */
  private def inline(sql: String, values: Seq[String]): String = {
    val parts = sql.split("\\?", -1)
    assert(parts.length == values.length + 1,
      s"marker/value count mismatch: ${parts.length - 1} vs ${values.length}")
    parts.head + values.zip(parts.tail).map { case (v, p) => v + p }.mkString
  }

  private val salesSchema = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("unit_price", DecimalType(10, 2), nullable = false)))

  test("live PG: dialect DDL + ON CONFLICT upsert — accepted, idempotent, updates on conflict") {
    assume(serverUp, "no live PostgreSQL available in this environment")
    val ddl = JdbcUpsert.createTableSql("sales_tx", salesSchema,
      Seq("transaction_id"), auditTimestampCol = Some("loaded_at"))
    psql(s"CREATE TABLE IF NOT EXISTS ${ddl.stripPrefix("CREATE TABLE ")}")
    val upsert = JdbcUpsert.Postgres.upsertSql("sales_tx", salesSchema,
      Seq("transaction_id"), Some("loaded_at"))
    psql(inline(upsert, Seq("'t1'", "1", "5", "19.99")) + ";\n" +
      inline(upsert, Seq("'t2'", "2", "3", "5.00")))
    assert(psql("SELECT count(*) FROM sales_tx") == "2")
    // idempotency: replaying an identical batch changes nothing
    psql(inline(upsert, Seq("'t1'", "1", "5", "19.99")))
    assert(psql("SELECT count(*) FROM sales_tx") == "2")
    assert(psql("SELECT quantity FROM sales_tx WHERE transaction_id = 't1'") == "5")
    // conflict branch: non-key columns update in place, no new row
    psql(inline(upsert, Seq("'t1'", "1", "7", "21.50")))
    assert(psql("SELECT count(*) FROM sales_tx") == "2")
    assert(psql(
      "SELECT quantity, unit_price FROM sales_tx WHERE transaction_id = 't1'")
      == "7|21.50")
    // the audit column was stamped by the DB on the insert branch
    assert(psql("SELECT count(*) FROM sales_tx WHERE loaded_at IS NOT NULL") == "2")
  }

  test("live PG: SERIAL dead-letter table keeps duplicate rejected rows apart") {
    assume(serverUp, "no live PostgreSQL available in this environment")
    val rejSchema = StructType(Seq(
      StructField("transaction_id", StringType, nullable = true),
      StructField("raw_data", StringType, nullable = true),
      StructField("rejection_reason", StringType, nullable = false)))
    val ddl = JdbcUpsert.createTableSql("rejected_rows", rejSchema, Seq.empty,
      identityCol = Some("id"), auditTimestampCol = Some("rejected_at"))
    assert(ddl.contains("id SERIAL PRIMARY KEY"), ddl)
    psql(s"CREATE TABLE IF NOT EXISTS ${ddl.stripPrefix("CREATE TABLE ")}")
    val ins = inline(JdbcUpsert.insertSql("rejected_rows", rejSchema),
      Seq("'t9'", "'{\"quantity\": -3}'", "'negative_quantity'"))
    psql(ins)
    psql(ins)
    // identical rejected rows are both preserved, told apart by SERIAL
    assert(psql("SELECT count(*), count(DISTINCT id) FROM rejected_rows") == "2|2")
    assert(psql(
      "SELECT count(*) FROM rejected_rows WHERE rejected_at IS NOT NULL") == "2")
  }
}

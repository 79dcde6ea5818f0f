package graft.sinks

import java.net.URLEncoder
import java.sql.DriverManager

/** DB connection config from the environment (reference src/load.py:8-22,
  * test_connection.py:5-17): the reference assembles its engine URL from
  * the five-variable DB_USER / DB_PASSWORD / DB_HOST / DB_PORT / DB_NAME
  * contract loaded via dotenv. This is the Spark-side twin: the same five
  * variables become a JDBC URL usable by both `spark.read.jdbc` and the
  * [[JdbcUpsert]] sink. `env` is injectable so tests exercise the
  * assembly without mutating the process environment.
  */
object DbEnv {

  val Keys: Seq[String] =
    Seq("DB_USER", "DB_PASSWORD", "DB_HOST", "DB_PORT", "DB_NAME")

  /** Postgres JDBC URL from the 5-env-var contract. Credentials are
    * URL-encoded — a password with `&` or spaces must not corrupt the
    * query string. Fails fast (like the reference's None-propagating
    * getenv would at connect time, but with a readable message). */
  def jdbcUrl(env: Map[String, String] = sys.env): String = {
    val missing = Keys.filterNot(k => env.get(k).exists(_.nonEmpty))
    require(missing.isEmpty,
      s"missing DB env vars: ${missing.mkString(", ")} (need ${Keys.mkString(", ")})")
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    s"jdbc:postgresql://${env("DB_HOST")}:${env("DB_PORT")}/${env("DB_NAME")}" +
      s"?user=${enc(env("DB_USER"))}&password=${enc(env("DB_PASSWORD"))}"
  }

  /** Connection probe (reference test_connection.py:20-23 runs `SELECT
    * version()` and prints the row): execute a trivial statement, report
    * reachability. `probeSql` is dialect-specific — "SELECT version()"
    * on Postgres, "VALUES 1" on Derby. */
  def probe(url: String, probeSql: String = "SELECT version()"): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(probeSql)
      try rs.next() finally rs.close()
    } finally conn.close()
  }
}

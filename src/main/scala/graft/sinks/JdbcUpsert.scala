package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Idempotent JDBC upsert sink (reference src/load.py:60-104).
  *
  * Spark's DataFrameWriter.jdbc is append/overwrite only — the same gap
  * the reference hits with pandas `to_sql` (reference src/load.py:76,
  * docs/documentation.md:163) — so this sink runs `foreachPartition`:
  * each executor opens one connection, binds rows into a prepared
  * single-statement upsert, flushes in batches, and commits per
  * partition. Re-running the whole job leaves row counts unchanged —
  * idempotency is the reference's defining property
  * (README.md:150, docs/documentation.md:158-160).
  *
  * 100 TB shape: connections scale with partitions, not rows; batches
  * bound executor memory; no driver materialization. Writes within a
  * partition are one transaction (mirrors the reference's single-tx
  * load, src/load.py:99-101); cross-partition atomicity is out of scope,
  * as it is for every parallel JDBC writer.
  *
  * Two dialects:
  *  - [[Postgres]]: `INSERT … ON CONFLICT (pk) DO UPDATE SET` — the
  *    statement the reference emits (src/load.py:77-96).
  *  - [[AnsiMerge]]: `MERGE INTO … USING (VALUES …)` for engines without
  *    ON CONFLICT (Derby, which embeds in our tests; Oracle/DB2/MSSQL).
  *    Derby requires typed CASTs on parameter markers inside VALUES, so
  *    the row source is generated from the DataFrame schema.
  */
object JdbcUpsert {

  sealed trait Dialect {
    /** `auditTimestampCol`: a `TIMESTAMP DEFAULT CURRENT_TIMESTAMP` audit
      * column (reference `loaded_at`, src/load.py:44) stamped explicitly
      * on the INSERT branch and left untouched on update — explicit
      * because Derby 10.16's MERGE compiler NPEs when the implicit
      * insert-row has to materialize a CURRENT_TIMESTAMP default
      * (CurrentDatetimeOperatorNode), and an explicit stamp is
      * equivalent and portable. */
    def upsertSql(table: String, schema: StructType, keyCols: Seq[String],
        auditTimestampCol: Option[String] = None): String
    /** Column indices to bind, in the order the statement's ?-markers
      * appear. Postgres binds each column once; MERGE-over-dummy-table
      * repeats columns across the ON / UPDATE / INSERT clauses. */
    def bindOrder(schema: StructType, keyCols: Seq[String]): Seq[Int] =
      schema.fieldNames.indices.toSeq
    /** Auto-increment surrogate-key column DDL (the reference's
      * `id SERIAL` on rejected_rows, src/load.py:45). */
    def identityColSql(name: String): String =
      s"$name INTEGER GENERATED ALWAYS AS IDENTITY" // ANSI; Derby/DB2
  }

  case object Postgres extends Dialect {
    override def identityColSql(name: String): String = s"$name SERIAL"
    def upsertSql(table: String, schema: StructType, keyCols: Seq[String],
        auditTimestampCol: Option[String] = None): String = {
      val cols = schema.fieldNames.toSeq
      val nonKey = cols.filterNot(keyCols.contains)
      val insertCols = cols ++ auditTimestampCol
      val insertVals = cols.map(_ => "?") ++ auditTimestampCol.map(_ => "CURRENT_TIMESTAMP")
      val updates = nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"""INSERT INTO $table (${insertCols.mkString(", ")})
         |VALUES (${insertVals.mkString(", ")})
         |ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $updates""".stripMargin
    }
  }

  /** MERGE keyed off a one-row dummy table — Derby and DB2 reject a
    * parameterized VALUES row as a MERGE source ("must be a base table
    * or table function"), but accept parameters inside ON/UPDATE/INSERT
    * when each marker carries an explicit CAST. Oracle's spelling is
    * `AnsiMerge("dual")`. */
  final case class AnsiMerge(dummyTable: String = "SYSIBM.SYSDUMMY1")
      extends Dialect {
    def upsertSql(table: String, schema: StructType, keyCols: Seq[String],
        auditTimestampCol: Option[String] = None): String = {
      val cols = schema.fieldNames.toSeq
      val nonKey = cols.filterNot(keyCols.contains)
      def cast(c: String) =
        s"CAST(? AS ${sqlType(schema(schema.fieldIndex(c)).dataType)})"
      val on = keyCols.map(k => s"t.$k = ${cast(k)}").mkString(" AND ")
      val updates = nonKey.map(c => s"t.$c = ${cast(c)}").mkString(", ")
      val insertCols = cols ++ auditTimestampCol
      val insertVals = cols.map(cast) ++ auditTimestampCol.map(_ => "CURRENT_TIMESTAMP")
      s"""MERGE INTO $table t
         |USING $dummyTable d
         |ON $on
         |WHEN MATCHED THEN UPDATE SET $updates
         |WHEN NOT MATCHED THEN INSERT (${insertCols.mkString(", ")})
         |  VALUES (${insertVals.mkString(", ")})""".stripMargin
    }
    override def bindOrder(schema: StructType, keyCols: Seq[String]): Seq[Int] = {
      val idx = schema.fieldNames.zipWithIndex.toMap
      val keys = keyCols.map(idx)
      val nonKeys = schema.fieldNames.toSeq.filterNot(keyCols.contains).map(idx)
      keys ++ nonKeys ++ schema.fieldNames.indices
    }
  }

  /** Spark type → portable SQL type for CAST targets and DDL. */
  def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(255)"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  /** Spark type → java.sql.Types code, needed for null binds: Derby
    * rejects `setNull(_, Types.NULL)` outright ("data type '0' is not
    * supported"), so nulls must carry the column's real JDBC type. */
  private def jdbcTypeCode(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.NULL
  }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType,
      order: Seq[Int]): Unit = {
    var m = 0
    order.foreach { i =>
      m += 1
      if (row.isNullAt(i)) {
        ps.setNull(m, jdbcTypeCode(schema(i).dataType))
      } else schema(i).dataType match {
        case StringType => ps.setString(m, row.getString(i))
        case IntegerType => ps.setInt(m, row.getInt(i))
        case LongType => ps.setLong(m, row.getLong(i))
        case DoubleType => ps.setDouble(m, row.getDouble(i))
        case FloatType => ps.setFloat(m, row.getFloat(i))
        case BooleanType => ps.setBoolean(m, row.getBoolean(i))
        case DateType => ps.setDate(m, row.getDate(i))
        case TimestampType => ps.setTimestamp(m, row.getTimestamp(i))
        case _: DecimalType => ps.setBigDecimal(m, row.getDecimal(i))
        case other => throw new IllegalArgumentException(s"bind: $other")
      }
    }
  }

  /** Default connection-fan-out cap — see [[capConnections]]. */
  val DefaultMaxConnections = 16

  /** Bound the sink's connection fan-out (VERDICT r13 #4): each
    * partition opens one connection, so a wide frame (an sf100 shuffle
    * output easily carries 256+ partitions) is a connection STORM
    * against the database — PostgreSQL defaults to max_connections=100
    * shared by everything, and the reference names connection pooling
    * as its own scale plan (docs/documentation.md:192-194). `coalesce`
    * (narrow — no shuffle: partitions are merged, never re-hashed)
    * caps concurrent writers at `maxConnections`; a frame already at
    * or under the cap is untouched. Pure so the spec pins both
    * branches. */
  def capConnections(df: DataFrame, maxConnections: Int): DataFrame =
    if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
    else df

  /** Upsert every row of `df` into `table`, keyed on `keyCols`.
    * `auditTimestampCol` stamps inserts with CURRENT_TIMESTAMP (the
    * reference's loaded_at audit column); updates leave it untouched.
    * At most `maxConnections` connections are opened concurrently. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
      dialect: Dialect = Postgres, batchSize: Int = 1000,
      auditTimestampCol: Option[String] = None,
      maxConnections: Int = DefaultMaxConnections): Unit = {
    val schema = df.schema
    val sql = dialect.upsertSql(table, schema, keyCols, auditTimestampCol)
    val order = dialect.bindOrder(schema, keyCols)
    capConnections(df, maxConnections).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            bind(ps, row, schema, order)
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          conn.commit()
          ps.close()
        } catch {
          case e: Throwable => rollbackQuietly(conn, e); throw e
        } finally conn.close()
      }
    }
  }

  /** Structured-Streaming writer for `writeStream.foreachBatch`: each
    * microbatch upserts keyed on `keyCols`. Streaming sinks are
    * at-least-once on recovery (a failed microbatch replays), and the
    * keyed upsert is idempotent — together the table converges to
    * effectively-once state, the same property the reference's batch
    * re-runs rely on (README.md:150). */
  def streamWriter(url: String, table: String, keyCols: Seq[String],
      dialect: Dialect = Postgres, batchSize: Int = 1000,
      auditTimestampCol: Option[String] = None): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      upsert(batch, url, table, keyCols, dialect, batchSize, auditTimestampCol)

  /** Roll back without masking the original failure: some drivers
    * (Derby) kill the connection on a batch error, so the rollback
    * itself can throw — that secondary error must ride along as a
    * suppressed exception, not replace the root cause. */
  private def rollbackQuietly(conn: Connection, cause: Throwable): Unit =
    try conn.rollback() catch { case r: Throwable => cause.addSuppressed(r) }

  /** The dead-letter INSERT's statement text — exposed (like
    * [[createTableSql]]) so the psql-driven live-Postgres e2e executes
    * the exact SQL the sink emits. */
  def insertSql(table: String, schema: StructType): String =
    s"INSERT INTO $table (${schema.fieldNames.mkString(", ")}) " +
      s"VALUES (${schema.fieldNames.map(_ => "?").mkString(", ")})"

  /** Dead-letter append (reference src/load.py:106-141): plain batched
    * INSERT — no conflict handling, every rejected row is preserved.
    * Connection fan-out capped like [[upsert]]. */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000,
      maxConnections: Int = DefaultMaxConnections): Unit = {
    val schema = df.schema
    val sql = insertSql(table, schema)
    capConnections(df, maxConnections).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            bind(ps, row, schema, schema.fieldNames.indices.toSeq)
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          conn.commit()
          ps.close()
        } catch {
          case e: Throwable => rollbackQuietly(conn, e); throw e
        } finally conn.close()
      }
    }
  }

  /** DDL bootstrap (reference src/load.py:24-58): driver-side
    * CREATE-TABLE-IF-NOT-EXISTS before any load. Not a migration tool —
    * same caveat the reference states (docs/documentation.md:166-168).
    *
    * Audit columns mirror the reference's DDL exactly:
    *  - `auditTimestampCol` → `TIMESTAMP DEFAULT CURRENT_TIMESTAMP`
    *    (`loaded_at` on the clean table, `rejected_at` on the dead
    *    letter — src/load.py:44,52). Loads never bind it; the DB stamps
    *    each insert.
    *  - `identityCol` → auto-increment surrogate key (`id SERIAL
    *    PRIMARY KEY` on rejected_rows, src/load.py:45); becomes the PK
    *    when no natural `keyCols` are given, which is what lets the
    *    dead-letter table keep duplicate rejected rows apart. */
  /** The CREATE TABLE statement text [[ensureTable]] executes — exposed
    * so a harness without a JDBC driver on the classpath (the
    * psql-driven live-Postgres e2e, PostgresLiveSpec) can run the SAME
    * DDL the production path emits. */
  def createTableSql(table: String, schema: StructType, keyCols: Seq[String],
      identityCol: Option[String] = None,
      auditTimestampCol: Option[String] = None,
      dialect: Dialect = Postgres): String = {
    val idDef = identityCol.map { c =>
      val pk = if (keyCols.isEmpty) " PRIMARY KEY" else ""
      s"${dialect.identityColSql(c)}$pk"
    }
    val dataDefs = schema.fields.map { f =>
      val nn = if (!f.nullable || keyCols.contains(f.name)) " NOT NULL" else ""
      s"${f.name} ${sqlType(f.dataType)}$nn"
    }
    val tsDef = auditTimestampCol.map(c => s"$c TIMESTAMP DEFAULT CURRENT_TIMESTAMP")
    val colDefs = idDef.toSeq ++ dataDefs ++ tsDef.toSeq
    val pk =
      if (keyCols.nonEmpty) s", PRIMARY KEY (${keyCols.mkString(", ")})" else ""
    s"CREATE TABLE $table (${colDefs.mkString(", ")}$pk)"
  }

  def ensureTable(url: String, table: String, schema: StructType,
      keyCols: Seq[String], ifNotExistsSyntax: Boolean = true,
      identityCol: Option[String] = None,
      auditTimestampCol: Option[String] = None,
      dialect: Dialect = Postgres): Unit = {
    val ddl = createTableSql(table, schema, keyCols, identityCol,
      auditTimestampCol, dialect)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      if (ifNotExistsSyntax) st.execute(s"CREATE TABLE IF NOT EXISTS ${ddl.stripPrefix("CREATE TABLE ")}")
      else {
        // Engines without IF NOT EXISTS (Derby): probe the catalog first.
        val meta = conn.getMetaData
        val rs = meta.getTables(null, null, table.toUpperCase, null)
        val exists = rs.next()
        rs.close()
        if (!exists) st.execute(ddl)
      }
      st.close()
    } finally conn.close()
  }
}

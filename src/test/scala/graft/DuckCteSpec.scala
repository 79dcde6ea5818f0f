package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.DuckCte

/** The oracle-side CTE materialization hint is a pure text transform —
  * pin exactly what it may and may not touch. */
class DuckCteSpec extends AnyFunSuite {

  test("annotates a line-start CTE head") {
    val in = "WITH x AS (SELECT 1),\ny AS (\n  SELECT 2)\nSELECT * FROM y"
    val out = DuckCte.materialized(in)
    assert(out.contains("y AS MATERIALIZED ("))
    // `WITH x AS (` shares the WITH line — anchored out, stays inlined
    assert(out.contains("WITH x AS (SELECT 1)"))
  }

  test("skips recursive CTE heads (parenthesised column list)") {
    val in = "WITH RECURSIVE\nreach(src, dst) AS (\n  SELECT 1, 1)\nSELECT * FROM reach"
    assert(DuckCte.materialized(in) == in)
  }

  test("skips duplicate CTE names (materializing a shadowed name is a binder error)") {
    val in = "WITH a AS (SELECT 1),\nstill AS (SELECT 2),\nb AS (\n" +
      "WITH x AS (SELECT 0),\nstill AS (SELECT 3)\nSELECT * FROM still)\n" +
      "SELECT * FROM b"
    val out = DuckCte.materialized(in)
    assert(!out.contains("still AS MATERIALIZED"))
    assert(out.contains("b AS MATERIALIZED ("))
  }

  test("a name already materialized on a previous pass still counts as a duplicate") {
    // composite oracles embed already-transformed oracles as nested
    // WITHs; the shadowed name must stay un-hinted in the outer scope
    val in = "WITH a AS (SELECT 1),\nstill AS (SELECT 2),\nb AS (\n" +
      "WITH RECURSIVE x AS (SELECT 3),\nstill AS MATERIALIZED (SELECT 4)" +
      " SELECT * FROM still)\nSELECT * FROM b"
    val out = DuckCte.materialized(in)
    assert(out.contains("still AS (SELECT 2)"))
  }

  test("indented heads keep their indentation") {
    val in = "WITH\n  q AS (\n  SELECT 1)\nSELECT * FROM q"
    assert(DuckCte.materialized(in).contains("  q AS MATERIALIZED ("))
  }

  test("every registered oracle still parses under the transform rules it uses") {
    // the 11 hinted oracles are registered through the transform; the
    // transform must never produce a duplicate-name materialization
    graft.SparkEntry.oracleSql.foreach { case (_, sql) =>
      val heads = "(?m)^\\s*([A-Za-z_][A-Za-z0-9_]*) AS MATERIALIZED \\(".r
        .findAllMatchIn(sql).map(_.group(1)).toList
      assert(heads.distinct.size == heads.size)
    }
  }
}

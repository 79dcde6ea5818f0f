package graft

/** Driver t1 mirror: the flagship entry returns rows on sf0.001, and
  * every registered query has unique naming + a well-formed oracle. */
class EntrySmokeSpec extends SparkSpec {

  test("entry produces rows on sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry is consistent: unique names, oracles only for known queries") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // every oracle is non-empty SQL
    SparkEntry.oracleSql.values.foreach(sql => assert(sql.trim.nonEmpty))
  }
}

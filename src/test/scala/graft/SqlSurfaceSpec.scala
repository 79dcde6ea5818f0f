package graft

import graft.sql.Views

/** The declarative entry surface: tables as temp views + custom functions
  * in the registry, everything reachable from SQL text. */
class SqlSurfaceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("register exposes all tables as views and is idempotent") {
    Views.register(spark, sf)
    Views.register(spark, sf) // createOrReplace + idempotent functions
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Views.tables.forall(views.contains), views)
    assert(spark.sql("SELECT count(*) AS n FROM nation").head.getLong(0) > 0)
  }

  test("sql_q6_forecast pushes all three predicates to the parquet scan") {
    val df = SparkEntry.queries("sql_q6_forecast")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    // view indirection must not block pushdown: quantity/discount/shipdate
    // all reach the scan
    assert(plan.contains("l_quantity"), plan)
    assert(plan.contains("l_discount"), plan)
    assert(plan.contains("l_shipdate"), plan)
    assert(df.head.getLong(1) > 0) // n_lines
  }

  test("join hint overrides the planner: SHUFFLE_HASH beats the broadcast default") {
    val hinted = SparkEntry.queries("sql_join_hints")(spark, sf)
    val hintedPlan = hinted.queryExecution.executedPlan.toString
    assert(hintedPlan.contains("ShuffledHashJoin"), hintedPlan.take(1200))
    // the same text without the hint broadcasts the small dim
    val plain = Views.sql(spark, sf,
      """SELECT c.c_mktsegment, COUNT(*) AS n
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin)
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("BroadcastHashJoin"), plainPlan.take(1200))
  }

  test("rabin_karp from SQL text plans the codegen'd expression") {
    val df = SparkEntry.queries("sql_rabin_karp")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("rabin_karp"), plan)
    assert(!plan.toLowerCase.contains("aggregate(transform"), plan)
    // same answer as the typed doc_rolling_hash path
    val viaSql = df.select("doc_id", "rhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = SparkEntry.queries("doc_rolling_hash")(spark, sf)
      .select("doc_id", "rhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("sql_window_topk text plans the bounded-heap TopKPerGroup exec") {
    // the portable row_number spelling on SQL TEXT must hit the same
    // WindowTopKRewrite → TopKPerGroup path as the DataFrame idiom: no
    // WindowExec, no per-partition full sort.
    val df = SparkEntry.queries("sql_window_topk")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), s"SQL window top-k fell back to WindowExec: $p")
  }

  test("custom functions are callable in arbitrary user SQL (vec_dot)") {
    Views.register(spark, sf)
    // embeddings store array<float>; vec_dot is double-typed — the same
    // explicit widening the typed API applies (Similarity.scala)
    val n = spark.sql(
      """SELECT vec_id, vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |               CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
        |FROM embeddings
        |WHERE vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |              CAST(embedding AS ARRAY<DOUBLE>)) > 0""".stripMargin).count()
    assert(n > 0)
  }
}

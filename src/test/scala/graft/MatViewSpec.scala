package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan pins for the materialized-view routing rule (SURVEY B47):
  * results parity is the oracle's job; THIS spec proves the plan
  * actually swapped — and refuses to swap where it must not.
  */
class MatViewSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  test("routable aggregate reads the summary, not events.parquet") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_daily")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"summary not in scan set: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")),
      s"raw events still scanned: $paths")
    // and the routed plan returns the same rows as the raw computation
    // (built inline — the registered builder would re-register the route)
    val routed = df.collect().map(_.toString).sorted
    graft.plans.SummaryRewrite.clear()
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      val raw = T.events(spark, sf)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("day"), col("event_type"))
      assert(scanPaths(raw).exists(_.endsWith("events.parquet")),
        "cleared registry should leave the raw scan")
      assert(raw.collect().map(_.toString).sorted.sameElements(routed),
        "routed and raw answers differ")
    } finally graft.queries.MatView.enableRouting(spark, sf)
  }

  test("coarser-grain aggregate (day only) also routes") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_daily_total")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")))
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("hour-grain aggregate routes to the hour summary") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_hourly")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_hourly_")), s"not routed: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("navigator fallback: a day query routes onto the hour summary alone") {
    assume(new java.io.File(sf).isDirectory)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    graft.queries.MatView.enableRouting(spark, sf) // summaries exist
    def dayAgg() = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))
    graft.plans.SummaryRewrite.clear()
    try {
      graft.plans.SummaryRewrite.register(s"$sf/events.parquet", "hour",
        graft.queries.MatView.ensureSummary(spark, sf, "hour"))
      val viaHour = dayAgg()
      val paths = scanPaths(viaHour)
      assert(paths.exists(_.contains("events_hourly_")),
        s"day query did not fall back to the hour summary: $paths")
      assert(!paths.exists(_.endsWith("events.parquet")))
      val routed = viaHour.collect().map(_.toString).sorted
      graft.plans.SummaryRewrite.clear()
      val raw = dayAgg().collect().map(_.toString).sorted
      assert(routed.sameElements(raw),
        "hour-summary re-aggregation differs from the raw day aggregate")
    } finally graft.queries.MatView.enableRouting(spark, sf)
  }

  test("SQL text routes through the temp-view surface too") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("sql_mv_daily")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"summary not in SQL-path scan set: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("non-routable shapes stay on the raw scan") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    val ev = T.events(spark, sf)
    // avg is not decomposable without exposing sum/count — must not route
    val avgQ = ev.groupBy(date_trunc("day", col("ts"))).agg(avg(col("value")))
    assert(scanPaths(avgQ).exists(_.endsWith("events.parquet")))
    // grouping by a column the summary lacks — must not route
    val userQ = ev.groupBy(col("user_id")).agg(count(lit(1)))
    assert(scanPaths(userQ).exists(_.endsWith("events.parquet")))
    // aggregating a column the summary lacks — must not route
    val otherAgg = ev.groupBy(date_trunc("day", col("ts"))).agg(sum(col("user_id")))
    assert(scanPaths(otherAgg).exists(_.endsWith("events.parquet")))
    // distinct count — not decomposable over the rollup; must not route
    val dist = ev.groupBy(date_trunc("day", col("ts")))
      .agg(countDistinct(col("event_type")))
    assert(scanPaths(dist).exists(_.endsWith("events.parquet")))
  }
}

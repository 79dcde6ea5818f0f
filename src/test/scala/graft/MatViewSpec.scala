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

  test("advisor lifecycle: workload shift re-materializes; drop hint vacuums; routing green throughout") {
    assume(new java.io.File(sf).isDirectory)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    // the decisions come from the GATE's own output, not re-derived here
    val shift = SparkEntry.queries("mv_advisor_shift")(spark, sf).collect()
    def nodeOf(r: org.apache.spark.sql.Row) =
      r.getAs[String]("time_grain") + ":" + r.getAs[String]("dim_set")
    val pickW1 = shift.filter(_.getAs[Boolean]("picked_w1")).map(nodeOf).head
    val pickW2 = shift.filter(_.getAs[Boolean]("picked_w2")).map(nodeOf).head
    val dropW2 = shift.filter(_.getAs[Boolean]("drop_w2")).map(nodeOf).toSet
    assert(pickW1 == "day:event_type" && pickW2 == "hour:")
    assert(dropW2.contains(pickW1),
      "the W1-era materialization must become droppable under W2")
    graft.queries.MatView.enableRouting(spark, sf) // fixture summaries exist
    def dayAgg() = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
      .orderBy(col("day"), col("event_type"))
    // W1 era: materialize the pick in a PRIVATE dir (the vacuum must
    // not eat the shared fixture mirror) and route through it
    val w1Dir = java.nio.file.Files
      .createTempDirectory("graft-mv-w1").toString + "/daysum"
    graft.plans.SummaryRewrite.clear()
    try {
      spark.read
        .parquet(graft.queries.MatView.ensureSummary(spark, sf, "day"))
        .write.mode("overwrite").parquet(w1Dir)
      graft.plans.SummaryRewrite.register(s"$sf/events.parquet", "day", w1Dir)
      val before = dayAgg()
      assert(scanPaths(before).exists(_.contains("daysum")),
        s"W1 era must route to the materialized pick: ${scanPaths(before)}")
      val rows = before.collect().map(_.toString).sorted
      // the SHIFT: materialize W2's pick (the hour summary), act on the
      // drop hint — deregister ONLY the day grain and vacuum its files
      graft.plans.SummaryRewrite.register(s"$sf/events.parquet", "hour",
        graft.queries.MatView.ensureSummary(spark, sf, "hour"))
      graft.plans.SummaryRewrite.deregister(s"$sf/events.parquet", "day")
      val p = new org.apache.hadoop.fs.Path(w1Dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      assert(!fs.exists(p), "dropped summary's files must be vacuumed")
      // routing stays green THROUGH the vacuum: the same day query now
      // falls back to the finer hour summary, byte-equal answer
      val after = dayAgg()
      val paths = scanPaths(after)
      assert(paths.exists(_.contains("events_hourly_")),
        s"day query did not fall back after the drop: $paths")
      assert(!paths.exists(_.contains("daysum")) &&
        !paths.exists(_.endsWith("events.parquet")), paths.toString)
      assert(after.collect().map(_.toString).sorted.sameElements(rows),
        "answers diverged across the materialization shift")
    } finally graft.queries.MatView.enableRouting(spark, sf)
  }

  test("schema-generic route: the orders aggregate reads the orders summary") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_orders_daily")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("orders_daily_")),
      s"orders aggregate did not route: $paths")
    assert(!paths.exists(_.endsWith("orders.parquet")),
      s"raw orders still scanned: $paths")
    // routed ≡ raw (the events summaries must not bleed into this table)
    val routed = df.collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      T.orders(spark, sf)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("sum_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("day"), col("o_orderstatus"))
        .collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "orders routed and raw answers differ")
  }

  test("grain lattice: a month query re-truncs the day summary") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_monthly")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"month grain did not route onto the day summary: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    val routed = df.collect().map(_.toString).sorted
    graft.plans.SummaryRewrite.clear()
    try {
      val raw = SparkEntry.queries("mv_rewrite_monthly")(spark, sf)
      graft.plans.SummaryRewrite.clear()
      assert(scanPaths(raw).exists(_.endsWith("events.parquet")))
      assert(raw.collect().map(_.toString).sorted.sameElements(routed),
        "month-over-day re-trunc differs from the raw aggregate")
    } finally graft.queries.MatView.enableRouting(spark, sf)
  }

  test("extractor spellings route; minute-level extractors refuse") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_dow_profile")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"dayofweek grouping did not route: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    val routed = df.collect().map(_.toString).sorted
    graft.plans.SummaryRewrite.clear()
    try {
      val raw = SparkEntry.queries("mv_rewrite_dow_profile")(spark, sf)
      graft.plans.SummaryRewrite.clear()
      assert(raw.collect().map(_.toString).sorted.sameElements(routed),
        "extractor route differs from raw")
    } finally graft.queries.MatView.enableRouting(spark, sf)
    // hour(ts) is only hour-constant: must land on the HOUR summary
    import org.apache.spark.sql.functions._
    val byHourOfDay = T.events(spark, sf)
      .groupBy(hour(col("ts"))).agg(count(lit(1)))
    assert(scanPaths(byHourOfDay).exists(_.contains("events_hourly_")),
      "hour(ts) must route to the hour summary")
    // minute(ts): no stored grain answers it — raw scan
    val byMinute = T.events(spark, sf)
      .groupBy(minute(col("ts"))).agg(count(lit(1)))
    assert(scanPaths(byMinute).exists(_.endsWith("events.parquet")),
      "minute(ts) must stay on the raw scan")
  }

  test("multi-dim route: exact dims + dim predicate read the orders summary") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_orders_by_priority")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("orders_daily_")),
      s"multi-dim aggregate did not route: $paths")
    assert(!paths.exists(_.endsWith("orders.parquet")))
  }

  test("SQL text routes through the temp-view surface too") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("sql_mv_daily")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"summary not in SQL-path scan set: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("SQL-text pivot (FILTER clause) routes; HAVING stays routed") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("sql_mv_pivot")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"pivot SQL did not route: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    // GROUP BY ROLLUP from SQL text produces the same Expand shape as
    // DataFrame .rollup — the grouping-sets path must fire there too
    val rp = scanPaths(SparkEntry.queries("sql_mv_rollup")(spark, sf))
    assert(rp.exists(_.contains("events_daily_")),
      s"SQL rollup did not route: $rp")
    assert(!rp.exists(_.endsWith("events.parquet")))
    // HAVING sits ABOVE the Aggregate (a Filter over its output), so the
    // swap underneath leaves it untouched — the routed plan must still
    // read the summary and agree with the bypassed plan
    graft.sql.Views.register(spark, sf)
    def having() = spark.sql(
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n FROM events
        |GROUP BY 1 HAVING COUNT(*) > 10 ORDER BY day""".stripMargin)
    val hp = scanPaths(having())
    assert(hp.exists(_.contains("events_daily_")), s"HAVING broke route: $hp")
    assert(!hp.exists(_.endsWith("events.parquet")))
    val routed = having().collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      having().collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "HAVING route moved an answer")
    // explicit GROUPING SETS text and the HAVING gate text route too
    val gp = scanPaths(SparkEntry.queries("sql_mv_gsets")(spark, sf))
    assert(gp.exists(_.contains("events_daily_")),
      s"GROUPING SETS SQL did not route: $gp")
    assert(!gp.exists(_.endsWith("events.parquet")))
    val hg = scanPaths(SparkEntry.queries("sql_mv_having")(spark, sf))
    assert(hg.exists(_.contains("events_daily_")),
      s"HAVING gate SQL did not route: $hg")
    assert(!hg.exists(_.endsWith("events.parquet")))
    // the star-schema VALUES-join text swaps the fact side underneath
    val jp = scanPaths(SparkEntry.queries("sql_mv_joined")(spark, sf))
    assert(jp.exists(_.contains("events_daily_")),
      s"joined SQL did not route: $jp")
    assert(!jp.exists(_.endsWith("events.parquet")))
  }

  test("day-aligned filtered aggregate routes; answers match the raw plan") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_daily_filtered")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"filtered aggregate did not route: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    val routed = df.collect().map(_.toString).sorted
    graft.plans.SummaryRewrite.clear()
    try {
      val raw = SparkEntry.queries("mv_rewrite_daily_filtered")(spark, sf)
      // the builder re-registers routes — clear again to compare raw
      graft.plans.SummaryRewrite.clear()
      assert(scanPaths(raw).exists(_.endsWith("events.parquet")))
      assert(raw.collect().map(_.toString).sorted.sameElements(routed),
        "filtered routed and raw answers differ")
    } finally graft.queries.MatView.enableRouting(spark, sf)
  }

  test("hour-aligned (not day-aligned) bound routes the day query to the hour summary") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_rewrite_day_from_hours_filtered")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_hourly_")),
      s"hour-aligned bound should fall to the hour summary: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("misaligned or unanswerable predicates refuse the route") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    def dayAgg(f: org.apache.spark.sql.Column) = T.events(spark, sf)
      .filter(f)
      .groupBy(date_trunc("day", col("ts")), col("event_type"))
      .agg(count(lit(1)))
    // mid-hour bound: neither grain's buckets can honor the 00:30 cut
    val misaligned = dayAgg(col("ts") >= to_timestamp(lit("2024-01-08 00:30:00")))
    assert(scanPaths(misaligned).exists(_.endsWith("events.parquet")),
      "misaligned ts bound must stay on the raw scan")
    // ts <= upper bound: bucket-level cannot exclude the rest of the bucket
    val closedUpper = dayAgg(col("ts") <= to_timestamp(lit("2024-01-08 00:00:00")))
    assert(scanPaths(closedUpper).exists(_.endsWith("events.parquet")),
      "ts <= bound must stay on the raw scan")
    // predicate over a column the summary lacks
    val valuePred = dayAgg(col("value") > 0)
    assert(scanPaths(valuePred).exists(_.endsWith("events.parquet")),
      "value predicate must stay on the raw scan")
  }

  test("trunc-based predicates route at any expressible shape") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    // equality on date_trunc('day', ts): substitutes the bucket column
    val eqDay = T.events(spark, sf)
      .filter(date_trunc("day", col("ts")) === to_timestamp(lit("2024-01-08 00:00:00")))
      .groupBy(date_trunc("day", col("ts")), col("event_type"))
      .agg(count(lit(1)))
    val paths = scanPaths(eqDay)
    assert(paths.exists(_.contains("events_daily_")), s"trunc-eq did not route: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("the navigator knob turns routing off without touching the registry") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    def dayAgg() = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")), col("event_type"))
      .agg(count(lit(1)))
    spark.conf.set(graft.plans.SummaryRewrite.EnabledKey, "false")
    try
      assert(scanPaths(dayAgg()).exists(_.endsWith("events.parquet")),
        "disabled navigator must leave the raw scan")
    finally spark.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    assert(scanPaths(dayAgg()).exists(_.contains("events_daily_")),
      "re-enabled navigator must route again")
  }

  test("summary rebuild never routes onto a stale summary (regen scenario)") {
    assume(new java.io.File(sf).isDirectory)
    // simulate the r5 incident: routes registered for this source, then
    // the fingerprint changes. The rebuild's own aggregate matches the
    // routing grammar — deregister+bypass must force it onto raw rows.
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    graft.plans.SummaryRewrite.withBypass {
      val agg = T.events(spark, sf)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(agg).exists(_.endsWith("events.parquet")),
        "bypassed rebuild plan must scan raw events")
    }
    // and deregister drops every grain for the suffix
    graft.plans.SummaryRewrite.deregister(s"$sf/events.parquet")
    val unrouted = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")), col("event_type")).agg(count(lit(1)))
    assert(scanPaths(unrouted).exists(_.endsWith("events.parquet")),
      "deregistered source must stay raw")
    graft.queries.MatView.enableRouting(spark, sf) // restore for later suites
  }

  test("SQL text with a WHERE routes too") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("sql_mv_daily_filtered")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"filtered SQL text did not route: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
  }

  test("non-routable shapes stay on the raw scan") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    val ev = T.events(spark, sf)
    // avg over the bare DOUBLE column — float addition is
    // order-sensitive, no partial reproduces it exactly: must not route
    val avgQ = ev.groupBy(date_trunc("day", col("ts"))).agg(avg(col("value")))
    assert(scanPaths(avgQ).exists(_.endsWith("events.parquet")))
    // grouping by a column the summary lacks — must not route
    val userQ = ev.groupBy(col("user_id")).agg(count(lit(1)))
    assert(scanPaths(userQ).exists(_.endsWith("events.parquet")))
    // aggregating a column the summary lacks — must not route
    val otherAgg = ev.groupBy(date_trunc("day", col("ts"))).agg(sum(col("user_id")))
    assert(scanPaths(otherAgg).exists(_.endsWith("events.parquet")))
    // distinct over a NON-dim column — not decomposable; must not route
    val dist = ev.groupBy(date_trunc("day", col("ts")))
      .agg(countDistinct(col("user_id")))
    assert(scanPaths(dist).exists(_.endsWith("events.parquet")))
    // distinct over a DIM routes (the summary holds every (bucket, dim)
    // pair) — and agrees with the bypassed plan
    def typeDist() = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("event_type")).as("n_types"))
    val dp = scanPaths(typeDist())
    assert(dp.exists(_.contains("events_daily_")), s"dim distinct: $dp")
    assert(!dp.exists(_.endsWith("events.parquet")))
    val dRouted = typeDist().collect().map(_.toString).sorted
    val dRaw = graft.plans.SummaryRewrite.withBypass {
      typeDist().collect().map(_.toString).sorted
    }
    assert(dRouted.sameElements(dRaw), "dim-distinct route moved an answer")
  }

  test("star-schema join routes; non-carried join keys refuse") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // the gate shape: aggregate over events ⋈ 5-row dim ON event_type
    // (bucket-constant key) — the fact side must swap for the summary
    // UNDER the join, and the answers must match the bypassed raw plan
    def joined() = SparkEntry.queries("mv_rewrite_joined")(spark, sf)
    val jp = scanPaths(joined())
    assert(jp.exists(_.contains("events_daily_")), s"join not routed: $jp")
    assert(!jp.exists(_.endsWith("events.parquet")), s"raw under join: $jp")
    val routed = joined().collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      joined().collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "join route moved an answer")

    // join on user_id — NOT bucket-constant (the summary doesn't carry
    // it): each bucket's rows match different dim rows, the rollup does
    // not commute, the route must refuse
    val userDim = Seq((1L, "vip"), (2L, "basic")).toDF("user_id", "tier")
    val byUser = T.events(spark, sf).join(userDim, "user_id")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("tier"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(byUser).exists(_.endsWith("events.parquet")),
      "user-keyed join must stay on the raw scan")

    // fact ⋈ fact self-join — ambiguous fact side: refuse
    val e1 = T.events(spark, sf).select(col("ts"), col("event_type"))
    val e2 = T.events(spark, sf).select(col("event_type").as("et2"))
    val selfJ = e1.join(e2, col("event_type") === col("et2"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(selfJ).exists(_.endsWith("events.parquet")),
      "fact-fact join must stay on the raw scan")

    // aggregate over a DIM-side measure — not decomposable over the
    // summary's partials: refuse
    val mDim = Seq(("click", 1.0), ("view", 2.0), ("purchase", 3.0),
      ("signup", 4.0), ("error", 5.0)).toDF("event_type", "weight")
    val dimAgg = T.events(spark, sf).join(mDim, "event_type")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("weight")).as("w"))
    assert(scanPaths(dimAgg).exists(_.endsWith("events.parquet")),
      "dim-measure aggregate must stay on the raw scan")

    // fact LEFT JOIN dim ROUTES (r9): NULL-extension is bucket-uniform
    // under a bucket-constant key, so aggregate-then-left-join commutes
    // — and the answers must match the raw plan bit-for-bit
    def leftJ() = T.events(spark, sf)
      .join(graft.queries.MatView.partialTypeDim(spark),
        Seq("event_type"), "left")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n"))
    val lp = scanPaths(leftJ())
    assert(lp.exists(_.contains("events_daily_")), s"left join not routed: $lp")
    val lRouted = leftJ().collect().map(_.toString).sorted
    val lRaw = graft.plans.SummaryRewrite.withBypass {
      leftJ().collect().map(_.toString).sorted
    }
    assert(lRouted.sameElements(lRaw), "left-join route changed answers")

    // dim LEFT JOIN fact — preserves dim-only rows no summary bucket
    // accounts for: refuse
    val dimLeft = graft.queries.MatView.typeDim(spark)
      .join(T.events(spark, sf), Seq("event_type"), "left")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(dimLeft).exists(_.endsWith("events.parquet")),
      "dim-left-join-fact must stay on the raw scan")

    // a LEFT join whose condition also references the fact's VALUE
    // column is not bucket-constant: refuse (the "filtering" left join)
    val ev = T.events(spark, sf)
    val dimT = graft.queries.MatView.typeDim(spark)
      .select(col("event_type").as("det"), col("category"))
    val leftValJ = ev.join(dimT,
        ev("event_type") === col("det") && ev("value") > lit(10.0), "left")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(leftValJ).exists(_.endsWith("events.parquet")),
      "value-conditioned left join must stay on the raw scan")

    // snowflake chain (fact ⋈ dim ⋈ dim) routes and matches raw
    def snow() = T.events(spark, sf)
      .join(graft.queries.MatView.typeDim(spark), "event_type")
      .join(graft.queries.MatView.categoryDim(spark), "category")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("org"))
      .agg(count(lit(1)).as("n"))
    val sp = scanPaths(snow())
    assert(sp.exists(_.contains("events_daily_")), s"snowflake not routed: $sp")
    val sRouted = snow().collect().map(_.toString).sorted
    val sRaw = graft.plans.SummaryRewrite.withBypass {
      snow().collect().map(_.toString).sorted
    }
    assert(sRouted.sameElements(sRaw), "snowflake route changed answers")

    // dim-side measure present but UNUSED + dim grouping: still routes
    // (the grammar only inspects referenced expressions)
    def catOnly() = T.events(spark, sf)
      .join(graft.queries.MatView.typeDim(spark), "event_type")
      .groupBy(col("category"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("s"))
    val cp = scanPaths(catOnly())
    assert(cp.exists(_.contains("events_daily_")), s"cat-only not routed: $cp")
    val cRouted = catOnly().collect().map(_.toString).sorted
    val cRaw = graft.plans.SummaryRewrite.withBypass {
      catOnly().collect().map(_.toString).sorted
    }
    assert(cRouted.sameElements(cRaw), "cat-only route moved an answer")
  }

  test("FILTER-clause aggregates route; value FILTER refuses") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    // the registered pivot gate reads the day summary only
    val piv = SparkEntry.queries("mv_rewrite_pivot")(spark, sf)
    val paths = scanPaths(piv)
    assert(paths.exists(_.contains("events_daily_")), s"not routed: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    // routed ≡ bypassed, including the count-FILTER coalesce-to-0 and
    // sum/max-FILTER NULL contracts
    def build() = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("count(1) FILTER (WHERE event_type = 'signup')").as("n"),
        expr("sum(cast(value as decimal(18,2))) FILTER " +
          "(WHERE event_type = 'signup')").as("s"),
        expr("max(value) FILTER (WHERE event_type = 'nope')").as("mx"))
    val routed = build().collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      build().collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "FILTER route moved an answer")
    // an hour-extractor FILTER narrows the candidate to the HOUR summary
    val hourFilt = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("count(1) FILTER (WHERE hour(ts) = 12)").as("n_noon"))
    val hp = scanPaths(hourFilt)
    assert(hp.exists(_.contains("events_hourly_")), s"not hour-routed: $hp")
    assert(!hp.exists(_.endsWith("events.parquet")))
    // a FILTER over the measure column cannot apply whole-bucket: refuse
    val valFilt = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("count(1) FILTER (WHERE value > 50)").as("n_big"))
    assert(scanPaths(valFilt).exists(_.endsWith("events.parquet")))
  }

  test("grouping sets route: rollup/cube re-aggregate the summary") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(18, 2)
    // the registered rollup gate reads the day summary only
    val paths = scanPaths(SparkEntry.queries("mv_rewrite_rollup")(spark, sf))
    assert(paths.exists(_.contains("events_daily_")), s"not routed: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    // cube + WHERE + grouping_id: routed ≡ bypassed, subtotals included
    def cubeQ() = T.events(spark, sf)
      .filter(col("ts") >= to_timestamp(lit("2024-01-08 00:00:00")))
      .cube(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D)).as("s"),
        grouping_id().as("gid"))
    val cp = scanPaths(cubeQ())
    assert(cp.exists(_.contains("events_daily_")), s"cube not routed: $cp")
    assert(!cp.exists(_.endsWith("events.parquet")))
    val routed = cubeQ().collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      cubeQ().collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "grouping-sets route moved an answer")
    // explicit GROUPING SETS (non-hierarchical — no detail set) routes
    // through the same Expand path and agrees with the bypassed plan
    graft.sql.Views.register(spark, sf)
    def gs() = spark.sql(
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
        |FROM events
        |GROUP BY GROUPING SETS ((date_trunc('day', ts)), (event_type))"""
        .stripMargin)
    val gp = scanPaths(gs())
    assert(gp.exists(_.contains("events_daily_")), s"GS not routed: $gp")
    assert(!gp.exists(_.endsWith("events.parquet")))
    val gsRouted = gs().collect().map(_.toString).sorted
    val gsRaw = graft.plans.SummaryRewrite.withBypass {
      gs().collect().map(_.toString).sorted
    }
    assert(gsRouted.sameElements(gsRaw), "GROUPING SETS route moved an answer")
    // a rollup including a column the summary lacks must stay raw
    val userRoll = T.events(spark, sf)
      .rollup(date_trunc("day", col("ts")), col("user_id"))
      .agg(count(lit(1)))
    assert(scanPaths(userRoll).exists(_.endsWith("events.parquet")))
    // minute-grain rollup: no stored grain answers it — stays raw
    val minRoll = T.events(spark, sf)
      .rollup(date_trunc("minute", col("ts")), col("event_type"))
      .agg(count(lit(1)))
    assert(scanPaths(minRoll).exists(_.endsWith("events.parquet")))
  }

  test("avg over the decimal spelling routes bit-equal; double avg stays raw") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(18, 2)
    def build() = T.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(avg(col("value").cast(D)).as("a"),
        expr("avg(cast(value as decimal(18,2))) FILTER " +
          "(WHERE event_type = 'click')").as("af"))
    val paths = scanPaths(build())
    assert(paths.exists(_.contains("events_daily_")), s"not routed: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")))
    // DECIMAL(22,6) output compared VERBATIM — the routed division must
    // reproduce Average's own quotient bit-for-bit, not within an ulp
    val routed = build().collect().map(_.toString).sorted
    val raw = graft.plans.SummaryRewrite.withBypass {
      build().collect().map(_.toString).sorted
    }
    assert(routed.sameElements(raw), "routed avg moved an answer")
  }

  test("mv_advisor_e2e: the advisor-chosen summary is what the plan scans") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("mv_advisor_e2e")(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains("events_daily_")),
      s"advisor-materialized summary not in scan set: $paths")
    assert(!paths.exists(_.endsWith("events.parquet")),
      s"raw events still scanned after advise->materialize->route: $paths")
  }
}

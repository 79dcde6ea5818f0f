package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Randomized parity net for the aggregate navigator: for a seeded set
  * of random (grain, aligned bound, type filter, aggregate subset)
  * combinations, the ROUTED plan must return exactly the rows the
  * BYPASSED raw plan does. The shape-specific MatViewSpec pins prove
  * the plan swapped; this spec proves the swap never moves an answer
  * across a much wider slice of the grammar than hand-picked cases
  * cover. */
class MatViewPropertySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val D = DecimalType(18, 2)

  test("random routable shapes: routed ≡ raw across the grammar") {
    assume(new java.io.File(sf).isDirectory)
    graft.queries.MatView.enableRouting(spark, sf)
    val rnd = new scala.util.Random(20260814L)
    val grains = Seq("day", "hour", "month", "week")
    val dayBounds = (1 to 28).map(d => f"2024-01-$d%02d 00:00:00")
    val hourBounds = for (d <- 1 to 28; h <- Seq(6, 12, 18))
      yield f"2024-01-$d%02d $h%02d:00:00"
    val types = Seq("click", "view", "purchase", "signup")

    for (i <- 0 until 25) {
      val grain = grains(rnd.nextInt(grains.size))
      val withType = rnd.nextBoolean()
      val loOpt = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(dayBounds(rnd.nextInt(dayBounds.size)))
        case 2 => Some(hourBounds(rnd.nextInt(hourBounds.size)))
      }
      val typeFilter =
        if (rnd.nextBoolean()) Some(types.take(1 + rnd.nextInt(3))) else None
      // drawn OUTSIDE build(): it runs twice (routed + bypassed) and
      // both runs must spell the identical query
      val filterAggType =
        if (rnd.nextBoolean()) Some(types(rnd.nextInt(types.size))) else None
      // 0 = flat groupBy, 1 = rollup, 2 = cube (the grouping-sets path)
      val shape = rnd.nextInt(3)

      def build(): DataFrame = {
        var df = graft.T.events(spark, sf)
        loOpt.foreach(lo =>
          df = df.filter(col("ts") >= to_timestamp(lit(lo))))
        typeFilter.foreach(ts =>
          df = df.filter(col("event_type").isin(ts: _*)))
        val groups =
          if (withType)
            Seq(date_trunc(grain, col("ts")).as("g"), col("event_type"))
          else Seq(date_trunc(grain, col("ts")).as("g"))
        // half the cases carry a FILTER-clause aggregate too (pivot
        // shape) — predicate over a pre-drawn type segment
        val aggs = Seq(count(lit(1)).as("n"),
          sum(col("value").cast(D)).cast("double").as("s"),
          min(col("value")).as("mn"),
          max(col("value")).as("mx"),
          avg(col("value").cast(D)).as("av")) ++
          filterAggType.toSeq.flatMap(t =>
            Seq(expr(s"count(1) FILTER (WHERE event_type = '$t')").as("nf"),
              expr("sum(cast(value as decimal(18,2))) FILTER " +
                s"(WHERE event_type = '$t')").cast("double").as("sf")))
        val grouped = shape match {
          case 0 => df.groupBy(groups: _*)
          case 1 => df.rollup(groups: _*)
          case _ => df.cube(groups: _*)
        }
        grouped.agg(aggs.head, aggs.tail: _*)
      }

      val routed = build().collect().map(_.toString).sorted
      val raw = graft.plans.SummaryRewrite.withBypass {
        build().collect().map(_.toString).sorted
      }
      assert(routed.sameElements(raw),
        s"case $i diverged: grain=$grain lo=$loOpt types=$typeFilter " +
          s"withType=$withType")
    }
  }
}

package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salting must be a pure plan rewrite: identical results to the unsalted
  * aggregation/join on skewed input (one key holding ~90% of rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (
    (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("warm", i.toLong)) ++
      Seq(("cold", 7L))
    ).toDF("k", "v")

  test("saltedAggregate ≡ plain groupBy on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(skewed, Seq("k"), buckets = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn"), max("v").as("pmx")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n"), max("pmx").as("mx")))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedAggregate spreads a hot key over multiple salt buckets") {
    val salted = skewed.withColumn("salt",
      pmod(hash(col("k"), col("v")), lit(8)))
    val hotBuckets = salted.filter(col("k") === "hot")
      .select("salt").distinct().count()
    assert(hotBuckets > 4, s"expected hot key spread over >4 of 8 buckets, got $hotBuckets")
  }

  // AQE's OptimizeSkewedJoin is the runtime complement to manual
  // salting: a hot key's oversized shuffle partition is split into
  // sub-reads paired with a replicated other side — no code change in
  // the query. Pin (a) that it FIRES on a hot-key SMJ when thresholds
  // flag the partition (the plan marks the join skew=true), and (b)
  // that splitting never changes results. At 100 TB this is the first
  // line of defense; ops.Skew is for skew AQE can't see (pre-shuffle
  // map-side explosion, aggregation hot keys under partial-agg).
  test("AQE splits the hot partition in a skewed SMJ (skew=true), results unchanged") {
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // ~99% of rows share key 0 → one shuffle partition dwarfs the rest
      val left = spark.range(0, 60000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 97)
          .as("k"),
        col("id").as("v"))
      val right = spark.range(0, 100).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // AQE finalizes the plan only on execution: collect FIRST, then
      // read the adaptive plan (same rule as the scan-metrics tests)
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew=true SMJ in:\n${plan.take(1500)}")
      val got = (rows.length,
        rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
      // ground truth with AQE off
      conf.set("spark.sql.adaptive.enabled", "false")
      val wantRows = left.join(right, "k").collect()
      val want = (wantRows.length,
        wantRows.map(_.getLong(1)).sum, wantRows.map(_.getLong(2)).sum)
      assert(got == want)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("saltedJoin ≡ plain inner join, including duplicate right keys") {
    val dim = Seq(("hot", "H"), ("warm", "W"), ("warm", "W2"), ("miss", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"), "inner")
      .orderBy("k", "v", "label").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .orderBy("k", "v", "label").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty && !plain.exists(_.getString(0) == "miss"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics pins for the SCD2 dimension build and the per-user
  * timeline assembly (beyond the DuckDB oracle's value equality):
  * the SCD2 output must PARTITION each user's observed time span —
  * half-open intervals that chain exactly (valid_to(n) = valid_from
  * (n+1)), exactly one open (is_current) interval per user, and no
  * two consecutive versions sharing a state (else the run-collapse
  * failed). The timeline's type_path must agree with the SCD2 state
  * sequence after collapsing repeats — two independently-spelled
  * queries over one history must tell one story. */
class Scd2TimelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def scd2 = SparkEntry.queries("events_scd2_state")(spark, sf)

  test("SCD2 intervals chain: valid_to = next valid_from, one current row per user") {
    assume(new java.io.File(sf).isDirectory)
    val d = scd2.cache()
    try {
      val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
      val chained = d
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .filter(col("next_from").isNotNull)
      assert(chained.filter(col("valid_to") =!= col("next_from")).count() == 0)
      // exactly one open interval per user, and it is the max version
      val cur = d.filter(col("is_current"))
        .groupBy(col("user_id")).count()
      assert(cur.filter(col("count") =!= 1).count() == 0)
      val lastV = d.groupBy(col("user_id")).agg(max(col("version")).as("mx"))
      val curV = d.filter(col("is_current"))
        .select(col("user_id"), col("version"))
      assert(curV.join(lastV, "user_id")
        .filter(col("version") =!= col("mx")).count() == 0)
    } finally d.unpersist()
  }

  test("no two consecutive versions share event_type (runs collapsed)") {
    assume(new java.io.File(sf).isDirectory)
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val d = scd2.withColumn("prev", lag(col("event_type"), 1).over(w))
    assert(d.filter(col("prev") === col("event_type")).count() == 0)
  }

  test("timeline type_path collapses to the SCD2 state sequence") {
    assume(new java.io.File(sf).isDirectory)
    val tl = SparkEntry.queries("events_user_timeline")(spark, sf)
      .select(col("user_id"), col("type_path"))
    // collapse repeats in the raw path: a>a>b>b>a -> a>b>a
    val collapsed = tl.select(col("user_id"),
      array_join(expr(
        """filter(split(type_path, '>'),
          |  (x, i) -> i = 0 OR x != split(type_path, '>')[i - 1])"""
          .stripMargin), ">").as("path"))
    val fromScd2 = scd2
      .groupBy(col("user_id"))
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(version, event_type))), s -> s.event_type)"),
        ">").as("path"))
    assert(collapsed.except(fromScd2).count() == 0 &&
      fromScd2.except(collapsed).count() == 0)
  }
}

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

  test("property: CDC apply ≡ a plain Scala fold of the op log") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // random logs: few keys (forces collisions), ops at distinct
    // (us, id) points so last-writer is well-defined
    val genLog: Gen[List[(Long, Long, Long, String, Double)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L)
        us <- Gen.choose(0L, 9L)
        d <- Gen.oneOf("D", "U", "U")
        v <- Gen.choose(0, 999)
      } yield (k, us, d, v / 100.0))
    } yield rows.zipWithIndex.map { case ((k, us, d, v), i) =>
      (k, us, i.toLong, d, v)
    }
    val prop = Prop.forAll(genLog) { rows =>
      val df = rows.toDF("user_id", "us", "event_id", "op", "value")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("event_id"), col("op"), col("value"))
      val got = graft.queries.Events.cdcApplyOn(df).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(3)))).toMap
      // reference fold: last op per key by (us, event_id); tombstone
      // removes the key; n_ops counts the whole log for the key
      val want = rows.groupBy(_._1).flatMap { case (k, ops) =>
        val last = ops.maxBy(o => (o._2, o._3))
        if (last._4 == "D") None
        else Some(k -> ((last._5, ops.size.toLong)))
      }
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
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

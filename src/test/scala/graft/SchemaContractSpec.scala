package graft

import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema-drift regression net for the table loaders (VERDICT r5 item 2).
  *
  * Round 5 lost 29 queries when the driver regenerated events.parquet with
  * `ts` as TIMESTAMP(MICROS) while `T.events` still assumed
  * TIMESTAMP(NANOS)-read-as-long. The engine-facing contract is: whatever
  * the physical encoding, `T.events(...)("ts")` is microsecond
  * TimestampType. This spec pins that contract against the LIVE testdata
  * (so the next regen trips a test before it trips the driver) and against
  * synthetic parquet files covering every branch the loader supports.
  */
class SchemaContractSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("live testdata: every table loads with its engine-facing schema") {
    assume(new java.io.File(sf).isDirectory)
    // Pins the CURRENT engine-facing types the 173 query builders compile
    // against (dates ship as pandas datetime64[us] → TIMESTAMP_NTZ; keys
    // mix int32/int64 — that mix is what the builders and oracles assume).
    // A driver regen that shifts any of these fails HERE with a named
    // column, not 29 queries deep in the correctness gate.
    val expect: Map[String, Map[String, DataType]] = Map(
      "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
                        "c_acctbal" -> DoubleType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
      "part"     -> Map("p_partkey" -> LongType, "p_size" -> IntegerType),
      "orders"   -> Map("o_orderkey" -> LongType, "o_totalprice" -> DoubleType,
                        "o_orderdate" -> TimestampNTZType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
                        "l_linenumber" -> IntegerType,
                        "l_shipdate" -> TimestampNTZType),
      "documents"  -> Map("doc_id" -> LongType, "text" -> StringType,
                          "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
                          "embedding" -> ArrayType(FloatType),
                          "label" -> IntegerType)
    )
    expect.foreach { case (table, cols) =>
      val schema = T(spark, sf, table).schema
      cols.foreach { case (c, dt) =>
        val got = schema(c).dataType
        assert(got == dt, s"$table.$c: expected $dt, testdata drifted to $got")
      }
    }
  }

  test("live testdata: events.ts surfaces as TimestampType and is readable") {
    assume(new java.io.File(sf).isDirectory)
    val ev = T.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts contract broken: ${ev.schema("ts").dataType}")
    // the r5 failure was an AnalysisException at first use, not at load —
    // so actually execute a projection over ts
    assert(ev.selectExpr("max(unix_micros(ts))").first().getLong(0) > 0L)
  }

  test("T.events adapts to long-nanos, timestamp_ntz, and timestamp encodings") {
    // All three physical encodings of the same instant must surface as
    // TimestampType with identical microseconds.
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    val dirLong = Files.createTempDirectory("graft-evt-long").toString
    val dirNtz = Files.createTempDirectory("graft-evt-ntz").toString
    val dirLtz = Files.createTempDirectory("graft-evt-ltz").toString
    import spark.implicits._
    // long branch: raw nanoseconds (what nanosAsLong produced for TIMESTAMP(NANOS))
    Seq((1L, micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dirLong/events.parquet")
    // ntz branch: what the regenerated testdata stores (isAdjustedToUTC=false)
    Seq((1L, micros)).toDF("event_id", "us")
      .selectExpr("event_id", "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts")
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")
    // ltz branch: plain TimestampType passes through
    Seq((1L, micros)).toDF("event_id", "us")
      .selectExpr("event_id", "timestamp_micros(us) AS ts")
      .write.mode("overwrite").parquet(s"$dirLtz/events.parquet")
    for (d <- Seq(dirLong, dirNtz, dirLtz)) {
      val ev = T.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"dir $d")
      assert(ev.selectExpr("unix_micros(ts)").first().getLong(0) == micros,
        s"dir $d: micros drifted")
    }
  }

  test("T.events rejects an unsupported ts encoding loudly") {
    val dir = Files.createTempDirectory("graft-evt-bad").toString
    import spark.implicits._
    Seq((1L, "2024-01-01")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](T.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}

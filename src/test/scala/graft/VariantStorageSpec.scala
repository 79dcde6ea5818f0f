package graft

import org.apache.spark.sql.functions._

/** VARIANT as a STORED column: parse once at ingest, persist the binary
  * variant encoding in parquet, navigate typed paths on read — the
  * parse-once/extract-many lifecycle behind `events_variant_stored`. */
class VariantStorageSpec extends SparkSpec {
  import spark.implicits._

  test("variant column round-trips through parquet and serves typed paths") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-variant").toString
    Seq("""{"k": 1}""", """{"k": 2, "extra": "x"}""").toDF("props")
      .withColumn("v", parse_json(col("props")))
      .select("v").write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .select(expr("variant_get(v, '$.k', 'int')").as("k"))
      .orderBy("k").collect().map(_.getInt(0)).toSeq
    assert(back == Seq(1, 2))
  }
}

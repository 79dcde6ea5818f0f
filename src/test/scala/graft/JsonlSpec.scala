package graft

import java.nio.file.{Files, Paths}

import graft.sources.Jsonl
import org.apache.spark.sql.types._

/** JSONL ingestion: explicit-schema read, corrupt-line capture (never
  * drop), and per-row schema-drift tolerance. */
class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(Paths.get(dir, "part-0.jsonl"), lines.mkString("\n"))
    dir
  }

  test("valid, drifted, and corrupt lines route without loss") {
    val path = write(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "missing lang field"}""",          // drift: absent → null
      """{"doc_id": 3, "text": "extra field", "lang": "de", "source": "web"}""", // drift: extra → ignored
      """{"doc_id": 4, "text": "truncated...""",                  // corrupt: unterminated
      """not json at all""")                                      // corrupt: garbage
    val (clean, rejected) = Jsonl.split(Jsonl.read(spark, path, schema))

    val rows = clean.orderBy("doc_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).isNullAt(2))                    // missing lang → null
    assert(rows(2).getString(2) == "de")           // extra field ignored, rest intact
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))

    val bad = rejected.collect().map(_.getString(0))
    assert(bad.length == 2)                        // never-drop: both captured whole
    assert(bad.exists(_.contains("truncated")))
    assert(bad.contains("not json at all"))
    spark.sharedState.cacheManager.clearCache()    // split persists; caller releases
  }

  test("schema is caller-supplied — no inference pass, types enforced") {
    val path = write("""{"doc_id": "not-a-number", "text": "t", "lang": "en"}""")
    val df = Jsonl.read(spark, path, schema)
    // a type mismatch is a corrupt record under an explicit schema,
    // not a silently re-inferred string column
    val (clean, rejected) = Jsonl.split(df)
    assert(clean.count() == 0 && rejected.count() == 1)
    assert(df.schema.fieldNames.contains(Jsonl.CorruptCol))
    spark.sharedState.cacheManager.clearCache()
  }

  test("read refuses a schema that predefines the corrupt column") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/tmp/none", StructType(Seq(
        StructField(Jsonl.CorruptCol, StringType))))
    }
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.etl.Ingest

/** Ingest semantics: encoding fallback + the two typed failure classes
  * (reference src/ingest.py:28-58, docs/documentation.md:68-84). */
class IngestSpec extends SparkSpec {

  private def tmpCsv(bytes: Array[Byte]): String = {
    val f = Files.createTempFile("graft-ingest", ".csv")
    Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("valid UTF-8 detected as UTF-8") {
    val p = tmpCsv("id,name\n1,café\n".getBytes(StandardCharsets.UTF_8))
    assert(Ingest.detectEncoding(spark, p) == StandardCharsets.UTF_8)
    val df = Ingest.csv(spark, p)
    assert(df.collect().map(_.getString(1)).toSeq == Seq("café"))
  }

  test("latin-1 bytes fall back to ISO-8859-1 and decode losslessly") {
    val p = tmpCsv("id,name\n1,café\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(Ingest.detectEncoding(spark, p) == StandardCharsets.ISO_8859_1)
    val df = Ingest.csv(spark, p)
    assert(df.collect().map(_.getString(1)).toSeq == Seq("café"))
  }

  test("missing path raises the RETRYABLE class before any Spark job") {
    intercept[Ingest.MissingInputException] {
      Ingest.csv(spark, "/nonexistent/nowhere.csv")
    }
  }

  test("explicit schema skips inference and types columns") {
    import org.apache.spark.sql.types._
    val p = tmpCsv("id,qty\n1,5\n2,bad\n".getBytes(StandardCharsets.UTF_8))
    val sch = StructType(Seq(StructField("id", IntegerType),
      StructField("qty", IntegerType)))
    val rows = Ingest.csv(spark, p, Some(sch)).collect()
    assert(rows(0).getInt(1) == 5)
    assert(rows(1).isNullAt(1)) // coerce-to-null, pandas-style
  }
}

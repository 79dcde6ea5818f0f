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

  test("latin-1 byte deep past the first 64 KiB still flips the whole file") {
    // a bounded-prefix probe would miss this — whole-input fidelity
    // (reference src/ingest.py:38-58 decodes the entire file)
    val header = "id,name\n".getBytes(StandardCharsets.UTF_8)
    val filler = ("1,aaaaaaaaaaaaaaaa\n" * 8192).getBytes(StandardCharsets.UTF_8)
    val tail = "2,café\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(filler.length > 128 * 1024)
    val p = tmpCsv(header ++ filler ++ tail)
    assert(Ingest.detectEncoding(spark, p) == StandardCharsets.ISO_8859_1)
    val names = Ingest.csv(spark, p).collect().map(_.getString(1))
    assert(names.last == "café")
  }

  test("latin-1 byte in the SECOND file of a directory flips the input") {
    val dir = Files.createTempDirectory("graft-ingest-dir")
    Files.write(dir.resolve("a_clean.csv"),
      "id,name\n1,plain\n".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b_latin.csv"),
      "id,name\n2,café\n".getBytes(StandardCharsets.ISO_8859_1))
    dir.toFile.deleteOnExit()
    assert(Ingest.detectEncoding(spark, dir.toString) ==
      StandardCharsets.ISO_8859_1)
    val names = Ingest.csv(spark, dir.toString).collect().map(_.getString(1))
    assert(names.toSet == Set("plain", "café"))
  }

  test("multi-byte UTF-8 sequence straddling the 64 KiB chunk boundary is fine") {
    // é = 0xC3 0xA9: place the first byte at chunk offset 65535 so the
    // incremental decoder must carry the partial sequence across chunks
    val pad = new Array[Byte](64 * 1024 - 1)
    java.util.Arrays.fill(pad, 'x'.toByte)
    val bytes = pad ++ "é after the boundary".getBytes(StandardCharsets.UTF_8)
    val in = new java.io.ByteArrayInputStream(bytes)
    assert(Ingest.isValidUtf8(in))
    // and a TRUNCATED sequence at EOF is malformed, not silently valid
    val truncated = pad ++ Array(0xC3.toByte)
    assert(!Ingest.isValidUtf8(new java.io.ByteArrayInputStream(truncated)))
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

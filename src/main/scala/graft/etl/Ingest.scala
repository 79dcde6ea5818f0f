package graft.etl

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion (reference src/ingest.py:11-58) re-expressed for Spark.
  *
  * The reference reads in 10k-row chunks purely to bound memory — Spark's
  * file-split parallel scan subsumes that, so no chunking knob survives.
  * What does survive:
  *  - fail-fast on a missing path with a RETRYABLE error class, distinct
  *    from the non-retryable "unreadable" class (reference
  *    src/ingest.py:28-30; two-exception design docs/documentation.md:68-81)
  *  - UTF-8 first, ISO-8859-1 fallback (reference src/ingest.py:38-58;
  *    latin-1 maps every byte so the fallback cannot fail,
  *    docs/documentation.md:84)
  *
  * Spark's CSV reader never throws on bad encoding — it substitutes
  * U+FFFD — so the fallback decision probes a bounded prefix of the file
  * with a STRICT UTF-8 decoder on the driver (the reference decodes the
  * whole file eagerly; a bounded probe is the 100 TB-safe equivalent:
  * O(64 KiB) driver work regardless of input size).
  */
object Ingest {

  /** Missing input — transient infra problem, safe to retry (the reference
    * exits "retryable", main.py:78-82). */
  final class MissingInputException(path: String)
      extends RuntimeException(s"input not found: $path")

  /** Unreadable/undecodable input — data problem, escalate, do not retry
    * (reference main.py:84-87). */
  final class UnreadableInputException(path: String, cause: Throwable)
      extends RuntimeException(s"input unreadable: $path", cause)

  private val ProbeBytes = 64 * 1024

  /** Decide the charset the way the reference does, on a bounded prefix:
    * strict-UTF-8 decode, fall back to ISO-8859-1 on any malformed byte.
    * A multi-byte sequence truncated by the probe boundary is tolerated
    * (MALFORMED only counts inside the window). */
  def detectEncoding(spark: SparkSession, path: String): Charset = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new MissingInputException(path)
    val status = fs.getFileStatus(p)
    val target =
      if (status.isDirectory) {
        val files = fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .sortBy(_.getName)
        if (files.isEmpty) return StandardCharsets.UTF_8
        files.head
      } else p
    val in = fs.open(target)
    try {
      val buf = new Array[Byte](ProbeBytes)
      val n = in.read(buf)
      if (n <= 0) return StandardCharsets.UTF_8
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bb = ByteBuffer.wrap(buf, 0, n)
      val out = java.nio.CharBuffer.allocate(ProbeBytes)
      val res = dec.decode(bb, out, false) // false: don't flag a trailing partial sequence
      if (res.isMalformed || res.isUnmappable) StandardCharsets.ISO_8859_1
      else StandardCharsets.UTF_8
    } catch {
      case e: java.io.IOException => throw new UnreadableInputException(path, e)
    } finally in.close()
  }

  /** Read a headered CSV with the reference's semantics. With an explicit
    * schema Spark skips inference (one pass, not two); without one it
    * infers like pandas did (reference src/ingest.py:40). */
  def csv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val charset = detectEncoding(spark, path)
    val base = spark.read
      .option("header", "true")
      .option("encoding", charset.name())
      .option("mode", "PERMISSIVE")
    try {
      val withSchema = schema.fold(base.option("inferSchema", "true"))(base.schema)
      withSchema.csv(path)
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") =>
        throw new MissingInputException(path)
    }
  }
}

package graft.etl

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.{ByteBuffer, CharBuffer}

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
  * U+FFFD — so the fallback decision runs a strict UTF-8 decode over the
  * WHOLE input first, exactly the reference's semantics (it decodes the
  * entire file and falls back on any UnicodeDecodeError): a non-UTF-8
  * byte anywhere — megabytes in, or in the last file of a directory —
  * flips the whole input to latin-1, never to silent U+FFFD mojibake.
  * Unlike the reference's driver-side eager decode, the check is
  * DISTRIBUTED (one streaming task per file, O(64 KiB) memory each, no
  * file ever materialized) and short-circuits on the first malformed
  * file, so it holds at 100 TB: cost is one extra read pass, the same
  * price the reference pays, spread over the cluster.
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

  private val ChunkBytes = 64 * 1024

  /** Streaming strict-UTF-8 validity check: incremental CharsetDecoder
    * over fixed-size chunks (partial multi-byte sequences carry across
    * chunk boundaries via compact()), O(ChunkBytes) memory for any file
    * size. Java's strict decoder rejects the same inputs Python's does
    * (overlongs, lone surrogates, truncated tails) — the fidelity the
    * fallback contract needs. */
  private[graft] def isValidUtf8(in: java.io.InputStream): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val raw = new Array[Byte](ChunkBytes)
    val bb = ByteBuffer.allocate(ChunkBytes + 8)
    val cb = CharBuffer.allocate(ChunkBytes + 8)
    var eof = false
    while (!eof) {
      val n = in.read(raw)
      if (n < 0) eof = true else bb.put(raw, 0, n)
      bb.flip()
      val res = dec.decode(bb, cb, eof)
      if (res.isMalformed || res.isUnmappable) return false
      cb.clear()
      bb.compact()
    }
    !dec.flush(cb).isError
  }

  /** Charset decisions already paid for, keyed by (path, input
    * fingerprint). The fingerprint — file count + max mtime + total
    * length — changes whenever the data under the path is regenerated,
    * so a re-used path re-validates instead of serving a stale verdict;
    * an unchanged input skips the full distributed decode pass that
    * repeated csv() calls were paying per invocation. */
  private val charsetMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Charset]()

  /** Cheap driver-side input fingerprint: (file count, max mtime, total
    * length) over the files under `path` — one FS listing, no data read. */
  private def inputFingerprint(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val files = fs.getFileStatus(p) match {
      case st if st.isDirectory => fs.listStatus(p).filter(_.isFile)
      case st => Array(st)
    }
    val maxM = if (files.isEmpty) 0L else files.map(_.getModificationTime).max
    s"${files.length}:$maxM:${files.map(_.getLen).sum}"
  }

  /** Decide the charset the way the reference does — strict-UTF-8 decode
    * of the ENTIRE input, ISO-8859-1 on any malformed byte in any file —
    * but distributed: one constant-memory streaming task per file, job
    * short-circuited by take(1) on the first offender. Memoized per
    * (path, input fingerprint), so steady-state re-reads of unchanged
    * data pay one FS listing, not a second full decode pass. */
  def detectEncoding(spark: SparkSession, path: String): Charset = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new MissingInputException(path)
    try {
      if (fs.getFileStatus(p).isDirectory &&
          !fs.listStatus(p).exists(_.isFile))
        return StandardCharsets.UTF_8
      val key = (path, inputFingerprint(fs, p))
      val memo = charsetMemo.get(key)
      if (memo != null) return memo
      val anyMalformed = spark.sparkContext.binaryFiles(path)
        .map { case (_, pds) =>
          val in = pds.open()
          try isValidUtf8(in) finally in.close()
        }
        .filter(valid => !valid)
        .take(1).nonEmpty
      val cs = if (anyMalformed) StandardCharsets.ISO_8859_1
        else StandardCharsets.UTF_8
      charsetMemo.put(key, cs)
      cs
    } catch {
      case e: java.io.IOException => throw new UnreadableInputException(path, e)
      case e: org.apache.spark.SparkException =>
        throw new UnreadableInputException(path, e)
    }
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

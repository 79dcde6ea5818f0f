package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Per-file NDV (number-of-distinct-values) sketches riding with the
  * manifest — the lake's column statistics layer (what Iceberg ships
  * as theta-sketch puffin files; here the KMV bottom-k of
  * [[graft.functions.KmvBottomK]], which has the property the whole
  * design leans on: bottom-k of a union IS the bottom-k of the
  * per-part bottom-k's, EXACTLY — so the table-level estimate merged
  * from per-file sidecars is bit-identical to one computed over the
  * raw rows, and an oracle can replay it from the raw table).
  *
  * Why it's first-class at 100 TB: distinct-cardinality is the input
  * to every planning decision that matters — broadcast-or-shuffle,
  * agg strategy, join order — and computing it with a scan defeats
  * the point. With k·#files hashes in a sidecar (metadata scale),
  * `ANALYZE` is incremental: a new commit sketches ONLY its new files
  * (O(delta)), untouched files' sketches are reused by path, and the
  * table estimate is a metadata-only merge. Compaction rewrites file
  * paths, so its output files get fresh sketches; time travel works
  * because sketches key on the immutable file path and sidecars are
  * written per list version.
  *
  * Caveat (documented, not hidden): sketches are file-grain, so under
  * merge-on-read delete vectors the merged estimate counts rows a
  * vector subtracts — an upper bound until [[ManifestLake
  * .compactDeletes]] folds the vectors in. Same contract as Iceberg's.
  *
  * Path domains: `_metadata.file_path` is an RFC-encoded URI while
  * manifest entries carry the raw `Path.toString` (see the
  * [[ManifestLake]] classification note) — the sidecar keys on the
  * DECODED raw path component, each side through its own decoder.
  */
object NdvStats {

  private def statsDir(tablePath: String) = s"$tablePath/_stats"

  private def sidecar(tablePath: String, column: String, v: Int): String =
    s"${statsDir(tablePath)}/ndv_${column}_v$v.parquet"

  /** Raw path component of a recorded `_metadata.file_path` URI. */
  private def metaKey(p: String): String =
    try new java.net.URI(p).getPath
    catch { case _: java.net.URISyntaxException => new Path(p).toUri.getPath }

  /** Raw path component of a manifest entry path. */
  private def entryKey(p: String): String = new Path(p).toUri.getPath

  private val sidecarSchema = StructType(Seq(
    StructField("file_key", StringType, nullable = false),
    StructField("ks", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** Ensure per-file KMV sketches exist for every data file of
    * `version` (default head): reuse any prior sidecar's rows by file
    * path, sketch only the missing files (O(delta) after a commit),
    * persist as this version's sidecar. Returns (file_key, ks).
    * Driver-side state is k·#files hashes — metadata scale, the same
    * class as the manifest lists themselves. */
  def ensure(spark: SparkSession, tablePath: String, column: String,
      k: Int, version: Int = -1): DataFrame = {
    graft.functions.VecExprs.register(spark)
    val v = if (version >= 0) version
      else Manifest.currentListVersion(spark, tablePath)
    require(v >= 0, s"no committed list versions at $tablePath")
    val out = new Path(sidecar(tablePath, column, v))
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(out, "_SUCCESS")))
      return spark.read.parquet(out.toString)
    val files = Manifest.readAll(spark, tablePath, v)
      .filterNot(_.path.contains("/deletes/")).map(_.path)
    val fileKeys = files.map(entryKey).toSet
    // newest prior sidecar for this column, any version: sketches key
    // on the immutable file path, so reuse is safe across versions
    val prior: Seq[(String, Seq[String])] =
      if (!fs.exists(new Path(statsDir(tablePath)))) Seq.empty
      else fs.listStatus(new Path(statsDir(tablePath)))
        .map(_.getPath).filter(_.getName.startsWith(s"ndv_${column}_v"))
        .sortBy(p => p.getName.stripPrefix(s"ndv_${column}_v")
          .stripSuffix(".parquet").toInt)
        .lastOption.map { p =>
          spark.read.parquet(p.toString).collect().toSeq
            .map(r => (r.getString(0), r.getSeq[String](1)))
        }.getOrElse(Seq.empty)
    val known = prior.map(_._1).toSet
    val missing = files.filter(p => !known.contains(entryKey(p)))
    val fresh: Seq[(String, Seq[String])] =
      if (missing.isEmpty) Seq.empty
      else spark.read.parquet(missing: _*)
        .select(col(column), col("_metadata.file_path").as("mfp"))
        .groupBy(col("mfp"))
        .agg(expr(s"kmv_bottomk(md5(cast($column AS string)), $k)").as("ks"))
        .collect().toSeq
        .map(r => (metaKey(r.getString(0)), r.getSeq[String](1)))
    val rows = (prior.filter(e => fileKeys.contains(e._1)) ++ fresh)
      .sortBy(_._1)
      .map { case (f, ks) => Row(f, ks) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), sidecarSchema)
      .write.mode("overwrite").parquet(out.toString)
    spark.read.parquet(out.toString)
  }

  /** The table-level bottom-k merged from the per-file sidecars —
    * metadata-only (k·#files hashes in, k out). Exactly equal to the
    * bottom-k computed over the raw rows (KMV mergeability). */
  def mergedSketch(spark: SparkSession, tablePath: String, column: String,
      k: Int, version: Int = -1): DataFrame = {
    graft.functions.VecExprs.register(spark)
    ensure(spark, tablePath, column, k, version)
      .select(explode(col("ks")).as("h"))
      .agg(expr(s"kmv_bottomk(h, $k)").as("ks"))
  }
}

package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
  StringType, StructField, StructType}

/** Per-file equi-depth HISTOGRAM sidecars riding with the manifest —
  * the distribution-aware sibling of [[NdvStats]] (cardinality) and
  * [[HotKeyStats]] (heavy hitters), and the input that lets the
  * selectivity estimator interpolate real MASS instead of assuming a
  * uniform span (a skewed range predicate under the uniform model is
  * mis-costed by orders of magnitude — VERDICT r10 #3).
  *
  * Economics, same as the sibling sidecars: each data file is profiled
  * ONCE (an exact per-file quantile pass — file-grain, embarrassingly
  * parallel), reused by immutable file path across commits, so ANALYZE
  * is O(delta) per commit and the table-level histogram is a
  * metadata-only merge of #files × (buckets+1) doubles. Quantile
  * sketches don't merge exactly across parts, but piecewise-uniform
  * CDFs do: each file's equi-depth bounds define a CDF exact at its own
  * boundaries, the row-count-weighted mixture is the table CDF (exact
  * wherever any file has a boundary, linearly interpolated between),
  * and the merged equi-depth bounds are read off its inverse. The
  * approximation lives only WITHIN a file's bucket — 1/buckets of one
  * file's mass — not across files, so precision improves as files grow
  * in number, which is the direction 100 TB pushes.
  */
object HistStats {

  private def statsDir(tablePath: String) = s"$tablePath/_stats"

  private def sidecar(tablePath: String, column: String, v: Int): String =
    s"${statsDir(tablePath)}/hist_${column}_v$v.parquet"

  private def metaKey(p: String): String =
    try new java.net.URI(p).getPath
    catch { case _: java.net.URISyntaxException => new Path(p).toUri.getPath }

  private def entryKey(p: String): String = new Path(p).toUri.getPath

  private val sidecarSchema = StructType(Seq(
    StructField("file_key", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("bounds", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Ensure per-file equi-depth bounds exist for every data file of
    * `version` (default: current list head): reuse prior sidecar rows
    * by file path, profile only the missing files, persist as this
    * version's sidecar. Each row is (file_key, n_rows, bounds) with
    * bounds = the file's exact `percentile(column, 0/B … B/B)` —
    * B+1 doubles bracketing B equal-mass buckets. */
  def ensure(spark: SparkSession, tablePath: String, column: String,
      buckets: Int = 32, version: Int = -1): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
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
    val prior: Seq[(String, Long, Seq[Double])] =
      if (!fs.exists(new Path(statsDir(tablePath)))) Seq.empty
      else fs.listStatus(new Path(statsDir(tablePath)))
        .map(_.getPath).filter(_.getName.startsWith(s"hist_${column}_v"))
        .sortBy(p => p.getName.stripPrefix(s"hist_${column}_v")
          .stripSuffix(".parquet").toInt)
        .lastOption.map { p =>
          spark.read.parquet(p.toString).collect().toSeq
            .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2)))
        }.getOrElse(Seq.empty)
    val known = prior.map(_._1).toSet
    val missing = files.filter(p => !known.contains(entryKey(p)))
    val qs = (0 to buckets).map(i => i.toDouble / buckets)
      .mkString("array(", ",", ")")
    val fresh: Seq[(String, Long, Seq[Double])] =
      if (missing.isEmpty) Seq.empty
      else spark.read.parquet(missing: _*)
        .select(col(column), col("_metadata.file_path").as("mfp"))
        .filter(col(column).isNotNull)
        .groupBy(col("mfp"))
        .agg(count(lit(1)).as("n"),
          expr(s"percentile($column, $qs)").as("bounds"))
        .collect().toSeq
        .map(r => (metaKey(r.getString(0)), r.getLong(1), r.getSeq[Double](2)))
    val rows = (prior.filter(e => fileKeys.contains(e._1)) ++ fresh)
      .sortBy(_._1)
      .map { case (f, n, bs) => Row(f, n, bs) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), sidecarSchema)
      .write.mode("overwrite").parquet(out.toString)
    spark.read.parquet(out.toString)
  }

  /** The table-level CDF merged from the per-file sidecars —
    * metadata-only. Returned as (xs, cum): strictly increasing support
    * points with the cumulative ROW COUNT ≤ x at each, piecewise-linear
    * between (the row-count-weighted mixture of the per-file
    * piecewise-uniform CDFs, evaluated at the union of all boundary
    * points — exact there by construction). */
  def mergedCdf(spark: SparkSession, tablePath: String, column: String,
      buckets: Int = 32, version: Int = -1): (Array[Double], Array[Double]) = {
    val side = ensure(spark, tablePath, column, buckets, version)
      .collect().toSeq
      .map(r => (r.getLong(1), r.getSeq[Double](2).toArray))
      .filter(_._1 > 0L)
    require(side.nonEmpty, s"$tablePath.$column: no profiled rows")
    // one file's CDF at x: full buckets below + linear fraction within
    def fileCdf(n: Long, bs: Array[Double])(x: Double): Double = {
      if (x < bs.head) return 0.0
      if (x >= bs.last) return n.toDouble
      val b = bs.length - 1
      var k = java.util.Arrays.binarySearch(bs, x)
      if (k < 0) k = -k - 2
      // step over zero-width buckets (a heavy value repeats bounds):
      // all their mass sits AT the boundary, which x >= covers
      while (k + 1 < bs.length && bs(k + 1) <= x) k += 1
      val frac =
        if (bs(k + 1) == bs(k)) 1.0
        else (x - bs(k)) / (bs(k + 1) - bs(k))
      n.toDouble * (k + frac) / b
    }
    val xs = side.flatMap(_._2).distinct.sorted.toArray
    val cum = xs.map(x => side.map { case (n, bs) => fileCdf(n, bs)(x) }.sum)
    (xs, cum)
  }
}

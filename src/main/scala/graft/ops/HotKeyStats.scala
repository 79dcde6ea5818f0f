package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import graft.functions.SpaceSavingBuffer

/** Per-file heavy-hitter sketches riding with the manifest — the
  * statistics layer behind SKEW decisions, the sibling of
  * [[NdvStats]] (NDV answers "how selective is this key"; this answers
  * "which exact values dominate it"). Each data file carries a bounded
  * SpaceSaving summary of a column ([[graft.functions.SpaceSavingTopK]]
  * — Metwally et al., ICDT'05) in a per-version sidecar; the table
  * view merges the per-file summaries with the mergeable-summaries
  * compensation (Agarwal et al., PODS'12), so both guarantees survive
  * the metadata-only merge:
  *
  *  - any value with true frequency > N/m is IN the merged summary;
  *  - for every reported value, cnt − err ≤ true frequency ≤ cnt.
  *
  * `cnt − err` is the guaranteed LOWER bound — the number a planner
  * can act on without false positives: a key whose lower bound clears
  * θ·N really does own ≥ θ of the table, so salting it is never wasted
  * work ([[Skew.splitSaltedJoin]] consumes exactly this list). Under
  * capacity (distinct ≤ m in every file and in the merge) the summary
  * is EXACT (err = 0) — which is what lets the `lake_hotkey_salted`
  * gate's DuckDB oracle check the decision against a plain GROUP BY.
  *
  * The lifecycle is [[NdvStats]]'s, O(delta) by construction: a commit
  * sketches only files the newest prior sidecar has never seen
  * (sketches key on the immutable file path and are reused verbatim),
  * and the merged decision reads k·#files counters — metadata scale,
  * never the table.
  */
object HotKeyStats {

  private def statsDir(tablePath: String) = s"$tablePath/_stats"

  private def sidecar(tablePath: String, column: String, v: Int): String =
    s"${statsDir(tablePath)}/hot_${column}_v$v.parquet"

  private def metaKey(p: String): String =
    try new java.net.URI(p).getPath
    catch { case _: java.net.URISyntaxException => new Path(p).toUri.getPath }

  private def entryKey(p: String): String = new Path(p).toUri.getPath

  private val entryType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  private val sidecarSchema = StructType(Seq(
    StructField("file_key", StringType, nullable = false),
    StructField("entries", ArrayType(entryType, containsNull = false),
      nullable = false)))

  /** Ensure per-file SpaceSaving summaries (capacity `m`) exist for
    * every data file of `version` (default head): reuse prior sidecar
    * rows by immutable file path, sketch only missing files, persist
    * as this version's sidecar. Returns (file_key, entries). */
  def ensure(spark: SparkSession, tablePath: String, column: String,
      m: Int, version: Int = -1): DataFrame = {
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
    val prior: Seq[(String, Seq[Row])] =
      if (!fs.exists(new Path(statsDir(tablePath)))) Seq.empty
      else fs.listStatus(new Path(statsDir(tablePath)))
        .map(_.getPath).filter(_.getName.startsWith(s"hot_${column}_v"))
        .sortBy(p => p.getName.stripPrefix(s"hot_${column}_v")
          .stripSuffix(".parquet").toInt)
        .lastOption.map { p =>
          spark.read.parquet(p.toString).collect().toSeq
            .map(r => (r.getString(0), r.getSeq[Row](1)))
        }.getOrElse(Seq.empty)
    val known = prior.map(_._1).toSet
    val missing = files.filter(p => !known.contains(entryKey(p)))
    val fresh: Seq[(String, Seq[Row])] =
      if (missing.isEmpty) Seq.empty
      else spark.read.parquet(missing: _*)
        .select(col(column), col("_metadata.file_path").as("mfp"))
        .groupBy(col("mfp"))
        .agg(expr(s"space_saving(cast($column AS string), $m)").as("entries"))
        .collect().toSeq
        .map(r => (metaKey(r.getString(0)), r.getSeq[Row](1)))
    val rows = (prior.filter(e => fileKeys.contains(e._1)) ++ fresh)
      .sortBy(_._1)
      .map { case (f, es) => Row(f, es) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), sidecarSchema)
      .write.mode("overwrite").parquet(out.toString)
    spark.read.parquet(out.toString)
  }

  /** The table-level summary merged from the per-file sidecars —
    * metadata-only (m·#files counters in, m out), per-file buffers
    * combined in sorted file order with the PODS'12 min-offset
    * compensation. Returns (value, cnt, err) by cnt desc, value asc. */
  def mergedHot(spark: SparkSession, tablePath: String, column: String,
      m: Int, version: Int = -1): Seq[(String, Long, Long)] = {
    val per = ensure(spark, tablePath, column, m, version)
      .collect().sortBy(_.getString(0))
    val total = new SpaceSavingBuffer(m)
    per.foreach { r =>
      val buf = new SpaceSavingBuffer(m)
      r.getSeq[Row](1).foreach { e =>
        val (v, c, err) = (e.getString(0), e.getLong(1), e.getLong(2))
        buf.counts.put(v, Array(c, err))
        buf.byCount.put((c, v), ())
      }
      total.mergeIn(buf)
    }
    import scala.jdk.CollectionConverters._
    total.counts.asScala.toSeq
      .map { case (v, ce) => (v, ce(0), ce(1)) }
      .sortBy { case (v, c, _) => (-c, v) }
  }

  /** The salting decision: values whose GUARANTEED lower bound
    * (cnt − err) clears `minShare` of the manifest's row accounting.
    * No false positives by the overestimate invariant — a returned key
    * really owns ≥ minShare of the table. */
  def hotKeys(spark: SparkSession, tablePath: String, column: String,
      m: Int, minShare: Double, version: Int = -1): Seq[String] = {
    val v = if (version >= 0) version
      else Manifest.currentListVersion(spark, tablePath)
    val totalRows = Manifest.readAll(spark, tablePath, v)
      .filterNot(_.path.contains("/deletes/")).map(_.rows).sum
    mergedHot(spark, tablePath, column, m, v)
      .filter { case (_, c, e) => (c - e).toDouble >= minShare * totalRows }
      .map(_._1)
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat,
  CatalogStatistics}

/** Publish manifest-derived statistics as CATALOG statistics — the
  * bridge from the lake's metadata layer to VANILLA Spark planning
  * (VERDICT r10 #7).
  *
  * The graft CBO rules ([[graft.plans.StatsBroadcast]] /
  * [[graft.plans.StatsJoinReorder]]) consume the manifest numbers
  * through their own registries, which only helps plans that pass
  * through the graft optimizer batch. But Spark's OWN planner reads
  * `CatalogTable.stats`: join selection compares `sizeInBytes` against
  * the broadcast threshold, and with CBO enabled the row count + column
  * NDV/min/max drive `FilterEstimation`/`JoinEstimation` — the same
  * numbers ANALYZE TABLE would compute with a full scan. This object
  * injects them from the manifest + sidecars instead: row and byte
  * totals are already in the manifest entries (zero reads), per-column
  * min/max is one footer pass, NDV merges the per-file KMV sidecars
  * ([[NdvStats]], O(delta) maintained). After `publish`, a plain
  * `spark.table(name)` join broadcasts or reorders from the injected
  * stats with NO graft rule in the loop — exactly what a vanilla
  * consumer (a BI tool, a notebook) sees at 100 TB, where ANALYZE's
  * scan is the cost being dodged.
  */
object CatalogStats {

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Live file entries at the current head — two-level list when the
    * table has one, else the single-level chain. */
  private def liveEntries(spark: SparkSession,
      tablePath: String): Seq[Manifest.FileEntry] = {
    val lv = Manifest.currentListVersion(spark, tablePath)
    if (lv >= 0) Manifest.readAll(spark, tablePath, lv)
    else {
      val v = Manifest.currentVersion(spark, tablePath)
      require(v >= 0, s"no committed manifest versions at $tablePath")
      Manifest.read(spark, tablePath, v)
    }
  }

  /** Register `tableName` in the session catalog as an external parquet
    * table over `tablePath` (if absent) and publish manifest-derived
    * [[CatalogStatistics]]: total bytes + row count from the manifest
    * entries, and for each int64 column in `columns` a
    * [[CatalogColumnStat]] with the KMV NDV estimate and the footer
    * min/max. Metadata-only throughout (footers, sidecars — no data
    * pages). Returns the injected statistics. */
  def publish(spark: SparkSession, tableName: String, tablePath: String,
      columns: Seq[String] = Nil, k: Int = 256): CatalogStatistics = {
    val entries = liveEntries(spark, tablePath)
        .filterNot(_.path.contains("/deletes/"))
    require(entries.nonEmpty, s"empty manifest at $tablePath")
    val rows = entries.map(_.rows).sum
    val bytes = entries.map(_.bytes).sum
    if (!spark.catalog.tableExists(tableName))
      spark.catalog.createTable(tableName, tablePath)
    val colStats: Map[String, CatalogColumnStat] = columns.map { c =>
      val st = Manifest.collectStats(spark, entries.map(_.path), c)
      require(st.forall(e =>
        !(e.minKey == Long.MinValue && e.maxKey == Long.MaxValue)),
        s"$tablePath.$c: some files carry no footer stats")
      // same KMV estimator as the reorderer's registerNdv / the
      // lake_ndv_manifest gate: k−1 over the k-th smallest hash
      val ks = NdvStats.mergedSketch(spark, tablePath, c, k)
        .collect()(0).getSeq[String](0)
      val ndv =
        if (ks.size < k) ks.size.toLong
        else ((k - 1).toDouble * 1152921504606846976.0 /
          java.lang.Long.parseLong(ks.max.substring(0, 15), 16)).toLong
      c -> CatalogColumnStat(
        distinctCount = Some(BigInt(ndv)),
        min = Some(st.map(_.minKey).min.toString),
        max = Some(st.map(_.maxKey).max.toString),
        nullCount = Some(BigInt(0)),
        avgLen = Some(8L),
        maxLen = Some(8L))
    }.toMap
    val stats = CatalogStatistics(BigInt(bytes), Some(BigInt(rows)), colStats)
    classic(spark).sessionState.catalog
      .alterTableStats(TableIdentifier(tableName), Some(stats))
    // drop any cached relation resolved before the stats landed
    spark.catalog.refreshTable(tableName)
    stats
  }
}

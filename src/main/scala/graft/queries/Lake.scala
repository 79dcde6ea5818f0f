package graft.queries

import graft.{Ctx, QueryDef, T}
import graft.ops.{CopyOnWrite, DenseIds, HotKeyStats, IncrementalDedup, Manifest, ManifestLake, NdvStats, Skew, ZOrder}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lake/storage utilities that round out the engine's table-format and
  * id-management surface:
  *
  *  - `scan_orc_mirror` — the same query answers from an ORC copy of a
  *    parquet table: a write-once, fingerprint-memoized format mirror
  *    (the multi-format lake reality — Spark's scan stack treats ORC
  *    and Parquet as interchangeable columnar sources, with the same
  *    predicate pushdown and column pruning).
  *  - `ids_dense_assign` — globally dense 0-based ids + contiguous
  *    shard assignment without a single-partition window
  *    ([[graft.ops.DenseIds]] has the two-pass offset argument).
  */
object Lake {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  // -------------------------------------------------------------------
  // scan_orc_mirror — ORC format mirror, then a selective aggregate
  // over it. The mirror is written ONCE per source fingerprint (same
  // memoization as every graft mirror: regenerated inputs land at a
  // fresh path and rebuild; a _SUCCESS-marked mirror is reused). The
  // aggregate must match the oracle running on the ORIGINAL parquet —
  // proving the format hop is lossless for the engine's type set
  // (int64, double, string, timestamp).
  //
  // Scale note: the ORC scan gets the same treatment as parquet —
  // `PushedFilters` carries the o_orderstatus predicate to the reader
  // and only the 3 referenced columns are materialized. At 100 TB a
  // format mirror is a compaction-time decision, not a query-time one;
  // queries are layout-agnostic by construction.
  private def orcMirror(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_orc_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-orc/$tag"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      T.orders(spark, dir).write.mode("overwrite").orc(path)
    }
    path
  }

  private def orcScan(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    spark.read.orc(orcMirror(spark, dir))
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val orcScanSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // ids_dense_assign — stamp every document with a dense, contiguous,
  // 0-based id in doc_id order, then derive its training-shard number
  // (64 docs per shard, contiguous — the "pack N examples per output
  // file" addressing a dataloader expects). ROW_NUMBER() OVER (ORDER BY
  // doc_id) is the spec but a single-partition window physically; the
  // implementation is the two-pass partition-offset scheme in
  // [[DenseIds]], whose driver state is #partitions longs, not rows.
  private val ShardSize = 64

  private def idsAssign(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    DenseIds.assign(
      T.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      "doc_id", "dense_id")
      .withColumn("shard", expr(s"dense_id div $ShardSize"))
      .select(col("doc_id"), col("dense_id"), col("shard"))
      .orderBy(col("dense_id"))
  }

  private val idsAssignSql =
    s"""SELECT doc_id,
      |  ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS dense_id,
      |  CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // $ShardSize AS BIGINT) AS shard
      |FROM documents
      |ORDER BY dense_id""".stripMargin

  // -------------------------------------------------------------------
  // scan_zorder_cells — Z-order (Morton curve) layout serving a 2-D box
  // query: orders mirrored into 16 grid-cell partition directories
  // (cell = 2 scaled bits per dimension, Morton-coded) and
  // Morton-sorted within each file. The query decomposes its box
  // [custkey 101..400] x [orderdate 1996] into covering cells
  // DRIVER-SIDE from table min/max stats (z-range decomposition — pure
  // arithmetic, no data read) and plans `zcell IN (...)`, so partition
  // pruning skips the non-intersecting directories at planning time;
  // the residual predicate keeps the answer exact regardless of how
  // coarse the covering is. A linear sort on either column can prune
  // for that column only — the curve serves both.
  private val zMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, Long, Long)]

  private val Day0 = java.time.LocalDate.of(1970, 1, 1)
  private def days(d: java.time.LocalDate): Long = d.toEpochDay

  /** table min/max of the two z dimensions — the stats a catalog would
    * carry; memoized per SOURCE FINGERPRINT (not per dir — a
    * regenerated source must refresh the bounds along with the mirror
    * itself, or the rebuilt mirror would grid rows against stale
    * min/max and the covering enumeration would miss cells). One
    * O(1)-row aggregate on a miss. */
  private def zStats(spark: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    zMemo.computeIfAbsent(s"${dir}_$fp", _ => {
      val r = T.orders(spark, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit(Day0.toString).cast("date"))
            .cast("long").as("d"))
        .agg(min("o_custkey"), max("o_custkey"), min("d"), max("d")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    })
  }

  private def zMirror(spark: SparkSession, dir: String): String = {
    val (xLo, xHi, yLo, yHi) = zStats(spark, dir)
    graft.ops.PartitionedLayout.ensureDerived(
      spark, s"$dir/orders.parquet", s"orders_zorder_$dir", "zcell") {
      ZOrder.withZ(
        T.orders(spark, dir).withColumn("o_days",
          datediff(col("o_orderdate").cast("date"), lit(Day0.toString).cast("date"))
            .cast("long")),
        col("o_custkey"), col("o_days"), xLo, xHi, yLo, yHi)
        .repartition(col("zcell"))
        .sortWithinPartitions("z32")
    }
  }

  private def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val (xLo, xHi, yLo, yHi) = zStats(spark, dir)
    val (x1, x2) = (101L, 400L)
    val (y1, y2) = (days(java.time.LocalDate.of(1996, 1, 1)),
      days(java.time.LocalDate.of(1996, 12, 31)))
    val cells = ZOrder.coveringCells(x1, x2, xLo, xHi, y1, y2, yLo, yHi)
    spark.read.parquet(zMirror(spark, dir))
      .filter(col("zcell").isin(cells: _*)) // planning-time dir pruning
      .filter(col("o_custkey").between(x1, x2) &&
        col("o_days").between(y1, y2)) // exact residual
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val zorderScanSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_custkey BETWEEN 101 AND 400
      |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_merge_upsert — copy-on-write MERGE over a partitioned orders
  // table: a delta of updates (urgent orders with key % 97 = 0 get a
  // 1000.00 price adjustment) and inserts (key % 499 = 0 re-keyed to
  // 20M+key) lands entirely in the '1-URGENT' partition, so the merge
  // rewrites exactly that directory and leaves the other four
  // partitions byte-identical (LakeCowSpec pins the file listing).
  // The merged table is memoized per source fingerprint behind a
  // marker file; the query aggregates the merged result and the oracle
  // replays the merge relationally (base minus matched keys, union
  // delta) on the original table.
  private def mergedOrdersPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_cow_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-cow/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_MERGED")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      T.orders(spark, dir).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(path)
      CopyOnWrite.merge(spark, path, "o_orderpriority", "o_orderkey",
        mergeDelta(spark, dir))
      fs.create(marker, true).close()
    }
    path
  }

  /** updates ∪ inserts, all in the '1-URGENT' partition. */
  private def mergeDelta(spark: SparkSession, dir: String): DataFrame = {
    val urgent = T.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    val updates = urgent.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
    val inserts = urgent.filter(col("o_orderkey") % 499 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(20000000L))
    updates.unionByName(inserts)
  }

  private def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    CopyOnWrite.read(spark, mergedOrdersPath(spark, dir))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val mergeUpsertSql =
    """WITH delta AS (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice + 1000.0 AS o_totalprice
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 20000000, o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 499 = 0),
      |merged AS (
      |  SELECT o_orderpriority, o_totalprice FROM orders
      |  WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0)
      |  UNION ALL
      |  SELECT o_orderpriority, o_totalprice FROM delta)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM merged
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_snapshot_diff — CDC between two table snapshot VERSIONS,
  // computed from their MANIFESTS: files named by both v0 and v1 are
  // immutable and shared, so every row in them is provably unchanged
  // and contributes via the manifests' footer row counts WITHOUT being
  // read; only the symmetric difference (files the merge archived +
  // files it wrote) is opened, and a full-outer join on the key
  // classifies those rows as insert / delete / update / unchanged — the
  // change feed a downstream sync consumes after a merge. At 100 TB a
  // merge touches a sliver of the table, so the diff's IO scales with
  // the DELTA, not the table (ManifestSpec pins that untouched files
  // never enter the scan). The oracle replays the merge relationally
  // over the full table and classifies the same way, so the gate also
  // re-proves both the CoW merge's output and the manifests'
  // row-count honesty.
  private[graft] def diffFromManifests(spark: SparkSession, path: String,
      vOld: Int, vNew: Int, keyCol: String, valCol: String): DataFrame = {
    import spark.implicits._
    val v0 = Manifest.read(spark, path, vOld)
    val v1 = Manifest.read(spark, path, vNew)
    val v0p = v0.map(_.path).toSet
    val v1p = v1.map(_.path).toSet
    val removed = v0.collect { case e if !v1p.contains(e.path) => e.path }
    val added = v1.collect { case e if !v0p.contains(e.path) => e.path }
    val commonRows = v0.collect { case e if v1p.contains(e.path) => e.rows }.sum
    def side(paths: Seq[String], k: String, v: String) =
      (if (paths.nonEmpty) spark.read.parquet(paths: _*)
       else spark.read.parquet(v1.map(_.path): _*).filter(lit(false)))
        .select(col(keyCol).as(k), col(valCol).as(v))
    val touched = side(removed, "k", "v_old")
      .join(side(added, "k2", "v_new"), col("k") === col("k2"), "full_outer")
      .select(
        when(col("k").isNull, "insert")
          .when(col("k2").isNull, "delete")
          .when(col("v_old") =!= col("v_new"), "update")
          .otherwise("unchanged").as("change_type"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"))
    touched
      .unionByName(Seq(("unchanged", commonRows)).toDF("change_type", "n_rows"))
      .groupBy(col("change_type"))
      .agg(sum(col("n_rows")).as("n_rows"))
      .filter(col("n_rows") > 0)
      .orderBy(col("change_type"))
  }

  private def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    diffFromManifests(spark, timeTravelPath(spark, dir), 0, 1,
      "o_orderkey", "o_totalprice")
  }

  private val snapshotDiffSql =
    """WITH merged AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0)
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice + 1000.0 FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 20000000, o_totalprice FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 499 = 0),
      |d AS (
      |  SELECT CASE
      |    WHEN b.o_orderkey IS NULL THEN 'insert'
      |    WHEN m.o_orderkey IS NULL THEN 'delete'
      |    WHEN b.o_totalprice <> m.o_totalprice THEN 'update'
      |    ELSE 'unchanged' END AS change_type
      |  FROM orders b FULL OUTER JOIN merged m ON b.o_orderkey = m.o_orderkey)
      |SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM d GROUP BY change_type ORDER BY change_type""".stripMargin

  // -------------------------------------------------------------------
  // meta_parquet_stats — footer-statistics audit over the events table:
  // per-column value and null counts read from the parquet FOOTERS
  // (file listing is driver-side catalog work; the footer reads are a
  // distributed mapPartitions over the file list, one open per file —
  // at 100 TB this is how table-stats collection runs, touching
  // metadata pages only, zero data pages). The oracle RECOUNTS the same
  // quantities from the rows, so the gate is "trust but verify": a
  // writer that misdeclared its footer stats would fail here before a
  // stats-driven optimizer ever trusted it. Byte-level quantities
  // (compressed/uncompressed sizes) have no row-level oracle and are
  // asserted in ParquetMetaSpec instead.
  private def parquetStats(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      (if (fs.getFileStatus(root).isDirectory) fs.listStatus(root).toSeq
       else Seq(fs.getFileStatus(root)))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    val confB = spark.sparkContext.broadcast(new graft.ops.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .mapPartitions { it =>
        val conf = confB.value.value
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            r.getFooter.getBlocks.asScala.flatMap(b =>
              b.getColumns.asScala.map(c =>
                (c.getPath.toDotString, c.getValueCount,
                  Option(c.getStatistics).map(_.getNumNulls).getOrElse(-1L)))).toList
          } finally r.close()
        }
      }
      .toDF("col_name", "vals", "nulls")
      .groupBy(col("col_name"))
      .agg(sum(col("vals")).as("n_values"), sum(col("nulls")).as("n_nulls"))
      .orderBy(col("col_name"))
  }

  private val parquetStatsSql =
    """WITH t AS (
      |  SELECT 'event_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_values,
      |    CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls FROM events
      |  UNION ALL SELECT 'ts', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(ts) AS BIGINT) FROM events
      |  UNION ALL SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(user_id) AS BIGINT) FROM events
      |  UNION ALL SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(event_type) AS BIGINT) FROM events
      |  UNION ALL SELECT 'value', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(value) AS BIGINT) FROM events
      |  UNION ALL SELECT 'props', CAST(COUNT(*) AS BIGINT),
      |    CAST(COUNT(*) - COUNT(props) AS BIGINT) FROM events)
      |SELECT col_name, n_values, n_nulls FROM t ORDER BY col_name""".stripMargin

  // -------------------------------------------------------------------
  // lake_manifest_prune — manifest-driven FILE-level pruning without
  // any directory layout: a flat orders mirror is written range-
  // partitioned on o_orderkey (disjoint key ranges per file), a
  // manifest records each file's footer [min,max] key, and a key-range
  // query keeps only intersecting files — O(#files) driver arithmetic,
  // zero data reads for the pruning decision, residual predicate for
  // exactness (ManifestSpec pins that files actually drop out). This is
  // the table-format alternative to Hive directories: stats-based
  // skipping composes with ANY predicate dimension the footers cover.
  // populated at every SF (sf0.001's key domain tops out ~6k), and a
  // strict subset of the 8 range files at each
  private val PruneLo = 1000L
  private val PruneHi = 3000L

  private def manifestTable(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_ranged_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-manifest/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_manifest/v0.json")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      T.orders(spark, dir)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(path)
      val entries = Manifest.collectStats(
        spark, Manifest.dataFiles(spark, path), "o_orderkey")
      Manifest.write(spark, path, 0, entries)
    }
    path
  }

  private def manifestPrune(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = manifestTable(spark, dir)
    val entries = Manifest.read(spark, path, 0)
    val picked = Manifest.prune(entries, PruneLo, PruneHi).map(_.path)
    // a range outside every file's stats legitimately prunes ALL files;
    // the empty relation still needs the table schema
    val base =
      if (picked.nonEmpty) spark.read.parquet(picked: _*)
      else spark.read.parquet(path).filter(lit(false))
    base
      .filter(col("o_orderkey").between(PruneLo, PruneHi))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val manifestPruneSql =
    s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderkey BETWEEN $PruneLo AND $PruneHi
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // lake_zorder_prune — FILE-level 2-D pruning: the grain between
  // scan_zorder_cells' directory pruning and ZOrderSpec's row-group
  // skipping. The orders mirror is sorted by the full 32-bit Morton
  // code of (o_orderkey, o_custkey) and split into fixed-size files, so
  // EVERY file carries a tight span on BOTH dimensions; the manifest
  // harvests one span per dimension ([[Manifest.collectStatsN]]) and a
  // box query keeps only files intersecting on ALL of them — driver
  // arithmetic, zero data reads. Against a linear o_orderkey sort the
  // same box prunes NOTHING on the custkey side (every file's secondary
  // span is the full domain — the ManifestSpec pin); interleaving is
  // what makes multi-dimension stats tight. Residual predicate keeps
  // the answer exact however coarse the spans; the oracle is the plain
  // 2-D filter on the unmirrored table.
  private val ZpKeyLo = 1000L; private val ZpKeyHi = 4000L
  private val ZpCustLo = 200L; private val ZpCustHi = 700L

  private def zorderPruneTable(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_z2_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-manifest/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_manifest/n0.json")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val o = T.orders(spark, dir)
      val Row(kLo: Long, kHi: Long, cLo: Long, cHi: Long) = o.agg(
        min(col("o_orderkey")), max(col("o_orderkey")),
        min(col("o_custkey")), max(col("o_custkey"))).head()
      val rows = o.count()
      ZOrder.withZ(o, col("o_orderkey"), col("o_custkey"), kLo, kHi, cLo, cHi)
        .repartitionByRange(8, col("z32"))
        .sortWithinPartitions(col("z32"))
        .drop("zcell", "z32")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", math.max(rows / 16, 256L))
        .parquet(path)
      Manifest.writeN(spark, path, 0, Manifest.collectStatsN(
        spark, Manifest.dataFiles(spark, path),
        Seq("o_orderkey", "o_custkey")))
    }
    path
  }

  private def zorderPrune(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = zorderPruneTable(spark, dir)
    val entries = Manifest.readN(spark, path, 0)
    val picked = Manifest.pruneN(entries,
      Seq((ZpKeyLo, ZpKeyHi), (ZpCustLo, ZpCustHi))).map(_.path)
    val base =
      if (picked.nonEmpty) spark.read.parquet(picked: _*)
      else spark.read.parquet(path).filter(lit(false))
    base
      .filter(col("o_orderkey").between(ZpKeyLo, ZpKeyHi) &&
        col("o_custkey").between(ZpCustLo, ZpCustHi))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val zorderPruneSql =
    s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
       |FROM orders
       |WHERE o_orderkey BETWEEN $ZpKeyLo AND $ZpKeyHi
       |  AND o_custkey BETWEEN $ZpCustLo AND $ZpCustHi
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // lake_time_travel — versioned reads over the copy-on-write table:
  // the merge runs in ARCHIVE mode (replaced partition dirs are renamed
  // aside, never deleted — data files stay immutable), and manifests v0
  // (pre-merge file set, with replaced partitions at their archive
  // locations) / v1 (live file set) each name a complete consistent
  // snapshot. Reading "as of v0" is reading exactly v0's files: the
  // query aggregates the v0 snapshot and must equal the ORIGINAL orders
  // table — proving the merge left history intact. Grouping is on a
  // DATA column (o_orderstatus) so the mixed-root file list needs no
  // partition-column reconstruction.
  private def timeTravelPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_tt_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-timetravel/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_manifest/v1.json")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      T.orders(spark, dir).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(path)
      val archive = s"$path/_archive/v0"
      val touched = CopyOnWrite.merge(spark, path, "o_orderpriority",
        "o_orderkey", mergeDelta(spark, dir), archiveTo = Some(archive))
      val touchedDirs = touched.map(p => s"o_orderpriority=$p").toSet
      val live = Manifest.dataFiles(spark, path)
      val v0Files = Manifest.dataFiles(spark, archive) ++
        live.filterNot(f => touchedDirs.exists(d => f.contains(s"/$d/")))
      Manifest.write(spark, path, 0,
        Manifest.collectStats(spark, v0Files, "o_orderkey"))
      Manifest.write(spark, path, 1,
        Manifest.collectStats(spark, live, "o_orderkey"))
    }
    path
  }

  private def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = timeTravelPath(spark, dir)
    val v0 = Manifest.read(spark, path, 0).map(_.path)
    spark.read.parquet(v0: _*)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val timeTravelSql =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // scan_bloom_prune — per-FILE bloom index for point lookups
  // ([[graft.ops.BloomIndex]]): orders mirrored as 16 hash-distributed
  // files (each file's o_orderkey span covers the whole domain — the
  // layout min/max spans prune NOTHING for a point lookup), one bloom
  // per file built in a single distributed pass, and the probe reads
  // ONLY bloom-admitted files. Blooms have no false negatives, so the
  // result must equal the oracle's plain WHERE-IN over raw rows — the
  // hash match proves pruning never loses a row, and BloomIndexSpec
  // pins the pruning actually happens (admitted ≪ 16 files). At 100 TB
  // this is the id-lookup path: O(#files) driver-side sidecar consult,
  // then a scan of ~|keys| files instead of the table.
  private def bloomMirror(spark: SparkSession, dir: String): (String, String) = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val base = s"${sys.props("java.io.tmpdir")}/graft-bloom/orders_$fp"
    val (dataPath, idxPath) = (s"$base/data", s"$base/index")
    val marker = new org.apache.hadoop.fs.Path(base, "_GRAFT_BLOOM_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      T.orders(spark, dir).repartition(16, col("o_orderkey"))
        .write.mode("overwrite").parquet(dataPath)
      graft.ops.BloomIndex.build(spark, dataPath, "o_orderkey", idxPath)
      fs.create(marker, true).close()
    }
    (dataPath, idxPath)
  }

  private def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val (dataPath, idxPath) = bloomMirror(spark, dir)
    // deterministic probes: the 5 smallest orderkeys (O(5) driver rows)
    val keys = T.orders(spark, dir).select(col("o_orderkey"))
      .orderBy(col("o_orderkey")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val idx = graft.ops.BloomIndex.load(spark, idxPath)
    val files = graft.ops.BloomIndex.candidateFiles(idx, keys)
    // all probed keys absent + zero false positives is a legal outcome:
    // empty candidate set → empty result (zero paths would throw)
    if (files.isEmpty) return spark.read.parquet(dataPath).limit(0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    spark.read.parquet(files: _*)
      .filter(col("o_orderkey").isin(keys: _*))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val bloomPruneSql =
    """WITH probes AS (
      |  SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)
      |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
      |FROM orders o JOIN probes USING (o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // scan_bloom_prune_str — the SAME per-file bloom point-lookup on a
  // STRING key (c_name, a unique "Customer#..." id — the uuid-ish case
  // the index header motivates). The round-7 index put keys in through
  // `cast("long")`, which NULLs every string id and blinds the filter;
  // keys now enter by native type ([[graft.functions.BloomAgg]]
  // putBinary of the UTF-8 bytes, probed with mightContainString).
  // Same contract as the long gate: no false negatives (hash-match vs
  // the oracle's WHERE-IN over raw rows), real pruning pinned in
  // BloomIndexSpec.
  private def bloomMirrorStr(spark: SparkSession, dir: String): (String, String) = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/customer.parquet")
    val base = s"${sys.props("java.io.tmpdir")}/graft-bloom/customer_$fp"
    val (dataPath, idxPath) = (s"$base/data", s"$base/index")
    val marker = new org.apache.hadoop.fs.Path(base, "_GRAFT_BLOOM_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      T.customer(spark, dir).repartition(16, col("c_name"))
        .write.mode("overwrite").parquet(dataPath)
      graft.ops.BloomIndex.build(spark, dataPath, "c_name", idxPath)
      fs.create(marker, true).close()
    }
    (dataPath, idxPath)
  }

  private def bloomPruneStr(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val (dataPath, idxPath) = bloomMirrorStr(spark, dir)
    val keys = T.customer(spark, dir).select(col("c_name"))
      .orderBy(col("c_name")).limit(5)
      .collect().map(_.getString(0)).toSeq
    val idx = graft.ops.BloomIndex.load(spark, idxPath)
    val files = graft.ops.BloomIndex.candidateFilesStr(idx, keys)
    if (files.isEmpty) return spark.read.parquet(dataPath).limit(0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    spark.read.parquet(files: _*)
      .filter(col("c_name").isin(keys: _*))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_name"))
  }

  private val bloomPruneStrSql =
    """WITH probes AS (
      |  SELECT c_name FROM customer ORDER BY c_name LIMIT 5)
      |SELECT c.c_custkey, c.c_name, c.c_mktsegment
      |FROM customer c JOIN probes USING (c_name)
      |ORDER BY c_name""".stripMargin

  // -------------------------------------------------------------------
  // lake_schema_evolution — metadata-only column rename on the
  // manifest-list table ([[ManifestLake.renameColumn]]): half of orders
  // commits under the column name `amount`, the table renames
  // amount→total_price touching ZERO data files, and the other half
  // commits under the new name — so the table's files permanently spell
  // the column two different ways. The read path maps each logical
  // column over its name history (coalesce across the physical
  // spellings; each row's file wrote exactly one), and the aggregate
  // over the mixed-epoch table must equal the oracle computing from the
  // ORIGINAL orders rows — proving the rename is invisible to queries.
  // At 100 TB this is the Iceberg headline: renaming a column on a
  // petabyte table is one ~100-byte metadata commit, not a rewrite.
  // Time travel sees each snapshot under the schema it was created
  // with, and the composition with MOR deletes/compaction is
  // SchemaEvolutionSpec's job.
  private def schemaEvoPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_sev_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-sev/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_SEV_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val o = T.orders(spark, dir).select(col("o_orderkey"),
        col("o_orderpriority"), col("o_totalprice"))
      ManifestLake.mergeCommit(spark, path, "o_orderpriority", "o_orderkey",
        o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
          .withColumnRenamed("o_totalprice", "amount"), "load")
      ManifestLake.renameColumn(spark, path, "amount", "total_price")
      ManifestLake.mergeCommit(spark, path, "o_orderpriority", "o_orderkey",
        o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
          .withColumnRenamed("o_totalprice", "total_price"), "evolve")
      fs.create(marker, true).close()
    }
    path
  }

  private def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    ManifestLake.read(spark, schemaEvoPath(spark, dir))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("total_price"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val schemaEvolutionSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_schema_widen — TYPE PROMOTION (Iceberg widening evolution) on
  // the manifest-list table: an int column outgrows its container —
  // the canonical ops incident: a counter crosses 2^31 — and
  // [[ManifestLake.widenColumn]] promotes it to bigint as pure
  // metadata. Old files stay byte-identical (the read path casts each
  // epoch to the widened type — exact, int⊂bigint), and the NEXT
  // commit lands values only a bigint can hold. The fixture writes an
  // int epoch, widens, then appends values past 2^31 (bounded so Σ stays in int64 at any SF);
  // the oracle recomputes both epochs from raw orders with the same
  // CAST, so the promotion is hash-proven value-preserving across the
  // epoch boundary. SchemaEvolutionSpec pins the rejections (narrowing,
  // cross-family, dead/unknown columns) and byte-stability.
  private def schemaWidenPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_widen_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-sev/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_WIDEN_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val o = T.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      ManifestLake.appendCommit(spark, path, "o_orderpriority", "o_orderkey",
        o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
          .withColumn("qty", pmod(col("o_orderkey"), lit(1000)).cast("int")),
        "load")
      ManifestLake.widenColumn(spark, path, "qty", "bigint")
      ManifestLake.appendCommit(spark, path, "o_orderpriority", "o_orderkey",
        o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
          .withColumn("qty",
            (pmod(col("o_orderkey"), lit(1000)) * lit(4000000L)
              + lit(3000000000L)).cast("bigint")),
        "wide")
      fs.create(marker, true).close()
    }
    path
  }

  private def schemaWiden(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    ManifestLake.read(spark, schemaWidenPath(spark, dir))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("qty")).as("sum_qty"),
        max(col("qty")).as("max_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val schemaWidenSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
      |       ELSE (o_orderkey % 1000) * 4000000 + 3000000000 END) AS BIGINT)
      |    AS sum_qty,
      |  CAST(MAX(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
      |       ELSE (o_orderkey % 1000) * 4000000 + 3000000000 END) AS BIGINT)
      |    AS max_qty
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_delete_vectors — merge-on-read DELETE over a manifest-list
  // table ([[ManifestLake.deleteWhere]]): two successive deletes write
  // only (file_path, row_index) sidecars — zero data files rewritten,
  // which at 100 TB is the difference between an O(matched-rows)
  // metadata commit and re-copying every touched terabyte. The read
  // subtracts positions at scan time: files no vector names scan clean
  // (no join); dirty files anti-join a broadcast delete set, the
  // broadcast decision driven by manifest row counts alone. The oracle
  // replays both deletes relationally on the original table — also
  // re-proving that the second delete's live-rows harvest composes with
  // the first's subtraction (order-independent for disjoint-by-row
  // predicates, exactly what a WHERE conjunction expresses).
  private def morOrdersPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_mor_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-mor/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_MOR_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      ManifestLake.mergeCommit(spark, path, "o_orderpriority", "o_orderkey",
        T.orders(spark, dir), "load")
      ManifestLake.deleteWhere(spark, path,
        col("o_orderkey") % 131 === 0, "d1")
      ManifestLake.deleteWhere(spark, path,
        col("o_custkey") % 211 === 0, "d2")
      fs.create(marker, true).close()
    }
    path
  }

  private def deleteVectors(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    ManifestLake.read(spark, morOrdersPath(spark, dir))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val deleteVectorsSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE NOT (o_orderkey % 131 = 0) AND NOT (o_custkey % 211 = 0)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_mor_diff — the change feed of the two delete commits, read
  // from the DELTA alone: [[ManifestLake.deletedRows]] opens only the
  // new vector sidecars plus the dirty files they address and
  // position-semi-joins the subtracted rows back out — CDC for a MOR
  // delete without comparing snapshots, IO O(delta) (the dual of
  // lake_snapshot_diff's manifest-diff over CoW membership changes).
  // The oracle recomputes the same rows as a predicate disjunction on
  // the original table — proving the vectors name exactly the rows the
  // two predicates matched, once each, across both commits.
  private def morDiff(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = morOrdersPath(spark, dir)
    ManifestLake.deletedRows(spark, path, 0,
      graft.ops.Manifest.currentListVersion(spark, path))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_deleted"),
        sum(dec(col("o_totalprice"))).cast("double").as("deleted_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val morDiffSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_deleted,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS deleted_price
      |FROM orders
      |WHERE o_orderkey % 131 = 0 OR o_custkey % 211 = 0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // lake_compact_small — bin-pack small-file compaction (the lake's
  // OPTIMIZE) proven semantics-preserving by the oracle. The fixture
  // simulates the ingest reality that CREATES the small-file problem:
  // six chunked [[ManifestLake.appendCommit]]s (each O(delta), nothing
  // rewritten — the streaming fast path) leave every event_type
  // partition holding six sub-target files; [[ManifestLake
  // .compactSmall]] then plans bins from manifest metadata alone
  // (zero data IO to decide), packs each partition's files
  // first-fit-decreasing under the byte target, rewrites only bins
  // that merge, and CAS-commits adds+removes in one new version. The
  // gate reads the COMPACTED head and must hash-match the oracle on
  // the raw rows — compaction is a pure physical rewrite, and this is
  // the proof. CompactSmallSpec pins what the oracle can't see: file
  // counts collapse 6→1 per partition, bins respect the cap, dirty
  // files (delete-vector-addressed) are excluded, and time travel to
  // the pre-compaction version still reads the original files.
  private def compactedEventsPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = s"events_compact_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_COMPACT_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = T.events(spark, dir).filter(col("event_id").isNotNull)
      (0 until 6).foreach { k =>
        ManifestLake.appendCommit(spark, path, "event_type", "event_id",
          ev.filter(col("event_id") % 6 === k), s"chunk-$k")
      }
      ManifestLake.compactSmall(spark, path, "event_id",
        256L * 1024 * 1024, "opt")
      fs.create(marker, true).close()
    }
    path
  }

  // -------------------------------------------------------------------
  // lake_compact_cluster — clustered compaction ([[ManifestLake
  // .compactClustered]], the Delta OPTIMIZE ZORDER BY analogue) proven
  // semantics-preserving AND useful: the same six chunked appends leave
  // every file spanning the FULL event_id range (chunks are event_id %
  // 6 — worst case for span pruning: a key-range read must open every
  // file), the clustered rewrite range-partitions each event_type
  // partition on event_id into capped sorted files, and the gate then
  // does exactly the read the layout exists for — readWhere over a
  // narrow id range — whose result must hash-match the oracle running
  // the same predicate over raw rows. CompactClusterSpec pins what the
  // oracle can't see: post-compaction spans are pairwise disjoint,
  // Manifest.prune keeps a strict subset of files (pre-compaction it
  // keeps ALL), re-running is a metadata-only no-op, and the
  // pre-compaction version still time-travels byte-stable.
  private def clusteredEventsPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = s"events_cluster_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_CLUSTER_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = T.events(spark, dir).filter(col("event_id").isNotNull)
      (0 until 6).foreach { k =>
        ManifestLake.appendCommit(spark, path, "event_type", "event_id",
          ev.filter(col("event_id") % 6 === k), s"chunk-$k")
      }
      ManifestLake.compactClustered(spark, path, "event_id",
        128L * 1024, "cluster")
      fs.create(marker, true).close()
    }
    path
  }

  private def compactCluster(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    ManifestLake.readWhere(spark, clusteredEventsPath(spark, dir), 100L, 299L)
      .filter(col("event_id").between(100, 299)) // residual predicate
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  private val compactClusterSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id BETWEEN 100 AND 299
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  private def compactSmall(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    ManifestLake.read(spark, compactedEventsPath(spark, dir))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  private val compactSmallSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // lake_ndv_manifest — column NDV statistics AT THE MANIFEST GRAIN
  // ([[graft.ops.NdvStats]]): every data file carries a KMV bottom-k
  // sketch of user_id in a sidecar, and the TABLE-level estimate is a
  // metadata-only merge of the per-file sketches — the ANALYZE that
  // never rescans the table (Iceberg's puffin theta sketches; KMV here
  // because bottom-k merges EXACTLY, so the sidecar-merged sketch is
  // bit-identical to one computed over the raw rows and the oracle
  // replays it with ROW_NUMBER OVER (ORDER BY hash)). The estimate
  // (k−1)·16^15/kth-hash carries its within-50% contract as a checked
  // column, same discipline as sketch_kmv_custkey. NdvStatsSpec pins
  // what the oracle can't see: one sketch per file, O(delta) reuse
  // across commits, and estimate-invariance under compaction.
  private val NdvK = 64

  /** (k_held, kth_hash, est) from a merged bottom-k sketch frame —
    * the KMV estimator spelling shared with sketch_kmv_custkey. */
  private def kmvEstimate(ks: DataFrame): DataFrame = ks
    .select(
      size(col("ks")).cast("long").as("k_held"),
      element_at(col("ks"), size(col("ks"))).as("kth_hash"))
    .withColumn("est",
      when(col("k_held") < NdvK, col("k_held").cast("double"))
        .otherwise(lit((NdvK - 1).toDouble) * lit(1152921504606846976.0) /
          conv(substring(col("kth_hash"), 1, 15), 16, 10).cast("long")))

  private def ndvManifest(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = compactedEventsPath(spark, dir)
    val est = kmvEstimate(
      NdvStats.mergedSketch(spark, path, "user_id", NdvK))
    val exact = T.events(spark, dir).filter(col("event_id").isNotNull)
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.crossJoin(broadcast(exact))
      .withColumn("est_ok",
        abs(col("est") - col("n_exact")) / col("n_exact") <= 0.5)
      .select(col("n_exact"), col("k_held"), col("kth_hash"), col("est"),
        col("est_ok"))
  }

  private val ndvManifestSql =
    s"""WITH h AS (
       |  SELECT md5(CAST(user_id AS VARCHAR)) AS h
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |ranked AS (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
       |  FROM (SELECT DISTINCT h FROM h)),
       |bot AS (
       |  SELECT MAX(h) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS k_held
       |  FROM ranked WHERE r <= $NdvK),
       |ex AS (
       |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events WHERE event_id IS NOT NULL),
       |j AS (
       |  SELECT n_exact, k_held, kth_hash,
       |    CASE WHEN k_held < $NdvK THEN CAST(k_held AS DOUBLE)
       |         ELSE CAST(${NdvK - 1} AS DOUBLE) * 1152921504606846976.0 /
       |              CAST('0x' || substr(kth_hash, 1, 15) AS BIGINT) END AS est
       |  FROM bot, ex)
       |SELECT n_exact, k_held, kth_hash, est,
       |  abs(est - n_exact) / n_exact <= 0.5 AS est_ok
       |FROM j""".stripMargin

  // -------------------------------------------------------------------
  // lake_stats_profile — the statistics layer CONSUMED: the planning
  // profile a cost-based decision reads before touching any data.
  // n_rows comes from MANIFEST row accounting (sum of per-file counts
  // — zero scan), est_ndv from the merged KMV sidecars, and the two
  // derived quantities are the actual CBO inputs: fanout_est =
  // n_rows/est_ndv is the per-key multiplicity a join on user_id would
  // fan out to, and broadcast_ok is the build-side decision at a row
  // threshold. The oracle recomputes ALL of it from raw rows — so the
  // gate simultaneously proves the manifest's row accounting (metadata
  // count == true count) and the sketch estimate, the two numbers a
  // planner would otherwise scan for. At 100 TB this row is what
  // ANALYZE publishes and every join strategy reads.
  private def statsProfile(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = compactedEventsPath(spark, dir)
    val head = Manifest.currentListVersion(spark, path)
    val nRows = Manifest.readAll(spark, path, head)
      .filterNot(_.path.contains("/deletes/")).map(_.rows).sum
    kmvEstimate(NdvStats.mergedSketch(spark, path, "user_id", NdvK))
      .select(
        lit(nRows).as("n_rows"),
        col("est").as("est_ndv"),
        (lit(nRows).cast("double") / col("est")).as("fanout_est"),
        (lit(nRows) <= lit(1000000L)).as("broadcast_ok"))
  }

  private val statsProfileSql =
    s"""WITH h AS (
       |  SELECT md5(CAST(user_id AS VARCHAR)) AS h
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |ranked AS (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
       |  FROM (SELECT DISTINCT h FROM h)),
       |bot AS (
       |  SELECT MAX(h) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS k_held
       |  FROM ranked WHERE r <= $NdvK),
       |ex AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM events WHERE event_id IS NOT NULL),
       |j AS (
       |  SELECT n_rows,
       |    CASE WHEN k_held < $NdvK THEN CAST(k_held AS DOUBLE)
       |         ELSE CAST(${NdvK - 1} AS DOUBLE) * 1152921504606846976.0 /
       |              CAST('0x' || substr(kth_hash, 1, 15) AS BIGINT) END AS est
       |  FROM bot, ex)
       |SELECT n_rows, est AS est_ndv,
       |  CAST(n_rows AS DOUBLE) / est AS fanout_est,
       |  n_rows <= 1000000 AS broadcast_ok
       |FROM j""".stripMargin

  // -------------------------------------------------------------------
  // lake_cbo_broadcast — the statistics layer DRIVING the planner:
  // [[graft.plans.StatsBroadcast]] consumes the manifest's per-file row
  // accounting (the numbers lake_stats_profile publishes) and injects a
  // BROADCAST hint on a join side whose manifest row bound clears the
  // threshold — the query itself is written with NO hint, exactly as a
  // user who doesn't know the table's live size writes it. The fixture
  // is the case file-size estimation gets WRONG at 100 TB: a
  // merge-on-read deleteWhere leaves every data file byte-identical on
  // disk (bytes say "big") while the manifest knows most rows are gone
  // — the CBO reads live truth at zero IO. The oracle recomputes the
  // join from raw rows under the same delete predicate, so the gate
  // proves the hinted plan is semantics-preserving; StatsBroadcastSpec
  // pins the plan shape (BroadcastHashJoin under a -1 size threshold,
  // SortMergeJoin with the registry empty, refusals for unregistered
  // files / multiplying subtrees / user-hint override).
  private def cboEventsPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = s"events_cbo_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_CBO_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = T.events(spark, dir).filter(col("event_id").isNotNull)
      (0 until 2).foreach { k =>
        ManifestLake.appendCommit(spark, path, "event_type", "event_id",
          ev.filter(col("event_id") % 2 === k), s"chunk-$k")
      }
      // MOR delete: data files stay byte-identical, live rows shrink
      ManifestLake.deleteWhere(spark, path, col("user_id") % 7 === 3, "cbo")
      fs.create(marker, true).close()
    }
    path
  }

  private def cboBroadcast(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark) // installs the rule
    val path = cboEventsPath(spark, dir)
    graft.plans.StatsBroadcast.register(spark, path)
    val ev = ManifestLake.read(spark, path)
      .select(col("user_id"), col("event_type"), dec(col("value")).as("v"))
    val ord = T.orders(spark, dir)
      .select(col("o_custkey"), dec(col("o_totalprice")).as("p"))
    // no hint, no broadcast() — the manifest-stats rule decides
    ord.join(ev, col("o_custkey") === col("user_id"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("v")).cast("double").as("sum_value"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy(col("event_type"))
  }

  private val cboBroadcastSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN events ON o_custkey = user_id
      |WHERE event_id IS NOT NULL AND user_id % 7 <> 3
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // lake_cbo_reorder — statistics drive JOIN ORDER, the CBO step past
  // the broadcast decision: [[graft.plans.StatsJoinReorder]] flattens a
  // no-hint inner-join tree and rebuilds it smallest-estimated-
  // intermediate first from manifest row bounds + the NDV sidecars
  // ([[NdvStats]] KMV sketches — registered at metadata grain, zero
  // table scans to decide). The fixture is the star query every
  // warehouse hits written in DELIBERATELY bad order: fact ⋈ fact
  // first ((orders ⋈ events) ⋈ type_dim), where the dim join would
  // have cut the intermediate ~30× — at 100 TB that ordering mistake
  // is a spilled shuffle, and file sizes can't make the call (MOR
  // deletes and compression skew lie; the manifest knows). Estimator:
  // |A⋈B| = |A|·|B| / max(ndv(a.k), ndv(b.k)) per conjunct, greedy
  // left-deep. The oracle replays the SAME query from raw rows, so the
  // gate proves the re-ordered plan is bit-parity with the written
  // one; StatsJoinReorderSpec pins that the order actually CHANGED
  // (deepest join = events⋈dim, orders joins last) and the refusal
  // matrix (disabled flag / unregistered side / user hint / outer
  // join ⇒ untouched).
  private def cboReorderPaths(spark: SparkSession, dir: String):
      (String, String, String) = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val base = s"${sys.props("java.io.tmpdir")}/graft-compact/" +
      s"reorder_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val (po, pe, pd) = (s"$base/orders", s"$base/events", s"$base/dim")
    val marker = new org.apache.hadoop.fs.Path(base, "_GRAFT_REORDER_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = T.events(spark, dir).filter(col("event_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      (0 until 2).foreach { k =>
        ManifestLake.appendCommit(spark, pe, "event_type", "event_id",
          ev.filter(col("event_id") % 2 === k), s"chunk-$k")
      }
      val ord = T.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      (0 until 2).foreach { k =>
        ManifestLake.appendCommit(spark, po, "o_orderpriority", "o_orderkey",
          ord.filter(col("o_orderkey") % 2 === k), s"chunk-$k")
      }
      // the type dim: one row per event_type with a deterministic rank
      // declared-single-partition key (the pmod(hash, 1) idiom — ≡ 0,
      // attribute-dependent so it survives constant folding, never
      // null): the dim is ≤ |event types| rows, but an unpartitioned
      // window still WARNs and the suite stays warning-free by contract
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(hash(col("event_type")), lit(1)))
        .orderBy(col("event_type"))
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("type_rank", row_number().over(w).cast("long"))
      ManifestLake.appendCommit(spark, pd, "event_type", "type_rank",
        dim, "chunk-0")
      fs.create(marker, true).close()
    }
    (po, pe, pd)
  }

  private def cboReorder(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark) // installs both CBO rules
    val (po, pe, pd) = cboReorderPaths(spark, dir)
    graft.plans.StatsBroadcast.register(spark, po)
    graft.plans.StatsBroadcast.register(spark, pe)
    graft.plans.StatsBroadcast.register(spark, pd)
    // key NDVs from the manifest-riding sketches — O(delta) to maintain
    graft.plans.StatsJoinReorder.registerNdv(spark, po, "o_custkey")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "user_id")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "event_type")
    graft.plans.StatsJoinReorder.registerNdv(spark, pd, "event_type")
    val o = ManifestLake.read(spark, po)
      .select(col("o_custkey"), dec(col("o_totalprice")).as("p"))
    val e = ManifestLake.read(spark, pe)
      .select(col("user_id"), col("event_type"), dec(col("value")).as("v"))
    val d = ManifestLake.read(spark, pd)
      .select(col("event_type").as("d_event_type"), col("type_rank"))
    // written worst-first: fact ⋈ fact, dim last — no hints, the
    // statistics rule re-orders (explicit conditions keep a pure join
    // tree; a USING join would interpose a coalescing Project)
    o.join(e, col("o_custkey") === col("user_id"))
      .join(d, col("event_type") === col("d_event_type"))
      .groupBy(col("type_rank"), col("d_event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).cast("double").as("sum_value"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy(col("type_rank"))
  }

  private val cboReorderSql =
    """WITH dim AS (
      |  SELECT event_type AS d_event_type,
      |    ROW_NUMBER() OVER (ORDER BY event_type) AS type_rank
      |  FROM (SELECT DISTINCT event_type FROM events WHERE event_id IS NOT NULL)),
      |j AS (
      |  SELECT type_rank, d_event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders
      |  JOIN (SELECT user_id, event_type, value FROM events
      |        WHERE event_id IS NOT NULL) e ON o_custkey = user_id
      |  JOIN dim ON event_type = d_event_type)
      |SELECT type_rank, d_event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value,
      |  CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM j GROUP BY type_rank, d_event_type
      |ORDER BY type_rank""".stripMargin

  // -------------------------------------------------------------------
  // lake_cbo_selectivity — FILTER SELECTIVITY feeds the join reorderer
  // (VERDICT r9 #3): the same star as lake_cbo_reorder, but the orders
  // fact carries a range predicate (o_orderkey <= 600) and the
  // estimator now knows the column's manifest [min,max] span
  // ([[graft.plans.StatsJoinReorder.registerSpan]] — one parquet FOOTER
  // pass, no data pages). The written order joins the heavily-filtered
  // fact LAST; the span-scaled estimate makes it the smallest side, so
  // the greedy rebuild joins it EARLY — the routing a warehouse CBO
  // picks when ANALYZE histograms exist, and exactly the case the old
  // row-bound-only estimator misordered (a 0.1%-filtered fact costed
  // at full rows). StatsJoinReorderSpec pins the order FLIP itself
  // (ndv-only: written order survives; span registered: the filtered
  // fact joins innermost) plus bit-parity both ways; this gate proves
  // the selectivity-driven plan against the oracle end-to-end.
  private def cboSelectivity(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val (po, pe, pd) = cboReorderPaths(spark, dir)
    graft.plans.StatsBroadcast.register(spark, po)
    graft.plans.StatsBroadcast.register(spark, pe)
    graft.plans.StatsBroadcast.register(spark, pd)
    graft.plans.StatsJoinReorder.registerNdv(spark, po, "o_custkey")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "user_id")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "event_type")
    graft.plans.StatsJoinReorder.registerNdv(spark, pd, "event_type")
    // the selectivity input: o_orderkey's global span from file footers
    graft.plans.StatsJoinReorder.registerSpan(spark, po, "o_orderkey")
    val o = ManifestLake.read(spark, po)
      .filter(col("o_orderkey") <= 600)
      .select(col("o_custkey"), dec(col("o_totalprice")).as("p"))
    val e = ManifestLake.read(spark, pe)
      .select(col("user_id"), col("event_type"), dec(col("value")).as("v"))
    val d = ManifestLake.read(spark, pd)
      .select(col("event_type").as("d_event_type"), col("type_rank"))
    // written: dim join first, the 1%-filtered fact LAST
    e.join(d, col("event_type") === col("d_event_type"))
      .join(o, col("user_id") === col("o_custkey"))
      .groupBy(col("type_rank"), col("d_event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).cast("double").as("sum_value"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy(col("type_rank"))
  }

  private val cboSelectivitySql =
    """WITH dim AS (
      |  SELECT event_type AS d_event_type,
      |    ROW_NUMBER() OVER (ORDER BY event_type) AS type_rank
      |  FROM (SELECT DISTINCT event_type FROM events WHERE event_id IS NOT NULL)),
      |j AS (
      |  SELECT type_rank, d_event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM (SELECT user_id, event_type, value FROM events
      |        WHERE event_id IS NOT NULL) e
      |  JOIN dim ON event_type = d_event_type
      |  JOIN (SELECT o_custkey, o_totalprice FROM orders
      |        WHERE o_orderkey <= 600) o ON user_id = o_custkey)
      |SELECT type_rank, d_event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value,
      |  CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM j GROUP BY type_rank, d_event_type
      |ORDER BY type_rank""".stripMargin

  // lake_cbo_histogram — HISTOGRAM selectivity in the join reorderer
  // (VERDICT r10 #3): the same star as lake_cbo_selectivity, but the
  // fact's filter column is SKEWED (95% of orders collapse into
  // [0,100), 5% scatter across a [100000, ~115000] tail) and the
  // predicate keeps only the tail. The manifest [min,max] span under
  // the uniform assumption says the filter keeps ~99% — the bad
  // estimate that leaves the written worst-first order in place — while
  // the merged per-file equi-depth sidecars ([[graft.ops.HistStats]],
  // registered via [[graft.plans.StatsJoinReorder.registerHistogram]])
  // interpolate the real mass (~5%) and route the filtered fact
  // innermost. StatsJoinReorderSpec pins the span-stays/histogram-flips
  // decision pair and bit-parity; this gate proves the histogram-driven
  // plan end-to-end against the oracle (the result is join-order
  // invariant — the oracle replays the skew derivation and the query).
  private def cboHistogramPaths(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/" +
      s"histcbo_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_HISTCBO_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ord = T.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 20 < 19, col("o_orderkey") % 100)
            .otherwise(lit(100000L) + expr("o_orderkey div 20")).as("skew_key"),
          col("o_totalprice"), col("o_orderpriority"))
      (0 until 2).foreach { k =>
        ManifestLake.appendCommit(spark, path, "o_orderpriority",
          "o_orderkey", ord.filter(col("o_orderkey") % 2 === k), s"chunk-$k")
      }
      fs.create(marker, true).close()
    }
    path
  }

  private def cboHistogram(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val (_, pe, pd) = cboReorderPaths(spark, dir)
    val po = cboHistogramPaths(spark, dir)
    graft.plans.StatsBroadcast.register(spark, po)
    graft.plans.StatsBroadcast.register(spark, pe)
    graft.plans.StatsBroadcast.register(spark, pd)
    graft.plans.StatsJoinReorder.registerNdv(spark, po, "o_custkey")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "user_id")
    graft.plans.StatsJoinReorder.registerNdv(spark, pe, "event_type")
    graft.plans.StatsJoinReorder.registerNdv(spark, pd, "event_type")
    // both selectivity inputs registered; the ESTIMATOR must prefer the
    // histogram's mass over the span's uniform guess
    graft.plans.StatsJoinReorder.registerSpan(spark, po, "skew_key")
    graft.plans.StatsJoinReorder.registerHistogram(spark, po, "skew_key")
    val o = ManifestLake.read(spark, po)
      .filter(col("skew_key") >= 100000L)
      .select(col("o_custkey"), dec(col("o_totalprice")).as("p"))
    val e = ManifestLake.read(spark, pe)
      .select(col("user_id"), col("event_type"), dec(col("value")).as("v"))
    val d = ManifestLake.read(spark, pd)
      .select(col("event_type").as("d_event_type"), col("type_rank"))
    // written: dim join first, the tail-filtered fact LAST
    e.join(d, col("event_type") === col("d_event_type"))
      .join(o, col("user_id") === col("o_custkey"))
      .groupBy(col("type_rank"), col("d_event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).cast("double").as("sum_value"),
        sum(col("p")).cast("double").as("sum_price"))
      .orderBy(col("type_rank"))
  }

  private val cboHistogramSql =
    """WITH dim AS (
      |  SELECT event_type AS d_event_type,
      |    ROW_NUMBER() OVER (ORDER BY event_type) AS type_rank
      |  FROM (SELECT DISTINCT event_type FROM events WHERE event_id IS NOT NULL)),
      |o AS (
      |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM (SELECT o_orderkey, o_custkey, o_totalprice,
      |          CASE WHEN o_orderkey % 20 < 19 THEN o_orderkey % 100
      |               ELSE 100000 + o_orderkey // 20 END AS skew_key
      |        FROM orders)
      |  WHERE skew_key >= 100000),
      |j AS (
      |  SELECT type_rank, d_event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v, p
      |  FROM (SELECT user_id, event_type, value FROM events
      |        WHERE event_id IS NOT NULL) e
      |  JOIN dim ON event_type = d_event_type
      |  JOIN o ON user_id = o_custkey)
      |SELECT type_rank, d_event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(v) AS DOUBLE) AS sum_value,
      |  CAST(SUM(p) AS DOUBLE) AS sum_price
      |FROM j GROUP BY type_rank, d_event_type
      |ORDER BY type_rank""".stripMargin

  // lake_catalog_stats — the manifest→catalog statistics bridge under
  // the correctness gate (VERDICT r10 #7's wiring, oracle-replayable):
  // a lake table built from orders (cat = o_custkey % 97, NDV 97 < k =
  // 256 so the KMV bottom-k holds EVERY distinct hash and the estimate
  // is exact) is registered in the session catalog with
  // [[graft.ops.CatalogStats.publish]]; the gate emits the injected
  // CatalogStatistics themselves — row count from manifest entries, NDV
  // from the merged per-file sketches, min/max from footers — which the
  // oracle replays as plain COUNT/COUNT DISTINCT/MIN/MAX over the raw
  // rows. CatalogStatsSpec separately proves vanilla Spark PLANS with
  // these numbers; this gate proves the numbers are RIGHT.
  private def catalogStats(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/" +
      s"catstats_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_CATSTATS_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      // ONE commit: the vanilla catalog's schema inference requires a
      // uniform directory layout under the table root (two chunk roots
      // trip "multiple root directories") — the multi-commit O(delta)
      // sidecar reuse is NdvStats/HistStats specs' business
      val ord = T.orders(spark, dir)
        .select(col("o_orderkey"), (col("o_custkey") % 97).as("cat"),
          col("o_orderpriority"))
      ManifestLake.appendCommit(spark, path, "o_orderpriority",
        "o_orderkey", ord, "load")
      fs.create(marker, true).close()
    }
    val tbl = "graft_catstats_" +
      s"${dir}_$fp".replaceAll("[^A-Za-z0-9_]", "_")
    val stats = graft.ops.CatalogStats.publish(spark, tbl, path, Seq("cat"))
    val cs = stats.colStats("cat")
    spark.range(1).select(
      lit(stats.rowCount.get.toLong).as("n_rows"),
      lit(cs.distinctCount.get.toLong).as("ndv_cat"),
      lit(cs.min.get.toLong).as("min_cat"),
      lit(cs.max.get.toLong).as("max_cat"))
  }

  private val catalogStatsSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT o_custkey % 97) AS BIGINT) AS ndv_cat,
      |  CAST(MIN(o_custkey % 97) AS BIGINT) AS min_cat,
      |  CAST(MAX(o_custkey % 97) AS BIGINT) AS max_cat
      |FROM orders""".stripMargin

  // -------------------------------------------------------------------
  // lake_hotkey_salted — the skew-mitigation primitives WIRED to a
  // data-driven trigger: per-file SpaceSaving heavy-hitter sidecars
  // ([[HotKeyStats]], the sibling of the NDV sketches) merge at
  // metadata grain into a guaranteed-bound hot-key list, and
  // [[Skew.splitSaltedJoin]] salts exactly those keys — left side
  // row-salted, right side replicated only for its hot rows, cold keys
  // joining plain. The fixture derives a deliberately skewed key from
  // events (70% of rows collapse to one key — the profile AQE's
  // byte-based splitting may miss when the hot key hides inside
  // many-row-but-few-byte partitions), loads it as a chunked lake
  // table, and the decision reads ONLY the sidecar + manifest row
  // accounting — zero table scans to decide, the ANALYZE-feeds-the-
  // planner economics at 100 TB. The key universe (≤ 51) sits under
  // the sketch capacity (64), so the summary is EXACT (err = 0,
  // SpaceSavingSpec's contract) and the DuckDB oracle can replay the
  // decision itself as a plain GROUP BY share test: n_hot_rows puts
  // the hot-key CLASSIFICATION, not just the join result, under the
  // hash check. HotKeyStatsSpec pins what the oracle can't see:
  // O(delta) sketch reuse across commits, the eviction-path error
  // bounds on a high-cardinality key, the no-false-positive decision
  // rule, and salted≡plain bit-equality with the salt visible in the
  // hot branch's plan.
  private def skewEventsPath(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = s"events_hotkey_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-compact/$tag"
    val marker = new org.apache.hadoop.fs.Path(path, "_GRAFT_HOTKEY_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = T.events(spark, dir)
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"),
          when(col("user_id") % 10 < 7, lit(-1L))
            .otherwise(col("user_id") % 50).as("skew_key"),
          col("event_type"), col("value"))
      (0 until 2).foreach { k =>
        ManifestLake.appendCommit(spark, path, "event_type", "event_id",
          ev.filter(col("event_id") % 2 === k), s"chunk-$k")
      }
      fs.create(marker, true).close()
    }
    path
  }

  private def hotkeySalted(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = skewEventsPath(spark, dir)
    // decision from metadata alone: sidecar sketches + manifest rows
    val hot = HotKeyStats.hotKeys(spark, path, "skew_key", 64, 0.3)
      .map(_.toLong)
    val e = ManifestLake.read(spark, path)
    val d = e.select(col("skew_key")).distinct()
      .withColumn("grp", col("skew_key") % 5)
    val isHot =
      if (hot.isEmpty) lit(false) else col("skew_key").isInCollection(hot)
    Skew.splitSaltedJoin(e, d, "skew_key", hot, 8)
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        sum(when(isHot, 1L).otherwise(0L)).as("n_hot_rows"))
      .orderBy(col("grp"))
  }

  private val hotkeySaltedSql =
    """WITH e AS (
      |  SELECT event_id,
      |    CASE WHEN user_id % 10 < 7 THEN -1 ELSE user_id % 50 END AS skew_key,
      |    event_type, value
      |  FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
      |hot AS (
      |  SELECT skew_key FROM e, tot
      |  GROUP BY skew_key, n HAVING COUNT(*) >= 0.3 * n),
      |d AS (SELECT DISTINCT skew_key, skew_key % 5 AS grp FROM e)
      |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CASE WHEN e.skew_key IN (SELECT skew_key FROM hot)
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_rows
      |FROM e JOIN d ON e.skew_key = d.skew_key
      |GROUP BY grp ORDER BY grp""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("lake_hotkey_salted", hotkeySalted, Some(hotkeySaltedSql)),
    QueryDef("lake_ndv_manifest", ndvManifest, Some(ndvManifestSql)),
    QueryDef("lake_stats_profile", statsProfile, Some(statsProfileSql)),
    QueryDef("lake_cbo_broadcast", cboBroadcast, Some(cboBroadcastSql)),
    QueryDef("lake_cbo_reorder", cboReorder, Some(cboReorderSql)),
    QueryDef("lake_cbo_selectivity", cboSelectivity, Some(cboSelectivitySql)),
    QueryDef("lake_cbo_histogram", cboHistogram, Some(cboHistogramSql)),
    QueryDef("lake_catalog_stats", catalogStats, Some(catalogStatsSql)),
    QueryDef("scan_orc_mirror", orcScan, Some(orcScanSql)),
    QueryDef("lake_compact_small", compactSmall, Some(compactSmallSql)),
    QueryDef("lake_compact_cluster", compactCluster, Some(compactClusterSql)),
    QueryDef("lake_delete_vectors", deleteVectors, Some(deleteVectorsSql)),
    QueryDef("lake_mor_diff", morDiff, Some(morDiffSql)),
    QueryDef("ids_dense_assign", idsAssign, Some(idsAssignSql)),
    QueryDef("scan_zorder_cells", zorderScan, Some(zorderScanSql)),
    QueryDef("lake_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QueryDef("lake_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("meta_parquet_stats", parquetStats, Some(parquetStatsSql)),
    QueryDef("lake_manifest_prune", manifestPrune, Some(manifestPruneSql)),
    QueryDef("lake_zorder_prune", zorderPrune, Some(zorderPruneSql)),
    QueryDef("lake_time_travel", timeTravel, Some(timeTravelSql)),
    QueryDef("lake_schema_evolution", schemaEvolution,
      Some(schemaEvolutionSql)),
    QueryDef("lake_schema_widen", schemaWiden, Some(schemaWidenSql)),
    QueryDef("scan_bloom_prune", bloomPrune, Some(bloomPruneSql)),
    QueryDef("scan_bloom_prune_str", bloomPruneStr, Some(bloomPruneStrSql))
  )
}

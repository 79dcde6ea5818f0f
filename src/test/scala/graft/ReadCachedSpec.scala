package graft

import java.nio.file.Files

/** T.readCached staleness contract (VERDICT r14 #6): the memo key must
  * drop an entry on ANY change under the dataset path — including an
  * in-place part-file rewrite that leaves the top directory's entry
  * list (and therefore its mtime) unchanged, the case the old
  * dir-mtime-only key silently served stale plans for. */
class ReadCachedSpec extends SparkSpec {
  import spark.implicits._

  private def writeDs(path: String, rows: Seq[Long]): Unit =
    rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(path)

  test("overwrite of the dataset dir invalidates the memo") {
    val dir = Files.createTempDirectory("graft-rc").toFile
    val p = s"${dir.getAbsolutePath}/ds.parquet"
    writeDs(p, Seq(1L, 2L))
    assert(T.readCached(spark, p).count() == 2)
    Thread.sleep(5) // distinct mtimes even on coarse filesystems
    writeDs(p, Seq(1L, 2L, 3L))
    assert(T.readCached(spark, p).count() == 3)
  }

  test("in-place rewrite of an existing part-file invalidates the memo") {
    val dir = Files.createTempDirectory("graft-rc").toFile
    val p = s"${dir.getAbsolutePath}/ds.parquet"
    writeDs(p, Seq(1L, 2L))
    assert(T.readCached(spark, p).count() == 2)
    // regenerate elsewhere and copy the new part-file CONTENT over the
    // old file name: entry list unchanged, only the file mtime moves —
    // exactly the in-place writer the dir-mtime key missed
    val alt = s"${dir.getAbsolutePath}/alt.parquet"
    writeDs(alt, Seq(7L, 8L, 9L))
    val dst = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val src = new java.io.File(alt).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val topMtimeBefore = new java.io.File(p).lastModified
    Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecars — a real in-place writer
    // maintains them; this test's byte copy would trip ChecksumException
    new java.io.File(p).listFiles().filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    dst.setLastModified(System.currentTimeMillis() + 2000)
    new java.io.File(p).setLastModified(topMtimeBefore) // pin dir mtime
    assert(T.readCached(spark, p).count() == 3,
      "stale memo entry served after an in-place part-file rewrite")
  }

  test("always-rewritten paths replace their memo entry instead of accumulating") {
    // ADVICE r14 (LinkRank triangle mirror): the memo is keyed by PATH
    // with the signature in the value, so N rewrites hold one entry,
    // not N dead analyzed plans. Observable contract: after a rewrite
    // the fresh frame is served and the old one is unreachable — probe
    // via row counts across several rewrites.
    val dir = Files.createTempDirectory("graft-rc").toFile
    val p = s"${dir.getAbsolutePath}/ds.parquet"
    (1 to 4).foreach { n =>
      writeDs(p, (1L to n.toLong))
      assert(T.readCached(spark, p).count() == n)
      Thread.sleep(5)
    }
  }

  test("Views.register re-registers when a table regenerates under the same dir") {
    // ADVICE r14 (medium): the view memo keyed on the dir STRING alone
    // kept stale plans over replaced files. Build a minimal star dir
    // with all ten tables, register, regenerate one table, re-register.
    val dir = Files.createTempDirectory("graft-views").toFile.getAbsolutePath
    graft.sql.Views.tables.foreach { t =>
      if (t == "events")
        Seq((1L, new java.sql.Timestamp(0L))).toDF("event_id", "ts")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      else Seq(1L).toDF(s"${t}_id").write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    graft.sql.Views.register(spark, dir)
    assert(spark.sql("SELECT COUNT(*) FROM region").head.getLong(0) == 1)
    Thread.sleep(5)
    Seq(1L, 2L, 3L).toDF("region_id")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    graft.sql.Views.register(spark, dir)
    assert(spark.sql("SELECT COUNT(*) FROM region").head.getLong(0) == 3,
      "view served a stale plan after in-session regeneration")
  }
}

package graft

import java.nio.file.Files
import graft.ops.{Manifest, ManifestLake}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Metadata-only schema evolution on the manifest-list table
  * ([[ManifestLake.renameColumn]]/addColumn/dropColumn): data files are
  * never rewritten, reads map each logical column over its name
  * history, and time travel sees every snapshot under the schema it
  * had. */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("rename is metadata-only; old and new files read as one column") {
    val dir = Files.createTempDirectory("graft-sev").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "amount"), "load")
    val v0Files = Manifest.readAll(spark, dir, 0).map(_.path)
    val v0Stamps = v0Files.map(p => fs.getFileStatus(new Path(p))
      .getModificationTime)

    ManifestLake.renameColumn(spark, dir, "amount", "total")
    // rename touched zero data files
    v0Files.zip(v0Stamps).foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
    // current read: single logical column under the NEW name
    val cur = ManifestLake.read(spark, dir)
    assert(cur.columns.contains("total") && !cur.columns.contains("amount"))
    assert(cur.select("k", "total").as[(Long, Double)].collect().sortBy(_._1)
      .toSeq == Seq((1L, 10.0), (2L, 20.0)))

    // a post-rename merge writes under the new name; both epochs of
    // files coexist and read as ONE column
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 99.0), (3L, "b", 30.0)).toDF("k", "p", "total"), "u1")
    val merged = ManifestLake.read(spark, dir)
    assert(merged.columns.count(_ == "total") == 1)
    assert(!merged.columns.contains("amount"))
    assert(merged.select("k", "total").as[(Long, Double)].collect()
      .sortBy(_._1).toSeq == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))

    // time travel BEFORE the rename keeps the old name
    val v0 = ManifestLake.read(spark, dir, 0)
    assert(v0.columns.contains("amount") && !v0.columns.contains("total"))

    // chained rename composes over the whole history
    ManifestLake.renameColumn(spark, dir, "total", "grand_total")
    val chained = ManifestLake.read(spark, dir)
    assert(chained.columns.contains("grand_total"))
    assert(chained.select("k", "grand_total").as[(Long, Double)].collect()
      .sortBy(_._1).toSeq == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("add reads old files as NULL; drop hides the whole history") {
    val dir = Files.createTempDirectory("graft-sev2").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0)).toDF("k", "p", "v"), "load")
    ManifestLake.addColumn(spark, dir, "note")
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 20.0, "hi")).toDF("k", "p", "v", "note"), "u1")
    val cur = ManifestLake.read(spark, dir)
      .select(col("k"), col("note")).as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(cur == Seq((1L, None), (2L, Some("hi"))))

    // drop v: gone from current reads — including its pre-rename names
    ManifestLake.renameColumn(spark, dir, "v", "val2")
    ManifestLake.dropColumn(spark, dir, "val2")
    val dropped = ManifestLake.read(spark, dir)
    assert(!dropped.columns.contains("v") && !dropped.columns.contains("val2"))
    // time travel before the drop still carries the data
    val v1 = ManifestLake.read(spark, dir, 1)
    assert(v1.columns.contains("v"))
  }

  test("field ids make dead names recyclable; live collisions and hostile names reject") {
    val dir = Files.createTempDirectory("graft-sev4").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0)).toDF("k", "p", "amount"), "load")
    ManifestLake.renameColumn(spark, dir, "amount", "total")

    // r9 INVERSION (VERDICT r8 #5): re-using the renamed-away name is
    // now LEGAL — it creates a NEW field id, and per-file epochs keep
    // the old physical 'amount' bound to the old id (now named
    // 'total'), never aliased into the new column
    ManifestLake.addColumn(spark, dir, "amount", "double")
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 20.0, 99.0)).toDF("k", "p", "total", "amount"), "u1")
    val cur = ManifestLake.read(spark, dir)
      .select(col("k"), col("total"), col("amount"))
      .as[(Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    // old epoch: total = its physical 'amount' (the old id), new
    // 'amount' reads NULL; new epoch: both columns real
    assert(cur == Seq((1L, Some(10.0), None), (2L, Some(20.0), Some(99.0))),
      s"field-id resolution broke: $cur")

    // drop-then-re-add: the canonical recycled-name workflow
    ManifestLake.dropColumn(spark, dir, "total")
    ManifestLake.addColumn(spark, dir, "total", "string")
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((3L, "b", 1.0, "fresh")).toDF("k", "p", "amount", "total"), "u2")
    val rows = ManifestLake.read(spark, dir)
      .select(col("k"), col("total")).as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    // re-added name reads NULL for old epochs, new values after —
    // the old doubles never alias into the new string column
    assert(rows == Seq((1L, None), (2L, None), (3L, Some("fresh"))),
      s"recycled name aliased old data: $rows")

    // introducing a LIVE name still refuses (two ids, one name)
    intercept[IllegalArgumentException] {
      ManifestLake.addColumn(spark, dir, "amount")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "total", "amount")
    }
    intercept[IllegalArgumentException] { // 'k' is a live base column
      ManifestLake.addColumn(spark, dir, "k")
    }
    // names that would corrupt the line-oriented op log never commit
    intercept[IllegalArgumentException] {
      ManifestLake.addColumn(spark, dir, "a\"b")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "k", "x\ny")
    }
    // the log holds exactly the committed ops after all the rejections
    assert(ManifestLake.schemaOps(spark, dir).map(_.op) ==
      Seq("rename", "add", "drop", "add"))
  }

  test("live base column absent from the NEWEST file still collides; widen finds it") {
    // ADVICE r9 medium: columns land file-by-file within an epoch
    // (mergeSchema), so the newest footer is NOT the live-name oracle —
    // probing only it let a colliding add/rename silently retire the
    // implicit field id and orphan every existing value of the column.
    val dir = Files.createTempDirectory("graft-sev-union").toString
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((1L, "a", "keep", 7)).toDF("k", "p", "extra", "cnt"), "wide")
    // second commit WITHOUT 'extra'/'cnt' — now the newest file's
    // physical schema doesn't carry them, but both are live
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((2L, "b")).toDF("k", "p"), "narrow")
    intercept[IllegalArgumentException] {
      ManifestLake.addColumn(spark, dir, "extra")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "p", "extra")
    }
    // physicalTypeOf must find the int in the OLDER file: widen works
    ManifestLake.widenColumn(spark, dir, "cnt", "bigint")
    val rows = ManifestLake.read(spark, dir)
      .select(col("k"), col("cnt")).as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, Some(7L)), (2L, None)), s"widen broke: $rows")
  }

  test("liveness probe survives mixed physical types across epochs") {
    // ADVICE r10 medium: the probe used ONE mergeSchema read over all of
    // a version's files; after a metadata-only widen (old files int32,
    // post-widen files int64) parquet schema merge throws 'incompatible
    // data types', so a later add/rename of an UNRELATED name crashed
    // instead of validating. Presence is per-file now.
    val dir = Files.createTempDirectory("graft-sev-mixed").toString
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((1L, "a", 7)).toDF("k", "p", "qty"), "int-file")
    ManifestLake.widenColumn(spark, dir, "qty", "bigint")
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((2L, "b", 3000000000L)).toDF("k", "p", "qty"), "bigint-file")
    // unrelated add/rename must validate, not crash on schema merge
    ManifestLake.addColumn(spark, dir, "note", "string")
    ManifestLake.renameColumn(spark, dir, "note", "remark")
    // a COLLIDING add still rejects with the liveness error (and the
    // probe walked both epochs' footers to find 'p' live)
    ManifestLake.dropColumn(spark, dir, "remark")
    intercept[IllegalArgumentException] {
      ManifestLake.addColumn(spark, dir, "p")
    }
    val rows = ManifestLake.read(spark, dir)
      .select(col("k"), col("qty")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 7L), (2L, 3000000000L)), rows.toString)
  }

  test("widen: int->bigint is metadata-only, value-preserving, id-bound") {
    val dir = Files.createTempDirectory("graft-sev-widen").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 7), (2L, "a", 9)).toDF("k", "p", "qty"), "load")
    val v0Files = Manifest.readAll(spark, dir, 0).map(_.path)
    val v0Stamps = v0Files.map(p => fs.getFileStatus(new Path(p))
      .getModificationTime)
    ManifestLake.widenColumn(spark, dir, "qty", "bigint")
    // promotion touched zero data files
    v0Files.zip(v0Stamps).foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
    // reads are bigint NOW, old values intact
    val cur = ManifestLake.read(spark, dir)
    assert(cur.schema("qty").dataType.simpleString == "bigint")
    // next commit carries a value only bigint holds
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((3L, "a", 3000000000L)).toDF("k", "p", "qty"), "wide")
    val rows = ManifestLake.read(spark, dir)
      .select(col("k"), col("qty")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 7L), (2L, 9L), (3L, 3000000000L)), rows.toString)
    // widening survives a rename (bound to the field id, not the name)
    ManifestLake.renameColumn(spark, dir, "qty", "quantity")
    val renamed = ManifestLake.read(spark, dir)
    assert(renamed.schema("quantity").dataType.simpleString == "bigint")
    // drop + re-add of the name starts UN-widened (new field id)
    ManifestLake.dropColumn(spark, dir, "quantity")
    ManifestLake.addColumn(spark, dir, "qty", "int")
    val readd = ManifestLake.read(spark, dir)
    assert(readd.schema("qty").dataType.simpleString == "int")
    // time travel before the widen reads the original int
    val v0 = ManifestLake.read(spark, dir, 0)
    assert(v0.schema("qty").dataType.simpleString == "int")
  }

  test("widen rejections: narrowing, cross-family, dead and unknown columns") {
    val dir = Files.createTempDirectory("graft-sev-widen2").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 7, 1.5f, "x")).toDF("k", "p", "qty", "ratio", "tag"),
      "load")
    // bigint -> int is narrowing; string -> bigint is cross-family
    intercept[IllegalArgumentException] {
      ManifestLake.widenColumn(spark, dir, "k", "int")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.widenColumn(spark, dir, "tag", "bigint")
    }
    intercept[IllegalArgumentException] { // unknown column
      ManifestLake.widenColumn(spark, dir, "nope", "bigint")
    }
    ManifestLake.dropColumn(spark, dir, "qty")
    intercept[IllegalArgumentException] { // dead column
      ManifestLake.widenColumn(spark, dir, "qty", "bigint")
    }
    // float -> double IS legal
    ManifestLake.widenColumn(spark, dir, "ratio", "double")
    assert(ManifestLake.read(spark, dir)
      .schema("ratio").dataType.simpleString == "double")
  }

  test("declared add is visible as typed NULL before any file writes it") {
    val dir = Files.createTempDirectory("graft-sev5").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0)).toDF("k", "p", "v"), "load")
    ManifestLake.addColumn(spark, dir, "score", "double")
    // no file carries 'score' yet — schema merge can't surface it, so
    // the read path synthesizes a typed NULL (the docstring's contract)
    val cur = ManifestLake.read(spark, dir)
    assert(cur.columns.contains("score"), cur.columns.toSeq)
    assert(cur.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(cur.select("score").collect().forall(_.isNullAt(0)))
    // once a file writes it, real values win and old files read NULL
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 20.0, 0.5)).toDF("k", "p", "v", "score"), "u1")
    val after = ManifestLake.read(spark, dir)
      .select(col("k"), col("score")).as[(Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(after == Seq((1L, None), (2L, Some(0.5))))
  }

  test("evolution composes with MOR deletes and survives compaction") {
    val dir = Files.createTempDirectory("graft-sev3").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("k", "p", "amount"), "load")
    ManifestLake.renameColumn(spark, dir, "amount", "total")
    // delete THROUGH the mapped name — the predicate sees the logical
    // schema even though every data file still spells "amount"
    ManifestLake.deleteWhere(spark, dir, col("total") === 20.0, "d1")
    def rows() = ManifestLake.read(spark, dir)
      .select("k", "total").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows() == Seq((1L, 10.0), (3L, 30.0)))
    // compaction folds the vectors in, physically writing CURRENT names
    // — the mapping stays correct (current name wins the coalesce)
    ManifestLake.compactDeletes(spark, dir, "p", "k", "c1")
    assert(rows() == Seq((1L, 10.0), (3L, 30.0)))
  }
}

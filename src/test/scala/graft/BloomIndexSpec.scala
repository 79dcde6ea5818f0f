package graft

import java.nio.file.Files
import graft.ops.BloomIndex
import org.apache.spark.sql.functions._

/** Per-file bloom index ([[BloomIndex]]): no false negatives (pruned
  * reads recover every row), real pruning (admitted files ≪ layout),
  * deterministic rebuilds. */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  test("bloom_agg is partition-invariant: same keys, same bytes, no false negatives") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    graft.functions.VecExprs.register(spark)
    def bytesAt(keys: List[Long], n: Int): Array[Byte] =
      keys.toDF("k").repartition(n)
        .agg(expr("bloom_agg(k, 256L, 0.05)").as("b"))
        .collect()(0).getAs[Array[Byte]](0)
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
      parts <- Gen.chooseNum(1, 8)
    } yield (keys, parts)
    val prop = Prop.forAll(gen) { case (keys, parts) =>
      val b1 = bytesAt(keys, 1)
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b1))
      java.util.Arrays.equals(b1, bytesAt(keys, parts)) &&
        keys.forall(bf.mightContainLong)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("point lookups scan only admitted files and lose no rows") {
    val base = Files.createTempDirectory("graft-bloomidx").toString
    val (dataPath, idxPath) = (s"$base/data", s"$base/index")
    // 10k keys hash-spread over 16 files — every file's [min, max] key
    // span covers ~the whole domain, so span pruning would keep all 16
    (0L until 10000L).toDF("k").withColumn("payload", col("k") * 7)
      .repartition(16, col("k"))
      .write.mode("overwrite").parquet(dataPath)
    BloomIndex.build(spark, dataPath, "k", idxPath,
      expectedPerFile = 1024, fpp = 0.01)
    val idx = BloomIndex.load(spark, idxPath)
    assert(idx.size == 16, s"expected 16 file filters, got ${idx.size}")

    // present keys: admitted set is small and the read recovers the row
    val keys = Seq(17L, 4242L, 9999L)
    val files = BloomIndex.candidateFiles(idx, keys)
    assert(files.size <= 6, // 3 true files + fpp slack (deterministic)
      s"bloom admitted ${files.size} of 16 files")
    val got = spark.read.parquet(files: _*)
      .filter(col("k").isin(keys: _*))
      .select("k", "payload").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == keys.sorted.map(k => (k, k * 7)),
      "pruned read lost or corrupted a probed row")

    // absent key: essentially nothing admitted (fpp 1% over 16 files)
    val ghost = BloomIndex.candidateFiles(idx, Seq(123456789L))
    assert(ghost.size <= 2, s"absent key admitted ${ghost.size} files")

    // deterministic: a rebuild yields byte-identical filters
    val idxPath2 = s"$base/index2"
    BloomIndex.build(spark, dataPath, "k", idxPath2,
      expectedPerFile = 1024, fpp = 0.01)
    val again = BloomIndex.load(spark, idxPath2).toMap
    idx.foreach { case (f, bf) =>
      val out1 = new java.io.ByteArrayOutputStream()
      val out2 = new java.io.ByteArrayOutputStream()
      bf.writeTo(out1); again(f).writeTo(out2)
      assert(java.util.Arrays.equals(out1.toByteArray, out2.toByteArray),
        s"rebuild changed the filter for $f")
    }
  }

  test("string keys index by native bytes — the uuid-ish id case") {
    // Round 7's build cast every key to long: a string id became NULL
    // and the filter admitted nothing (false negatives — rows LOST).
    // Keys now enter by native type; this pins the string path end to
    // end: real pruning, no false negatives, long probes unaffected.
    val base = Files.createTempDirectory("graft-bloomidx-str").toString
    val (dataPath, idxPath) = (s"$base/data", s"$base/index")
    (0L until 10000L).toDF("n")
      .select(concat(lit("id-"), format_string("%08d", col("n"))).as("k"),
        (col("n") * 7).as("payload"))
      .repartition(16, col("k"))
      .write.mode("overwrite").parquet(dataPath)
    BloomIndex.build(spark, dataPath, "k", idxPath,
      expectedPerFile = 1024, fpp = 0.01)
    val idx = BloomIndex.load(spark, idxPath)
    assert(idx.size == 16)

    val keys = Seq("id-00000017", "id-00004242", "id-00009999")
    val files = BloomIndex.candidateFilesStr(idx, keys)
    assert(files.nonEmpty && files.size <= 6,
      s"string bloom admitted ${files.size} of 16 files")
    val got = spark.read.parquet(files: _*)
      .filter(col("k").isin(keys: _*))
      .select("k", "payload").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("id-00000017", 17L * 7),
      ("id-00004242", 4242L * 7), ("id-00009999", 9999L * 7)),
      "pruned string-key read lost or corrupted a probed row")

    // absent key: near-nothing admitted — and an empty candidate set is
    // a LEGAL return (callers must not hand zero paths to the reader)
    val ghost = BloomIndex.candidateFilesStr(idx, Seq("id-99999999"))
    assert(ghost.size <= 2, s"absent string key admitted ${ghost.size} files")
  }
}

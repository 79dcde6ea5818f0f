package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 layout/curation operators that the oracle
  * gate can't see: the quantizer's analytic error bound, the stratified
  * sampler's rate fidelity, and the write-once memoization contracts of
  * the bucketed and partitioned mirrors. */
class LayoutOpsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("int8 quantization: midpoint reconstruction is within half a cell everywhere") {
    // |x - recon| <= scale/2 analytically (x lies in its floor cell and
    // recon is the cell midpoint); the additive epsilon covers the
    // floating floor at cell boundaries
    val bad = T.embeddings(spark, sf001)
      .select(expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("scale", (array_max(col("v")) - array_min(col("v"))) / lit(255.0))
      .select(col("lo"), col("scale"), explode(col("v")).as("x"))
      .withColumn("code",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(floor((col("x") - col("lo")) / col("scale"))))
      .withColumn("recon", col("lo") + (col("code") + lit(0.5)) * col("scale"))
      .filter(abs(col("x") - col("recon")) > col("scale") * lit(0.5) + lit(1e-12))
      .count()
    assert(bad == 0L)
  }

  test("stratified sampler hits each language's target rate (fixed corpus)") {
    val rates = Map("en" -> 192.0 / 256, "de" -> 128.0 / 256,
      "fr" -> 64.0 / 256, "es" -> 32.0 / 256)
    val kept = SparkEntry.queries("curate_sample_stratified")(spark, sf01)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = T.documents(spark, sf01)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rate) <- rates) {
      val f = kept.getOrElse(lang, 0L).toDouble / totals(lang)
      // md5-uniform draw over a ~100-doc stratum: generous 3-sigma-ish slack
      assert(math.abs(f - rate) < 0.15, s"$lang kept $f vs target $rate")
    }
    // languages outside the rates dim must not leak into the sample
    assert(kept.keySet.subsetOf(rates.keySet), kept.keySet.toString)
  }

  test("bucketed mirror is write-once per source fingerprint") {
    val t1 = ops.Bucketing.ensure(spark, sf001, "orders", "o_orderkey")
    val t2 = ops.Bucketing.ensure(spark, sf001, "orders", "o_orderkey")
    assert(t1 == t2)
    assert(spark.catalog.tableExists(t1))
    val desc = spark.sql(s"DESCRIBE FORMATTED $t1").collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets"), desc)
    assert(desc.contains(ops.Bucketing.Buckets.toString), desc)
  }

  test("partitioned mirror is write-once and lays out one directory per value") {
    val p1 = ops.PartitionedLayout.ensure(spark, sf001, "documents", "lang")
    val p2 = ops.PartitionedLayout.ensure(spark, sf001, "documents", "lang")
    assert(p1 == p2)
    val root = new java.io.File(p1)
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), dirs.toString)
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: per-stage wall times of the near-dup jaccard
  * pipeline at a given SF dir, to localize which stage breaks
  * linearity at large SF. Not part of the query surface. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.T.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      split(col("text"), " ").as("tokens"))
    val sh = toks.select(col("doc_id"), col("lang"),
      array_distinct(expr("word_shingles3(tokens)")).as("shingle_set"))
      .withColumn("hs", expr("array_md5_sorted(shingle_set)"))
    t("shingles_count")(sh.count())
    val persisted = sh.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    t("shingles_persist")(persisted.count())
    val inv = persisted.withColumn("plen",
        size(col("shingle_set")) - expr("(4 * size(shingle_set) + 4) div 5") + lit(1))
      .select(col("doc_id"), col("lang"), explode(expr("slice(hs, 1, plen)")).as("s"))
    val cand = t("bucket_pairs") {
      val c = inv.groupBy(col("lang"), col("s"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"  cand rows = ${c.count()}")
      c
    }
    val sa = persisted.select(col("doc_id").as("doc_a"), col("shingle_set").as("sa"))
    val sb = persisted.select(col("doc_id").as("doc_b"), col("shingle_set").as("sb"))
    t("verify_join") {
      val n = cand.join(sa, "doc_a").join(sb, "doc_b")
        .select((size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (size(col("sa")) + size(col("sb")) -
            size(array_intersect(col("sa"), col("sb")))).cast("double")).as("j"))
        .filter(col("j") >= 0.8).count()
      println(s"  pairs kept = $n")
    }
    spark.stop()
  }
}

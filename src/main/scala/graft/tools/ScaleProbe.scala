package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for SCALE.md investigations: posting-list and
  * candidate-pair statistics of the near-dup prefix index at a given
  * SF dir — the quantities that decide whether candidate generation is
  * linear in corpus size. Not part of the query surface. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val docs = graft.T.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      split(col("text"), " ").as("tokens"))
    val sh = toks.select(col("doc_id"), col("lang"),
      array_distinct(expr(
        "transform(sequence(1, greatest(size(tokens)-2, 1)), i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1]))")).as("s"))
      .withColumn("hs", expr("array_md5_sorted(s)"))
    val inv = sh.withColumn("plen",
        size(col("s")) - expr("(4 * size(s) + 4) div 5") + lit(1))
      .select(col("doc_id"), col("lang"), explode(expr("slice(hs, 1, plen)")).as("sh"))
    val posts = inv.groupBy(col("lang"), col("sh")).agg(count(lit(1)).as("m"))
    val stats = posts.agg(count(lit(1)).as("n_keys"), sum(col("m")).as("n_posts"),
      max(col("m")).as("max_m"), sum(col("m") * (col("m") - 1) / 2).as("cand_pairs")).first()
    println(s"PROBE dir=$dir keys=${stats.get(0)} posts=${stats.get(1)} maxPost=${stats.get(2)} candPairs=${stats.get(3)}")
    spark.stop()
  }
}

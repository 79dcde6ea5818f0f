package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-split diagnostic for the `ann_knn_join` scale wall (VERDICT
  * r12 #1): times the steady-state query's phases separately — mirror
  * read, probe expansion, candidate join + cosine, and the top-3 —
  * against a dir whose index artifacts are already warm, so the 11.7×/
  * decade overage is attributed to a PHASE, not guessed from totals.
  * Usage: KnnStageProbe <sfDir>. Not part of the query surface.
  */
object KnnStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[knnstage] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n")
    }
    // steady state: build mirrors once (untimed here beyond the tag)
    timed("warm (train+mirror)") {
      graft.queries.Similarity.knnFrameForProbe(spark, dir).count()
    }
    val frame = graft.queries.Similarity.knnFrameForProbe(spark, dir)
    timed("full knn (steady)") { frame.count() }
    // phase splits on the same bucketed serving tables the query reads
    val (corpusT, probeT) =
      graft.queries.Similarity.knnServingTablesForProbe(spark, dir)
    val corpus = spark.table(corpusT)
    timed("corpus scan") { corpus.count() }
    val probes = spark.table(probeT)
    timed("probe scan") { probes.count() }
    val cand = corpus.hint("shuffle_hash").join(probes,
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        expr("vec_dot(v, qv)") / (col("nrm") * col("qn")))
      .select(col("query_id"), col("vec_id"), col("cosine"))
    timed("candidate join + cosine") { cand.count() }
    timed("cand + filter>=0.45") { cand.filter(col("cosine") >= 0.45).count() }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: time the stages of dedup_semantic_knn separately
  * (knn frame vs edge build vs components vs final join) so SCALE.md
  * rows attribute wall time to the right operator. Not query surface.
  * Usage: CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[ccprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      a
    }
    val knn = timed("knn_frame") {
      val df = graft.queries.Similarity.knnFrameForProbe(spark, dir)
      df.localCheckpoint(true)
    }
    val edges = timed("edges") {
      knn.filter(col("cosine") >= 0.45)
        .select(least(col("query_id"), col("neighbor_id")).as("doc_a"),
          greatest(col("query_id"), col("neighbor_id")).as("doc_b"))
        .distinct().localCheckpoint(true)
    }
    println(s"[ccprobe] edge_count ${edges.count()}")
    val labels = timed("altstar") {
      val l = graft.ops.Graph.altStarComponents(edges)
      l.localCheckpoint(true)
    }
    println(s"[ccprobe] labels ${labels.count()}")
    spark.stop()
  }
}

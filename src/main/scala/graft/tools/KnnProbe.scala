package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch diagnostic for SCALE.md: the `ann_knn_join` operator with a
  * PARAMETERIZED cell count. The gate pins C=8 so the DuckDB oracle
  * can replay the training CTEs, which makes the join Θ(N²/C) — fine
  * at gate scale, quadratic-dominated by sf10 (200k vectors ⇒ ~1e10
  * candidate dots). The documented contract is C ~ √N: cell-mates per
  * vector stay O(√N) and the join is O(N^1.5). This probe measures
  * exactly that — same operator, same plan shape, C passed in — so
  * the contract line in SCALE.md is a number, not a claim.
  * Usage: KnnProbe <sfDir> <C> [iters]. Not part of the query surface.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val c = args(1).toInt
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val e = graft.T.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
    val n = e.count()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (cent, tTrain) = timed {
      graft.ops.KMeans.train(e, c, iters)
    }
    val centQ = cent.select(col("cent_id"), col("cv").as("qv"), col("cn"))
    def corpus(): DataFrame = e.crossJoin(broadcast(centQ))
      .withColumn("ccos", expr("vec_dot(v, qv)") / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    val probes = corpus()
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell").as("qcell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val (rows, tJoin) = timed {
      corpus().hint("shuffle_hash").join(probes,
          col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
        .withColumn("cosine", expr("vec_dot(v, qv)") / (col("nrm") * col("qn")))
        .select(col("query_id"), col("vec_id"), col("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .count()
    }
    println(f"KNN dir=$dir n=$n C=$c train=$tTrain%.1fs join=$tJoin%.1fs " +
      f"rows=$rows")
    spark.stop()
  }
}

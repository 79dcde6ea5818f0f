package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-build cost probe for the IVF coarse quantizer: times
  * KMeans.train on the full corpus vs the 25% md5 hash-sample
  * (ann_ivf_sampled's training set) at one SF. Usage:
  * TrainProbe <sfDir> [k] — prints one JSON line. */
object TrainProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExprs.register(spark)
    val k = if (a.length > 1) a(1).toInt else 8
    val e = spark.read.parquet(s"${a(0)}/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
      .localCheckpoint(true) // charge the scan once, not to either trainee
    val n = e.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tFull = time(graft.ops.KMeans.train(e, k, 3).count())
    val samp = e.filter(
      substring(md5(col("vec_id").cast("string")), 1, 2) < "40")
      .localCheckpoint(true)
    val ns = samp.count()
    val tSamp = time(graft.ops.KMeans.train(
      samp, k, 3, init = Some(e.filter(col("vec_id") < k))).count())
    println(s"""{"n":$n,"n_sample":$ns,"k":$k,""" +
      s""""train_full_sec":$tFull,"train_sampled_sec":$tSamp}""")
    spark.stop()
  }
}

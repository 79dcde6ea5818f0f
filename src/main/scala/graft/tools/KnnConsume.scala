package graft.tools
import org.apache.spark.sql.SparkSession
object KnnConsume {
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
      val t0 = System.nanoTime(); val a = f
      println(f"[kc] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val df = graft.queries.Similarity.knnFrameForProbe(spark, dir)
    println("== DF PLAN ==")
    println(df.queryExecution.executedPlan.toString.take(4000))
    val cnt = df.groupBy().count()
    println("== COUNT PLAN ==")
    println(cnt.queryExecution.executedPlan.toString.take(4000))
    timed("count")(df.count())
    timed("ckpt")(df.localCheckpoint(true))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does the per-query fixed cost go at bench scale? The sf0.1
  * suite spends ~0.45 s/query and the tail (~180 queries under 1 s) is
  * mostly NOT data work — this probe splits a representative query's
  * wall into (builder call [includes parquet schema/footer reads +
  * mirror existence checks]) / (analysis+optimization+physical
  * planning) / (first execution incl. codegen) / (steady-state
  * re-execution), so optimization targets the real sink instead of the
  * guessed one (guide §1.1). Usage:
  *   tools/run.sh graft.tools.FixedCostProbe <sfDir> <query>[,query...]
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup identical to Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold pass = what the bench's timed loop pays
      var t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val buildMs = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis→physical planning
      val planMs = ms(t0)
      t0 = System.nanoTime()
      df.count()
      val exec1Ms = ms(t0)
      t0 = System.nanoTime()
      df.count()
      val exec2Ms = ms(t0)
      // a SECOND full builder round-trip: how much of build+plan repeats
      t0 = System.nanoTime()
      val df2 = fn(spark, sfDir)
      val build2Ms = ms(t0)
      t0 = System.nanoTime()
      df2.queryExecution.executedPlan
      val plan2Ms = ms(t0)
      t0 = System.nanoTime()
      df2.count()
      val exec3Ms = ms(t0)
      println(f"$name%-28s build=$buildMs%7.1f plan=$planMs%7.1f exec1=$exec1Ms%7.1f execRe=$exec2Ms%7.1f | rebuild=$build2Ms%7.1f replan=$plan2Ms%7.1f reexec=$exec3Ms%7.1f ms")
    }
    spark.stop()
  }
}

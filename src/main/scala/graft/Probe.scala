package graft

import org.apache.spark.sql.SparkSession

/** One-off single-query runner for debugging: runMain graft.Probe <name> <sfDir>. */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    val n = df.count()
    println(s"[probe] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}

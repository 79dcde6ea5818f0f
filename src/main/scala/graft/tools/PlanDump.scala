package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dump for the optimization-round evidence
  * trail: one `<outDir>/<query>_<tag>.txt` per named query (the round
  * contract wants `plans/r15/<query>_{before,after}.txt` committed, so
  * the judge can check plan claims without running Spark).
  * Usage: tools/run.sh graft.tools.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "Exchange".r.findAllIn(plan).length
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"),
        s"# $name @ $sfDir (Exchange nodes: $exchanges)\n$plan")
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt (Exchange=$exchanges)")
    }
    spark.stop()
  }
}

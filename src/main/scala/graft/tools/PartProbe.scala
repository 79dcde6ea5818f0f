package graft.tools

import org.apache.spark.sql.SparkSession

/** Shuffle-width experiment for the sf30 spill step (SCALE.md r10-s4):
  * same queries, same data, one knob — AQE's initialPartitionNum.
  * Usage: PartProbe <sfDir> <initialPartitionNum> <q1,q2,...> */
object PartProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        a(1).toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = a(2).split(",").toSeq
    a.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    spark.read.parquet(s"${a(0)}/lineitem.parquet").count()
    val times = qs.map { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, a(0)).count() // warm
      val t0 = System.nanoTime()
      fn(spark, a(0)).count()
      q -> (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"init_parts":${a(1)},""" + times.map { case (q, t) =>
      s""""$q":${"%.2f".format(t)}""" }.mkString(",") + "}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic steady-state A/B harness: time named queries (median of N
  * re-executions of the full builder+count round trip, like the bench's
  * timed loop) under a list of session-conf overrides, in ONE JVM so
  * JIT/codegen warmup is shared. Only RUNTIME-settable confs can be
  * probed this way. Usage:
  *   tools/run.sh graft.tools.ConfProbe <sfDir> <q1,q2> <reps> [k=v,k=v ...]
  * Each trailing arg is one conf SET to apply (comma-separated k=v);
  * "base" means no overrides. Every set is restored before the next.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args(2).toInt
    val sets = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // untimed warm (mirrors built, codegen hot)
      sets.foreach { set =>
        val kvs = if (set == "base") Seq.empty
          else set.split(",").toSeq.map { kv =>
            val Array(k, v) = kv.split("=", 2); (k, v)
          }
        val saved = kvs.map { case (k, _) =>
          k -> (try Some(spark.conf.get(k)) catch { case _: Throwable => None })
        }
        kvs.foreach { case (k, v) => spark.conf.set(k, v) }
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e6
        }.sorted
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
        val med = ts(ts.size / 2)
        println(f"$name%-26s ${set.take(70)}%-70s med=$med%8.1f ms (min=${ts.head}%8.1f max=${ts.last}%8.1f)")
      }
    }
    spark.stop()
  }
}

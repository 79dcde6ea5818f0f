package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SpanVol {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val r = graft.SparkEntry.queries("dedup_substring_spans")(spark, d)
        .agg(sum("n_spans"), sum("n_dup_spans")).collect()(0)
      println(s"[spanvol] $d n_spans=${r.getLong(0)} n_dup=${r.getLong(1)}")
    }
    spark.stop()
  }
}

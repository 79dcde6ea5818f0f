package graft.tools
import org.apache.spark.sql.SparkSession
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long) = (System.nanoTime()-t0)/1e6
    // warm
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    for (t <- Seq("lineitem","documents","orders","region")) {
      val p = s"$dir/$t.parquet"
      var t0 = System.nanoTime(); val df1 = spark.read.parquet(p); val c1 = ms(t0)
      t0 = System.nanoTime(); val df2 = spark.read.parquet(p); val c2 = ms(t0)
      t0 = System.nanoTime(); val df3 = spark.read.parquet(p); val c3 = ms(t0)
      val sch = df1.schema
      t0 = System.nanoTime(); val df4 = spark.read.schema(sch).parquet(p); val c4 = ms(t0)
      t0 = System.nanoTime(); df1.createOrReplaceTempView(t); val c5 = ms(t0)
      println(f"$t%-12s read1=$c1%7.1f read2=$c2%7.1f read3=$c3%7.1f withSchema=$c4%7.1f view=$c5%6.1f ms")
    }
    // Views.register cost, twice
    var t0 = System.nanoTime(); graft.sql.Views.register(spark, dir); val r1 = ms(t0)
    t0 = System.nanoTime(); graft.sql.Views.register(spark, dir); val r2 = ms(t0)
    println(f"Views.register: first=$r1%7.1f repeat=$r2%7.1f ms")
    spark.stop()
  }
}

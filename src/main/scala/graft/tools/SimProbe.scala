package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for SCALE.md: SimHash banding candidate volumes —
  * the 4×15-bit band scheme's random-collision term (Σ C(m,2) over
  * buckets ≈ N²/2¹⁵) vs the Manku-style C(6,3) combination tables
  * (30-bit keys, ≈ 20·N²/2³⁰). Both schemes have full recall at
  * hamming ≤ 3 (pigeonhole), so the VERIFIED edge set is identical —
  * only the candidate volume differs. Not part of the query surface. */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    val tok = graft.T.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("h",
        expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"))
    val bitSums = (0 until 60).map(i =>
      sum(when(expr(s"shiftright(h, $i) % 2 = 1"), 1L).otherwise(-1L)).as(s"b$i"))
    val sim = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .localCheckpoint(true)
    val n = sim.count()
    // scheme A: 4 bands × 15 bits
    val a = sim.withColumn("band", explode(array((0 until 4).map(lit): _*)))
      .withColumn("bval", expr("shiftright(simhash, 15 * band) % 32768"))
      .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("m"))
      .agg(sum(expr("m * (m - 1) / 2")).as("pairs")).first().get(0)
    // scheme B: C(6,3) = 20 combination tables over 10-bit blocks
    val combos = (0 until 6).combinations(3).toSeq.zipWithIndex
    val keys = combos.map { case (Seq(x, y, z), cid) =>
      struct(lit(cid).as("tb"), expr(
        s"((shiftright(simhash, ${10 * x}) % 1024) * 1024 + " +
          s"(shiftright(simhash, ${10 * y}) % 1024)) * 1024 + " +
          s"(shiftright(simhash, ${10 * z}) % 1024)").as("k"))
    }
    val b = sim.select(col("doc_id"), explode(array(keys: _*)).as("p"))
      .groupBy(col("p.tb"), col("p.k")).agg(count(lit(1)).as("m"))
      .agg(sum(expr("m * (m - 1) / 2")).as("pairs")).first().get(0)
    println(s"SIMPROBE dir=$dir docs=$n bands4x15_pairs=$a combo20x30_pairs=$b")
    spark.stop()
  }
}

package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salting must be a pure plan rewrite: identical results to the unsalted
  * aggregation/join on skewed input (one key holding ~90% of rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (
    (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("warm", i.toLong)) ++
      Seq(("cold", 7L))
    ).toDF("k", "v")

  test("saltedAggregate ≡ plain groupBy on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(skewed, Seq("k"), buckets = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn"), max("v").as("pmx")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n"), max("pmx").as("mx")))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedAggregate spreads a hot key over multiple salt buckets") {
    val salted = skewed.withColumn("salt",
      pmod(hash(col("k"), col("v")), lit(8)))
    val hotBuckets = salted.filter(col("k") === "hot")
      .select("salt").distinct().count()
    assert(hotBuckets > 4, s"expected hot key spread over >4 of 8 buckets, got $hotBuckets")
  }

  test("saltedJoin ≡ plain inner join, including duplicate right keys") {
    val dim = Seq(("hot", "H"), ("warm", "W"), ("warm", "W2"), ("miss", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"), "inner")
      .orderBy("k", "v", "label").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8)
      .orderBy("k", "v", "label").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty && !plain.exists(_.getString(0) == "miss"))
  }
}

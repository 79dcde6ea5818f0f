package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[graft.functions.KmvBottomK]] — bounded bottom-k distinct sketch.
  * Spec: result = sorted distinct values, first k — regardless of
  * partitioning (the merge path) or duplication. */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def kmv(values: Seq[String], k: Int, parts: Int): Seq[String] = {
    graft.functions.VecExprs.register(spark)
    values.toDF("v").repartition(parts)
      .agg(expr(s"kmv_bottomk(v, $k)").as("ks"))
      .as[Seq[String]].head()
  }

  test("property: bottom-k of the distinct set, any partitioning, dups ignored") {
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(0, 40).map(n => f"v$n%02d"))
      k <- Gen.chooseNum(1, 8)
      parts <- Gen.chooseNum(1, 7)
    } yield (vs, k, parts)
    val prop = Prop.forAll(gen) { case (vs, k, parts) =>
      kmv(vs, k, parts) == vs.distinct.sorted.take(k)
    }
    check(prop, n = 10)
  }

  test("grouped: per-group state independent; under-k group held exactly") {
    graft.functions.VecExprs.register(spark)
    val df = Seq(
      ("a", "x3"), ("a", "x1"), ("a", "x2"), ("a", "x1"), ("a", "x9"),
      ("b", "y1")).toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(expr("kmv_bottomk(v, 3)").as("ks"))
      .orderBy("g").as[(String, Seq[String])].collect().toSeq
    assert(out == Seq(("a", Seq("x1", "x2", "x3")), ("b", Seq("y1"))))
  }

  test("nulls are skipped, not kept") {
    graft.functions.VecExprs.register(spark)
    val out = Seq(Some("b"), None, Some("a"), None).toDF("v")
      .agg(expr("kmv_bottomk(v, 5)").as("ks")).as[Seq[String]].head()
    assert(out == Seq("a", "b"))
  }

  test("callable from SQL text") {
    graft.functions.VecExprs.register(spark)
    spark.range(0, 100).select(md5(col("id").cast("string")).as("h"))
      .createOrReplaceTempView("kmv_sql_in")
    val got = spark.sql("SELECT kmv_bottomk(h, 4) AS ks FROM kmv_sql_in")
      .as[Seq[String]].head()
    val want = (0 until 100)
      .map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .sorted.take(4)
    assert(got == want)
  }
}

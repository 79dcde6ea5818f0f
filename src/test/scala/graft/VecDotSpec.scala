package graft

import graft.functions.VecExprs
import org.apache.spark.sql.functions._

/** The codegen'd vec_dot must agree exactly with the interpreted
  * higher-order-function fold it replaced (same left-to-right association
  * ⇒ bit-identical doubles), and obey the null contract. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 AS double), (s, x) -> s + x)"

  test("vec_dot ≡ interpreted HOF fold, bit-exact") {
    VecExprs.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.7, 0.11, 13.0)),
      (Array.fill(64)(math.Pi / 7), Array.tabulate(64)(i => i * 0.013 - 0.4)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val r = df.select(
      expr("vec_dot(a, b)").as("fast"), expr(hofDot).as("ref")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("vec_dot of empty arrays is 0.0; null input yields null") {
    VecExprs.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(cast(array() AS array<double>), cast(array() AS array<double>)) AS z,
        |  vec_dot(cast(null AS array<double>), array(1.0d)) AS n""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1))
  }

  test("word_shingles3 ≡ the HOF transform spelling, including short inputs") {
    VecExprs.register(spark)
    val df = Seq(
      "the quick brown fox jumps",
      "a b c",
      "one two",
      "solo",
      "").toDF("text").select(split(col("text"), " ").as("tokens"))
    val r = df.select(
      expr("word_shingles3(tokens)").as("fast"),
      expr("CASE WHEN size(tokens) >= 3 THEN transform(sequence(0, size(tokens)-3), i -> concat(tokens[i], ' ', tokens[i+1], ' ', tokens[i+2])) ELSE array() END").as("ref"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[String](0) == row.getSeq[String](1))
    }
  }

  test("array_md5_sorted ≡ array_sort(transform(md5)) spelling") {
    VecExprs.register(spark)
    val df = Seq(Seq("zebra", "apple", "mango", ""), Seq("x"), Seq.empty[String])
      .toDF("arr")
    val r = df.select(
      expr("array_md5_sorted(arr)").as("fast"),
      expr("array_sort(transform(arr, s -> md5(s)))").as("ref")).collect()
    r.foreach(row => assert(row.getSeq[String](0) == row.getSeq[String](1)))
  }

  test("vec_dot also evaluates correctly on the interpreted path") {
    // Force the non-codegen evaluator: same inputs, same results.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      VecExprs.register(spark)
      val r = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
        .select(expr("vec_dot(a, b)")).collect().head.getDouble(0)
      assert(r == 13.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}

package graft

import graft.functions.WordShingles3
import graft.plans.ShingleRewrite
import org.apache.spark.sql.functions._

/** The optimizer rule swaps the declarative HOF shingle spelling for the
  * codegen expression — and leaves everything else alone. */
class RuleSpec extends SparkSpec {
  import spark.implicits._

  // file-backed source: a literal Seq would be constant-folded into a
  // LocalRelation before any injected optimizer rule could see the pattern
  private def shingleDf = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(split(col("text"), " ").as("tokens"))
    .select(expr(
      "transform(sequence(0, size(tokens)-3), i -> concat(tokens[i], ' ', tokens[i+1], ' ', tokens[i+2]))")
      .as("sh"))

  test("rewrites the canonical HOF shingle pattern to WordShingles3") {
    val before = shingleDf.queryExecution.optimizedPlan
    val after = ShingleRewrite(before)
    assert(after.expressions.exists(_.exists(_.isInstanceOf[WordShingles3])),
      s"rule did not fire on:\n$before")
  }

  test("does not touch non-matching transforms") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("tokens"))
      .select(expr(
        "transform(sequence(0, size(tokens)-2), i -> concat(tokens[i], ' ', tokens[i+1]))")
        .as("bigrams"))
    val plan = df.queryExecution.optimizedPlan
    assert(ShingleRewrite(plan) == plan)
  }

  private val RkHof =
    """aggregate(transform(sequence(1, length(text)),
      |  i -> cast(ascii(substring(text, i, 1)) AS bigint)),
      |  0L, (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin

  test("rewrites the portable rolling-hash fold to RabinKarpHash") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr(RkHof).as("rhash"))
    val before = df.queryExecution.optimizedPlan
    val after = graft.plans.RollingHashRewrite(before)
    assert(after.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.RabinKarpHash])),
      s"rule did not fire on:\n$before")
  }

  test("does not touch a fold with a different base") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr(RkHof.replace("a * 31", "a * 33")).as("rhash"))
    val plan = df.queryExecution.optimizedPlan
    assert(graft.plans.RollingHashRewrite(plan) == plan)
  }

  test("rabin_karp computes the identical hash, incl. non-ASCII + empty") {
    graft.functions.VecExprs.register(spark)
    val rows = Seq("the quick brown fox", "café crème €42", "", "a")
      .toDF("text")
      .select(expr("rabin_karp(text)").as("fast"), expr(RkHof).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("rewritten expression computes the identical shingles") {
    // end-to-end: the codegen function (what the rule substitutes) vs the
    // HOF spelling it replaces, on the same input
    graft.functions.VecExprs.register(spark)
    val both = Seq("the quick brown fox jumps over").toDF("text")
      .select(split(col("text"), " ").as("tokens"))
      .select(
        expr("word_shingles3(tokens)").as("fast"),
        expr("transform(sequence(0, size(tokens)-3), i -> concat(tokens[i], ' ', tokens[i+1], ' ', tokens[i+2]))").as("ref"))
      .collect().head
    assert(both.getSeq[String](0) == both.getSeq[String](1))
  }
}

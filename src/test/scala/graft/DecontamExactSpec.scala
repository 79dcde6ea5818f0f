package graft

import org.apache.spark.sql.functions._

/** Exact-substring decontamination (VERDICT r6 item 7): the gram filter
  * answers only "shares ≥1 3-gram?"; the run detector must measure the
  * exact overlap length so a planted verbatim quote is separable from an
  * incidental gram collision — the case where treating every gram hit as
  * contamination would either over-purge (drop docs with one shared
  * idiom) or, with any n_shared threshold, miss real quotes in long docs.
  */
class DecontamExactSpec extends SparkSpec {

  private def detector(corpus: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame) = {
    graft.functions.VecExprs.register(spark)
    def sh(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr("word_shingles3(tokens)"))
    val evalGrams = sh(evalDocs).select(explode(col("shingles")).as("g")).distinct()
    graft.queries.Curation.exactOverlapRuns(sh(corpus), evalGrams)
  }

  test("a planted 50-token eval quote is measured at exactly 50; a lone gram collision at 3") {
    import spark.implicits._
    val quote = (1 to 50).map(i => s"q$i").mkString(" ")
    val evalDocs = Seq((0L, s"eval preamble $quote eval coda")).toDF("doc_id", "text")
    val corpus = Seq(
      // doc 1: the verbatim 50-token quote embedded mid-document
      (1L, s"alpha beta gamma $quote delta epsilon"),
      // doc 2: shares exactly ONE 3-gram with the eval doc ("q7 q8 q9"
      // appears, but its neighbors differ) — gram-level noise
      (2L, "zeta q7 q8 q9 eta theta iota kappa"),
      // doc 3: no overlap at all
      (3L, "lorem ipsum dolor sit amet consectetur")
    ).toDF("doc_id", "text")
    val got = detector(corpus, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 50L, s"quote length mis-measured: $got")
    assert(got(2L) == 3L, s"single collision should measure 3: $got")
    assert(!got.contains(3L), s"clean doc flagged: $got")
    // the ≥8 gate keeps the quote and drops the collision — the
    // separation the plain gram filter cannot make (both docs have
    // n_shared ≥ 1 there)
    assert(got.filter(_._2 >= 8).keySet == Set(1L))
  }

  test("two disjoint runs in one doc report the LONGEST, not the sum") {
    import spark.implicits._
    val a = (1 to 12).map(i => s"a$i").mkString(" ") // 12-token quote
    val b = (1 to 20).map(i => s"b$i").mkString(" ") // 20-token quote
    val evalDocs = Seq((0L, s"$a unrelated filler words $b")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"intro $a middle words here then $b outro")
    ).toDF("doc_id", "text")
    val got = detector(corpus, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 20L, s"longest run should win: $got")
  }

  test("the registered gate runs green end-to-end on testdata") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("curate_decontaminate_exact")(spark, sf)
    val rows = df.collect()
    // every reported overlap respects the ≥8 gate and is a real token length
    assert(rows.forall(_.getLong(1) >= 8L))
  }
}

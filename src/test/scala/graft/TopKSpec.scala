package graft

import graft.ops.TopK
import org.apache.spark.sql.functions._

/** Custom top-k-per-group physical operator: equivalence with the window
  * idiom, edge cases, and plan shape. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 5.0),
    ("c", 7L, 1.0)
  ).toDF("grp", "id", "score")

  test("matches the window row_number idiom, ties broken by the sort order") {
    val custom = TopK.perGroup(df, Seq("grp"),
        Seq(col("score").desc, col("id").asc), 2)
      .orderBy("grp", "id").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .orderBy("grp", "id").collect().map(_.toSeq).toSeq
    assert(custom == windowed)
    // ties at score=30: ids 2 and 4 win for group a; both 5.0s for b
    assert(custom.map(r => (r.head, r(1))) ==
      Seq(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("k larger than any group returns every row; k=1 returns one per group") {
    assert(TopK.perGroup(df, Seq("grp"), Seq(col("score").asc), 100).count() == 7)
    val one = TopK.perGroup(df, Seq("grp"), Seq(col("score").asc, col("id")), 1)
      .orderBy("grp").collect()
    assert(one.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 5L), ("c", 7L)))
  }

  test("plans a partial/final pair around one group-key exchange, no sort") {
    val plan = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan) // map-side heaps
    assert(plan.contains("TopKPerGroupFinal"), plan)   // post-shuffle re-heap
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort "), plan) // the window idiom would sort
  }

  test("multi-column groups and empty input") {
    val multi = TopK.perGroup(df.withColumn("g2", col("grp")),
      Seq("grp", "g2"), Seq(col("score").desc, col("id")), 1)
    assert(multi.count() == 3)
    val empty = TopK.perGroup(df.filter(col("score") > 1000),
      Seq("grp"), Seq(col("score").desc), 2)
    assert(empty.count() == 0)
  }
}

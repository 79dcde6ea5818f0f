package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step under near-dup
  * deduplication (pairs → components → one survivor per component).
  *
  * Min-label propagation accelerated with pointer doubling
  * (label ← label(label)), so rounds are O(log diameter) instead of
  * O(diameter). Every round localCheckpoints: persist would keep nesting
  * the logical plan (~3× per round — the analyzer, not the data, blows
  * up; see NOTES.md). The loop's shuffle width is pinned to the edge
  * volume and restored afterwards — iteration state is tiny relative to
  * the corpus that produced the pairs.
  */
object Graph {

  /** @param pairs undirected edges as two long columns (any names);
    *              vertices not present in any pair are absent from the
    *              output (they are their own singleton component).
    * @return (id, label) — label = min vertex id of the component.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    val fwd = pairs.select(col(ca).as("doc_a"), col(cb).as("doc_b"))
    val edges = fwd
      .unionByName(fwd.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    val spark = edges.sparkSession
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val loopParts = math.max(1L, edges.count() / 1000000L).toString
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {
      var labels = edges.groupBy(col("doc_a").as("id"))
        .agg(min(col("doc_b")).as("nbr0"))
        .select(col("id"), least(col("id"), col("nbr0")).as("label"))
        .localCheckpoint(true)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 40) {
        val viaNbr = edges.join(labels, edges("doc_b") === labels("id"))
          .groupBy(col("doc_a").as("nid")).agg(min(col("label")).as("nbr_min"))
        val viaPtr = labels.as("l")
          .join(labels.as("p"), col("l.label") === col("p.id"))
          .select(col("l.id").as("pid"), col("p.label").as("ptr_min"))
        val next = labels
          .join(viaNbr, labels("id") === col("nid"), "left")
          .join(viaPtr, labels("id") === col("pid"), "left")
          .select(labels("id"), labels("label").as("old"),
            least(labels("label"),
              coalesce(col("nbr_min"), labels("label")),
              coalesce(col("ptr_min"), labels("label"))).as("label"))
          .localCheckpoint(true)
        changed = next.filter(col("label") =!= col("old")).count()
        labels = next.select(col("id"), col("label"))
        rounds += 1
      }
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup candidate generation (SCALE.md "where the next
  * 10× goes" #3): once a corpus's LSH signatures are persisted as an
  * index partitioned by bucket, NEW data never re-joins the corpus with
  * itself. A delta of D docs against a corpus of N costs
  *
  *   delta⋈index bucket join (|D|·bucketFanout lookups)
  *   + delta self-join (|D|² worst case, tiny)
  *
  * instead of the (N+D)² full recompute — the difference between an
  * hourly ingest tick and a weekly cluster-wide job at 100 TB.
  *
  * Signature-agnostic: works over any (doc_id, bucket) frame — MinHash
  * band hashes, SimHash bands, blocking keys — because bucket-collision
  * candidacy is the common LSH contract. Completeness is exact by
  * construction (a qualifying pair within the union shares a bucket;
  * both its docs are in corpus — already known — or at least one is in
  * the delta — produced here), and the equivalence against a full
  * recompute on real documents is pinned by IncrementalDedupSpec.
  */
object IncrementalDedup {

  /** All bucket-collision pairs within one signature frame —
    * the "full recompute" baseline. Columns: (doc_id, bucket). */
  def candidates(sigs: DataFrame): DataFrame =
    sigs.as("x").join(sigs.as("y"), "bucket")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** Candidate pairs a delta ADDS to an indexed corpus: delta-vs-corpus
    * bucket collisions plus within-delta collisions. Union with the
    * corpus's own (already-known) pairs to equal `candidates(corpus ∪
    * delta)`. Requires corpus and delta doc_id sets to be disjoint —
    * re-ingested ids belong in the corpus index, not the delta. */
  def newCandidates(corpusSigs: DataFrame, deltaSigs: DataFrame): DataFrame = {
    val cross = deltaSigs.as("d").join(corpusSigs.as("c"), "bucket")
      .select(
        least(col("d.doc_id"), col("c.doc_id")).as("doc_a"),
        greatest(col("d.doc_id"), col("c.doc_id")).as("doc_b"))
    val within = deltaSigs.as("x").join(deltaSigs.as("y"), "bucket")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    cross.unionByName(within).distinct()
  }
}

package graft

import graft.ops.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup completeness: corpus-pairs ∪ delta-increment must
  * equal the full recompute over the union — on real document
  * signatures, not toy rows. */
class IncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Real signature frame: md5-band blocking over the documents table
    * (lang × length band × md5 prefix of the head), several buckets per
    * doc like banded MinHash. */
  private def sigs(filter: String): DataFrame =
    T.documents(spark, sf).filter(filter)
      .select(col("doc_id"),
        explode(array(
          concat_ws("#", col("lang"), floor(col("n_chars") / 25)),
          concat_ws("#", col("lang"), substring(md5(col("text")), 1, 1)),
          substring(md5(substring(col("text"), 1, 30)), 1, 3)
        )).as("bucket"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("corpus pairs + delta increment ≡ full recompute over the union") {
    val corpus = sigs("doc_id < 400")
    val delta = sigs("doc_id >= 400")
    val full = pairSet(IncrementalDedup.candidates(sigs("true")))
    val known = pairSet(IncrementalDedup.candidates(corpus))
    val added = pairSet(IncrementalDedup.newCandidates(corpus, delta))
    assert(known.union(added) == full)
    // the increment is genuinely new work, not a recompute in disguise
    assert(known.intersect(added).isEmpty)
    assert(added.nonEmpty && known.nonEmpty)
    // every added pair touches the delta (delta-vs-corpus or within-delta)
    assert(added.forall { case (a, b) => a >= 400 || b >= 400 })
  }

  test("empty delta adds nothing; empty corpus degrades to within-delta") {
    val corpus = sigs("doc_id < 400")
    val delta = sigs("doc_id >= 400")
    val none = sigs("false")
    assert(IncrementalDedup.newCandidates(corpus, none).count() == 0)
    val within = pairSet(IncrementalDedup.newCandidates(none, delta))
    assert(within == pairSet(IncrementalDedup.candidates(delta)))
  }
}

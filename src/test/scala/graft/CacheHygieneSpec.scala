package graft

/** Block-manager hygiene for the shared-artifact text queries (VERDICT r5
  * item 4, extended): the near-dup/containment/repetition family used to
  * share a MEMORY_AND_DISK persist with no unpersist — bounded leaks that
  * accumulate across a 175-query session. They now serve off
  * fingerprint-memoized disk mirrors, so running the whole family must
  * add zero entries to the block manager. Delta-based because the spec
  * session is shared across suites.
  */
class CacheHygieneSpec extends SparkSpec {
  test("near-dup/containment/repetition queries leave no persistent RDD blocks") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // dedup_clusters is excluded: connected components localCheckpoints
    // per round (deliberate lineage truncation, released by the
    // ContextCleaner once unreferenced), which this assertion would
    // misread as a leak.
    for (q <- Seq("dedup_near_jaccard", "dedup_near_minhash", "dedup_incremental",
                  "text_containment", "text_repetition",
                  "text_boilerplate_ngrams"))
      SparkEntry.queries(q)(spark, sf).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"text queries left persisted RDDs: $leaked")
  }
}

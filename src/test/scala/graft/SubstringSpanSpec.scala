package graft

import org.apache.spark.sql.functions._

/** Pins for dedup_substring_spans — the span-grain exact-substring
  * profiler (the suffix-array operation of Lee et al. ACL'22,
  * re-expressed as a span-hash aggregate).
  *
  * 1. Cross-spelling equivalence: the md5 span-hash path must agree
  *    per-source with an independent RAW-STRING spelling (group the
  *    literal k-token span text, no hashing) — this catches both a
  *    windowing off-by-one and any dream of hash collisions mattering.
  * 2. Integer contract: dup_ppm is exactly n_dup_spans*1e6 div n_spans
  *    and dup mass never exceeds span mass.
  * 3. Plan: the corpus-wide duplicate count must collapse occurrences
  *    to distinct (span, doc) pairs BEFORE counting (two stacked hash
  *    aggregates), and nothing may go quadratic (no cartesian / BNLJ
  *    over span rows).
  */
class SubstringSpanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val K = 10

  test("span dup counts match a raw-string (no-hash) respelling per source") {
    assume(new java.io.File(sf).isDirectory)
    val got = SparkEntry.queries("dedup_substring_spans")(spark, sf)
      .select("source", "n_dup_spans").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val spans = T.documents(spark, sf)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= K)
      .select(col("doc_id"), col("source"),
        explode(expr(s"transform(sequence(1, size(tokens) - ${K - 1}), " +
          s"i -> array_join(slice(tokens, i, $K), ' '))")).as("span"))
    val perDoc = spans.groupBy("span", "doc_id", "source")
      .agg(count(lit(1)).as("cnt"))
    val nDocs = perDoc.groupBy("span").agg(count(lit(1)).as("nd"))
    val want = perDoc.join(nDocs, "span").filter(col("nd") >= 2)
      .groupBy("source").agg(sum("cnt").as("dup")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    got.keys.foreach { s =>
      assert(got(s) == want.getOrElse(s, 0L),
        s"$s: hashed=${got(s)} raw=${want.getOrElse(s, 0L)}")
    }
    assert(got.values.sum > 0, "generator plants near-dups; zero is a bug")
  }

  test("dup_ppm integer contract and mass bound") {
    assume(new java.io.File(sf).isDirectory)
    SparkEntry.queries("dedup_substring_spans")(spark, sf).collect().foreach { r =>
      val (spansN, dup, ppm) = (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dup_spans"), r.getAs[Long]("dup_ppm"))
      assert(dup >= 0 && dup <= spansN, s"dup $dup outside [0, $spansN]")
      assert(ppm == dup * 1000000L / spansN, s"ppm $ppm != ${dup * 1000000L / spansN}")
    }
  }

  test("word_span_md5 expression ≡ the portable HOF spelling, bit-exact") {
    assume(new java.io.File(sf).isDirectory)
    graft.functions.VecExprs.register(spark)
    val t = T.documents(spark, sf)
      .withColumn("tokens", split(col("text"), " "))
    // include short docs: < k tokens must yield an EMPTY array both ways
    val both = t.select(
      expr(s"word_span_md5(tokens, $K)").as("fast"),
      expr(s"transform(sequence(1, greatest(size(tokens) - ${K - 1}, 0)), " +
        s"i -> md5(array_join(slice(tokens, i, $K), ' ')))").as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).isEmpty)
  }

  test("word_span_md5 handles null elements like array_join (skip, no NPE)") {
    graft.functions.VecExprs.register(spark)
    import spark.implicits._
    // null tokens are legal input (containsNull=true arrays pass the type
    // check) — array_join drops them WITH their separator, and the
    // expression must match bit-for-bit rather than NPE (ADVICE r8)
    val t = Seq(
      Seq("a", null, "c", "d"),
      Seq[String](null, null, "x"),
      Seq[String](null, null)).toDF("tokens")
    val both = t.select(
      expr("word_span_md5(tokens, 2)").as("fast"),
      expr("transform(sequence(1, greatest(size(tokens) - 1, 0)), " +
        "i -> md5(array_join(slice(tokens, i, 2), ' ')))").as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).isEmpty)
  }

  test("dedup_span_removal: coverage consistent with the span profile") {
    assume(new java.io.File(sf).isDirectory)
    val prof = SparkEntry.queries("dedup_substring_spans")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_dup_spans")).toMap
    val rem = SparkEntry.queries("dedup_span_removal")(spark, sf).collect()
    assert(rem.map(_.getAs[Long]("tokens_removed")).sum > 0)
    rem.foreach { r =>
      val s = r.getAs[String]("source")
      val (tot, cut) = (r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_removed"))
      val dups = prof.getOrElse(s, 0L)
      assert(cut >= 0 && cut <= tot, s"$s: removal outside [0, total]")
      // zero dup spans ⟺ zero coverage; each occurrence covers ≤ K and
      // any dup at all covers ≥ K positions (one full span minimum)
      assert((dups == 0) == (cut == 0), s"$s: dup/coverage zero-ness diverges")
      assert(cut <= dups * K, s"$s: coverage $cut exceeds $dups×$K")
      if (dups > 0) assert(cut >= K, s"$s: a dup span covers at least $K")
    }
  }

  test("plan: one scan, pair-collapse aggregate + h-window, NO join") {
    assume(new java.io.File(sf).isDirectory)
    val df = SparkEntry.queries("dedup_substring_spans")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the per-h doc count must be a window over the distinct-pair frame,
    // not a perDoc⋈perHash self-join: Generate keeps the scan's
    // sizeInBytes, so the join spelling tricks the static planner into
    // broadcasting the multi-million-row span aggregate (53 s at sf1)
    assert(p.contains("windowspecdefinition(h"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("BroadcastExchange"), p.take(1500))
    // occurrences → (h, doc) pairs → per-h doc count: the distinct-pair
    // collapse shows as a hash aggregate keyed (h, doc_id, source)
    assert("HashAggregate\\(keys=\\[h[#0-9]*, doc_id".r
      .findFirstIn(p).isDefined, p.take(1500))
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      "the profile must read the corpus exactly once")
  }
}

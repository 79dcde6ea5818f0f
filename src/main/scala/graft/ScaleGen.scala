package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N scale-up of a testdata directory (SCALE.md's measured
  * decade: sf0.1 → sf1-equivalent), used to RUN the suite one order of
  * magnitude above the driver's bench SF and record per-query scaling
  * ratios — plan audits claim linearity; this executes it.
  *
  * Method: every fact row is replicated once per replica index r ∈ [0, N)
  * with all primary/foreign keys remapped k → k·N + r, so replica r is a
  * complete, join-consistent copy of the star schema (orders still find
  * their customers, lineitems their orders/parts/suppliers, all key
  * uniqueness preserved). Bounded dimensions (region, nation) copy
  * verbatim — they are fixed-cardinality at any SF, exactly like TPC-H.
  * Events keep their timestamps: same time span, N× traffic — the shape a
  * real 10× workload has (windows/summaries see N× rows per bucket, not
  * N× more buckets).
  *
  * Two tables get value perturbation so the WORKLOAD shape scales
  * honestly, not just the row count:
  *  - documents: replica r>0 remaps every word through a deterministic
  *    per-replica hash into a FIXED synthetic token space sized
  *    V0·√N (V0 = source vocabulary) — each replica is a dissimilar
  *    sub-corpus whose INTERNAL dup structure matches the source
  *    (docs that were near-dups stay near-dups of each other — the map
  *    is per-replica deterministic), while cross-replica similarity
  *    stays ~0 for shingles, unigrams, simhash and Jaccard alike
  *    (independent hashes overlap ~|doc|/V by chance). Identical or
  *    order-permuted text would instead make every doc a 10-way near-dup
  *    (word-rotation preserves the unigram features simhash hashes), so
  *    cluster sizes — and candidate pair counts, quadratic in cluster
  *    size — would explode by CONSTRUCTION, not by engine behavior; the
  *    first sweep measured exactly that (dedup_near_simhash 5.3×,
  *    emb_neardup_pairs 16×). An earlier word-SUFFIX bijection fixed
  *    that but grew the vocabulary ×N — real corpora grow vocab
  *    sublinearly (Heaps' law), and the linear growth showed up as a
  *    4.1× generator artifact in text_lm_score's per-term state. The
  *    hash-into-√N-space map keeps total vocabulary ≈ V0·(1+√N):
  *    sublinear, saturating, Heaps-shaped. (Hash collisions merge two
  *    source words with probability ~1/(V0·√N) per pair — noise far
  *    below the near-dup thresholds.)
  *  - embeddings: replica r>0 rotates the vector's dimensions by 13·r
  *    (mod dim) — norms and coordinate distributions are preserved
  *    exactly while replica cosines decorrelate, so ANN sees N× distinct
  *    points, not N copies of each point (tiny jitter is NOT enough: a
  *    ±1e-3 perturbation leaves cosine ≈ 1 and every replica pair a
  *    near-dup).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"${sys.props("java.io.tmpdir")}/graft-sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Ctx.prep(spark)

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"scalegen: wrote $t")
    }
    /** Replicate ×n with key remap k → k·n + r; keeps `_r` for callers
      * that perturb values per replica. */
    def rep(df: DataFrame, keys: String*): DataFrame = {
      val withR = df.select(col("*"),
        explode(array((0 until n).map(i => lit(i.toLong)): _*)).as("_r"))
      keys.foldLeft(withR)((d, k) => d.withColumn(k, col(k) * n + col("_r")))
    }

    save(load("region"), "region", 1)
    save(load("nation"), "nation", 1)
    save(rep(load("customer"), "c_custkey").drop("_r"), "customer", 4)
    save(rep(load("supplier"), "s_suppkey").drop("_r"), "supplier", 2)
    save(rep(load("part"), "p_partkey").drop("_r"), "part", 4)
    save(rep(load("orders"), "o_orderkey", "o_custkey").drop("_r"), "orders", 8)
    save(rep(load("lineitem"), "l_orderkey", "l_partkey", "l_suppkey")
      .drop("_r"), "lineitem", 16)

    // T.events normalizes any stored ts encoding (nanos-as-long / ntz /
    // ltz) to TimestampType; the scaled table ships the normalized form.
    save(rep(T.events(spark, src), "event_id", "user_id").drop("_r"),
      "events", 16)

    val docs0 = load("documents")
    // source vocabulary size → synthetic token space V0·√N (see header)
    val v0 = docs0.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .agg(countDistinct(col("w"))).first().getLong(0)
    val vSyn = math.max(64L, (v0 * math.sqrt(n.toDouble)).toLong)
    val docs = rep(docs0, "doc_id")
    // token = base-36 digits of the hashed id, cycled out to the SOURCE
    // word's length: per-word LENGTH is preserved exactly, so n_chars,
    // the length-band blocking keys (text_fuzzy_pairs), and every
    // length-derived quality feature keep their source distributions —
    // a 3-char "w17" scheme collapsed all docs into a few length bands
    // and inflated the blocked join quadratically (generator artifact).
    val revocabed = concat_ws(" ",
      transform(split(col("text"), " "), w => {
        val h = conv(pmod(xxhash64(w, col("_r")), lit(vSyn)).cast("string"),
          10, 36)
        when(length(w) === 0, w)
          .otherwise(repeat(h, 64).substr(lit(1), length(w)))
      }))
    save(docs
      .withColumn("text",
        when(col("_r") === 0, col("text")).otherwise(revocabed))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_r"), "documents", 8)

    val emb = rep(load("embeddings"), "vec_id")
    val dim = size(col("embedding"))
    val rotated = transform(col("embedding"), (_, i) =>
      element_at(col("embedding"),
        (pmod(i + col("_r") * 13, dim) + 1).cast("int")))
    save(emb
      .withColumn("embedding",
        when(col("_r") === 0, col("embedding")).otherwise(rotated))
      .drop("_r"), "embeddings", 4)

    println(s"scalegen: done ×$n $src -> $out")
    spark.stop()
  }
}

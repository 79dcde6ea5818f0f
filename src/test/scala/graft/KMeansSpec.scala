package graft

import org.apache.spark.sql.functions._

/** ops.KMeans determinism + shape. The strong equivalence check is the
  * `ann_ivf_topk` oracle (DuckDB replays the whole training loop); this
  * pins the library-level contract directly. */
class KMeansSpec extends SparkSpec {

  private def corpus = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    T.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
  }

  test("fixed seed + fixed rounds => identical centroids run-to-run") {
    def run() = graft.ops.KMeans.train(corpus, 4, 2)
      .orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    val a = run()
    val b = run()
    assert(a.nonEmpty && a.length <= 4)
    assert(a.toSeq == b.toSeq)
  }

  test("centroids move off the seed vectors and keep the embedding dim") {
    val dim = corpus.select(size(col("v"))).head.getInt(0)
    val seed = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val trained = graft.ops.KMeans.train(corpus, 4, 2).collect()
    trained.foreach { r =>
      assert(r.getSeq[Double](1).length == dim)
      // a centroid equal to its seed vector after 2 rounds would mean
      // the mean never happened (singleton cells aside, impossible here)
      assert(r.getSeq[Double](1) != seed(r.getLong(0)))
    }
  }
}

package graft

import graft.queries.TextOps
import java.nio.file.Files

/** Incremental entity resolution — the id-stability contract.
  *
  * A synthetic corpus exercises every branch of the merge rule on a
  * controlled document table (corpus = doc_id % 20 ≠ 0, delta ≡ 0):
  *
  *  - entity A {1,2} extended by delta 20        → keeps base id 1
  *  - entities B {3} and C {21,22} BRIDGED by 40 → min base rep, id 3
  *  - entity E {41,42} untouched by the delta    → absent from the tick
  *    output entirely (the master-table rows are never rewritten)
  *  - pure-delta pair {60,80}                    → mints min delta id 60
  *  - delta singleton 100                        → own new entity
  *
  * The bridge doc's head is 12 edits from each side while the sides are
  * 24 apart, so B–C stay separate in the base resolution (the verify
  * gate is levenshtein ≤ 12 over 40-char heads) and only the delta doc
  * can connect them — the genuinely incremental merge case.
  */
class ErIncrementalSpec extends SparkSpec {

  private def mkDocs(dir: String): Unit = {
    import spark.implicits._
    // shared shingle payloads: the bridge doc carries both P and R so it
    // band-collides with each side; fillers are single long tokens that
    // equalize n_chars (the |len diff| ≤ 12 verify gate) without adding
    // competing shingles
    // these exact token names were searched offline so that the bridge
    // doc band-collides with BOTH sides (the md5 band minimum is
    // deterministic; an arbitrary vocabulary can lose one side's draw)
    val P = (1 to 60).map(i => s"alpha0x$i").mkString(" ")
    val R = (1 to 60).map(i => s"omega0x$i").mkString(" ")
    val h3 = "1" * 12 + "c" * 12 + "t" * 15 + " "
    val h40 = "2" * 12 + "c" * 12 + "t" * 15 + " "
    val h21 = "2" * 12 + "d" * 12 + "t" * 15 + " "
    val t40 = h40 + P + " " + R
    val L = t40.length
    def pad(s: String, fill: Char): String =
      s + " " + fill.toString * (L - s.length - 1)
    val t3 = pad(h3 + P, 'f')
    val t21 = pad(h21 + R, 'g')
    val tA = "shared base doc " + (1 to 30).map(i => s"au$i").mkString(" ")
    val tE = "quiet base doc " + (1 to 30).map(i => s"eu$i").mkString(" ")
    val tD = "fresh delta doc " + (1 to 30).map(i => s"du$i").mkString(" ")
    val tU = "lonely delta doc " + (1 to 30).map(i => s"uu$i").mkString(" ")
    val rows = Seq(
      (1L, tA), (2L, tA), (3L, t3), (21L, t21), (22L, t21),
      (41L, tE), (42L, tE),
      (20L, tA), (40L, t40), (60L, tD), (80L, tD), (100L, tU))
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'spec' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("tick output = affected entities only, with stable golden ids") {
    val dir = Files.createTempDirectory("graft-er-inc").toString
    mkDocs(dir)
    val out = TextOps.erIncremental(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // extended entity keeps its base id; bridged pair keeps the MIN
    // participating base rep; pure-delta mints its min id; singleton
    // mints itself — and nothing else appears
    assert(out.keySet == Set(1L, 3L, 60L, 100L),
      s"entity ids: ${out.keySet.toSeq.sorted}")
    assert(out(1L) == 3L, "A ∪ {20}: members 1,2,20")
    assert(out(3L) == 4L, "B ∪ C ∪ {40}: members 3,21,22,40")
    assert(out(60L) == 2L, "pure-delta pair 60,80")
    assert(out(100L) == 1L, "delta singleton")
    // the untouched entity E {41,42} (rep 41) is NOT rewritten
    assert(!out.contains(41L) && !out.contains(42L))
  }

  test("merged master ≡ from-scratch resolution over the union (real corpus, sf0.001)") {
    // the production invariant: applying the tick to the persisted base
    // clusters yields exactly the PARTITION a from-scratch resolution of
    // corpus ∪ delta computes (entity IDS differ by design — stability
    // keeps base reps where from-scratch takes the global min — so the
    // comparison is on member sets). Candidate sets coincide because the
    // banded LSH is deterministic: base pairs ∪ delta-probe pairs = the
    // full run's pairs; identical verify ⇒ identical edges ⇒ identical
    // components; the contraction only collapses base components, which
    // preserves connectivity.
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.col
    // from-scratch over ALL docs: components of the full edge set plus
    // singleton docs
    val full = graft.ops.Graph.altStarComponents(TextOps.erEdges(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val fullByDoc = full.toMap
    val allDocs = T.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val fullPartition = allDocs.groupBy(d => fullByDoc.getOrElse(d, d))
      .values.map(_.sorted.toSeq).toSet
    // merged master: tick membership for touched entities + delta
    // singletons, base reps for everything the tick did not touch
    val tick = TextOps.erIncrementalMemb(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(0)) // doc -> entity
    val tickDocs = tick.map(_._1).toSet
    val base = TextOps.erBaseLabelsMirror(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val merged = tick ++ base.filterNot { case (d, _) => tickDocs.contains(d) }
    val mergedPartition = merged.groupBy(_._2).values
      .map(_.map(_._1).sorted.toSeq).toSet
    assert(mergedPartition == fullPartition,
      s"partitions diverge: only-in-merged=${
        (mergedPartition -- fullPartition).take(3)}, only-in-full=${
        (fullPartition -- mergedPartition).take(3)}")
  }

  test("tick is deterministic: same input, same ids") {
    val dir = Files.createTempDirectory("graft-er-inc2").toString
    mkDocs(dir)
    val a = TextOps.erIncremental(spark, dir).collect().toSeq
    val b = TextOps.erIncremental(spark, dir).collect().toSeq
    assert(a == b)
  }
}

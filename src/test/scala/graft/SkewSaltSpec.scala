package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** VERDICT r11 #8 — hot-band salting in the near-dup candidate
  * generator: a constructed hot (band, sig) bucket must flip the route
  * to the salted self-join, with candidate-set parity against the
  * bucket-collect path both ways. */
class SkewSaltSpec extends SparkSpec {

  import spark.implicits._

  // 60 docs share ONE band bucket (the boilerplate band key); 40 more
  // spread over distinct buckets; plus a small genuine collision pair
  private def sigs = {
    val hot = (0 until 60).map(i => (i.toLong, 0, "deadbeef"))
    val cold = (0 until 40).map(i => (100L + i, 1, f"c$i%08x"))
    val pair = Seq((200L, 2, "feedface"), (201L, 2, "feedface"))
    (hot ++ cold ++ pair).toDF("doc_id", "band", "sig")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a guaranteed-share hot band flips the route") {
    assert(TextOps.hotBandKeys(sigs, hotMin = 50) == Seq("0#deadbeef"))
    assert(TextOps.hotBandKeys(sigs, hotMin = 4096).isEmpty,
      "below the floor nothing is hot — the cold plan stays untouched")
  }

  test("salted route candidate set is identical to bucket-collect") {
    val cold = pairs(TextOps.bandCandidates(sigs))
    val salted = pairs(TextOps.bandCandidatesAuto(sigs, hotMin = 50))
    assert(salted == cold, "salting changed the candidate set")
    assert(cold.contains((200L, 201L)), "cold-bucket pair must survive")
    assert(cold.count { case (a, b) => a < 60 && b < 60 } == 60 * 59 / 2,
      "hot bucket must contribute all its pairs")
  }

  test("no hot bucket → auto route IS the bucket-collect plan") {
    val auto = TextOps.bandCandidatesAuto(sigs, hotMin = 4096)
    val base = TextOps.bandCandidates(sigs)
    assert(pairs(auto) == pairs(base))
    // same logical shape: the auto router returned the unsalted plan
    // (no salt column, no fan-out join anywhere in it); plan strings
    // differ only by expression ids, which we can't compare directly
    // the fan-out marker is the [0..7] salt explode (pmod itself gets
    // constant-folded into the LocalRelation on spec-sized data)
    val fanOut = "explode([0,1,2,3,4,5,6,7])"
    val p = auto.queryExecution.optimizedPlan.toString
    assert(!p.contains(fanOut),
      s"cold route must carry no salted-join machinery:\n$p")
    val hotP = TextOps.bandCandidatesAuto(sigs, hotMin = 50)
      .queryExecution.optimizedPlan.toString
    assert(hotP.contains(fanOut), "hot route must carry the salt fan-out")
  }
}

package graft

import java.nio.file.Files

import graft.streaming.IngestTick
import org.apache.spark.sql.DataFrame

/** Crash-consistency of the COMPOSED ingest tick (VERDICT r11 #4): a
  * death injected after EVERY stage boundary must leave the committed
  * state untouched (head v1 absent — the single conditional-put is the
  * only visibility point), and the rerun must converge to exactly the
  * never-killed run's committed metrics. The gate's oracle proves the
  * VALUES; this spec proves the RECOVERY, which SQL can't see.
  */
class IngestTickSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshRoot(): String =
    Files.createTempDirectory("graft-ticktest").toString + "/t"

  private def rows(df: DataFrame): Seq[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  private lazy val clean: Seq[(String, String, Long)] = {
    val root = freshRoot()
    IngestTick.runTick(spark, dir, root)
    rows(IngestTick.metrics(spark, dir, root))
  }

  test("a never-killed tick commits exactly one head and is idempotent") {
    val root = freshRoot()
    assert(IngestTick.runTick(spark, dir, root),
      "first run must be the committing run")
    val first = rows(IngestTick.metrics(spark, dir, root))
    assert(first == clean)
    assert(!IngestTick.runTick(spark, dir, root),
      "second run must be a no-op replay")
    assert(rows(IngestTick.metrics(spark, dir, root)) == clean)
  }

  for (stage <- IngestTick.Stages)
    test(s"death after '$stage' leaves v0 committed; rerun converges") {
      val root = freshRoot()
      val died = intercept[IngestTick.InjectedDeath] {
        IngestTick.runTick(spark, dir, root, dieAfter = Some(stage))
      }
      assert(died.stage == stage)
      // the single commit point was never reached: nothing is visible
      assert(IngestTick.headExists(spark, root, 0),
        "bootstrap must already be committed")
      assert(!IngestTick.headExists(spark, root, 1),
        s"a death after '$stage' must not have published the tick head")
      // rerun over the same committed inputs converges byte-stably
      assert(IngestTick.runTick(spark, dir, root))
      assert(rows(IngestTick.metrics(spark, dir, root)) == clean,
        s"recovery after a '$stage' death diverged from the clean run")
    }

  test("death injected before any stage (bootstrap only) also recovers") {
    val root = freshRoot()
    IngestTick.ensureBootstrap(spark, dir, root)
    assert(IngestTick.headExists(spark, root, 0))
    assert(IngestTick.runTick(spark, dir, root))
    assert(rows(IngestTick.metrics(spark, dir, root)) == clean)
  }
}

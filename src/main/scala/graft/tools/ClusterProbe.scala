package graft.tools

import org.apache.spark.sql.SparkSession
import scala.sys.process._

/** Executor-loss resilience, measured on a REAL multi-JVM cluster.
  *
  * `local-cluster[n,cores,mem]` is Spark's standalone master running
  * in-process with n SEPARATE executor JVMs — real netty shuffle
  * fetches, TorrentBroadcast over the wire, serialized task dispatch:
  * everything `local[n]` short-circuits. This probe runs a registered
  * query there twice — once undisturbed for the baseline answer, once
  * with an executor JVM `kill -9`'d mid-flight — and asserts the
  * answers identical. A kill during stage 1 exercises task re-launch on
  * a replacement executor; during stage 2 it exercises FetchFailed →
  * parent-stage resubmission (the killed JVM's shuffle map outputs are
  * gone). The standalone worker relaunches the lost executor, so the
  * cluster heals to full width between queries.
  *
  * Usage: tools/run.sh graft.tools.ClusterProbe <sfDir> [q1,q2,...]
  * Exits nonzero if any post-kill answer differs from its baseline.
  *
  * Caveat this probe makes explicit: queries built on eager
  * localCheckpoint (the iterative-algorithm lineage-truncation idiom)
  * are NOT executor-loss-recoverable by design — a lost checkpoint
  * block fails the job instead of recomputing (Spark's documented
  * localCheckpoint contract; the production swap is a reliable
  * checkpoint dir). The default probe queries avoid them.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft-sf10")
    val names = args.lift(1).getOrElse("q1_lineitem_agg,dedup_near_minhash")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[3,8,6144]")
    val spark = SparkSession.builder()
      .master(master)
      // executor JVMs are launched from SPARK_HOME's jars only — the
      // application classes must ride extraClassPath (same host, the
      // driver's own classpath string works verbatim)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      // the local-cluster[n,c,mem] MEM is the WORKER's budget; the
      // executor JVM heap is spark.executor.memory (default 1g!) —
      // without this every executor runs -Xmx1024M no matter what the
      // master string says (measured: the "16 GB" battery OOM'd in 1 GB)
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "6g"))
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // wait for the full executor set before timing anything
    val want = "local-cluster\\[(\\d+)".r.findFirstMatchIn(master)
      .map(_.group(1).toInt).getOrElse(1)
    val t0 = System.nanoTime()
    while (spark.sparkContext.statusTracker.getExecutorInfos.length < want + 1
        && (System.nanoTime() - t0) < 60e9) Thread.sleep(200)
    val nExec = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
    println(s"[cluster] master=$master executors=$nExec")
    require(nExec >= 2, s"need >=2 executor JVMs, got $nExec")

    def awaitFullWidth(): Unit = {
      val r0 = System.nanoTime()
      while (spark.sparkContext.statusTracker.getExecutorInfos.length < want + 1
          && (System.nanoTime() - r0) < 120e9) Thread.sleep(200)
    }

    var failed = 0
    var notMid = 0
    names.foreach { name =>
      try {
      val fn = graft.SparkEntry.queries(name)
      def run(): (Array[String], Double) = {
        val s = System.nanoTime()
        val rows = fn(spark, sfDir).collect().map(_.toString).sorted
        (rows, (System.nanoTime() - s) / 1e9)
      }
      // cold run pays JIT/mirror builds; the WARM run is the kill-timing
      // baseline (a cold-inflated baseline schedules the kill after the
      // post-kill query already finished — measured, not hypothetical)
      val (cold, coldSec) = run()
      val (base, warmSec) = run()
      require(cold.sameElements(base), s"$name not deterministic across runs")
      println(f"[cluster] $name baseline rows=${base.length} " +
        f"cold=$coldSec%.1fs warm=$warmSec%.1fs")
      // kill one executor JVM mid-flight; retry with shorter delays until
      // the kill verifiably lands BEFORE the query completes
      var attempt = 0
      var delay = math.max(200L, (warmSec * 500).toLong)
      var midflight = false
      while (attempt < 4 && !midflight) {
        @volatile var killAt = 0L
        @volatile var killNote = "no executor pid found"
        val killer = new Thread(() => {
          Thread.sleep(delay)
          // pgrep matches only THIS app's executor backends (ADVICE r11:
          // a machine-wide CoarseGrainedExecutorBackend match could kill
          // a concurrently running unrelated Spark app's executor): the
          // worker launches each backend with --app-id <applicationId>,
          // so scoping on the id pins the blast radius to this probe
          val pids = try {
            Seq("pgrep", "-f",
              s"CoarseGrainedExecutorBackend.*${spark.sparkContext.applicationId}").!!.trim
          } catch { case _: Throwable => "" }
          pids.split("\n").filter(_.nonEmpty).sorted.lastOption.foreach { pid =>
            Seq("kill", "-9", pid).!
            killAt = System.nanoTime()
            killNote = s"kill -9 pid=$pid at ${delay}ms"
          }
        })
        killer.start()
        val (hit, hitSec) = run()
        val endAt = System.nanoTime()
        killer.join()
        midflight = killAt != 0L && killAt < endAt
        val ok = hit.sameElements(base)
        if (!ok) failed += 1
        println(f"[cluster] $name post-kill rows=${hit.length} sec=$hitSec%.1f " +
          s"($killNote, ${if (midflight) "MID-FLIGHT" else "landed late — retrying"}) " +
          (if (ok) "MATCH" else "MISMATCH"))
        awaitFullWidth() // worker respawns the lost executor
        delay = math.max(100L, delay / 2)
        attempt += 1
      }
      if (!midflight) notMid += 1
      } catch { case e: Throwable =>
        // a query that cannot run at this executor sizing (e.g. its
        // baseline OOMs the undersized cluster) is an ERROR for this
        // battery, not a silent stop — record and move on
        failed += 1
        println(s"[cluster] $name ERROR ${e.toString.take(200)}")
        awaitFullWidth()
      }
    }
    spark.stop()
    if (failed > 0) { println(s"[cluster] FAIL: $failed mismatches"); sys.exit(1) }
    if (notMid > 0) { println(s"[cluster] INCONCLUSIVE: $notMid queries never saw a mid-flight kill"); sys.exit(2) }
    println("[cluster] PASS: every query survived a mid-flight executor kill with byte-identical answers")
  }
}

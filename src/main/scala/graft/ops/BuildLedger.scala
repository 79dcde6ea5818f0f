package graft.ops

/** Session-wide ledger of ONE-TIME artifact builds (VERDICT r13 #5).
  *
  * Every fingerprint-memoized mirror/index (bucketed k-NN serving
  * tables, shingle/band-signature mirrors, IVF directories, partitioned
  * layouts) is built lazily by the first query that needs it and reused
  * by every later one — the right amortization at 100 TB, but it makes
  * bench attribution lie by omission: the r13 sf100 k-NN index build
  * (916.7 s) was charged to whichever leg ran first, and a false-start
  * leg paid it AGAIN after its artifacts were deleted. The ledger makes
  * the amortized cost a NAMED line: each `ensure*` build records its
  * wall-clock under a stable artifact name when it actually builds
  * (a memo hit records nothing), and Bench drains the ledger into
  * BENCH_FULL as `index_build_sec` — so a leg that reuses a prior
  * leg's index shows the reuse (no entry), and one that rebuilds shows
  * exactly what it paid and for what.
  *
  * Thread-safe; names aggregate (a build re-entered per batch sums).
  */
object BuildLedger {

  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Run `body` (an actual artifact build — call only on the memo-miss
    * path) and record its seconds under `name`. */
  def timed[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally {
      val sec = (System.nanoTime() - t0) / 1e9
      builds.merge(name, sec,
        (a: java.lang.Double, b: java.lang.Double) =>
          java.lang.Double.valueOf(a + b))
      System.err.println(
        s"[graft] built $name in ${"%.1f".formatLocal(java.util.Locale.ROOT, sec)} s")
    }
  }

  /** Snapshot of (artifact name → build seconds) recorded so far. */
  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    builds.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }

  def reset(): Unit = builds.clear()
}

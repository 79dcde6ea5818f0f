package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: regex over query names (local iteration only —
    // the driver always invokes with exactly two args = full dump)
    val nameFilter = if (args.length > 2) args(2) else ".*"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — e.g.
    // local-cluster[4,8,8192] runs the same sweep on real separate
    // executor JVMs (real netty shuffle, serialized task dispatch,
    // TorrentBroadcast over the wire), the multi-executor evidence a
    // local[n] run cannot give.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // wide initial shuffles, AQE-coalesced — see Bench
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // separate executor JVMs launch from SPARK_HOME's jars only — the
    // application classes ride extraClassPath (same host, the driver's
    // classpath string is valid verbatim)
    if (master.startsWith("local-cluster")) {
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
      // the master string's mem field budgets the WORKER; the executor
      // JVM heap is spark.executor.memory (default 1g)
      b.config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "4g"))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Pre-register the MV routes BEFORE the sweep (ADVICE r6): the sweep
    // runs alphabetically, so without this the events_* aggregates whose
    // shapes match the routing grammar would be verified UNROUTED while
    // the bench (whose warm pass registers routes) times them ROUTED.
    // Registering up front makes the verified plan the benched plan —
    // and puts the routed path itself under every matching oracle.
    try graft.queries.MatView.enableRouting(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] mv route pre-registration failed: ${e.getMessage}")
    }
    SparkEntry.queries.filter(_._1.matches(nameFilter)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

package graft.etl

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Pipeline orchestrator — the reference's `run_pipeline` (main.py:41-136)
  * as a library function. The reference's error ROUTING is part of its
  * semantics: four distinct halt conditions with distinct messages and a
  * retryable/escalate classification (main.py:70-123). A library returns
  * that decision instead of calling sys.exit: `Left(halt)` tells the
  * caller what stopped the run and whether retrying can help.
  *
  * Execution shape (SURVEY §3.1): everything stays one lazy plan until
  * the clean/rejected fork; the fork persists once and the only actions
  * are the two sink writes plus the summary counts.
  */
object Runner {

  sealed trait Halt { def stage: String; def retryable: Boolean }
  /** transient infra problem — retry (reference main.py:78-82) */
  final case class MissingInput(path: String) extends Halt {
    val stage = "ingest"; val retryable = true
  }
  /** data corruption — escalate, don't retry (reference main.py:84-87) */
  final case class UnreadableInput(path: String, cause: Throwable) extends Halt {
    val stage = "ingest"; val retryable = false
  }
  /** schema drift — halt before any row work (reference main.py:93-97) */
  final case class StructuralFailure(report: Validate.StructuralReport) extends Halt {
    val stage = "validate_structure"; val retryable = false
  }
  /** every row rejected — systemic data problem (reference main.py:111-114) */
  final case class AllRowsRejected(nInput: Long) extends Halt {
    val stage = "validate_rows"; val retryable = false
  }

  /** Run summary (reference main.py:125-136). */
  final case class Summary(runId: String, nInput: Long, nClean: Long,
      nRejected: Long, rejectionRatePct: Double, durationS: Double)

  private val log = LoggerFactory.getLogger("graft.pipeline")

  /** Full pipeline: ingest → structural check → transform → row validation
    * → sink. `sink` receives (clean, rejected) and performs the writes —
    * production wiring is `JdbcUpsert.upsert` / `JdbcUpsert.append`
    * (reference STAGE 5); tests pass collectors.
    */
  def run(spark: SparkSession, path: String)
      (sink: (DataFrame, DataFrame) => Unit): Either[Halt, Summary] = {
    val runId = UUID.randomUUID().toString.take(8) // reference main.py:58
    val t0 = System.nanoTime()
    def info(msg: String): Unit = log.info(s"[run=$runId] $msg")

    val raw =
      try {
        info(s"stage=ingest path=$path")
        Ingest.csv(spark, path)
      } catch {
        case e: Ingest.MissingInputException =>
          log.warn(s"[run=$runId] halt=missing_input retryable=true: ${e.getMessage}")
          return Left(MissingInput(path))
        case e: Ingest.UnreadableInputException =>
          log.error(s"[run=$runId] halt=unreadable_input retryable=false", e)
          return Left(UnreadableInput(path, e))
      }

    info("stage=validate_structure")
    val report = Validate.validateStructure(raw)
    if (!report.ok) {
      log.error(s"[run=$runId] halt=structural missing=${report.missing} empty=${report.empty}")
      return Left(StructuralFailure(report))
    }
    if (report.duplicateIds > 0) // warn-only, like the reference (src/validate.py:43-45)
      log.warn(s"[run=$runId] duplicate transaction_ids: ${report.duplicateIds}")

    info("stage=transform")
    val transformed = Transform(raw)

    info("stage=validate_rows")
    // persist ONCE before the two-output fork (SURVEY §4.3), unpersist in
    // the finally below — Validate.split's caller-managed contract
    val validated = Validate.withReasons(transformed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = validated.filter(size(col("reasons")) === 0).drop("reasons")
    val rejected = validated.filter(size(col("reasons")) > 0)
    try {
      val nClean = clean.count()
      val nRejected = rejected.count()
      val nInput = nClean + nRejected
      if (nClean == 0 && nInput > 0) {
        log.error(s"[run=$runId] halt=all_rows_rejected n=$nInput")
        return Left(AllRowsRejected(nInput))
      }

      info("stage=load")
      sink(clean, rejected.select(col("transaction_id"),
        to_json(struct(transformed.columns.map(col): _*)).as("raw_data"),
        Validate.reasonString.as("rejection_reason")))

      val summary = Summary(runId, nInput, nClean, nRejected,
        if (nInput == 0) 0.0 else nRejected * 100.0 / nInput,
        (System.nanoTime() - t0) / 1e9)
      info(f"summary input=$nInput clean=$nClean rejected=$nRejected " +
        f"rate=${summary.rejectionRatePct}%.1f%% duration=${summary.durationS}%.1fs")
      Right(summary)
    } finally {
      // both forks consumed (or halted) — release the cached validation
      validated.unpersist(); ()
    }
  }
}

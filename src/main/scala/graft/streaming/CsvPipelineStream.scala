package graft.streaming

import graft.etl.{Main, Transform, Validate}
import graft.sinks.JdbcUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming twin of the reference's flagship CSV→DB pipeline: the
  * batch pipeline (`etl.Runner`, reference main.py:41-136) re-expressed
  * as a Structured Streaming job that WATCHES a directory — every CSV
  * dropped in becomes a micro-batch through the SAME Transform /
  * Validate Column expressions the batch path runs (one-plan property:
  * the transformation logic is literally shared code, so stream and
  * batch cannot drift).
  *
  * Per micro-batch (foreachBatch = the reference's stage 3→5):
  * transform → persist-once clean/rejected fork → keyed JDBC upsert of
  * clean rows + dead-letter append of rejected rows. Streaming recovery
  * is at-least-once (a failed batch replays from the checkpoint), and
  * the upsert is idempotent on transaction_id, so the clean table
  * converges to effectively-once — the same property the reference's
  * batch re-runs rely on (README.md:150). The dead letter is
  * append-only by design, again like the reference.
  *
  * Structural validation collapses to the stream's REQUIRED schema: a
  * streaming CSV source cannot infer, so the 8-column contract
  * (reference src/validate.py:6-15) is enforced at source definition —
  * schema drift cannot even enter the stream.
  *
  * 100 TB shape: file-source listing is incremental (maxFilesPerTrigger
  * bounds a batch), state is ZERO (no aggregation state — the sink
  * carries all persistence), and the JDBC writers are per-partition
  * batched transactions, so a 1000-executor cluster drains a backlog in
  * parallel with memory bounded by batchSize.
  */
object CsvPipelineStream {

  /** The reference's 8 raw CSV columns, all strings at ingest —
    * coercion is Transform's job, exactly as in batch. */
  val RawSchema: StructType = StructType(Seq(
    "transaction_id", "customer_id", "product_name", "quantity",
    "unit_price", "transaction_date", "region", "status"
  ).map(StructField(_, StringType)))

  /** Start the watcher: CSVs landing in `srcDir` flow to the two JDBC
    * tables (which must exist — run Main's stage-0 bootstrap first). */
  def start(spark: SparkSession, srcDir: String, checkpoint: String,
      url: String, dialect: JdbcUpsert.Dialect,
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    graft.Ctx.prep(spark)
    val raw = spark.readStream
      .schema(RawSchema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(srcDir)
    val transformed = Transform(raw)
    transformed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the batch pipeline's persist-once fork (etl.Runner stage 4)
        val validated = Validate.withReasons(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val clean = validated.filter(size(col("reasons")) === 0)
            .select(Main.CleanSchema.fieldNames.map(col).toSeq: _*)
          val rejected = validated.filter(size(col("reasons")) > 0)
            .select(col("transaction_id"),
              to_json(struct(batch.columns.map(col).toSeq: _*)).as("raw_data"),
              Validate.reasonString.as("rejection_reason"))
          JdbcUpsert.upsert(clean, url, "sales_transactions",
            Seq("transaction_id"), dialect,
            auditTimestampCol = Some("loaded_at"))
          JdbcUpsert.append(rejected, url, "rejected_rows")
        } finally { validated.unpersist(); () }
      }
      .start()
  }
}

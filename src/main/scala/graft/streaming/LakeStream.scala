package graft.streaming

import graft.ops.CopyOnWrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert into a partitioned parquet lake table — the
  * continuous-ingest half of the copy-on-write story: every micro-batch
  * MERGEs into the table by key ([[CopyOnWrite.merge]]), rewriting only
  * the partitions that batch touches.
  *
  * Delivery: the file/checkpoint source replays a failed batch
  * (at-least-once), and merge-by-key is idempotent for identical delta
  * rows — a replayed batch re-replaces the same keys with the same
  * values — so the table converges to effectively-once, the same
  * argument as the JDBC upsert sink ([[CsvPipelineStream]]).
  *
  * 100 TB shape: per trigger the work is proportional to the TOUCHED
  * partitions, not the table (the merge's anti-join reads only those
  * directories); a hot partition amortizes across the batch's rows.
  * What this primitive does NOT give is concurrent writers or readers
  * isolated mid-swap — that is the snapshot/metadata layer a table
  * format adds (see CopyOnWrite's scaladoc); single-writer streaming
  * ingest, the overwhelmingly common shape, is exactly this.
  */
object LakeStream {

  /** Start a streaming merge of `source` (a streaming DataFrame whose
    * rows carry `partCol` and `keyCol`) into the table at `tablePath`. */
  def start(source: DataFrame, tablePath: String, partCol: String,
      keyCol: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CopyOnWrite.merge(batch.sparkSession, tablePath, partCol, keyCol, batch)
        ()
      }
      .outputMode("update")
      .start()
}

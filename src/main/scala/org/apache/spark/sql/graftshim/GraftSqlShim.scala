package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal `private[sql]` bridge for the custom-operator entry point —
  * the standard extension-library pattern (a tiny object inside the
  * org.apache.spark.sql namespace so `Dataset.ofRows` and the
  * Column→Expression converter are reachable; Spark 4 moved both behind
  * sql-private classic APIs). Everything else in this repo lives under
  * `graft.*`; keep this file to these two forwarders.
  */
object GraftSqlShim {

  /** Wrap a hand-built LogicalPlan (e.g. graft.plans.TopKPerGroup) as a
    * DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Catalyst expression behind a public Column — converted EAGERLY:
    * ExpressionUtils.expression wraps the node in a lazy
    * ColumnNodeExpression whose captured ColumnNode is not serializable,
    * which blows up the first task that ships a plan holding it. */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Spill file under Spark's managed local dirs (DiskBlockManager):
    * lands on the spark.local.dir volumes (not java.io.tmpdir — on a
    * real cluster those are different disks), is tracked by the block
    * manager's directory cleanup, and disappears with the executor's
    * storage even after a kill -9 (deleteOnExit only fires on a clean
    * JVM exit). Falls back to a tmpdir temp file when no SparkEnv is
    * live (bare unit tests of the buffer class). */
  def managedSpillFile(prefix: String): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) {
      val f = java.io.File.createTempFile(prefix, ".spill")
      f.deleteOnExit()
      f
    } else env.blockManager.diskBlockManager.createTempLocalBlock()._2
  }

  /** Re-wrap a just-localCheckpointed DataFrame with its carried
    * statistics CAPPED at Long.MaxValue.
    *
    * Why this must exist: `localCheckpoint` preserves the child plan's
    * computed `Statistics` on the resulting LogicalRDD. In an ITERATIVE
    * operator whose round joins a checkpointed frame with itself (the
    * connected-components pointer jump), sizeInBytes therefore SQUARES
    * per round — after ~15 rounds the BigInt has millions of digits and
    * every planner stats visit (AQE re-optimization calls one per
    * stage) grinds in Karatsuba/Toom-Cook multiplication: the sf10
    * semantic-dedup run burned 11+ driver-minutes in
    * `BigInteger.multiply` before it was killed. Capping at each
    * checkpoint bounds the digit count at 19 forever while keeping
    * small frames' real sizes (so in-loop broadcast decisions still
    * see truth). Row counts are capped the same way. */
  def capCheckpointStats(spark: SparkSession, df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val s = l.stats
        val lmax = BigInt(Long.MaxValue)
        if (s.sizeInBytes <= lmax && s.rowCount.forall(_ <= lmax)) df
        else {
          val capped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = s.sizeInBytes.min(lmax),
            rowCount = s.rowCount.map(_.min(lmax)))
          ofRows(spark, new org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(
            spark.asInstanceOf[CSparkSession], Some(capped), None))
        }
      case _ => df
    }
}

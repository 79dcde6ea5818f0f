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
}

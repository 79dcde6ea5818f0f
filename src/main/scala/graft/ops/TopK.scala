package graft.ops

import graft.plans.{TopKPerGroup, TopKStrategy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

/** User-facing entry for the custom top-k-per-group operator
  * ([[graft.plans.TopKPerGroup]] / [[graft.plans.TopKPerGroupExec]]):
  * keeps the k first rows per group under `orderBy`, computed with one
  * bounded heap per group instead of the window idiom's full partition
  * sort. Registers [[TopKStrategy]] on the session's experimental
  * strategies (idempotent), so it works on sessions the engine did not
  * build — the same post-hoc path VecExprs.register uses for functions.
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // check-then-set on a shared var: serialize it, or concurrent callers
    // race and the strategy list grows a duplicate per race
    spark.experimental.synchronized {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(TopKStrategy))
        spark.experimental.extraStrategies = cur :+ TopKStrategy
    }
    val order = orderBy.map(org.apache.spark.sql.graftshim.GraftSqlShim.expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    val groups = groupCols.map(UnresolvedAttribute(_))
    val plan = TopKPerGroup(groups, order, k, df.queryExecution.logical)
    org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(spark, plan)
  }
}

package graft

import graft.etl.{Transform, Validate}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** `Dataset.observe` — data-quality counters collected DURING the main
  * job (a CollectMetrics node piggybacking on the existing pass), not
  * by a second aggregate scan. This is how a production pipeline gets
  * its A1/A2-style KPIs (row counts, rejection tallies) at 100 TB for
  * free: the counters ride the write job.
  *
  * Kept OUT of the gated pipeline queries on purpose: observe inserts a
  * plan node, and the six pipeline queries share one cached `validated`
  * lineage by canonicalized-plan equality — adding CollectMetrics there
  * would silently fork the cache. The spec demonstrates the pattern on
  * the same Transform/Validate expressions. */
class ObserveSpec extends SparkSpec {

  import spark.implicits._

  test("observed metrics match the separately-computed aggregate") {
    val raw = Seq(
      ("t1", "c1", "widget", "2", "3.50", "2024-01-05", "north", "completed"),
      ("t2", "c2", "gadget", "1", "5.00", "2024-01-06", "south", "bogus"),
      ("t3", "c3", "sprocket", "4", "0.00", "2024-01-07", "east", "unknown"),
      ("t4", "", "cog", "1", "2.00", "2024-01-08", "west", "completed"))
      .toDF("transaction_id", "customer_id", "product_name", "quantity",
        "unit_price", "transaction_date", "region", "status")
    val validated = Validate.withReasons(Transform(raw))
    @volatile var observed: Map[String, Any] = Map.empty
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val m = qe.observedMetrics.get("quality")
        m.foreach(row => observed = row.getValuesMap(row.schema.fieldNames))
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = validated.observe("quality",
        count(lit(1)).as("n_rows"),
        sum(when(size(col("reasons")) > 0, 1L).otherwise(0L)).as("n_rejected"))
        .count()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(n == 4)
      assert(observed("n_rows") == 4L, observed)
      // t2 (invalid status) and t3 (non-positive price) must be flagged
      assert(observed("n_rejected") ==
        validated.filter(size(col("reasons")) > 0).count(), observed)
      assert(observed("n_rejected") == 2L, observed)
    } finally spark.listenerManager.unregister(listener)
  }
}

package graft

import java.nio.file.{Files, Paths}

import graft.etl.Runner
import org.apache.spark.sql.DataFrame

/** The reference's error ROUTING as semantics (main.py:70-123): four halt
  * classes with retryable/escalate classification, summary metrics on the
  * happy path, dead-letter serialization on the way out. */
class RunnerSpec extends SparkSpec {

  private def writeCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-runner").toString
    val f = Paths.get(dir, "sales.csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val header =
    "transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region,status"

  test("happy path: summary counts, sink receives both forks") {
    val path = writeCsv(
      header,
      "t1,1,Widget,2,3.50,2024-01-05,north,completed",
      "t2,2,Gadget,1,10.00,05/02/2024,south,PENDING",
      ",3,Gizmo,4,2.00,2024-01-07,east,completed", // missing id → rejected
      "t4,4,Doohickey,1,-9.00,Jan 08 2024,west,unknown") // bad price → rejected
    var cleanRows = 0L
    var rejectedCols: Seq[String] = Nil
    var rejectedRows = 0L
    val sink = (clean: DataFrame, rejected: DataFrame) => {
      cleanRows = clean.count()
      rejectedCols = rejected.columns.toSeq
      rejectedRows = rejected.count()
    }
    val out = Runner.run(spark, path)(sink)
    assert(out.isRight)
    val s = out.toOption.get
    assert(s.nInput == 4 && s.nClean == 2 && s.nRejected == 2)
    assert(s.rejectionRatePct == 50.0)
    assert(cleanRows == 2 && rejectedRows == 2)
    assert(rejectedCols == Seq("transaction_id", "raw_data", "rejection_reason"))
  }

  test("missing input halts retryable at ingest") {
    val out = Runner.run(spark, "/no/such/file.csv")((_, _) => ())
    assert(out == Left(Runner.MissingInput("/no/such/file.csv")))
    assert(out.swap.toOption.get.retryable)
  }

  test("missing required column halts non-retryable at structural validation") {
    val path = writeCsv(
      "transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region",
      "t1,1,Widget,2,3.50,2024-01-05,north")
    val out = Runner.run(spark, path)((_, _) => ())
    out match {
      case Left(h: Runner.StructuralFailure) =>
        assert(h.report.missing == Set("status"))
        assert(!h.retryable)
      case other => fail(s"expected StructuralFailure, got $other")
    }
  }

  test("all rows rejected halts after validation, before the sink") {
    val path = writeCsv(
      header,
      ",1,Widget,2,3.50,not-a-date,north,bogus",
      ",2,Gadget,1,,also-bad,south,bogus")
    var sinkCalled = false
    val out = Runner.run(spark, path)((_, _) => sinkCalled = true)
    assert(out == Left(Runner.AllRowsRejected(2)))
    assert(!sinkCalled)
  }
}

package graft

import graft.ops.ZOrder
import org.apache.spark.sql.functions._

/** [[ZOrder]] — the covering-cell decomposition must be a superset of
  * the cells any in-box row actually lands in (pruning may only drop
  * directories that cannot hold matches), and the Morton spread must
  * interleave bits exactly. */
class ZOrderSpec extends SparkSpec {

  test("morton interleaves the two coordinates' bits") {
    val df = spark.range(1).select(
      ZOrder.morton(lit(0xFFFFL), lit(0L)).as("xonly"),
      ZOrder.morton(lit(0L), lit(0xFFFFL)).as("yonly"),
      ZOrder.morton(lit(0b101L), lit(0b011L)).as("mixed"))
    val r = df.head()
    assert(r.getLong(0) == 0x55555555L) // x in even positions
    assert(r.getLong(1) == 0xAAAAAAAAL) // y in odd positions
    // x=101, y=011 -> bits y2x2 y1x1 y0x0 = 01 11 01 ... wait: see below
    // x bits (1,0,1) at even pos: 1<<0 | 0<<2 | 1<<4 = 0b010001
    // y bits (1,1,0) at odd pos:  1<<1 | 1<<3 | 0<<5 = 0b001010
    assert(r.getLong(2) == (0x11L | 0x0AL))
  }

  test("every in-box row's cell is inside the covering-cell set") {
    val (xLo, xHi, yLo, yHi) = (7L, 2513L, 100L, 9999L)
    val boxes = Seq(
      (7L, 2513L, 100L, 9999L),   // whole domain
      (100L, 120L, 150L, 170L),   // single cell
      (600L, 1300L, 4000L, 8000L) // straddles boundaries
    )
    val pts = spark.range(0, 2000).select(
      (lit(xLo) + col("id") * 37 % (xHi - xLo + 1)).as("x"),
      (lit(yLo) + col("id") * 101 % (yHi - yLo + 1)).as("y"))
    val cells = ZOrder.withZ(pts, col("x"), col("y"), xLo, xHi, yLo, yHi)
    boxes.foreach { case (x1, x2, y1, y2) =>
      val covering = ZOrder.coveringCells(x1, x2, xLo, xHi, y1, y2, yLo, yHi).toSet
      val inBox = cells
        .filter(col("x").between(x1, x2) && col("y").between(y1, y2))
        .select("zcell").distinct().collect().map(_.getInt(0)).toSet
      assert(inBox.subsetOf(covering), s"box ($x1,$x2,$y1,$y2): $inBox vs $covering")
    }
    // and the whole-domain box covers all 16 cells
    assert(ZOrder.coveringCells(xLo, xHi, xLo, xHi, yLo, yHi, yLo, yHi).size == 16)
  }

  test("morton-sorted files skip row groups a linear sort cannot (scan metrics)") {
    // the FINE half of the clustering story (scan_zorder_cells pins the
    // coarse directory-pruning half): within a file, Morton order gives
    // every parquet row group tight min/max on BOTH dimensions, so a
    // 2-D box probe decodes fewer rows than the same data sorted
    // linearly — same rows, same file count, same row-group size, only
    // the ORDER differs. The scan's numOutputRows metric counts rows
    // the reader actually produced after row-group/page skipping.
    import java.nio.file.Files
    val n = 1 << 16 // 256 x 256 grid, one point per cell
    val pts = spark.range(n).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"),
      col("id").as("payload"))
    val z = ops.ZOrder.withZ(pts, col("x"), col("y"), 0, 255, 0, 255)
    val dirZ = Files.createTempDirectory("graft-zrg-morton").toString
    val dirL = Files.createTempDirectory("graft-zrg-linear").toString
    // ~16 KiB row groups -> ~100+ groups per file: enough granularity
    // for skipping to show up at test scale
    z.orderBy("z32").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024).parquet(dirZ)
    z.orderBy("x", "y").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024).parquet(dirL)

    def probe(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("x").between(64, 71) && col("y").between(64, 71))
        .select(col("x"), col("y"), col("payload"))
      val got = df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val read = plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.getOrElse(fail("no FileSourceScan leaf in the probe plan"))
      (got.map(_.getLong(2)).sum, read)
    }
    val (zSum, zRead) = probe(dirZ)
    val (lSum, lRead) = probe(dirL)
    assert(zSum == lSum, "the two layouts disagree on the box contents")
    assert(zRead < n && lRead < n, s"no skipping at all: z=$zRead linear=$lRead")
    assert(zRead < lRead,
      s"morton order should decode fewer rows than linear: z=$zRead linear=$lRead")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling curve) layout — multi-dimensional
  * clustering so that a box predicate on TWO columns prunes data, where
  * a linear sort can only serve one of them.
  *
  * Two granularities, both driven by the same curve:
  *
  *  - COARSE: each row lands in one of 16 grid cells (2 bits per
  *    dimension, min/max-scaled), and the cell's 4-bit Morton code is
  *    the Hive partition directory. A box query enumerates its covering
  *    cells DRIVER-SIDE (the classic z-range decomposition — O(grid)
  *    arithmetic, no data touched) and plans `zcell IN (...)`, so
  *    planning-time partition pruning skips the non-intersecting
  *    directories entirely.
  *  - FINE: within each partition, rows are sorted by the full 32-bit
  *    Morton code, so parquet row groups carry TIGHT min/max ranges on
  *    BOTH dimensions and the pushed residual predicate skips row
  *    groups inside the surviving cells.
  *
  * At 100 TB the grid is sized so one cell ≈ one compaction unit
  * (hundreds of files), and the same decomposition prunes thousands of
  * cells; the 16-cell grid here keeps the toy-scale directory count
  * honest. Correctness never depends on the layout: covering cells
  * OVER-approximate the box and the residual predicate is always
  * applied (the oracle runs the plain filter on the unmirrored table).
  */
object ZOrder {

  val BitsPerDim = 16
  val CellBitsPerDim = 2 // 4x4 grid -> 16 cells

  /** Interleave the low 16 bits of `c` into even bit positions
    * (the standard mask-shift spread; all Column-level integer ops, so
    * the whole Morton code stays inside whole-stage codegen). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Morton code of two 16-bit coordinates. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale `v` in [lo, hi] to a `CellBitsPerDim`-bit grid coordinate —
    * clamped at BOTH ends, mirroring the driver-side clamp in
    * [[coveringCells]]: a row outside the stated [lo, hi] (stale
    * catalog stats, late data) must land in an edge cell the covering
    * enumeration can still name, never in a negative/overflow cell it
    * would silently skip. */
  def gridCoord(v: Column, lo: Long, hi: Long): Column = {
    val cells = 1L << CellBitsPerDim
    greatest(lit(0L), least(lit(cells - 1),
      (v - lit(lo)) * lit(cells) / lit(hi - lo + 1))).cast("int")
  }

  private def mortonSmall(x: Int, y: Int): Int = {
    def spread(v: Int) = (v & 1) | ((v & 2) << 1)
    spread(x) | (spread(y) << 1)
  }

  /** Driver-side z-range decomposition of a box query: the Morton codes
    * of every grid cell intersecting [x1,x2] x [y1,y2]. Pure arithmetic
    * over table min/max stats — no data is read. */
  def coveringCells(
      x1: Long, x2: Long, xLo: Long, xHi: Long,
      y1: Long, y2: Long, yLo: Long, yHi: Long): Seq[Int] = {
    val cells = (1L << CellBitsPerDim).toInt
    def coord(v: Long, lo: Long, hi: Long): Int =
      math.min(cells - 1, ((v - lo) * cells / (hi - lo + 1)).toInt).max(0)
    val (cx1, cx2) = (coord(x1, xLo, xHi), coord(x2, xLo, xHi))
    val (cy1, cy2) = (coord(y1, yLo, yHi), coord(y2, yLo, yHi))
    (for { x <- cx1 to cx2; y <- cy1 to cy2 } yield mortonSmall(x, y)).sorted
  }

  /** Append `zcell` (grid-cell Morton partition key) and `z32` (full
    * Morton clustering key) for integer dimension columns `xc`, `yc`
    * scaled over the given min/max. */
  def withZ(df: DataFrame, xc: Column, yc: Column,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val gx = gridCoord(xc, xLo, xHi)
    val gy = gridCoord(yc, yLo, yHi)
    df.withColumn("zcell", morton(gx.cast("long"), gy.cast("long")).cast("int"))
      .withColumn("z32",
        morton((xc - lit(xLo)).cast("long"), (yc - lit(yLo)).cast("long")))
  }
}

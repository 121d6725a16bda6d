package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — the multi-dimensional
  * clustering lever of a 100 TB parquet lake. Sorting a table by ONE
  * column makes parquet row-group min/max stats selective for that
  * column only; interleaving the bits of SEVERAL rank-normalized
  * columns into a Morton code and range-sorting by it keeps rows that
  * are close in ANY of those dimensions close on disk, so a box
  * predicate over any subset of the z-columns skips most row groups
  * at scan time (the pushed min/max filters never open them).
  *
  * This is a LAYOUT operator, not a query: it decides where rows
  * live. The write is one range shuffle (repartitionByRange on the
  * z-value + sortWithinPartitions) — exactly the cost of any global
  * sort — and every later query pays nothing: pruning happens inside
  * the parquet reader via the same PushedFilters Catalyst already
  * emits. ZOrderSpec measures the effect directly: the scan's
  * numOutputRows (rows surviving row-group pruning) on a box query
  * drops by >2x vs the same data written in arrival order.
  *
  * Bit interleaving is plain integer arithmetic on the DataFrame
  * columns (shiftleft/and/or — all codegen'd, no UDF). Columns are
  * rank-normalized to ZBits-bit integers via min/max scaling: two
  * lightweight scalar aggregates per column, broadcast as literals —
  * at 100 TB these come from table statistics, not a scan; the
  * ventile-exactness of the scaling does not matter, only the
  * monotonicity (Morton locality is rank-level, and synthetic or
  * real, a coarse uniform scale preserves it).
  */
object ZOrder {

  val ZBits = 16 // bits per dimension; 2 dims -> 32-bit z-value

  /** The Morton code of `cols` (each already an integer Column in
    * [0, 2^ZBits)): bit j of dimension d lands at position
    * j * nDims + d. Unrolled into ZBits * nDims codegen'd shifts. */
  def mortonCode(cols: Seq[Column]): Column = {
    val n = cols.size
    val parts = for {
      (c, d) <- cols.zipWithIndex
      j <- 0 until ZBits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + d)
    parts.reduce(_ bitwiseOR _)
  }

  /** Scale a numeric column to a ZBits-bit integer via min/max
    * bounds (inclusive): floor((x - lo) / (hi - lo) * (2^ZBits - 1)). */
  def scaled(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(lit((1 << ZBits) - 1),
      greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(span) * lit((1 << ZBits) - 1))))
      .cast("long")
  }

  /** Write `df` z-ordered by `zCols` into `path` as parquet split
    * over `numFiles` range partitions of the Morton curve. The
    * z-value is a transient sort key — it is NOT persisted (queries
    * filter on the original columns; the layout alone carries the
    * benefit). Bounds come from one tiny agg (table-stats stand-in). */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      numFiles: Int = 32): Unit =
    writeZOrderedExprs(df, zCols.map(col), path, numFiles)

  /** [[writeZOrdered]] over arbitrary numeric EXPRESSIONS of the
    * row — the form non-numeric dimensions need (a timestamp's
    * epoch micros, a categorical's hash). The expressions are
    * transient like the z-value: computed, interleaved, sorted by,
    * dropped — the persisted schema is `df`'s own, so the layout is
    * a DROP-IN replacement for the original files. */
  def writeZOrderedExprs(df: DataFrame, dims: Seq[Column], path: String,
      numFiles: Int = 32): Unit = {
    val tagged = df.select(col("*") +:
      dims.zipWithIndex.map { case (c, i) => c.as(s"__zd$i") }: _*)
    val bounds = tagged.select(
      dims.indices.flatMap(i => Seq(
        min(col(s"__zd$i")).cast("double"), max(col(s"__zd$i")).cast("double"))): _*)
      .head() // 2 * nDims doubles — table-stats scale, not data scale
    val scaledCols = dims.indices.map { i =>
      scaled(col(s"__zd$i"), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
    }
    tagged.withColumn("__z", mortonCode(scaledCols))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(dims.indices.map(i => s"__zd$i") :+ "__z": _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  /** The events-table layout: z-order by (ts × event_type) — the two
    * columns every operational query boxes on (q08's windows, q15's
    * proximity buckets, dashboard slices). ts interleaves as epoch
    * micros; the categorical interleaves as its crc32 (any stable
    * numeric works — Morton locality only needs equal values to
    * cluster, which is what parquet's string min/max stats prune
    * by). Writes `outDir/events.parquet`, so `outDir` is a DROP-IN
    * sf dir: every events query runs unchanged against it and a
    * (ts, event_type) box skips most row groups at the scan. */
  def zOrderEvents(spark: org.apache.spark.sql.SparkSession, dir: String,
      outDir: String, numFiles: Int = 32): Unit = {
    val ev = graft.sources.Tables.events(spark, dir)
    writeZOrderedExprs(ev,
      Seq(unix_micros(col("ts").cast("timestamp")), crc32(col("event_type"))),
      s"$outDir/events.parquet", numFiles)
  }
}

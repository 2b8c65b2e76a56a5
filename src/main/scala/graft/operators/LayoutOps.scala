package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Multi-dimension data-layout clustering (Z-order / Morton curve) plus a
  * file-skipping manifest — the lakehouse data-skipping pattern (Delta
  * OPTIMIZE ZORDER / Iceberg sort orders) on plain parquet.
  *
  * Why: hive partitioning prunes on ONE directory hierarchy; a query that
  * ranges over two independent columns (user bucket × value band, lat ×
  * lon, time × tenant) prunes on neither unless the layout interleaves
  * both. Sorting files by the Morton code of the filter columns makes
  * every file cover a small HYPER-RECTANGLE of the key space, so per-file
  * min/max stats exclude most files for any multi-dimensional range box.
  * At 100 TB the win is the difference between "scan everything and rely
  * on row-group skipping" and "open |selected| files": the manifest is
  * one row per file (metadata-sized), the box intersection runs as a
  * Spark filter over it, and only matching paths reach the real scan.
  *
  * Correctness never depends on the layout: the manifest records the TRUE
  * per-file min/max of each stat column, so pruning is exact for any file
  * arrangement (a non-z-ordered table prunes correctly too — it just
  * skips fewer files), and the residual filter re-applies the full
  * predicate to the surviving rows.
  */
object LayoutOps {

  /** Morton code: bit-interleave of the low `bits` bits of each column
    * (column j's bit i lands at position `i * n + j`). Inputs are clamped
    * into [0, 2^bits) — clamping can only cost layout LOCALITY for
    * outliers, never correctness, because pruning uses the manifest's
    * true min/max of the raw columns, not the z-value. Pure
    * `functions._` arithmetic: the expression folds into straight-line
    * codegen (no UDF, no custom Expression needed).
    */
  def zValue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 63,
      s"z-value overflows a long: ${cols.size} cols x $bits bits")
    val n = cols.size
    val clamped = cols.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1)))
    val terms = for {
      i <- 0 until bits
      (c, j) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `nFiles` parquet files range-partitioned and sorted by
    * the Morton code of `zCols`, then build the file-skipping manifest.
    *
    * `repartitionByRange` samples the z distribution so files carry
    * balanced ROW counts even when the key distribution is skewed (a hot
    * key region just spans more files — no single writer task absorbs
    * it). The manifest pass re-reads only `zCols` (column-pruned) to
    * record true per-file min/max.
    */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      nFiles: Int = 64, bits: Int = 21): Unit = {
    require(zCols.nonEmpty, "writeZOrdered needs at least one layout column")
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    buildManifest(df.sparkSession, path, zCols)
  }

  /** (Re)build the per-file stats manifest for `path`: one row per file
    * with row count and min/max of each stat column, stored under
    * `path/_manifest` (the underscore prefix keeps it invisible to plain
    * `spark.read.parquet(path)` readers). Safe to call on any parquet
    * dir, z-ordered or not.
    */
  def buildManifest(spark: SparkSession, path: String,
      statCols: Seq[String]): Unit = {
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .select(statCols.map(col): _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** File paths surviving the manifest intersection for an inclusive
    * range box, plus the table's total file count. The manifest filter
    * runs in Spark; only the selected PATH STRINGS are collected — the
    * driver never holds data rows, and the collected list is bounded by
    * the table's file count (the same planning-time cost every table
    * format's file pruning pays).
    */
  def selectFiles(spark: SparkSession, path: String,
      box: Seq[(String, Long, Long)]): (Array[String], Long) = {
    require(box.nonEmpty, "selectFiles needs at least one range")
    val m = spark.read.parquet(s"$path/_manifest")
    val total = m.count()
    val sel = box.foldLeft(m) { case (d, (c, lo, hi)) =>
      d.where(col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
    }.select(col("file")).collect().map(_.getString(0))
    (sel, total)
  }

  /** Manifest-pruned range read: open only the files whose stats
    * intersect the box, then re-apply the exact inclusive predicate as
    * the residual filter (pushed into the parquet scan for row-group
    * skipping within the surviving files). Result is identical to
    * `spark.read.parquet(path).where(box)` for any layout.
    */
  def readPruned(spark: SparkSession, path: String,
      box: Seq[(String, Long, Long)]): DataFrame = {
    val (sel, _) = selectFiles(spark, path, box)
    val residual = box.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (sel.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(sel.toIndexedSeq: _*).where(residual)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Interval/range join: points matched to every interval that contains them
  * (`start <= t <= end`, inclusive both ends), optionally under extra
  * equi-keys — session attribution ("clicks inside a purchase's 2h
  * window"), time-window enrichment, IP-range lookups.
  *
  * Spark compiles a raw `p JOIN i ON t BETWEEN s AND e` to a broadcast
  * nested-loop (or worse, a cartesian) because there is no equi-condition —
  * O(|points|·|intervals|) comparisons, the canonical 100 TB cliff. This
  * operator rewrites it as the classic *binned* interval join: the time
  * axis is cut into fixed `binWidth` cells, each interval explodes to the
  * cells it overlaps, each point maps to exactly ONE cell, and the join
  * becomes a plain hash equi-join on `(keys…, cell)` + a residual
  * `s <= t <= e` filter. Because a point owns a single cell and an
  * interval lists each overlapped cell once, every qualifying
  * (point, interval) pair is emitted exactly once — no post-join dedup.
  *
  * Scale: the exploded interval side grows by `len/binWidth + 1` per row —
  * a one-action stats pass on the interval side (assumed the smaller, as in
  * every attribution/enrichment workload) bounds the blow-up BEFORE any
  * join work and fails loudly past `maxBinsPerInterval` (the fix is a wider
  * bin, suggested in the message). Under `broadcastMaxExplodedRows` the
  * exploded intervals broadcast and the point side never shuffles at all;
  * above it both sides hash-partition on `(keys…, cell)`. Binning also
  * spreads a hot equi-key across its time cells, so keyless (or
  * low-cardinality-key) joins still parallelize; residual hot cells are
  * AQE skew-join territory. Bin width is the precision/fan-out dial:
  * too small explodes intervals, too big drags in candidates the residual
  * filter kills — [[suggestBinWidth]] starts at the median interval length.
  */
object RangeJoinOps {

  /** Normalize a time-axis column to LONG for binning: timestamps become
    * epoch microseconds, integral columns pass through. Anything else
    * (double/decimal/string) is rejected — floor-division binning on a
    * lossy axis would silently mis-bin.
    */
  private def axis(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case TimestampType | TimestampNTZType | DateType =>
      unix_micros(col(c).cast("timestamp"))
    case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
    case other => throw new IllegalArgumentException(
      s"rangeJoin: column '$c' has unsupported time-axis type $other " +
        "(timestamp, date, or integral required)")
  }

  /** Exact floor division for a long column of either sign, by NAME:
    * `a - pmod(a, w)` is exactly divisible so integer `div` is exact.
    * (Plain `div` alone truncates toward zero and mis-bins negative axes;
    * `floor(a / w)` goes through a double and loses integer precision past
    * 2^53.)
    */
  private def fdiv(name: String, w: Long): Column =
    expr(s"(`$name` - pmod(`$name`, ${w}L)) div ${w}L")

  /** Median interval length on the normalized axis (microseconds for
    * timestamp bounds) — a sane starting `binWidth`: at the median, a
    * typical interval explodes to ~2 cells while a point's candidate set
    * stays within ~2 bins' worth of intervals. One action on the interval
    * side only.
    */
  def suggestBinWidth(intervals: DataFrame, startCol: String,
      endCol: String): Long = {
    val med = intervals
      .select((axis(intervals, endCol) - axis(intervals, startCol)).as("__rj_len"))
      .agg(expr("approx_percentile(__rj_len, 0.5)")).head()
    if (med.isNullAt(0)) 1L else math.max(1L, med.getLong(0))
  }

  /** The binned range join. `points` rows keep all their columns plus the
    * matched interval's columns; non-key column names must be disjoint
    * between the two sides (rename before calling — silent aliasing hides
    * bugs). Null times or bounds drop their row (inner-join semantics);
    * an interval with `end < start` is a loud error, not a silent empty
    * match — reversed bounds are always an upstream bug.
    *
    * `binWidth` is in the units of the normalized axis: microseconds when
    * the bound columns are timestamps, the raw unit when integral.
    */
  def rangeJoin(points: DataFrame, pointTimeCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Nil,
      broadcastMaxExplodedRows: Long = 4000000L,
      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"rangeJoin: binWidth must be positive, got $binWidth")
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys.toSet
    require(shared.isEmpty,
      s"rangeJoin: non-key columns ${shared.toSeq.sorted.mkString(", ")} exist " +
        "on both sides — rename one side first")
    keys.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"rangeJoin: key column '$k' must exist on both sides")
    }

    val ivl = intervals
      .withColumn("__rj_s", axis(intervals, startCol))
      .withColumn("__rj_e", axis(intervals, endCol))
      .withColumn("__rj_sb", fdiv("__rj_s", binWidth))
      .withColumn("__rj_eb", fdiv("__rj_e", binWidth))
    val binsPer = col("__rj_eb") - col("__rj_sb")

    // one action on the (small) interval side bounds the explode AND
    // catches reversed bounds before any join work
    val st = ivl.agg(
      coalesce(sum(when(col("__rj_e") < col("__rj_s"), 1L).otherwise(0L)),
        lit(0L)).as("neg"),
      coalesce(max(when(col("__rj_e") >= col("__rj_s"), binsPer)),
        lit(0L)).as("maxBins"),
      coalesce(sum(when(col("__rj_e") >= col("__rj_s"), binsPer + lit(1L))),
        lit(0L)).as("exploded")
    ).head()
    val (neg, maxBins, exploded) = (st.getLong(0), st.getLong(1), st.getLong(2))
    if (neg > 0) throw new IllegalArgumentException(
      s"rangeJoin: $neg interval(s) have $endCol < $startCol — reversed " +
        "bounds are an upstream bug, refusing to silently drop them")
    if (maxBins > maxBinsPerInterval) throw new IllegalArgumentException(
      s"rangeJoin: longest interval spans ${maxBins + 1} bins of width " +
        s"$binWidth (cap $maxBinsPerInterval) — raise binWidth to ~" +
        s"${binWidth * (maxBins / maxBinsPerInterval + 1)} or raise " +
        "maxBinsPerInterval if the explode cost is understood")

    val expl = ivl
      .withColumn("__rj_bin", explode(sequence(col("__rj_sb"), col("__rj_eb"))))
      .drop("__rj_sb", "__rj_eb")
    val pts = points
      .withColumn("__rj_t", axis(points, pointTimeCol))
      .withColumn("__rj_bin", fdiv("__rj_t", binWidth))
    val joinCols = keys :+ "__rj_bin"
    val joined =
      if (exploded <= broadcastMaxExplodedRows) pts.join(broadcast(expl), joinCols)
      else pts.join(expl.hint("shuffle_hash"), joinCols)
    joined
      .where(col("__rj_s") <= col("__rj_t") && col("__rj_t") <= col("__rj_e"))
      .drop("__rj_bin", "__rj_t", "__rj_s", "__rj_e")
  }
}

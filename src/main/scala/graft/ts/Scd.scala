package graft.ts

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Change-capture / SCD-type-2 materialization: turn a per-entity event
  * stream of attribute observations into validity intervals
  * `[valid_from, valid_to)` — one row per *change*, consecutive repeats of
  * the same attribute tuple collapsed into the run's first observation.
  *
  * This is the dimension-history shape a training pipeline joins against
  * point-in-time (the as-of family in [[Align]] consumes raw observations;
  * an SCD2 table is the compacted equivalent: |changes| rows instead of
  * |observations|, with the join predicate `valid_from <= t < valid_to`).
  * The reference keeps full observation history and replays merge_asof
  * (src/qafs/backend/pandas.py:163-172); materializing intervals is the
  * warehouse-idiomatic compaction of exactly that semantics.
  *
  * Scale shape: both window passes partition BY ENTITY — there is no
  * global sort and no single-partition window anywhere; cost is one hash
  * shuffle on the entity key reused by both stages (Catalyst plans the lag
  * and lead windows over the same partitioning without a second exchange).
  * A hot entity costs its own row count, which for per-entity event
  * streams is bounded by that entity's history — the natural unit.
  */
object Scd {

  /** Collapse `df` (one row per observation) into SCD2 intervals per
    * `entityCol`, tracking `attrCols` for changes.
    *
    * Ordering within an entity is by `timeCol`, then `tieCols` (supply
    * enough of a tiebreak to make the order total — with equal timestamps
    * and no tiebreak, which observation "wins" the instant would be
    * nondeterministic, and a nondeterministic dimension table is a
    * nondeterministic training set).
    *
    * Output: entity, attrCols..., `valid_from`, `valid_to` (null for the
    * currently-open interval). An interval opens at the first observation
    * of a run of equal attr tuples and closes at the next run's first
    * observation time. Null attribute values are treated as values (null →
    * null is "no change"), matching SQL `IS NOT DISTINCT FROM`.
    */
  def scdIntervals(df: DataFrame, entityCol: String, timeCol: String,
      attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute column")
    val order = (col(timeCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)

    // change flag: any tracked attr differs from the previous observation
    // of the SAME entity. struct() comparison gives tuple equality with
    // null-safe per-field semantics via the <=> on the struct.
    val attrs = struct(attrCols.map(col): _*)
    val isChange = !(attrs <=> lag(attrs, 1).over(w)) ||
      row_number().over(w) === 1

    val changes = df
      .withColumn("__chg", isChange)
      .where(col("__chg"))
      .drop("__chg")

    // valid_to = the next change's valid_from, over the SAME entity
    // partitioning (no extra shuffle: same keys, same order)
    val w2 = Window.partitionBy(col(entityCol))
      .orderBy((col(timeCol) +: tieCols.map(col)).map(_.asc): _*)
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w2))
      .select((entityCol +: attrCols).map(col) :+ col("valid_from") :+ col("valid_to"): _*)
  }

  /** Point-in-time lookup against an SCD2 table: each spine row
    * (entity, t, payload...) receives the attribute tuple valid at its
    * instant — the interval with the latest `valid_from <= t`. Because
    * intervals of one entity abut (each closes where the next opens),
    * this IS a per-entity backward as-of join on `valid_from`, so it
    * rides [[Align.asOfJoinKeyed]]'s union+window shape: one hash
    * shuffle on the entity key, no interval explode, no range join.
    *
    * Empty intervals (`valid_to == valid_from`, produced by two changes
    * at the same instant) never serve — they are closed before they
    * open — so they are dropped first, which also makes the lookup
    * deterministic at tied instants: the tie's LAST change (by the SCD2
    * build's tiebreak) owns the instant. Spine rows before an entity's
    * first interval get nulls.
    */
  def scdAsOf(spine: DataFrame, scd: DataFrame, entityCol: String,
      timeCol: String, attrCols: Seq[String]): DataFrame = {
    val live = scd.where(col("valid_to").isNull || col("valid_to") > col("valid_from"))
    Align.asOfJoinKeyed(spine, live.withColumnRenamed("valid_from", timeCol),
      Seq(entityCol), timeCol, attrCols)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation for aggregations over hot keys.
  *
  * AQE's skew-join splitting handles joins, but a `groupBy` over a key
  * where a handful of values carry most rows still funnels each hot key
  * through one reducer. Salting splits every key into `buckets` sub-keys,
  * aggregates partially per (key, salt), then re-aggregates per key — two
  * small shuffles instead of one skewed one. Works for any algebraic
  * aggregate (re-aggregatable: sum/count/min/max and compositions like
  * avg = sum/count).
  */
object SkewOps {

  case class Agg(col: String, fn: String) // fn: sum | count | min | max

  /** Two-stage salted aggregation. `aggs` name output columns
    * `{fn}_{col}` (count uses `count_rows` when col is "*").
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      buckets: Int = 16): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    // deterministic salt: spread rows of one key across buckets by row
    // content, not rand() (reproducible plans, retried tasks stay correct)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(buckets)))

    def partial(a: Agg): Column = a.fn match {
      case "count" => count(if (a.col == "*") lit(1) else col(a.col)).as(partialName(a))
      case "sum"   => sum(col(a.col)).as(partialName(a))
      case "min"   => min(col(a.col)).as(partialName(a))
      case "max"   => max(col(a.col)).as(partialName(a))
      case other   => throw new IllegalArgumentException(s"non-reaggregatable fn: $other")
    }
    // counts re-aggregate by SUM; the rest by themselves
    def fin(a: Agg): Column = (a.fn match {
      case "count" => sum(col(partialName(a)))
      case "sum"   => sum(col(partialName(a)))
      case "min"   => min(col(partialName(a)))
      case "max"   => max(col(partialName(a)))
    }).as(outName(a))

    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial(aggs.head), aggs.tail.map(partial): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(fin(aggs.head), aggs.tail.map(fin): _*)
  }

  private def partialName(a: Agg) = s"__p_${a.fn}_${safe(a.col)}"
  private def outName(a: Agg) = if (a.col == "*") s"${a.fn}_rows" else s"${a.fn}_${safe(a.col)}"
  private def safe(c: String) = c.replaceAll("[^a-zA-Z0-9_]", "_")
}

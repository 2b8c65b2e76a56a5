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

  /** Skew-safe salted inner equi-join (salt-replicate): every fact row of a
    * hot key would land on ONE reducer in a plain shuffle join; here the
    * fact side is salted into `buckets` sub-keys by row content and the dim
    * side is REPLICATED once per bucket, so the join runs on
    * (keys..., salt) and a hot key's rows spread across `buckets` tasks.
    *
    * This is the shape for when the dim side is too large to broadcast
    * wholesale (a broadcast join would be the first choice — see the
    * scaladoc dial below) but small enough that `buckets`× replication is
    * cheap relative to the skewed reducer it removes. Replication cost is
    * |dim| × buckets rows through one shuffle; the win is the hot key's
    * |fact_hot| rows splitting `buckets` ways. AQE's skew-join splitting
    * covers sort-merge joins after the fact; this form guarantees the
    * spread in the plan itself and also covers shuffled-hash joins.
    *
    * Result is identical to `fact.join(dim, keys, "inner")`: each fact row
    * carries exactly one salt value, and the dim replica set contains each
    * dim row exactly once per salt value, so every (fact, dim) key match
    * pairs exactly once. Salt is derived from `xxhash64` of the whole fact
    * row (deterministic — retried tasks resalt identically; `rand()` here
    * would double- or zero-count rows under task retry).
    *
    * Output columns: all of `fact`, then dim's non-key columns (names must
    * not collide — enforced loudly).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    val dimPayload = dim.columns.filterNot(keys.contains)
    val clash = dimPayload.intersect(fact.columns)
    require(clash.isEmpty,
      s"dim payload columns collide with fact columns: ${clash.mkString(", ")}")

    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets)).cast("int"))
    // one replica of every dim row per salt value; posexplode of a literal
    // array keeps this a map-side projection (no shuffle to replicate)
    val replicated = dim.withColumn("__salt",
      explode(lit((0 until buckets).toArray)))
    // shuffle_hash: the point is spreading the hot key, not re-sorting it
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt")
      .drop("__salt")
  }
}

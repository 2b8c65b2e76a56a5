package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling operators for training-data curation.
  *
  * A 100 TB corpus is never used whole: pipelines mix sources with
  * per-source/per-language quotas ("20% web, cap code at 10M docs, upsample
  * wiki 2x"). `df.sample()` is non-reproducible across runs/engines (seeded
  * per-partition, partitioning-dependent), so every operator here derives
  * its keep/drop decision from a content hash of the row's id — the same
  * row set comes back on every engine, every partitioning, every rerun.
  * That reproducibility is what makes ablations and incremental re-runs
  * comparable, and it is what the DuckDB oracle checks.
  *
  * Hash = the engine-reproducible 60-bit md5 prefix
  * ([[DedupOps.baseHash]], numerically `conv(substring(md5(s),1,15),16,10)`)
  * over the id rendered as a decimal string, optionally salted — so
  * resampling with a different salt draws an independent sample.
  */
object SampleOps {

  /** Hash of an id column mapped into [0, 1e6) — the sampling universe.
    * Million-slot granularity keeps rate thresholds integer-exact
    * (ppm = parts per million) across engines.
    */
  val Ppm = 1000000L

  private[graft] def slot(idCol: Column, salt: String): Column =
    pmod(DedupOps.baseHash(concat(lit(salt), idCol.cast("string"))), lit(Ppm))

  /** Uniform deterministic sample: keep rows whose hash slot < rate·1e6.
    * Map-side filter, no shuffle, pushdown-friendly.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = ""): DataFrame = {
    DedupOps.ensureHashRegistered(df)
    df.where(slot(col(idCol), salt) < lit(math.floor(rate * Ppm).toLong))
  }

  /** Deterministic k-fold assignment (cross-validation / sharded eval):
    * `fold` = the id's md5 slot mapped through k equal ppm ranges — the
    * same slot machinery as [[splitAssign]], so folds are disjoint and
    * total by construction, rerun- and partitioning-independent, and
    * STABLE under corpus growth (a row's fold never changes when other
    * rows appear). Map-side projection, no shuffle.
    */
  def foldAssign(df: DataFrame, idCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k > 1, s"foldAssign: need k > 1, got $k")
    DedupOps.ensureHashRegistered(df)
    df.withColumn("fold",
      (slot(col(idCol), salt) * k / Ppm).cast("bigint"))
  }

  /** Stratified deterministic sample: per-stratum keep rates, e.g.
    * `Map("en" -> 0.5, "de" -> 0.25)` over a language column, with
    * `defaultRate` for strata not in the map.
    *
    * The rate table is a tiny broadcast-joined DataFrame, NOT a literal
    * CASE chain — hundreds of strata (source × lang cells) stay O(1) in
    * the expression tree and the corpus still streams map-side with no
    * shuffle. Scale shape: broadcast join + filter; the corpus is touched
    * once.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    DedupOps.ensureHashRegistered(df)
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq
      .map { case (s, r) => (s, math.floor(r * Ppm).toLong) }
      .toDF("__stratum", "__ppm")
    val defPpm = math.floor(defaultRate * Ppm).toLong
    df.join(broadcast(rateDf), df(stratumCol) === col("__stratum"), "left")
      .where(slot(col(idCol), salt) < coalesce(col("__ppm"), lit(defPpm)))
      .drop("__stratum", "__ppm")
  }

  /** Deterministic quota sample: the `n` rows with the smallest id-hashes
    * per stratum (a fixed-size uniform draw without replacement). Adds
    * `sample_rank` (1-based within the stratum, ordered by hash then id).
    *
    * Scale note: the per-stratum window sorts each stratum's rows once
    * (one shuffle on the stratum key). When quotas are small relative to
    * huge strata, pre-filter with [[hashSample]] at a rate comfortably
    * above n/|stratum| and quota the survivors — same result, a fraction
    * of the sort. Rate-based [[stratifiedSample]] remains the preferred
    * shuffle-free shape when an exact count isn't required.
    */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String, n: Int,
      salt: String = ""): DataFrame = {
    DedupOps.ensureHashRegistered(df)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(slot(col(idCol), salt), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .where(col("sample_rank") <= n)
  }

  /** Token-budget sample: per stratum, keep docs in hash order while the
    * cumulative TOKEN count stays within the stratum's budget — corpus
    * mixing by token share ("5M tokens of wiki, 1M of code"), the unit
    * mixtures are actually specified in. Prefix semantics: a doc is kept
    * iff it fits entirely within the budget at its hash position, so the
    * kept set is a deterministic prefix of the stratum's hash order
    * (engine/partitioning/rerun-independent, like every operator here).
    * Adds `cum_tokens` (the running total through the kept doc).
    *
    * Scale shape: one shuffle on the stratum key (per-stratum window,
    * strata are independent partitions); budgets are a tiny broadcast
    * table, not a CASE chain. A stratum's whole row set sorts through one
    * window partition — when budgets are small next to a huge stratum
    * (the normal case), pre-filter with [[hashSample]] at a rate
    * comfortably above budget/E[stratum tokens] first, exactly like
    * [[quotaSample]]'s documented escape: the kept prefix is unchanged as
    * long as the pre-filter retains every doc the budget admits.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, salt: String = "",
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    DedupOps.ensureHashRegistered(df)
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF("__stratum", "__budget")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(slot(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null text = empty text (1 empty token), matching CurationOps — a
    // null token count would ride the window sum uncharged and be kept
    // for free. `tokenCounter` sets the budget's token basis (whitespace
    // default; [[TextOps.bpeTokenCount]] or any reproducible expression) —
    // one map-side column, the window shape is unchanged.
    df.withColumn("__n",
        tokenCounter(coalesce(col(textCol), lit(""))).cast("long"))
      .withColumn("cum_tokens", sum(col("__n")).over(w))
      .join(broadcast(budgetDf), df(stratumCol) === col("__stratum"), "left")
      .where(col("cum_tokens") <= coalesce(col("__budget"), lit(defaultBudget)))
      .drop("__stratum", "__budget", "__n")
  }

  /** Per-stratum token budgets from target mixture weights over one global
    * token budget — floor(wᵢ/Σw · total) each. Driver-side arithmetic on a
    * handful of strata; exposed so the sample and its report agree on
    * budgets by construction.
    */
  def mixtureBudgets(weights: Map[String, Double],
      totalTokens: Long): Map[String, Long] = {
    require(weights.nonEmpty, "mixture needs at least one stratum weight")
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      s"mixture weights must be >= 0 with a positive sum, got $weights")
    val z = weights.values.sum
    weights.map { case (k, w) => k -> (w / z * totalTokens).toLong }
  }

  /** Corpus mixing by token share — the "40% web / 30% code / 30% wiki"
    * construction every pretraining run specifies: target mixture
    * `weights` over one global `totalTokens` budget become per-stratum
    * token budgets ([[mixtureBudgets]]), filled deterministically in hash
    * order by [[tokenBudgetSample]]. Strata not named in the mixture are
    * dropped (budget 0). A weight whose stratum runs out of tokens
    * under-fills silently — read the achieved mixture with
    * [[mixtureReport]] rather than assuming targets were met.
    *
    * Scale: identical to [[tokenBudgetSample]] — one stratum-keyed window
    * shuffle, budgets broadcast; same [[hashSample]] pre-filter escape for
    * budgets tiny next to a huge stratum.
    */
  def mixtureTokenSample(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, weights: Map[String, Double], totalTokens: Long,
      salt: String = "",
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame =
    tokenBudgetSample(df, idCol, textCol, stratumCol,
      mixtureBudgets(weights, totalTokens), 0L, salt, tokenCounter)

  /** Achieved-vs-target accounting for [[mixtureTokenSample]]: one row per
    * TARGETED stratum — `(stratum, target_tokens, kept_docs, kept_tokens)`,
    * kept_tokens <= target_tokens always (the prefix property), zero rows
    * for strata absent from the corpus. Integer-exact columns only, so two
    * engines agree cell-for-cell.
    *
    * Cost: the sample's window shuffle + one tiny per-stratum aggregate
    * (kept_tokens is the stratum's max cum_tokens — no second token scan).
    */
  def mixtureReport(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, weights: Map[String, Double], totalTokens: Long,
      salt: String = "",
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = mixtureBudgets(weights, totalTokens)
    val kept = mixtureTokenSample(df, idCol, textCol, stratumCol, weights,
      totalTokens, salt, tokenCounter)
    val budgetDf = budgets.toSeq.toDF("stratum", "target_tokens")
    val agg = kept.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("kept_docs"),
        max(col("cum_tokens")).as("kept_tokens"))
    budgetDf.join(agg, Seq("stratum"), "left")
      .select(col("stratum"), col("target_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /** Deterministic train/val/test assignment: every row gets exactly one
    * split label from its id-hash slot, so the partition is disjoint and
    * total by construction — the invariant downstream decontamination and
    * eval hygiene depend on (a doc must never drift between train and val
    * across reruns or engines; cf. qafs's train/test dataset split role,
    * /root/reference/src/qafs/api.py dataset retrieval).
    *
    * `fractions` is an ORDERED list of (name, fraction): slot thresholds
    * are the cumulative ppm floors, and the LAST split absorbs the
    * sub-ppm rounding remainder so no slot is unassigned. Fractions must
    * be positive and sum to 1 within ppm resolution. Re-salting draws an
    * independent partition (e.g. per-ablation splits).
    *
    * Scale shape: one map-side `CASE` over a handful of thresholds —
    * no shuffle, no join, pushdown-friendly; composes with any
    * downstream filter.
    */
  def splitAssign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "splitAssign needs at least one split")
    require(fractions.forall(_._2 > 0),
      s"split fractions must be positive, got $fractions")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6,
      s"split fractions must sum to 1, got $total from $fractions")
    DedupOps.ensureHashRegistered(df)
    // cumulative ppm bounds; the last bound is pinned to Ppm so flooring
    // never leaves a slot without a split
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.floor(f * Ppm).toLong
    }.tail.init :+ Ppm
    val s = slot(col(idCol), salt)
    val assigned = fractions.map(_._1).zip(bounds).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, hi)) =>
        when(s < lit(hi), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** [[splitAssign]] at LEAKAGE-SAFE granularity: the slot hashes the
    * row's near-dup COMPONENT label (`labels` = `(id, component)`, e.g.
    * [[DedupOps.loadClusterLabels]]'s latest-wins view; ids absent from
    * `labels` are their own singleton components), so every member of a
    * near-dup cluster draws the SAME split. A doc-granular split cannot
    * prevent the worst eval-hygiene leak — a near-duplicate of a val doc
    * sitting in train — because the two docs hash independently; hashing
    * the cluster makes straddling impossible by construction, and the
    * partition stays disjoint + total exactly as in [[splitAssign]].
    *
    * Fractions apply to CLUSTERS: each cluster lands whole, so realized
    * row fractions track cluster mass (exact in expectation; deviation
    * bounded by the largest cluster's share).
    *
    * Scale shape: one left join against the label view — the same size
    * class as the dedup store the pipeline already maintains, equi-keyed
    * on the id so AQE broadcasts or shuffles as its size dictates — then
    * [[splitAssign]]'s map-side CASE; no other corpus exchange.
    */
  def splitAssignClustered(df: DataFrame, idCol: String, labels: DataFrame,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    val cc = labels.select(col("id").as("__sp_id"),
      col("component").as("__sp_comp"))
    val keyed = df.join(cc, col(idCol) === col("__sp_id"), "left")
      .withColumn("__sp_key", coalesce(col("__sp_comp"), col(idCol)))
      .drop("__sp_id", "__sp_comp")
    splitAssign(keyed, "__sp_key", fractions, salt).drop("__sp_key")
  }
}

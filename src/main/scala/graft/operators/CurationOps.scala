package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Benchmark decontamination + end-to-end corpus curation.
  *
  * Training corpora must be scrubbed of evaluation-benchmark content before
  * training (the GPT-3 appendix-C construction: a document is contaminated if
  * it shares any word k-gram with the benchmark set). The reference engine
  * (rodrigobaron/qafs) has no corpus surface at all — this module, like the
  * rest of the LLM-pipeline tier, extends it with the operations a
  * training-data pipeline needs at 100 TB.
  *
  * Scale shape: the benchmark n-gram set is inherently small (eval suites are
  * megabytes; the corpus is the 100 TB side), so membership is a broadcast
  * hash join against the corpus shingle stream — no shuffle of corpus data on
  * the shingle key. The only wide exchange is `shingleRows`' single doc-id
  * shuffle, and both aggregations downstream group on supersets of that key
  * (`(id, s)` then `id`), which `HashPartitioning(id)` already satisfies — so
  * the whole operator costs exactly one corpus shuffle. If the "benchmark"
  * side ever is corpus-sized, swap the broadcast for a `shuffle_hash` hint on
  * `s`; semantics are unchanged.
  */
object CurationOps {

  /** Per-document k-gram overlap with a benchmark corpus.
    *
    * Output: one row per corpus doc with ≥ 1 full k-gram —
    * `(idCol, n_shingles, n_overlap, contaminated)` where `n_shingles` is
    * the count of DISTINCT word k-grams in the doc, `n_overlap` how many of
    * them occur anywhere in `bench`, and `contaminated` = n_overlap > 0
    * (the GPT-3 any-collision rule). Docs shorter than k tokens emit
    * nothing — they carry no k-gram evidence either way.
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 4,
      broadcastBenchChars: Long = 64000000L): DataFrame = {
    val corpusShingles = TextOps.shingleRows(corpus, idCol, textCol, k)
    val benchShingles = TextOps.shingleRows(bench, idCol, textCol, k)
      .select(col("s")).distinct().withColumn("__hit", lit(1))
    // guard BEFORE choosing the join strategy: eval suites are megabytes so
    // the broadcast is the normal path, but a corpus-sized "benchmark" fed
    // here by mistake must not be collected onto the driver. The guard is a
    // cheap upper bound — total bench text chars, one map-side aggregate on
    // the SMALL side (distinct k-gram bytes are within ~k× of it) — rather
    // than an exact distinct-shingle count: exactness would force
    // computing+caching the shingle set before planning, which pollutes
    // the membership join's plan (and the cost model only needs a bound).
    // Above the limit the join degrades to a shuffled hash join on the
    // shingle key; semantics identical, one extra corpus shuffle.
    val benchChars = bench
      .agg(coalesce(sum(length(coalesce(col(textCol), lit("")))), lit(0L)))
      .head().getLong(0)
    val joined =
      if (benchChars <= broadcastBenchChars)
        corpusShingles.join(broadcast(benchShingles), Seq("s"), "left")
      else
        corpusShingles.join(benchShingles.hint("shuffle_hash"), Seq("s"), "left")
    joined
      // shingleRows repeats a k-gram at each position; fold to per-(doc,
      // k-gram) first. Both groupBys run on the window's existing id
      // partitioning — no further exchange.
      .groupBy(col("id"), col("s"))
      .agg(max(coalesce(col("__hit"), lit(0))).as("hit"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("hit")).as("n_overlap"))
      .select(col("id").as(idCol),
        col("n_shingles").cast("bigint").as("n_shingles"),
        col("n_overlap").cast("bigint").as("n_overlap"),
        (col("n_overlap") > 0).as("contaminated"))
  }

  /** End-to-end curation: the kept corpus after exact dedup, benchmark
    * decontamination, and repetition/length quality filters — the compose-
    * everything pass a pipeline runs between raw crawl and tokenization.
    *
    * Keeps a doc iff its source survives the optional `blockedSources`
    * list (applied first, RefinedWeb-style), it is its own exact-dup
    * canonical (min id per content fingerprint) among the survivors,
    * shares no word k-gram with `bench`, has at least `minTokens`
    * whitespace tokens, and its most frequent token accounts for at most
    * `maxTopTokenFrac` of them (Gopher-style repetition cut).
    *
    * Every stage keys by the doc id, so the joins reuse one hash
    * partitioning; the contamination stage broadcasts the benchmark set
    * (see [[ngramOverlap]]); nothing touches the driver.
    *
    * Output: `(idCol, langCol, n_tokens, top_token_frac)` for kept docs.
    */
  def curateKeep(docs0: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, langCol: String, k: Int = 4, minTokens: Long = 20,
      maxTopTokenFrac: Double = 0.12,
      tokenCounter: Option[Column => Column] = None,
      sourceCol: String = "source",
      blockedSources: Option[DataFrame] = None): DataFrame = {
    // null text = empty text: tokenizes to one empty token (n_tokens = 1),
    // so such docs flow through every rule (and fail the length cut)
    // instead of silently vanishing from the inner joins below
    val unblocked = docs0.withColumn(textCol, coalesce(col(textCol), lit("")))
    // RefinedWeb-style source/domain blocklist, applied FIRST (cheapest
    // cut: blocked docs never reach the dedup/contamination work, and
    // duplicates re-canonicalize among survivors). Real blocklists are
    // MB-scale domain lists — broadcast; the first column of the frame is
    // the blocked source value.
    val docs = blockedSources.fold(unblocked)(b =>
      unblocked.join(
        broadcast(b.select(col(b.columns.head).as("__bsrc")).distinct()),
        col(sourceCol) === col("__bsrc"), "left_anti"))
    val rep = repWithCounter(docs, idCol, textCol, tokenCounter)
    val contaminated = ngramOverlap(docs, bench, idCol, textCol, k)
      .where(col("contaminated"))
      .select(col(idCol))
    val canonical = DedupOps.exactDedupMap(docs, idCol, textCol)
      .where(col("canonical_id") === col(idCol))
      .select(col(idCol))
    docs.select(col(idCol), col(langCol))
      .join(rep, Seq(idCol))
      .join(canonical, Seq(idCol), "left_semi")
      .join(contaminated, Seq(idCol), "left_anti")
      .where(col("n_tokens") >= minTokens &&
        col("top_token_frac") <= maxTopTokenFrac)
      .select(col(idCol), col(langCol), col("n_tokens"), col("top_token_frac"))
  }

  /** [[curateKeep]] with a NEAR-DUP, quality-aware dedup stage: the
    * exact-fingerprint min-id canonicalization is replaced by keep-best
    * selection over precomputed `(id, component)` near-dup cluster labels
    * ([[DedupOps.clusterKeepBestFromLabels]] — winner = max `scoreCol`,
    * ties to min id; docs absent from `labels` are their own singletons).
    * This is the composition a production pipeline runs once an
    * incrementally-maintained label store
    * ([[DedupOps.loadClusterLabels]]) tracks the corpus's near-dup
    * components: the curation pass never re-clusters, and cluster
    * NON-keepers drop BEFORE the expensive per-doc work, so the
    * contamination shingle explode and token accounting run over one
    * representative per near-dup group instead of every copy — on a
    * boilerplate-heavy crawl that is most of the corpus.
    *
    * Keeps a doc iff it survives the optional `blockedSources` list
    * (applied first — blocked docs never compete for cluster
    * representative), it is its cluster's keep-best representative, it
    * shares no word k-gram with `bench`, and it passes the same
    * length/repetition cuts as [[curateKeep]]. Output:
    * `(idCol, langCol, n_tokens, top_token_frac)` for kept docs.
    */
  def curateKeepClustered(docs0: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, langCol: String, labels: DataFrame, scoreCol: String,
      k: Int = 4, minTokens: Long = 20, maxTopTokenFrac: Double = 0.12,
      tokenCounter: Option[Column => Column] = None,
      sourceCol: String = "source",
      blockedSources: Option[DataFrame] = None): DataFrame = {
    val unblocked = docs0.withColumn(textCol, coalesce(col(textCol), lit("")))
    val docs = blockedSources.fold(unblocked)(b =>
      unblocked.join(
        broadcast(b.select(col(b.columns.head).as("__bsrc")).distinct()),
        col(sourceCol) === col("__bsrc"), "left_anti"))
    val keepers = DedupOps.clusterKeepBestFromLabels(docs, idCol, scoreCol, labels)
      .where(col("keep"))
      .select(col(idCol))
    // representatives only from here down — the shingle explode and token
    // accounting never touch a non-keeper's text
    val reps = docs.join(keepers, Seq(idCol), "left_semi")
    val rep = repWithCounter(reps, idCol, textCol, tokenCounter)
    val contaminated = ngramOverlap(reps, bench, idCol, textCol, k)
      .where(col("contaminated"))
      .select(col(idCol))
    reps.select(col(idCol), col(langCol))
      .join(rep, Seq(idCol))
      .join(contaminated, Seq(idCol), "left_anti")
      .where(col("n_tokens") >= minTokens &&
        col("top_token_frac") <= maxTopTokenFrac)
      .select(col(idCol), col(langCol), col("n_tokens"), col("top_token_frac"))
  }

  /** [[curationReport]] for the CLUSTERED pipeline — the accounting twin
    * of [[curateKeepClustered]]: outcome precedence `blocked` →
    * `non_keeper` (lost its near-dup cluster's keep-best election) →
    * `contaminated` → `short` → `repetitive` → `kept`, so the `kept` rows
    * are EXACTLY [[curateKeepClustered]]'s result set and the outcome
    * counts partition the corpus. Per-doc stats are computed over
    * representatives only and joined back — non-keepers are accounted by
    * their outcome, not re-scored (their text never reaches the shingle
    * explode, mirroring the keep path's cost shape; their token counts
    * in the report come from one cheap map-side [[TextOps.tokenCount]]
    * pass, not the full repetition scan).
    */
  def curationReportClustered(docs0: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, langCol: String, labels: DataFrame,
      scoreCol: String, k: Int = 4, minTokens: Long = 20,
      maxTopTokenFrac: Double = 0.12,
      tokenCounter: Option[Column => Column] = None,
      sourceCol: String = "source",
      blockedSources: Option[DataFrame] = None): DataFrame = {
    val docs = docs0.withColumn(textCol, coalesce(col(textCol), lit("")))
    val flagged = blockedSources.fold(docs.withColumn("__blk", lit(null).cast("int")))(b =>
      docs.join(
        broadcast(b.select(col(b.columns.head).as(sourceCol)).distinct()
          .withColumn("__blk", lit(1))), Seq(sourceCol), "left"))
    val live = flagged.where(col("__blk").isNull)
    val keepers = DedupOps.clusterKeepBestFromLabels(live, idCol, scoreCol, labels)
      .where(col("keep"))
      .select(col(idCol), lit(1).as("__kb"))
    val reps = live.join(keepers.select(col(idCol)), Seq(idCol), "left_semi")
    val rep = repWithCounter(reps, idCol, textCol, tokenCounter)
    val contaminated = ngramOverlap(reps, bench, idCol, textCol, k)
      .where(col("contaminated"))
      .select(col(idCol), lit(1).as("__contam"))
    val counterCol: Column => Column =
      tokenCounter.getOrElse(TextOps.tokenCount(_).cast("long"))
    flagged.select(col(idCol), col(langCol), col("__blk"),
        counterCol(col(textCol)).cast("long").as("__all_n"))
      .join(keepers, Seq(idCol), "left")
      .join(rep, Seq(idCol), "left")
      .join(contaminated, Seq(idCol), "left")
      .withColumn("outcome",
        when(col("__blk") === 1, "blocked")
          .when(col("__kb").isNull, "non_keeper")
          .when(col("__contam") === 1, "contaminated")
          .when(col("n_tokens") < minTokens, "short")
          .when(col("top_token_frac") > maxTopTokenFrac, "repetitive")
          .otherwise("kept"))
      .groupBy(col(langCol), col("outcome"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_tokens"), col("__all_n"))).cast("bigint")
          .as("n_tokens"))
  }

  /** Curation accounting — the per-language outcome breakdown every real
    * curation run reports (what fraction of docs/tokens each rule dropped).
    * Outcomes use first-failing-rule precedence `blocked` → `duplicate` →
    * `contaminated` → `short` → `repetitive` → `kept`, so the `kept` rows
    * are EXACTLY [[curateKeep]]'s result set and the outcome counts
    * partition the corpus. Output: `(langCol, outcome, n_docs, n_tokens)`.
    *
    * Same join graph as [[curateKeep]] (all keyed by the doc id, benchmark
    * broadcast) plus one tiny final groupBy on (lang, outcome) — partial
    * aggregates collapse it map-side to ≤ |langs|×5 rows before the
    * exchange.
    */
  def curationReport(docs0: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, langCol: String, k: Int = 4, minTokens: Long = 20,
      maxTopTokenFrac: Double = 0.12,
      tokenCounter: Option[Column => Column] = None,
      sourceCol: String = "source",
      blockedSources: Option[DataFrame] = None): DataFrame = {
    // null text = empty text (see [[curateKeep]]) — the partition contract
    // (outcome counts sum to the corpus size) must hold for crawl rows
    // with missing text too
    val docs = docs0.withColumn(textCol, coalesce(col(textCol), lit("")))
    // blocked docs are ACCOUNTED (outcome `blocked`, highest precedence),
    // not dropped; dedup canonicalization and the contamination probe run
    // over the surviving docs only, mirroring [[curateKeep]]'s
    // filter-first order so `kept` stays exactly its result set
    val flagged = blockedSources.fold(docs.withColumn("__blk", lit(null).cast("int")))(b =>
      docs.join(
        broadcast(b.select(col(b.columns.head).as(sourceCol)).distinct()
          .withColumn("__blk", lit(1))), Seq(sourceCol), "left"))
    val live = flagged.where(col("__blk").isNull)
    val rep = repWithCounter(docs, idCol, textCol, tokenCounter)
    val contaminated = ngramOverlap(live, bench, idCol, textCol, k)
      .where(col("contaminated"))
      .select(col(idCol), lit(1).as("__contam"))
    val canon = DedupOps.exactDedupMap(live, idCol, textCol)
      .select(col(idCol), col("canonical_id"))
    flagged.select(col(idCol), col(langCol), col("__blk"))
      .join(rep, Seq(idCol))
      .join(canon, Seq(idCol), "left")
      .join(contaminated, Seq(idCol), "left")
      .withColumn("outcome",
        when(col("__blk") === 1, "blocked")
          .when(col("canonical_id") =!= col(idCol), "duplicate")
          .when(col("__contam") === 1, "contaminated")
          .when(col("n_tokens") < minTokens, "short")
          .when(col("top_token_frac") > maxTopTokenFrac, "repetitive")
          .otherwise("kept"))
      .groupBy(col(langCol), col("outcome"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))
  }

  /** SPAN-level benchmark decontamination — the other half of the GPT-3
    * appendix-C construction (Brown et al. 2020: remove the colliding
    * window plus a surrounding margin and keep the REST of the document;
    * dropping whole docs at any-collision granularity, as [[curateKeep]]
    * does, overkills long documents that merely quote one benchmark line):
    * every corpus k-window whose content appears anywhere in `bench` is cut
    * together with `margin` tokens on each side, and each doc is rebuilt
    * from its surviving tokens. Returns `(idCol, textCol, n_cut_tokens)`
    * for EVERY corpus doc — uncontaminated docs come back unchanged with
    * n_cut_tokens = 0; a fully-contaminated doc becomes "".
    *
    * Scale: the bench membership join is the same broadcast-under-char-
    * bound guard as [[ngramOverlap]] (fail-safe to `shuffle_hash`); cut
    * positions explode from the MATCHED windows only, anti-join the token
    * stream on (id, pos), and docs reassemble with one id-keyed aggregate
    * — the [[DedupOps.dropDuplicateSpans]] rebuild shape. Margin positions
    * past either end of the doc are harmless (the anti join never matches
    * them; sequence starts clamp at 0).
    */
  def decontaminateSpans(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 4, margin: Int = 0,
      broadcastBenchChars: Long = 64000000L): DataFrame = {
    require(margin >= 0, "margin must be >= 0")
    val corpusShingles = TextOps.shingleRows(corpus, idCol, textCol, k)
    val benchShingles = TextOps.shingleRows(bench, idCol, textCol, k)
      .select(col("s")).distinct()
    val benchChars = bench
      .agg(coalesce(sum(length(coalesce(col(textCol), lit("")))), lit(0L)))
      .head().getLong(0)
    val matched =
      if (benchChars <= broadcastBenchChars)
        corpusShingles.join(broadcast(benchShingles), Seq("s"), "left_semi")
      else corpusShingles.join(benchShingles.hint("shuffle_hash"), Seq("s"), "left_semi")
    val cut = matched.select(col("id"),
      explode(sequence(greatest(col("p") - margin, lit(0)),
        col("p") + k - 1 + margin)).as("__pos"))
    val toks = corpus.select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), " ")))
      .select(col("id"), col("pos").as("__pos"), col("col").as("__t"))
    val rebuilt = toks.join(cut, Seq("id", "__pos"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__t")))),
        s => s.getField("__t")), " ").as(textCol),
        count(lit(1)).as("__kept"))
    corpus.select(col(idCol),
        TextOps.tokenCount(coalesce(col(textCol), lit(""))).cast("bigint").as("__n"))
      .join(rebuilt.select(col("id").as(idCol), col(textCol), col("__kept")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol),
        (col("__n") - coalesce(col("__kept"), lit(0L))).cast("bigint")
          .as("n_cut_tokens"))
  }

  /** Per-doc (n_tokens, top_token_frac) in the requested token basis:
    * `None` keeps [[TextOps.repetitionStats]]' whitespace counts (the
    * default — plans unchanged); `Some(counter)` re-denominates `n_tokens`
    * (the `short` cut and every token share/budget in the report) in the
    * counter's basis while `top_token_frac` stays a whitespace-token
    * repetition signal — [[curateKeep]] and [[curationReport]] receive the
    * SAME frame, so the kept-rows == report-kept invariant holds under any
    * counter. The overlay join keys by the doc id like every other curation
    * stage (one shared hash partitioning).
    */
  private def repWithCounter(docs: DataFrame, idCol: String, textCol: String,
      tokenCounter: Option[Column => Column]): DataFrame = {
    val rep = TextOps.repetitionStats(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("top_token_frac"))
    tokenCounter match {
      case None => rep
      case Some(tc) =>
        docs.select(col(idCol), tc(col(textCol)).cast("long").as("n_tokens"))
          .join(rep.select(col(idCol), col("top_token_frac")), Seq(idCol))
    }
  }

  /** Distributed inclusive prefix sum of `valueCol` in `orderCol` order,
    * appended as `cumCol` — the same two-pass parallel-scan shape as
    * [[graft.ts.Align]]'s bucketed ffill: quantile-bucket by the order key
    * (skew-robust), per-bucket window sums, an O(buckets)-row driver prefix
    * of bucket totals broadcast back as carry-ins. One shuffle + one tiny
    * broadcast at any data size; a naive `Window.orderBy` with no
    * partitioning would pull the corpus through ONE task.
    *
    * `orderCol` must be numeric, non-null and UNIQUE per row (ties make an
    * inclusive running sum engine-dependent); `valueCol` must be non-null
    * integral. The uniqueness/non-null contract is ENFORCED, not assumed:
    * the bootstrap aggregation also counts distinct order keys and the
    * operator throws on a mismatch — a silent duplicate would make the
    * running sum partitioning-dependent with no other signal.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum", buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets else spark.sparkContext.defaultParallelism
    val cached = graft.CacheScope.persist(df)
    val oc = col(orderCol).cast("long")
    // quantile cuts ride the same single aggregation as the row count and
    // the exact distinct-key count (count_distinct skips nulls, so null
    // order keys surface through the same mismatch)
    val probs = (1 until nb).map(_.toDouble / nb)
    val r = cached.agg(count(lit(1)).as("n"), count_distinct(oc).as("nd"),
      (if (probs.nonEmpty) percentile_approx(oc, array(probs.map(lit): _*), lit(1000))
       else array()).as("cuts")).head()
    if (r.getLong(0) == 0L) return df.withColumn(cumCol, lit(0L))
    require(r.getLong(1) == r.getLong(0),
      s"prefixSum: orderCol '$orderCol' must be non-null and unique per row " +
        s"(${r.getLong(0)} rows, ${r.getLong(1)} distinct non-null keys) — " +
        "duplicate order keys make an inclusive running sum partitioning-dependent")
    val cuts: Seq[Long] =
      if (probs.isEmpty) Nil else r.getSeq[Long](2).distinct.sorted
    val bucketOf = cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length.toLong): Column) {
      case (acc, (c, i)) => when(oc < lit(c), lit(i.toLong)).otherwise(acc)
    }
    val withB = cached.withColumn("__b", bucketOf)
    // bucket totals -> driver prefix scan -> broadcast carry-ins
    val totals = withB.groupBy(col("__b"))
      .agg(sum(col(valueCol).cast("long")).as("__s")).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).sortBy(_._1)
    var acc = 0L
    val carryIn = totals.map { case (b, s) => val in = Row(b, acc); acc += s; in }
    val carryDf = spark.createDataFrame(
      spark.sparkContext.parallelize(carryIn.toSeq, 1),
      StructType(Seq(StructField("__b", LongType), StructField("__carry", LongType))))
    val w = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.withColumn("__ps", sum(col(valueCol).cast("long")).over(w))
      .join(broadcast(carryDf), Seq("__b"), "left")
      .withColumn(cumCol, col("__ps") + coalesce(col("__carry"), lit(0L)))
      .drop("__b", "__ps", "__carry")
  }

  /** Per-group distributed prefix sum — [[prefixSum]] with the running
    * total RESTARTING at every `groupCol` value, in the same two-pass
    * parallel-scan shape generalized by one dimension: rows quantile-
    * bucket on the order key exactly as before, per-(bucket, group)
    * partials run in bucket-local windows, and the carry table is one row
    * per (bucket, group) — driver-prefix-scanned per group and broadcast
    * back. A hot group therefore costs its per-bucket row share, never
    * one window partition holding the whole group (the naive
    * `PARTITION BY group ORDER BY key` sort dies exactly there when one
    * language is most of a 100 TB corpus).
    *
    * The carry table is (buckets × |groups|) rows on the driver — tiny
    * for source/language-shaped groups; a cardinality explosion (grouping
    * by doc id by mistake) raises loudly at `maxCarryRows` instead of
    * OOMing the driver. Order keys must be unique WITHIN their group.
    */
  def prefixSumGrouped(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, cumCol: String = "cum", buckets: Int = 0,
      maxCarryRows: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets else spark.sparkContext.defaultParallelism
    val cached = graft.CacheScope.persist(df)
    val oc = col(orderCol).cast("long")
    val probs = (1 until nb).map(_.toDouble / nb)
    val r = cached.agg(count(lit(1)).as("n"),
      count_distinct(col(groupCol), oc).as("nd"),
      (if (probs.nonEmpty) percentile_approx(oc, array(probs.map(lit): _*), lit(1000))
       else array()).as("cuts")).head()
    if (r.getLong(0) == 0L) return df.withColumn(cumCol, lit(0L))
    require(r.getLong(1) == r.getLong(0),
      s"prefixSumGrouped: ($groupCol, $orderCol) must be non-null and unique " +
        s"per row (${r.getLong(0)} rows, ${r.getLong(1)} distinct keys)")
    val cuts: Seq[Long] =
      if (probs.isEmpty) Nil else r.getSeq[Long](2).distinct.sorted
    val bucketOf = cuts.zipWithIndex.reverse.foldLeft(lit(cuts.length.toLong): Column) {
      case (acc, (c, i)) => when(oc < lit(c), lit(i.toLong)).otherwise(acc)
    }
    val withB = cached.withColumn("__b", bucketOf)
    val totalsDf = withB.groupBy(col("__b"), col(groupCol).as("__g"))
      .agg(sum(col(valueCol).cast("long")).as("__s"))
    // ONE bounded collect serves both the cardinality guard and the carry
    // rows: `limit(max+1)` caps what can ever reach the driver (the guard's
    // whole point), and the previous separate count() re-ran the entire
    // (bucket, group) aggregation a second time just to learn a number the
    // collect was about to reveal anyway.
    val totalRows = totalsDf
      .limit(math.min(maxCarryRows, Int.MaxValue - 1L).toInt + 1).collect()
    require(totalRows.length <= maxCarryRows,
      s"prefixSumGrouped: carry table exceeds $maxCarryRows (bucket, group) " +
        s"rows — '$groupCol' is too fine-grained for the driver-side carry " +
        "scan; group by a coarser key")
    val totals = totalRows
      .map(row => (row.getAs[Any]("__g"), row.getLong(0), row.getLong(2)))
    val carryIn = totals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, s) => val in = Row(g, b, acc); acc += s; in }
    }
    val gField = df.schema(groupCol)
    val carryDf = spark.createDataFrame(
      spark.sparkContext.parallelize(carryIn, 1),
      StructType(Seq(StructField("__cg", gField.dataType),
        StructField("__cb", LongType), StructField("__carry", LongType))))
    val w = Window.partitionBy(col(groupCol), col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.withColumn("__ps", sum(col(valueCol).cast("long")).over(w))
      .join(broadcast(carryDf),
        col(groupCol) === col("__cg") && col("__b") === col("__cb"), "left")
      .withColumn(cumCol, col("__ps") + coalesce(col("__carry"), lit(0L)))
      .drop("__b", "__cg", "__cb", "__ps", "__carry")
  }

  /** Sequence packing — the concat-and-chunk construction every pretraining
    * pipeline runs between the curated corpus and the trainer: documents are
    * concatenated in `idCol` order and cut into fixed `chunkTokens`-token
    * training sequences, docs spanning cut points split across chunks.
    *
    * Output: one row per (chunk, doc) incidence —
    * `(chunk_id, idCol, tok_from, tok_to)` with `[tok_from, tok_to)` the
    * 0-based within-doc token span that lands in `chunk_id`; every chunk
    * except the last covers exactly `chunkTokens` tokens. Deterministic
    * given ids — independent of partitioning, engine, or rerun.
    *
    * Cost: [[prefixSum]]'s one shuffle + carry broadcast; the chunk-span
    * explosion is map-side arithmetic on exact longs (`div`, no
    * floating-point floor — survives token offsets past 2^53).
    *
    * `tokenCounter` sets the token basis the spans are denominated in —
    * whitespace by default, [[TextOps.bpeTokenCount]] for a BPE-ish count,
    * or any engine-reproducible expression over the text (real mixtures
    * and chunk budgets are specified in tokenizer tokens, which run
    * 1.3–1.7× whitespace counts). The distributed shape is unchanged:
    * the counter is one map-side column, everything downstream is span
    * arithmetic on its counts.
    */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long,
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val counts = df.select(col(idCol),
      tokenCounter(col(textCol)).cast("long").as("__n"))
    prefixSum(counts, idCol, "__n", "__cum")
      .where(col("__n") > 0)
      .withColumn("__start", col("__cum") - col("__n"))
      .withColumn("chunk_id",
        explode(sequence(expr(s"__start div ${chunkTokens}L"),
          expr(s"(__cum - 1L) div ${chunkTokens}L"))))
      .select(col("chunk_id").cast("bigint").as("chunk_id"), col(idCol),
        greatest(lit(0L), col("chunk_id") * chunkTokens - col("__start"))
          .cast("bigint").as("tok_from"),
        least(col("__n"), (col("chunk_id") + 1) * chunkTokens - col("__start"))
          .cast("bigint").as("tok_to"))
  }

  /** [[packChunks]] PER GROUP — sequence packing that never mixes groups
    * inside a training chunk (the per-language / per-source packing every
    * multilingual or multi-domain pretraining mix runs: a 512-token
    * sequence must not splice Chinese into an English doc's tail, or web
    * text into code). Each group packs independently in `idCol` order;
    * `chunk_id` is group-LOCAL (0-based per group), so the output key is
    * `(groupCol, chunk_id)` and every chunk except each group's last
    * covers exactly `chunkTokens` tokens of that group.
    *
    * Scale: [[prefixSumGrouped]]'s one shuffle + (buckets × groups)
    * driver carry — a corpus-dominating group costs its per-bucket share,
    * not one window partition. The span explosion is unchanged map-side
    * long arithmetic.
    */
  def packChunksGrouped(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, chunkTokens: Long,
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val counts = df.select(col(groupCol), col(idCol),
      tokenCounter(col(textCol)).cast("long").as("__n"))
    prefixSumGrouped(counts, groupCol, idCol, "__n", "__cum")
      .where(col("__n") > 0)
      .withColumn("__start", col("__cum") - col("__n"))
      .withColumn("chunk_id",
        explode(sequence(expr(s"__start div ${chunkTokens}L"),
          expr(s"(__cum - 1L) div ${chunkTokens}L"))))
      .select(col(groupCol), col("chunk_id").cast("bigint").as("chunk_id"),
        col(idCol),
        greatest(lit(0L), col("chunk_id") * chunkTokens - col("__start"))
          .cast("bigint").as("tok_from"),
        least(col("__n"), (col("chunk_id") + 1) * chunkTokens - col("__start"))
          .cast("bigint").as("tok_to"))
  }

  /** Materialized training sequences: [[packChunks]] spans joined back to
    * the token arrays and concatenated per chunk — `(chunk_id, text)` with
    * every chunk except the last holding exactly `chunkTokens` tokens.
    * This is the frame a writer partitions into train-ready shards.
    *
    * Cost on top of the spans: one id-keyed join (span side already
    * carries the id) and one shuffle on `chunk_id`; fragments order by
    * doc id inside a sorted-struct aggregate, so output text is
    * partitioning-independent. A doc appears in at most
    * ⌈|doc|/chunkTokens⌉+1 chunks, so the join fans out by ~1 — no
    * amplification at any corpus size.
    *
    * `tokenizer` sets the token basis (default whitespace,
    * [[TextOps.bpeTokens]] for BPE-ish): the span counts are derived from
    * the SAME tokenization that gets sliced, so spans and materialized
    * fragments cannot disagree under any custom basis.
    */
  def packChunkText(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long,
      tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    val spans = packChunks(df, idCol, textCol, chunkTokens, c => size(tokenizer(c)))
    val toks = df.select(col(idCol), tokenizer(col(textCol)).as("__t"))
    // the within-doc slice bounds go through int (Spark arrays are
    // int-indexed, so a >2^31-token doc cannot be sliced at all) — a loud
    // raise beats the silent overflow wrap; [[packChunks]] itself stays
    // long-exact for the cross-doc offsets
    val from32 = when(col("tok_to") <= lit(Int.MaxValue.toLong),
        (col("tok_from") + 1).cast("int"))
      .otherwise(raise_error(concat(
        lit("packChunkText: per-doc token count exceeds Int.MaxValue for doc "),
        col(idCol).cast("string"))).cast("int"))
    spans.join(toks, Seq(idCol))
      .select(col("chunk_id"), col(idCol),
        concat_ws(" ", slice(col("__t"), from32,
          (col("tok_to") - col("tok_from")).cast("int"))).as("__frag"))
      .groupBy(col("chunk_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(idCol).as("i"), col("__frag").as("f")))),
        s => s.getField("f")), " ").as("text"))
  }

  /** [[packChunkText]] PER GROUP — materialized training sequences that
    * never mix groups ([[packChunksGrouped]]'s spans joined back to the
    * token arrays): output `(groupCol, chunk_id, text)` keyed by the
    * group-local chunk id, every chunk except each group's last holding
    * exactly `chunkTokens` tokens of that group. This is the frame a
    * writer shards into per-language / per-source training files.
    *
    * Cost over the grouped spans: the same one id-keyed join + one
    * (group, chunk) shuffle as the ungrouped materialization; fragment
    * order inside a chunk is doc-id-sorted (partitioning-independent).
    */
  def packChunkTextGrouped(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, chunkTokens: Long,
      tokenizer: Column => Column = TextOps.tokens): DataFrame = {
    val spans = packChunksGrouped(df, idCol, textCol, groupCol, chunkTokens,
      c => size(tokenizer(c)))
    val toks = df.select(col(idCol), tokenizer(col(textCol)).as("__t"))
    val from32 = when(col("tok_to") <= lit(Int.MaxValue.toLong),
        (col("tok_from") + 1).cast("int"))
      .otherwise(raise_error(concat(
        lit("packChunkTextGrouped: per-doc token count exceeds Int.MaxValue for doc "),
        col(idCol).cast("string"))).cast("int"))
    spans.join(toks, Seq(idCol))
      .select(col(groupCol), col("chunk_id"), col(idCol),
        concat_ws(" ", slice(col("__t"), from32,
          (col("tok_to") - col("tok_from")).cast("int"))).as("__frag"))
      .groupBy(col(groupCol), col("chunk_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(idCol).as("i"), col("__frag").as("f")))),
        s => s.getField("f")), " ").as("text"))
  }

  /** [[packChunkText]] in REAL-tokenizer PIECE space — the train-ready
    * chunk materialization in actual tokenizer pieces, not whitespace
    * words: every word maps through the broadcast `(word, pieces)` vocab
    * ([[TextOps.topWordPieceVocab]] for the self-contained demo, a real
    * tokenizer's dump in production), OOV words fall back to 2-char
    * pieces ([[TextOps.pieceTokens]]), and the concat-and-chunk cut runs
    * on the resulting piece sequence. Output `(chunk_id, text)` with text
    * the space-joined piece sequence; every chunk except the last holds
    * exactly `chunkTokens` PIECES. Span counts derive from the same piece
    * tokenization that gets sliced (the [[packChunkText]] contract), so
    * accounting and materialization cannot disagree.
    *
    * Scale: the vocab becomes ONE broadcast map row (megabytes for a
    * top-1M-word table) via crossJoin — no corpus-side join or shuffle is
    * added; everything downstream is [[packChunks]]' one prefix-sum
    * shuffle + the chunk_id shuffle. A duplicate vocab word fails loudly
    * in map_from_entries rather than silently picking a winner.
    */
  def packChunkPieces(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, chunkTokens: Long): DataFrame = {
    val vm = broadcast(vocab.agg(
      map_from_entries(collect_list(struct(col("word"), col("pieces"))))
        .as("__vm")))
    packChunkText(df.crossJoin(vm), idCol, textCol, chunkTokens,
      c => TextOps.pieceTokens(c, col("__vm")))
  }

  /** Packing-efficiency accounting over [[packChunks]]: ONE summary row —
    * `(chunks, incidences, packed_docs, split_docs, total_tokens,
    * last_chunk_tokens)`. `split_docs` counts documents cut by a chunk
    * boundary (the fragmentation a trainer's attention-mask reset pays
    * for); `incidences - packed_docs` is the total number of boundary
    * crossings; `last_chunk_tokens` is the only partially-filled chunk
    * (every other chunk holds exactly `chunkTokens` by construction, so
    * "fill ratio" needs no per-chunk scan). Integer-exact columns only.
    *
    * Cost: the spans' [[prefixSum]] shuffle + one global aggregate
    * (map-side partials; the two distinct-counts run over span rows,
    * ~docs + crossings — not tokens).
    */
  def packStats(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long,
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    val spans = packChunks(df, idCol, textCol, chunkTokens, tokenCounter)
    spans.agg(
        coalesce(max(col("chunk_id")) + 1, lit(0L)).as("chunks"),
        count(lit(1)).as("incidences"),
        countDistinct(col(idCol)).as("packed_docs"),
        countDistinct(when(col("tok_from") > 0, col(idCol))).as("split_docs"),
        coalesce(sum(col("tok_to") - col("tok_from")), lit(0L))
          .as("total_tokens"))
      .withColumn("last_chunk_tokens",
        when(col("chunks") > 0,
          col("total_tokens") - (col("chunks") - 1) * chunkTokens)
          .otherwise(lit(0L)))
  }

  /** Write the packed corpus as train-ready hive shards: chunk texts from
    * [[packChunkText]] land under `path/shard=<chunk_id div
    * chunksPerShard>`, one parquet file per shard (repartitioned on the
    * shard key — no tasks×shards small-file storm). CONTIGUOUS sharding
    * (div, not hash) preserves document order within and across shards,
    * so a trainer streaming shard files in order reads the corpus in
    * curriculum/id order; every shard holds exactly chunksPerShard ×
    * chunkTokens tokens except the tail.
    */
  def writePackedCorpus(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long, path: String, chunksPerShard: Long = 1024,
      tokenizer: Column => Column = TextOps.tokens): Unit = {
    require(chunksPerShard > 0, "chunksPerShard must be positive")
    packChunkText(df, idCol, textCol, chunkTokens, tokenizer)
      .withColumn("shard", expr(s"chunk_id div ${chunksPerShard}L"))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Shuffled twin of [[writePackedCorpus]] — training-order randomization
    * done ONCE at write time: chunks are assigned to `shards` shards by the
    * engine-reproducible md5 slot of their chunk id (salted — a different
    * `salt` draws an independent permutation) and ordered within each shard
    * file by that same hash. A trainer streaming shard files in order
    * replays one fixed, partitioning-independent global permutation with
    * zero train-time shuffle buffer; re-running the writer reproduces it
    * bit-for-bit. Chunk ids ride along, so provenance back to
    * [[packChunks]] spans survives the shuffle.
    *
    * Scale: identical to the contiguous writer — packing's prefix-sum
    * shuffle + one repartition on the shard key, one file per shard
    * (shards ≪ tasks×shards small files). Hash sharding adds no skew: slot
    * uniformity bounds shard-size spread at ~±3√(chunks/shards).
    */
  def writePackedCorpusShuffled(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long, path: String, shards: Int = 1024, salt: String = "",
      tokenizer: Column => Column = TextOps.tokens): Unit = {
    require(shards > 0, "shards must be positive")
    DedupOps.ensureHashRegistered(df)
    val slot = DedupOps.baseHash(
      concat(lit(salt), col("chunk_id").cast("string")))
    packChunkText(df, idCol, textCol, chunkTokens, tokenizer)
      .withColumn("shard", pmod(slot, lit(shards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), slot, col("chunk_id"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Per-group exact-quantile keep — "drop the worst X% per language",
    * the CCNet head/middle/tail cut and the standard way perplexity or
    * quality scores become a filter. Keeps each group's `frac` lowest
    * rows by `scoreCol` (ascending; negate the score to keep the top),
    * ties broken by id so the kept SET is engine/partitioning/rerun-
    * independent — an approx-percentile threshold is not (two runs
    * disagree at the boundary), which is why this is rank-based.
    * Adds `q_rank` (1-based within group) and `q_n` (group size);
    * keeps rank <= ceil(n · frac) computed in ppm-integer arithmetic
    * (`frac` floored to parts-per-million, like every rate in
    * [[SampleOps]]) — fp `ceil(n * frac)` is a landmine (500 · 0.4
    * rounds to 200.0000…03, ceil 201), integers are not. A non-empty
    * group always keeps at least one row; frac=1 keeps all.
    *
    * Scale shape: ONE shuffle on the group key; rank + count share the
    * same window partitioning. A group sorts through one partition —
    * for huge groups under a small frac, pre-cut with a cheap loose
    * threshold (e.g. score below the group's approx p(frac·1.2)
    * percentile) and rank the survivors; the kept set is unchanged as
    * long as the pre-cut retains every row the exact rank admits.
    */
  def quantileKeep(df: DataFrame, idCol: String, scoreCol: String,
      groupCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    val ppm = math.floor(frac * SampleOps.Ppm).toLong
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("q_rank", row_number().over(w).cast("bigint"))
      .withColumn("q_n", count(lit(1)).over(wAll))
      .where(col("q_rank") <=
        expr(s"(q_n * ${ppm}L + ${SampleOps.Ppm - 1}L) DIV ${SampleOps.Ppm}L"))
  }

  /** Per-group quantile LABELS instead of a cut — CCNet's head/middle/tail
    * perplexity binning: every row keeps its group and gets the band its
    * exact (score, id) rank falls in. `bands` is ordered (name, fraction)
    * with fractions summing to 1 (ppm resolution, like [[SampleOps
    * .splitAssign]]); thresholds are cumulative `ceil(n·Σfrac)` ranks in
    * ppm-integer arithmetic and the LAST band absorbs the remainder, so
    * the labeling partitions each group exactly. Same one-shuffle window
    * shape as [[quantileKeep]]; the same pre-cut escape applies when only
    * the first bands are consumed downstream.
    */
  def quantileLabel(df: DataFrame, idCol: String, scoreCol: String,
      groupCol: String, bands: Seq[(String, Double)]): DataFrame = {
    require(bands.nonEmpty, "quantileLabel needs at least one band")
    require(bands.forall(_._2 > 0),
      s"band fractions must be positive, got $bands")
    val total = bands.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6,
      s"band fractions must sum to 1, got $total from $bands")
    val cum = bands.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.floor(f * SampleOps.Ppm).toLong
    }.tail.init // the last band needs no threshold: it takes the rest
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("q_rank", row_number().over(w).cast("bigint"))
      .withColumn("q_n", count(lit(1)).over(wAll))
    val label = bands.map(_._1).init.zip(cum).reverse
      .foldLeft(lit(bands.last._1)) { case (acc, (name, ppm)) =>
        when(col("q_rank") <= expr(
          s"(q_n * ${ppm}L + ${SampleOps.Ppm - 1}L) DIV ${SampleOps.Ppm}L"),
          lit(name)).otherwise(acc)
      }
    ranked.withColumn("band", label)
  }

  /** The 100 TB shape of [[quantileKeep]] — same EXACT result, without
    * sorting whole groups. Pass 1 computes per-group exact counts and an
    * approximate loose score threshold at `min(1, frac·margin)` (one
    * partial-aggregate pass, `approx_percentile`). Pass 2 ranks only the
    * rows under the loose threshold — a `margin`-fraction of each group —
    * against the FULL group size, so the cut is identical to the exact
    * operator whenever the pre-cut retained every admissible row. That
    * containment is CHECKED, not assumed: survivors form a (score, id)
    * prefix of the group (the filter keeps all rows ≤ threshold), so
    * "survivors ≥ ceil(n·frac)" per group is sufficient for exactness,
    * and a group failing it (an adversarial score distribution beating
    * the sketch) throws with the margin to raise rather than returning
    * a silently-shifted quantile. Cost: two passes, one group-keyed
    * shuffle of ~frac·margin of the corpus instead of all of it.
    */
  def quantileKeepLarge(df: DataFrame, idCol: String, scoreCol: String,
      groupCol: String, frac: Double, margin: Double = 1.3,
      sketchAccuracy: Int = 10000): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    require(margin > 1, s"margin must exceed 1, got $margin")
    val ppm = math.floor(frac * SampleOps.Ppm).toLong
    val loose = math.min(1.0, frac * margin)
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("q_n"),
        percentile_approx(col(scoreCol), lit(loose), lit(sketchAccuracy))
          .as("__loose"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val ranked = graft.CacheScope.persist(
      df.join(broadcast(stats), Seq(groupCol))
        .where(col(scoreCol) <= col("__loose"))
        .withColumn("q_rank", row_number().over(w).cast("bigint"))
        .withColumn("__k", expr(
          s"(q_n * ${ppm}L + ${SampleOps.Ppm - 1}L) DIV ${SampleOps.Ppm}L")))
    val short = ranked.groupBy(col(groupCol))
      .agg(max(col("q_rank")).as("__got"), max(col("__k")).as("__want"))
      .where(col("__got") < col("__want"))
      .limit(1).collect()
    if (short.nonEmpty) {
      // don't leave the eager persist behind on the failure path — the
      // caller never gets a frame to consume, so nothing downstream will
      // reach a CacheScope.release for it
      ranked.unpersist(blocking = false)
      throw new IllegalStateException(
        s"quantileKeepLarge: group '${short.head.get(0)}' pre-cut kept " +
          s"${short.head.getLong(1)} of the ${short.head.getLong(2)} rows the " +
          s"exact cut admits — raise margin above $margin (sketch missed the " +
          "quantile) or fall back to quantileKeep")
    }
    // success path: the persist stays live for the returned frame's
    // consumers — callers outside the gate harness should CacheScope
    // .release() (or unpersist) once the result is consumed
    ranked.where(col("q_rank") <= col("__k")).drop("__loose", "__k")
  }

  /** Length-bucketed batch assembly with padding accounting — the
    * "dynamic batching" a trainer uses when sequences are NOT packed:
    * group docs of similar token length so each batch pads to its own
    * max, not the corpus max. Docs are bucketed by the first boundary
    * their token count fits under (the last boundary is a hard cap:
    * longer docs are dropped, like a trainer's max_seq_len), then
    * batches of `batchDocs` docs form within each (bucket, shard) in
    * (tokens, id) order. Returns one row per batch:
    * `(bucket, shard, batch, n_docs, max_tokens, sum_tokens,
    * pad_tokens)` where `pad_tokens = n_docs·max_tokens − sum_tokens`
    * is exactly the attention-wasted padding a trainer pays for the
    * batch. All-integer columns — two engines agree cell-for-cell.
    *
    * Scale shape: batches form per (bucket, shard) — shard is an
    * id-hash slot mod `shards` — so no single window ever sees more
    * than ~docs/(buckets·shards) rows; size `shards` so that fits one
    * executor's sort buffer. Sharding costs nothing statistically
    * (each shard is a uniform subsample, so per-shard length
    * distributions match) and buys full parallelism: the global-order
    * alternative sorts the whole corpus through `buckets` partitions.
    * One shuffle total.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      boundaries: Seq[Long], batchDocs: Int, shards: Int = 1,
      salt: String = "",
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame =
    lengthBucketAssign(df, idCol, textCol, boundaries, batchDocs, shards,
      salt, tokenCounter)
      .groupBy(col("bucket"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))

  /** The doc→batch ASSIGNMENT behind [[lengthBucketBatches]] — what a
    * trainer's loader actually consumes: one row per admitted doc,
    * `(idCol, n_tokens, bucket, shard, batch)`, batches of `batchDocs`
    * formed in (tokens, id) order within (bucket, shard). Over-cap docs
    * (tokens > last boundary) are dropped, like max_seq_len. The stats
    * frame is this grouped — both views agree by construction; the agg
    * reuses the window's (bucket, shard) partitioning with no further
    * exchange.
    */
  def lengthBucketAssign(df: DataFrame, idCol: String, textCol: String,
      boundaries: Seq[Long], batchDocs: Int, shards: Int = 1,
      salt: String = "",
      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
        boundaries.distinct == boundaries,
      s"boundaries must be strictly increasing, got $boundaries")
    require(batchDocs > 0 && shards > 0,
      "batchDocs and shards must be positive")
    DedupOps.ensureHashRegistered(df)
    val n = tokenCounter(coalesce(col(textCol), lit(""))).cast("bigint")
    // first boundary >= n wins; docs past the cap fall out via the null
    val bucket = boundaries.reverse.foldLeft(lit(null).cast("bigint")) {
      case (acc, b) => when(n <= lit(b), lit(b)).otherwise(acc)
    }
    val shard = pmod(DedupOps.baseHash(
      concat(lit(salt), col(idCol).cast("string"))), lit(shards.toLong))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tokens"), col(idCol))
    df.select(col(idCol), n.as("n_tokens"), bucket.as("bucket"),
        shard.as("shard"))
      .where(col("bucket").isNotNull)
      .withColumn("__rn", row_number().over(w))
      // true integer division (DIV), not fp floor — engine-exact at any rank
      .withColumn("batch", expr(s"CAST((__rn - 1) DIV $batchDocs AS BIGINT)"))
      .drop("__rn")
  }
}

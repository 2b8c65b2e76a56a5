package graft.operators

import org.apache.spark.sql.DataFrame
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
      textCol: String, k: Int = 4): DataFrame = {
    val corpusShingles = TextOps.shingleRows(corpus, idCol, textCol, k)
    val benchShingles = TextOps.shingleRows(bench, idCol, textCol, k)
      .select(col("s")).distinct()
    corpusShingles
      .join(broadcast(benchShingles.withColumn("__hit", lit(1))), Seq("s"), "left")
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
    * Keeps a doc iff it is its own exact-dup canonical (min id per content
    * fingerprint), shares no word k-gram with `bench`, has at least
    * `minTokens` whitespace tokens, and its most frequent token accounts for
    * at most `maxTopTokenFrac` of them (Gopher-style repetition cut).
    *
    * Every stage keys by the doc id, so the joins reuse one hash
    * partitioning; the contamination stage broadcasts the benchmark set
    * (see [[ngramOverlap]]); nothing touches the driver.
    *
    * Output: `(idCol, langCol, n_tokens, top_token_frac)` for kept docs.
    */
  def curateKeep(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, langCol: String, k: Int = 4, minTokens: Long = 20,
      maxTopTokenFrac: Double = 0.12): DataFrame = {
    val rep = TextOps.repetitionStats(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("top_token_frac"))
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
}

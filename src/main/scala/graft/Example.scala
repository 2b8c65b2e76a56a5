package graft

import graft.api.FeatureStore
import graft.catalog.CheckSpec
import org.apache.spark.sql.functions._

/** Runnable tour of the engine — the reference's README example
  * (reference README.md:45-101, examples/simple.py) re-expressed on this
  * API, plus the extensions. `sbt "runMain graft.Example"`.
  */
object Example {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val root = java.nio.file.Files.createTempDirectory("graft-example").toString
    val fs = new FeatureStore(root, spark)

    // catalog + quality-checked feature
    fs.createNamespace("example", "tutorial namespace")
    fs.createFeature("example/numbers", "Timeseries of numbers",
      check = Some(CheckSpec(Some("bigint"), Seq("value > 0"))))

    // check-gated, hive-partitioned ingest of a 406-day daily series
    val days = spark.range(1, 407).select(
      expr("timestamp(date_add(date'2021-01-01', cast(id as int) - 1))").as("time"),
      col("id").as("value"))
    fs.saveDf(days, name = Some("example/numbers"))

    // virtual feature: stored SQL transform
    fs.registerSqlTransform("example/squared", Seq("numbers"), "numbers * numbers")

    // windowed, aligned, forward-filled wide load
    println("== loadFeatures(numbers, squared), 2021-01-01..2021-01-10 ==")
    fs.loadFeatures(Seq("example/numbers", "example/squared"),
      from = Some("2021-01-01"), to = Some("2021-01-10"))
      .orderBy("time").show()

    // point-in-time join onto an arbitrary label spine
    println("== point-in-time features at label instants ==")
    val labels = spark.range(5).select(
      expr("timestamp(date_add(date'2021-03-01', cast(id * 30 as int)))").as("time"),
      (col("id") % 2).as("label"))
    fs.loadFeaturesAsOf(labels, Seq("example/numbers", "example/squared"))
      .orderBy("time").show()

    // quality gate refusing bad data
    try fs.saveDf(days.withColumn("value", -col("value")), name = Some("example/numbers"))
    catch {
      case e: graft.catalog.CheckFailedException =>
        println(s"quality gate: ${e.getMessage}")
    }

    // curation tour: dedup -> clusters -> quality -> redaction -> sample
    println("== corpus curation pipeline ==")
    val docs = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "contact me at alice@example.com or https://example.com/alice for details"),
      (4L, "buy now buy now buy now buy now buy now buy now buy now buy now"),
      (5L, "a genuinely different document about distributed query engines and parquet")
    )).toDF("doc_id", "text")
    val pairs = operators.DedupOps.minhashLshPairs(docs, "doc_id", "text",
      thresholdNum = 4, thresholdDen = 5)
    val clusters = operators.DedupOps.connectedComponents(pairs, "id_a", "id_b")
    println("near-dup clusters (keep one doc per component):")
    clusters.show()
    println("repetition filters (the spammy doc 4 scores high):")
    operators.TextOps.repetitionStats(docs, "doc_id", "text").orderBy("doc_id").show()
    println("PII/link redaction:")
    operators.TextOps.redactionStats(docs, "doc_id", "text")
      .where(col("n_urls") + col("n_emails") + col("n_phones") > 0)
      .show(truncate = false)
    println("benchmark decontamination (docs 1-2 share 4-grams with the eval set):")
    val evalSet = spark.createDataFrame(Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    operators.CurationOps.ngramOverlap(docs, evalSet, "doc_id", "text").show()
    println("exact-substring dedup (Lee 2021): repeated token runs across docs 1-2:")
    operators.DedupOps.duplicateSpans(docs, "doc_id", "text")
      .orderBy("doc_id", "span_from").show()
    println("DSIR importance weights (doc 5 is the most target-like):")
    val target = spark.createDataFrame(Seq(
      (200L, "a survey of distributed query engines and parquet storage")))
      .toDF("doc_id", "text")
    operators.TextOps.dsirLogRatio(docs, target, "doc_id", "text")
      .orderBy(desc("avg_logratio_bits")).show()
    println("keyword search, quantized tf-idf ('fox' or 'parquet'):")
    operators.TextOps.keywordTopK(docs, "doc_id", "text",
      Seq("fox", "parquet"), 3).show()
    println("sequence packing into 16-token training chunks:")
    operators.CurationOps.packChunks(docs, "doc_id", "text", chunkTokens = 16)
      .orderBy("chunk_id", "doc_id").show()
    println("materialized training sequences:")
    operators.CurationOps.packChunkText(docs, "doc_id", "text", chunkTokens = 16)
      .orderBy("chunk_id").show(truncate = false)
    // done with the operator caches this tour created
    CacheScope.release()
    spark.stop()
  }
}

package graft

import graft.storage.TimeseriesStorage
import graft.ts.Align
import org.apache.spark.sql.functions._

/** Scale validation beyond the driver test data: core operators at tens of
  * millions of rows on local[32] — the "would this survive a 100x
  * scale-up" check (the shapes that must NOT degrade: partial-agg dedup,
  * bucketed ffill, as-of join, salted agg). `sbt "runMain graft.ScaleSmoke
  * [rows]"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    // optional 2nd arg: label substring filter — ONLY for self-contained
    // entries (lsh/minhash/skew/salted); store-backed entries need the
    // ingest entry to have run
    val only = args.lift(1).map(_.toLowerCase)
    val spark = GraftSession.local()
    def time[T](label: String)(f: => T): Unit = {
      if (only.exists(o => !label.toLowerCase.contains(o))) return
      val t0 = System.nanoTime()
      f
      println(f"[scale] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // n rows across 2 years, 3 versions per timestamp third → dedup-heavy
    val base = spark.range(n).select(
      expr("timestamp_micros(1609459200000000L + (id div 3) * 9467280L)").as("time"),
      (col("id") % 3).as("v"),
      (rand(42) * 100).as("value"))
    val series = base.select(col("time"),
      (col("value") * (col("v") + 1)).as("value"),
      (col("time") - expr("make_interval(0,0,0,0,0,0,v)")).as("created_time"))

    val root = "/tmp/graft_scale_smoke"
    val p = new org.apache.hadoop.fs.Path(root)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(p)) hfs.delete(p, true)
    val st = new TimeseriesStorage(root, spark)

    time(s"ingest $n rows (hive-partitioned write)") {
      st.save("scale", "f", series)
    }
    val deduped = time("load + latest-version dedup (count)") {
      val d = st.load("scale", "f"); d.count()
    }
    println(s"[scale]   deduped rows: was $n, kept ${n / 3}")
    time("time-range month read (partition-pruned)") {
      st.load("scale", "f",
        from = Some(java.sql.Timestamp.valueOf("2021-06-01 00:00:00")),
        to = Some(java.sql.Timestamp.valueOf("2021-06-30 23:59:59"))).count()
    }
    time("bucketed ffill over full deduped series") {
      val withNulls = st.load("scale", "f")
        .withColumn("value", when(pmod(unix_micros(col("time")), lit(7)) < 3, col("value")))
      Align.ffill(withNulls, "time", Seq("value")).count()
    }
    time("ffill under heavy event-time skew (90% in 1h)") {
      // 90% of rows inside one hour of a 2-year span: uniform time-range
      // buckets would funnel the hot hour through one window partition;
      // quantile buckets keep every partition ≈1/nb of the rows
      val skewedTimes = spark.range(n / 2).select(
        when(col("id") % 10 < 9,
          timestamp_micros(lit(1609459200000000L) + pmod(xxhash64(col("id")), lit(3600000000L))))
          .otherwise(timestamp_micros(lit(1609459200000000L) +
            pmod(xxhash64(col("id"), lit(1)), lit(63072000000000L)))).as("time"),
        when(pmod(xxhash64(col("id"), lit(2)), lit(7)) < 3, (col("id") % 1000).cast("double"))
          .as("value"))
      Align.ffill(skewedTimes, "time", Seq("value")).count()
    }
    time("as-of join of 100k-point spine") {
      val spine = spark.range(100000).select(
        timestamp_micros(lit(1609459200000000L) + col("id") * 630000000L).as("time"),
        col("id").as("k"))
      Align.asOfJoin(spine, "time", Seq("f" -> st.load("scale", "f"))).count()
    }
    time("minhash LSH dedup over 100k synthetic docs") {
      // synthetic corpus: 50-word vocab, ~60 tokens/doc, every 50th doc is
      // a near-copy of its predecessor (same words, 3 swapped)
      val words = (0 until 50).map(i => s"w$i")
      val vocab = array(words.map(lit): _*)
      val docs = spark.range(100000).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(59)),
          i => element_at(vocab,
            (pmod(xxhash64(expr("id div 50") * 100 + i +
              when(col("id") % 50 === 0, (i % 3) * 7).otherwise(0)), lit(50)) + 1)
              .cast("int")))).as("text"))
      operators.DedupOps.minhashLshPairs(docs, "doc_id", "text").count()
    }
    time("salted aggregation over skewed key") {
      // 90% of rows share one key — the shape AQE can't fix for groupBy
      val skewed = spark.range(n).select(
        when(col("id") % 10 < 9, lit(0)).otherwise(col("id") % 1000).as("k"),
        col("id").as("x"))
      operators.SkewOps.saltedAgg(skewed, Seq("k"),
        Seq(operators.SkewOps.Agg("x", "sum"), operators.SkewOps.Agg("*", "count")), 32).count()
    }
    time("RH-LSH embedding near-dup over 1M vectors") {
      // 950k random 64-dim vectors + 50k planted near-identical copies
      // (ids >= 950k copy id-950k's vector with one perturbed dim).
      // bands/rows sized for this n: background candidate rate is
      // ~ bands * 2^-rows * n^2/2, so rows grows with log2(n); (128, 20)
      // gives pair-miss ~0.3% at cosine 0.9 and ~6e7 background cands.
      val nv = 1000000L; val planted = 50000L
      // Params scale with n: background candidates/band ≈ C(n,2)/2^rows, so
      // rows must grow with log2(n²) — at (192, 24): ~5.5e6 background
      // pairs (the verify-join intermediate carries a 512B vector per
      // candidate, so candidate count IS the shuffle budget), pair-miss at
      // cosine 0.9 ≈ (1-0.856^24)^192 ≈ 1%.
      // per-dim exprs (codegen'd), not a transform lambda (interpreted)
      val dims = (0 until 64).map { i =>
        (pmod(xxhash64(pmod(col("id"), lit(nv - planted)), lit(i)), lit(2001)) - lit(1000))
          .cast("double") / lit(1000.0) +
          (if (i == 0) when(col("id") >= (nv - planted), lit(0.001)).otherwise(lit(0.0))
           else lit(0.0))
      }
      val vecs = spark.range(nv).select(col("id").as("vec_id"),
        array(dims: _*).as("embedding"))
      val pairs = operators.SimilarityOps.rhpNearDupPairs(
        vecs, "vec_id", "embedding", 0.9, bands = 192, rowsPerBand = 24)
      val plan = pairs.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "LSH near-dup plan must not contain a nested-loop join")
      val found = pairs.count()
      println(s"[scale]   planted $planted near-dup pairs, found $found " +
        f"(recall >= ${found.toDouble / planted}%.4f incl. any true random dups)")
    }
    hfs.delete(p, true)
    spark.stop()
  }
}

package graft

import graft.storage.TimeseriesStorage
import graft.ts.Align
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

/** Property-based invariants (SURVEY §5 test plan): save→load round-trip
  * identity modulo dedup, ffill idempotence and completeness — randomized
  * via ScalaCheck generators over fixed seeds (deterministic CI).
  */
class PropertySpec extends SparkTestBase {

  private val seriesGen: Gen[List[(Int, Option[Double], Int)]] =
    Gen.listOfN(40, for {
      dayOffset <- Gen.choose(0, 60)
      value <- Gen.option(Gen.choose(-1000.0, 1000.0))
      version <- Gen.choose(0, 2)
    } yield (dayOffset, value, version))

  private def samples(n: Int): Seq[List[(Int, Option[Double], Int)]] =
    (1 to n).flatMap(i => seriesGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def dayTs(d: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDate.of(2021, 1, 1).plusDays(d).atStartOfDay())

  private def toDf(rows: List[(Int, Option[Double], Int)]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("time", TimestampType),
      StructField("value", DoubleType), StructField("created_time", TimestampType)))
    val data = rows.map { case (d, v, ver) =>
      org.apache.spark.sql.Row(dayTs(d), v.orNull,
        Timestamp.valueOf(java.time.LocalDateTime.of(2021, 3, 1, ver, 0)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 3), schema)
  }

  test("property: save→load returns exactly the max-created version per time") {
    samples(5).filter(_.nonEmpty).foreach { rows =>
      val st = new TimeseriesStorage(tmpDir("prop"), spark)
      st.save("p", "f", toDf(rows))
      val got = st.load("p", "f").collect()
        .map(r => r.getAs[Timestamp]("time") -> r.getAs[Any]("value")).toMap
      val byDay = rows.groupBy(_._1)
      assert(got.keySet == byDay.keySet.map(dayTs))
      // where the winning version is unique per time, the value must match it
      byDay.foreach { case (d, vs) =>
        val maxVer = vs.map(_._3).max
        val winners = vs.filter(_._3 == maxVer)
        if (winners.size == 1)
          assert(got(dayTs(d)) == winners.head._2.map(x => x: Any).orNull, s"day $d")
      }
    }
  }

  test("property: ffill is idempotent") {
    samples(4).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows).select("time", "value").dropDuplicates("time")
      val once = Align.ffill(df, "time", Seq("value"), buckets = 4)
      val twice = Align.ffill(once, "time", Seq("value"), buckets = 4)
      assert(collectMap(once) == collectMap(twice))
    }
  }

  test("property: no null survives ffill after the first non-null") {
    samples(4).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows).select("time", "value").dropDuplicates("time")
      val out = Align.ffill(df, "time", Seq("value"), buckets = 4)
        .orderBy("time").collect()
      var seen = false
      out.foreach { r =>
        if (!r.isNullAt(1)) seen = true
        else assert(!seen, "null after a non-null value survived ffill")
      }
    }
  }

  // n >= 1: an empty string still tokenizes to one (empty) token in both
  // Spark and DuckDB (split('', ' ') = ['']), so zero-token docs don't exist
  private val docsGen: Gen[List[(Long, Int)]] =
    Gen.listOfN(60, Gen.choose(1, 10)).map(_.zipWithIndex.map {
      case (n, i) => (i.toLong, n)
    })

  /** The packChunks contract, parameterized by the expected per-doc token
    * count in whatever basis the counter under test denominates spans in.
    */
  private def assertSpanInvariants(
      spans: Array[(Long, Long, Long, Long)], rows: List[(Long, Int)],
      expectedCount: Int => Long, k: Long): Unit = {
    // within-doc spans are contiguous, non-empty and cover [0, count)
    val byDoc = spans.groupBy(_._2)
    val nOf = rows.toMap
    byDoc.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._1)
      assert(sorted.head._3 == 0L && sorted.last._4 == expectedCount(nOf(id)))
      assert(sorted.forall { case (_, _, a, b) => a < b })
      sorted.sliding(2).foreach {
        case Array((c1, _, _, b1), (c2, _, a2, _)) =>
          assert(c2 == c1 + 1 && a2 == b1)
        case _ =>
      }
    }
    // every doc appears (no doc is lost at a chunk boundary)
    assert(byDoc.keySet == rows.map(_._1).toSet)
    // every chunk except the last holds exactly k tokens
    val perChunk = spans.groupBy(_._1).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    if (perChunk.nonEmpty) {
      val last = perChunk.keys.max
      assert(perChunk.filter(_._1 != last).values.forall(_ == k))
      assert(perChunk(last) <= k)
    }
  }

  private def spanDocs(rows: List[(Long, Int)]) = {
    import spark.implicits._
    rows.map { case (id, n) =>
      (id, (0 until n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("property: packChunks spans partition the concatenated token stream") {
    (1 to 5).flatMap(i => docsGen.apply(Gen.Parameters.default, Seed(100L + i)))
      .foreach { rows =>
        val spans = operators.CurationOps.packChunks(spanDocs(rows), "doc_id", "text", 7L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assertSpanInvariants(spans, rows, n => n.toLong, 7L)
        graft.CacheScope.release()
      }
  }

  test("property: packChunks span invariants hold under any token counter") {
    import org.apache.spark.sql.Column
    // each "tJ" is a letter run + a digit run under the BPE-ish pattern
    // (2 subwords/word); the affine counter is deliberately unrelated to
    // any tokenization — the span algebra must not care
    val counters: Seq[(Column => Column, Int => Long)] = Seq(
      (c => operators.TextOps.bpeTokenCount(c), n => 2L * n),
      (c => operators.TextOps.tokenCount(c) * 3 + 1, n => 3L * n + 1))
    (1 to 2).flatMap(i => docsGen.apply(Gen.Parameters.default, Seed(300L + i)))
      .foreach { rows =>
        counters.foreach { case (counter, expected) =>
          val spans = operators.CurationOps
            .packChunks(spanDocs(rows), "doc_id", "text", 7L, counter)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          assertSpanInvariants(spans, rows, expected, 7L)
          graft.CacheScope.release()
        }
      }
  }

  // random corpora over a small vocab so 4-gram collisions actually occur
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.listOfN(40, Gen.listOfN(12, Gen.choose(0, 7))).map(_.zipWithIndex.map {
      case (ws, i) => (i.toLong, ws.map(w => s"w$w").mkString(" "))
    })

  test("property: ngramOverlap matches a driver-side brute-force recount") {
    import spark.implicits._
    (1 to 4).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(200L + i)))
      .foreach { rows =>
        val (benchRows, corpusRows) = rows.partition(_._1 % 5 == 0)
        val k = 4
        def grams(t: String): Set[String] =
          t.split(" ").sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
        val benchSet = benchRows.flatMap(r => grams(r._2)).toSet
        val expected = corpusRows
          .map { case (id, t) => id -> grams(t) }
          .filter(_._2.nonEmpty)
          .map { case (id, g) =>
            id -> ((g.size.toLong, g.count(benchSet.contains).toLong))
          }.toMap
        val got = graft.operators.CurationOps.ngramOverlap(
            corpusRows.toDF("doc_id", "text"), benchRows.toDF("doc_id", "text"),
            "doc_id", "text", k)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(got == expected)
      }
  }

  // 4-word vocab, 12 tokens/doc: 256 possible 4-grams vs ~270 windows per
  // corpus — duplicated windows, overlapping runs and cross-doc canonical
  // races all actually occur
  private val denseCorpusGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.listOfN(12, Gen.choose(0, 3))).map(_.zipWithIndex.map {
      case (ws, i) => (i.toLong, ws.map(w => s"w$w").mkString(" "))
    })

  test("property: duplicateSpans and dropDuplicateSpans match a brute-force reference") {
    import spark.implicits._
    val k = 4
    (1 to 4).flatMap(i => denseCorpusGen.apply(Gen.Parameters.default, Seed(400L + i)))
      .foreach { rows =>
        case class W(id: Long, p: Int, s: String)
        val wins = rows.flatMap { case (id, t) =>
          t.split(" ").sliding(k).zipWithIndex.collect {
            case (w, p) if w.length == k => W(id, p, w.mkString(" "))
          }
        }
        val counts = wins.groupBy(_.s).view.mapValues(_.size).toMap
        val dup = wins.filter(w => counts(w.s) > 1)
        val expSpans = dup.groupBy(_.id).flatMap { case (id, ws) =>
          val ps = ws.map(_.p).sorted
          val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var start = ps.head; var prev = ps.head; var n = 1
          ps.tail.foreach { p =>
            if (p - prev > k) {
              spans += ((id, start.toLong, (prev + k).toLong, n.toLong))
              start = p; n = 0
            }
            n += 1; prev = p
          }
          spans += ((id, start.toLong, (prev + k).toLong, n.toLong))
          spans
        }.toSet
        val df = rows.toDF("doc_id", "text")
        val gotSpans = operators.DedupOps.duplicateSpans(df, "doc_id", "text", k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(gotSpans == expSpans)
        // cut reference: canonical = min (id, p) per duplicated content;
        // a token dies iff covered by any non-canonical occurrence
        val canon = dup.groupBy(_.s).view
          .mapValues(ws => ws.map(w => (w.id, w.p)).min).toMap
        val cutPos = dup.filter(w => canon(w.s) != ((w.id, w.p)))
          .flatMap(w => (w.p until w.p + k).map(p => (w.id, p))).toSet
        val expCut = rows.map { case (id, t) =>
          id -> t.split(" ").zipWithIndex.collect {
            case (tok, p) if !cutPos((id, p)) => tok
          }.mkString(" ")
        }.toMap
        val gotCut = operators.DedupOps.dropDuplicateSpans(df, "doc_id", "text", k)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(gotCut == expCut)
      }
  }

  test("property: tfidfCosinePairs matches a driver-side brute-force recount") {
    import spark.implicits._
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val (num, den, maxDf) = (1, 2, 30)
    (1 to 4).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(500L + i)))
      .foreach { rows =>
        val n = rows.size.toLong
        val tf = rows.flatMap { case (id, t) =>
          t.split(" ").groupBy(identity).map { case (w, o) => ((id, w), o.length.toLong) }
        }.toMap
        val dfT = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val idf = dfT.view.mapValues(d => (bitlen(n) - bitlen(d)).toLong).toMap
        val live = dfT.filter { case (t, d) => d <= maxDf && idf(t) > 0 }.keySet
        val w = tf.collect { case ((id, t), c) if live(t) => ((id, t), c * idf(t)) }
        val norms = w.groupBy(_._1._1).view.mapValues(_.values.map(x => x * x).sum).toMap
        // over a Seq, not the Map: a for-yield over a Map collapses
        // duplicate (ia, ib) keys and would drop shared-term products
        val ws = w.toSeq
        val dots = (for {
          ((ia, ta), wa) <- ws; ((ib, tb), wb) <- ws
          if ta == tb && ia < ib
        } yield ((ia, ib), wa * wb))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val expected = dots.collect { case ((a, b), dot)
            if dot.toDouble * dot * (den.toLong * den) >=
              (num.toLong * num).toDouble * norms(a) * norms(b) =>
          (a, b, dot, norms(a), norms(b))
        }.toSet
        val got = graft.operators.TextOps.tfidfCosinePairs(
            rows.toDF("doc_id", "text"), "doc_id", "text", num, den, maxDf)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(got == expected)
        graft.CacheScope.release()
      }
  }

  // random per-entity observation streams for the SCD2 / rolling tier:
  // few entities + coarse time grid forces collisions, runs, and repeats
  private val obsGen: Gen[List[(Long, Int, String, Long)]] =
    Gen.listOfN(60, for {
      ent <- Gen.choose(0L, 4L)
      minute <- Gen.choose(0, 500)
      attr <- Gen.oneOf("a", "b", "c")
      seq <- Gen.choose(0L, 1000000L)
    } yield (ent, minute, attr, seq))

  private def obsDf(rows: List[(Long, Int, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // dedupe the (ent, minute, seq) key so the tiebreak order is total
    rows.distinctBy(r => (r._1, r._2, r._4))
      .toDF("ent", "minute", "attr", "seq")
      .select(col("ent"),
        timestamp_seconds(lit(1704067200L) + col("minute") * 60).as("t"),
        col("attr"), col("seq"))
  }

  test("property: scdAsOf == brute-force last-observation lookup at random instants") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 5).flatMap(i => obsGen.apply(Gen.Parameters.default, Seed(400L + i)))
      .foreach { raw =>
        val rows = raw.distinctBy(r => (r._1, r._2, r._4))
        if (rows.nonEmpty) {
          val df = obsDf(raw)
          val scd = graft.ts.Scd.scdIntervals(df, "ent", "t", Seq("attr"), Seq("seq"))
          val probes = (0 until 20).map(i => (i % 5L, (i * 37) % 520))
          val spine = probes.toDF("ent", "minute")
            .select(col("ent"),
              timestamp_seconds(lit(1704067200L) + col("minute") * 60).as("t"))
          val got = graft.ts.Scd.scdAsOf(spine, scd, "ent", "t", Seq("attr"))
            .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
              Option(r.getString(2)).orNull)).toSet
          // brute force: attr of the last observation at-or-before t in
          // (time, seq) order
          val expected = probes.map { case (e, m) =>
            val tMs = (1704067200L + m * 60) * 1000L
            val hist = rows.filter(_._1 == e)
              .filter { case (_, om, _, _) => (1704067200L + om * 60) * 1000L <= tMs }
            val attr = if (hist.isEmpty) null
              else hist.maxBy { case (_, om, _, sq) => (om, sq) }._3
            (e, tMs, attr)
          }.toSet
          assert(got == expected, s"scdAsOf diverged from brute force")
        }
      }
  }

  test("property: trailingAtSpine == brute-force window filter at random instants") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 5).flatMap(i => obsGen.apply(Gen.Parameters.default, Seed(500L + i)))
      .foreach { raw =>
        val rows = raw.distinctBy(r => (r._1, r._2, r._4))
        if (rows.nonEmpty) {
          val obs = obsDf(raw).withColumn("v", col("seq") % 100)
          val probes = (0 until 20).map(i => (i % 5L, (i * 53) % 520))
          val spine = probes.toDF("ent", "minute")
            .select(col("ent"),
              timestamp_seconds(lit(1704067200L) + col("minute") * 60).as("t"))
          val got = graft.ts.Rolling.trailingAtSpine(spine, obs, "ent", "t",
            "1h", Seq(graft.ts.Rolling.Agg("*", "count"),
              graft.ts.Rolling.Agg("v", "sum")))
            .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
              r.getLong(2), r.getLong(3))).toSet
          val expected = probes.map { case (e, m) =>
            val tS = 1704067200L + m * 60
            // (t - 1h, t] in seconds; values v = seq % 100 per DISTINCT
            // (ent, minute, seq) row — minute collisions are real rows
            val in = rows.filter(_._1 == e).filter { case (_, om, _, _) =>
              val oS = 1704067200L + om * 60
              oS > tS - 3600 && oS <= tS
            }
            (e, tS * 1000L, in.size.toLong, in.map(_._4 % 100).sum)
          }.toSet
          assert(got == expected, "trailingAtSpine diverged from brute force")
          graft.CacheScope.release()
        }
      }
  }

  test("property: curationReport outcomes always partition the corpus") {
    import spark.implicits._
    (1 to 4).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(300L + i)))
      .foreach { rows =>
        val (benchRows, corpusRows) = rows.partition(_._1 % 5 == 0)
        val corpus = corpusRows.map { case (id, t) => (id, t, s"l${id % 3}") }
          .toDF("doc_id", "text", "lang")
        val report = graft.operators.CurationOps.curationReport(
            corpus, benchRows.toDF("doc_id", "text"), "doc_id", "text", "lang",
            k = 4, minTokens = 10, maxTopTokenFrac = 0.3)
          .collect()
        assert(report.map(_.getLong(2)).sum == corpusRows.length.toLong)
        // and kept == curateKeep exactly
        val keptN = graft.operators.CurationOps.curateKeep(
          corpus, benchRows.toDF("doc_id", "text"), "doc_id", "text", "lang",
          k = 4, minTokens = 10, maxTopTokenFrac = 0.3).count()
        assert(report.filter(_.getString(1) == "kept").map(_.getLong(2)).sum == keptN)
      }
  }

  test("property: BPE rank-greedy encode == independent first-occurrence reference; lossless; monotone") {
    import graft.operators.TextOps
    // independent reference: repeatedly find the LOWEST-RANK adjacent pair
    // globally and merge ONLY ITS FIRST occurrence — structurally different
    // from the production one-pass left-to-right merge
    def refEncode(word: String, merges: Seq[(String, String)]): List[String] = {
      val rank = merges.zipWithIndex.toMap
      var s = word.map(_.toString).toList
      var go = true
      while (go && s.length > 1) {
        val ranked = s.zip(s.tail).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (ranked.isEmpty) go = false
        else {
          val (_, i) = ranked.minBy { case (r, i) => (r, i) }
          s = s.take(i) ++ ((s(i) + s(i + 1)) :: s.drop(i + 2))
        }
      }
      s
    }
    val wordGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val corpusGen = Gen.listOfN(30, wordGen)
    (1 to 40).foreach { seed =>
      val words = corpusGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val docs = {
        import spark.implicits._
        words.grouped(5).map(_.mkString(" ")).toSeq.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      }
      val merges = TextOps.learnBpeMerges(docs, "text", nMerges = 10)
      // pairwise-distinct symbols in each merge table by construction
      words.foreach { w =>
        val got = TextOps.bpeEncodeWord(
          w.map(_.toString).toArray, merges.zipWithIndex.toMap).toList
        val want = refEncode(w, merges)
        assert(got == want, s"seed=$seed word=$w got=$got want=$want merges=$merges")
        assert(got.mkString == w, s"lossless violated: $w -> $got")
        // prefix monotonicity: every merge-list prefix yields >= pieces
        (0 to merges.size).foreach { k =>
          val pk = TextOps.bpeEncodeWord(
            w.map(_.toString).toArray, merges.take(k).zipWithIndex.toMap).length
          assert(pk >= got.size, s"prefix $k grew pieces for $w")
        }
      }
      // empty merge table = code points
      assert(TextOps.bpeEncodeWord("abc".map(_.toString).toArray, Map.empty).toList
        == List("a", "b", "c"))
    }
  }

  test("BPE-learned vocab feeds the piece packer; accounting self-consistent") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = graft.operators.TextOps.learnBpeMerges(docs, "text", 50)
    assert(merges.nonEmpty && merges.size <= 50)
    val vocab = graft.operators.TextOps.bpeWordPieceVocab(docs, "text", merges, 300)
    // vocab pieces reconstruct their words
    val bad = vocab.where(concat_ws("", col("pieces")) =!= col("word")).count()
    assert(bad == 0, s"$bad vocab entries fail reconstruction")
    // the learned vocab drops into the production piece packer: chunk
    // token totals equal the corpus's piece-count total (no loss/dup)
    val packed = graft.operators.CurationOps.packChunkPieces(
      docs, "doc_id", "text", vocab, chunkTokens = 256)
    // chunks are (chunk_id, text) with pieces space-joined; pieces never
    // contain spaces (they come from whitespace-split words)
    val packedTokens = packed
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    val vmap = map_from_arrays(collect_list(col("word")), collect_list(col("pieces")))
    val vocabOneRow = vocab.agg(vmap.as("m"))
    val direct = docs.crossJoin(broadcast(vocabOneRow))
      .select(size(graft.operators.TextOps.pieceTokens(col("text"), col("m"))).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(packedTokens == direct,
      s"packed piece total $packedTokens != direct accounting $direct")
    graft.CacheScope.release()
  }
}

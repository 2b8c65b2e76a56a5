package graft

import graft.operators.{LayoutOps, SkewOps}
import graft.ts.Scd
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Z-order layout + manifest pruning, salted join, and SCD2 intervals. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits: axis neighbors are z-close, distant points are not") {
    // closed-form check of the Morton code for small coordinates
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // interleave x at even positions, y at odd: z(1,0)=1, z(0,1)=2, z(1,1)=3,
    // z(2,2)=12, z(3,5)= (11b interleaved with 101b) = 1 00 11 1 b? compute:
    // x=3=0b011 -> bits at pos 0,2 ; y=5=0b101 -> bits at pos 1,5 => 0b100111 = 39
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L && got((2L, 2L)) == 12L && got((3L, 5L)) == 39L)
  }

  test("zValue clamps out-of-range inputs instead of corrupting the code") {
    val df = Seq((-5L, 9999L)).toDF("x", "y")
      .select(LayoutOps.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
    // x -> 0, y -> 15 (0b1111 at odd positions = 0b10101010 = 170)
    assert(df.head().getLong(0) == 170L)
  }

  test("z-ordered write + manifest-pruned read == full-scan filter, and files are skipped") {
    val dir = tmpDir("zorder")
    val n = 20000
    val df = spark.range(n).select(
      col("id"),
      (col("id") * 7919 % 512).as("x"),
      (col("id") * 104729 % 512).as("y"))
    LayoutOps.writeZOrdered(df, Seq("x", "y"), dir, nFiles = 32, bits = 9)

    val box = Seq(("x", 64L, 127L), ("y", 256L, 319L))
    val (sel, total) = LayoutOps.selectFiles(spark, dir, box)
    assert(total == 32L, s"expected 32 files, manifest saw $total")
    // a (1/8 x 1/8) box over a z-ordered layout must skip most files
    assert(sel.length < total / 2,
      s"z-order pruning too weak: ${sel.length} of $total files selected")

    val pruned = LayoutOps.readPruned(spark, dir, box)
    val brute = LayoutOps.readTable(spark, dir)
      .where(col("x").between(64, 127) && col("y").between(256, 319))
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
      "pruned read must equal the full-scan filter")
    assert(pruned.count() > 0, "box must be non-empty for the test to mean anything")
  }

  test("appendZOrdered: appended batch serves exactly; token replay does not duplicate") {
    val dir = tmpDir("zappend")
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi).select(
      col("id"), (col("id") % 512).as("x"), (col("id") * 31 % 512).as("y"))
    LayoutOps.writeZOrdered(mk(0L, 4000L), Seq("x", "y"), dir, nFiles = 8, bits = 9)
    LayoutOps.appendZOrdered(mk(4000L, 6000L), Seq("x", "y"), dir, "b1", nFiles = 4)
    assert(LayoutOps.readTable(spark, dir).count() == 6000L)
    // replaying the same token rewrites, never duplicates
    LayoutOps.appendZOrdered(mk(4000L, 6000L), Seq("x", "y"), dir, "b1", nFiles = 4)
    assert(LayoutOps.readTable(spark, dir).count() == 6000L)
    val box = Seq(("x", 100L, 199L))
    val pruned = LayoutOps.readPruned(spark, dir, box)
    val brute = LayoutOps.readTable(spark, dir).where(col("x").between(100, 199))
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
      "pruned read over base+append must equal the full filter")
  }

  test("appendZOrdered refuses a mismatched layout loudly") {
    val dir = tmpDir("zmeta")
    val df = spark.range(100).select(col("id"), (col("id") % 10).as("x"), (col("id") % 7).as("y"))
    LayoutOps.writeZOrdered(df, Seq("x", "y"), dir, nFiles = 2, bits = 4)
    val e = intercept[IllegalArgumentException](
      LayoutOps.appendZOrdered(df, Seq("y", "x"), dir, "b1"))
    assert(e.getMessage.contains("layout mismatch"))
  }

  test("compactZOrdered re-clusters appends into a new path with identical rows") {
    val dir = tmpDir("zcompact"); val dst = tmpDir("zcompacted")
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi).select(
      col("id"), (col("id") * 7 % 256).as("x"), (col("id") * 13 % 256).as("y"))
    LayoutOps.writeZOrdered(mk(0L, 3000L), Seq("x", "y"), dir, nFiles = 8, bits = 8)
    LayoutOps.appendZOrdered(mk(3000L, 5000L), Seq("x", "y"), dir, "b1", nFiles = 8)
    LayoutOps.compactZOrdered(spark, dir, dst, nFiles = 8)
    val a = LayoutOps.readTable(spark, dir)
    val b = LayoutOps.readTable(spark, dst)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction must preserve the table's rows exactly")
    // global re-cluster = one batch, so a box touches no more files than
    // before compaction (usually fewer)
    val box = Seq(("x", 0L, 63L), ("y", 0L, 63L))
    val (selSrc, _) = LayoutOps.selectFiles(spark, dir, box)
    val (selDst, _) = LayoutOps.selectFiles(spark, dst, box)
    assert(selDst.length <= selSrc.length,
      s"compaction worsened pruning: ${selDst.length} > ${selSrc.length}")
  }

  test("manifest pruning is exact on a NON-z-ordered layout too (just weaker)") {
    val dir = tmpDir("nozorder")
    val df = spark.range(5000).select(col("id"), (col("id") % 100).as("x"))
    df.repartition(8).write.mode("overwrite").parquet(dir)
    LayoutOps.buildManifest(spark, dir, Seq("x"))
    val pruned = LayoutOps.readPruned(spark, dir, Seq(("x", 10L, 19L)))
    val brute = spark.read.parquet(dir).where(col("x").between(10, 19))
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty)
  }

  test("readPruned on a box outside the data returns empty with the table schema") {
    val dir = tmpDir("zempty")
    LayoutOps.writeZOrdered(
      spark.range(100).select(col("id"), (col("id") % 10).as("x")),
      Seq("x"), dir, nFiles = 4, bits = 4)
    val out = LayoutOps.readPruned(spark, dir, Seq(("x", 500L, 900L)))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "x"))
  }

  test("saltedJoin == plain inner join, with the salt in the physical join keys") {
    val fact = spark.range(10000).select(
      col("id"), (col("id") % 3).as("k"), (col("id") * 31 % 97).as("payload"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (99L, "never")).toDF("k", "tag")
    val salted = SkewOps.saltedJoin(fact, dim, Seq("k"), buckets = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must be row-identical to the plain inner join")
    // the executed join must key on the salt (that IS the skew spread)
    val phys = salted.queryExecution.executedPlan.toString
    assert(phys.contains("__salt"), s"salt column missing from physical plan:\n$phys")
  }

  test("saltedJoin refuses colliding dim payload columns loudly") {
    val fact = Seq((1L, 2L)).toDF("k", "v")
    val dim = Seq((1L, 3L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](SkewOps.saltedJoin(fact, dim, Seq("k")))
    assert(e.getMessage.contains("collide"))
  }

  test("scdIntervals collapses runs, opens at first obs, closes at next change") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-02 00:00:00", "a", 2L), // repeat -> collapsed
      (1L, "2024-01-03 00:00:00", "b", 3L), // change
      (1L, "2024-01-04 00:00:00", "a", 4L), // back to a = NEW interval
      (2L, "2024-01-01 00:00:00", "x", 5L)
    ).toDF("ent", "t", "attr", "seq")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"), col("seq"))
    val out = Scd.scdIntervals(df, "ent", "t", Seq("attr"), tieCols = Seq("seq"))
      .orderBy(col("ent"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.substring(0, 10),
        Option(r.getTimestamp(3)).map(_.toString.substring(0, 10)).orNull))
    assert(out.toSeq == Seq(
      (1L, "a", "2024-01-01", "2024-01-03"),
      (1L, "b", "2024-01-03", "2024-01-04"),
      (1L, "a", "2024-01-04", null),
      (2L, "x", "2024-01-01", null)))
  }

  test("scdIntervals: equal-timestamp observations order by the tiebreak; nulls are values") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", null.asInstanceOf[String], 1L),
      (1L, "2024-01-01 00:00:00", "b", 2L), // same instant, tiebreak seq
      (1L, "2024-01-02 00:00:00", "b", 3L) // repeat of b -> collapsed
    ).toDF("ent", "t", "attr", "seq")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"), col("seq"))
    val out = Scd.scdIntervals(df, "ent", "t", Seq("attr"), tieCols = Seq("seq"))
      .orderBy(col("valid_from"), col("seq"))
    // row 1: null attr interval closed at the same instant by seq=2's change
    val rows = out.select(col("attr"), col("valid_from"), col("valid_to")).collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(0) && rows(0).getTimestamp(1) == rows(0).getTimestamp(2),
      "null-attr run must close at the same-instant change (empty interval)")
    assert(rows(1).getString(0) == "b" && rows(1).isNullAt(2))
  }

  test("scdAsOf serves the interval valid at each instant; pre-history is null") {
    val obs = Seq(
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-03 00:00:00", "b", 2L),
      (2L, "2024-01-05 00:00:00", "x", 3L)
    ).toDF("ent", "t", "attr", "seq")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"), col("seq"))
    val scd = Scd.scdIntervals(obs, "ent", "t", Seq("attr"), tieCols = Seq("seq"))
    val spine = Seq(
      (1L, "2024-01-02 00:00:00"), // inside [a, b) -> a
      (1L, "2024-01-03 00:00:00"), // exactly at the change -> b (inclusive)
      (1L, "2023-12-01 00:00:00"), // before history -> null
      (2L, "2024-06-01 00:00:00") // open interval -> x
    ).toDF("ent", "t").select(col("ent"), col("t").cast("timestamp").as("t"))
    val out = Scd.scdAsOf(spine, scd, "ent", "t", Seq("attr"))
      .orderBy(col("ent"), col("t"))
      .collect().map(r => Option(r.getString(2)).orNull)
    assert(out.toSeq == Seq(null, "a", "b", "x"))
  }

  test("SCD2 store: update closes open intervals by shadowing; replay safe; late data refused") {
    val root = tmpDir("scdstore")
    def obs(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("ent", "t", "attr", "seq_id")
        .select(col("ent"), col("t").cast("timestamp").as("t"),
          col("attr"), col("seq_id"))
    val base = obs(Seq(
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-03 00:00:00", "b", 2L),
      (2L, "2024-01-02 00:00:00", "x", 3L)))
    Scd.buildScdStore(base, "ent", "t", Seq("attr"), Seq("seq_id"), root)
    // batch: entity 1 keeps b then flips to c; entity 3 is brand new;
    // entity 2 untouched
    val b1 = obs(Seq(
      (1L, "2024-01-05 00:00:00", "b", 4L), // same attr -> open interval extends
      (1L, "2024-01-07 00:00:00", "c", 5L),
      (3L, "2024-01-06 00:00:00", "z", 6L)))
    Scd.updateScdStore(b1, root, "b1")
    Scd.updateScdStore(b1, root, "b1") // replay must not duplicate
    val got = Scd.loadScd(spark, root)
    val oneShot = Scd.scdIntervals(base.unionByName(b1), "ent", "t",
      Seq("attr"), Seq("seq_id"))
    assert(got.exceptAll(oneShot).isEmpty && oneShot.exceptAll(got).isEmpty,
      "resolved store view must equal the one-shot change capture")
    // late data (older than entity 1's open interval) refuses loudly
    val late = obs(Seq((1L, "2024-01-02 00:00:00", "q", 9L)))
    val e = intercept[IllegalArgumentException](
      Scd.updateScdStore(late, root, "b2"))
    assert(e.getMessage.contains("OLDER"))
    // compaction to a new path preserves the resolved view exactly
    val dst = tmpDir("scdcompact")
    Scd.compactScdStore(spark, root, dst)
    val compacted = Scd.loadScd(spark, dst)
    assert(compacted.exceptAll(got).isEmpty && got.exceptAll(compacted).isEmpty)
  }

  test("SCD2 store: replaying a NON-latest token after newer batches is idempotent, never corrupting") {
    val root = tmpDir("scdreplay")
    def obs(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("ent", "t", "attr", "seq_id")
        .select(col("ent"), col("t").cast("timestamp").as("t"),
          col("attr"), col("seq_id"))
    val base = obs(Seq((1L, "2024-01-01 00:00:00", "a", 1L)))
    Scd.buildScdStore(base, "ent", "t", Seq("attr"), Seq("seq_id"), root)
    val b1 = obs(Seq((1L, "2024-01-03 00:00:00", "b", 2L)))
    val b2 = obs(Seq((1L, "2024-01-05 00:00:00", "c", 3L)))
    Scd.updateScdStore(b1, root, "b1")
    Scd.updateScdStore(b2, root, "b2")
    val before = Scd.loadScd(spark, root).collect().toSet
    // replay the NON-latest token b1: its rows (t=Jan 3) sit at-or-before
    // b2's observations — the pre-fix delete-then-guard path destroyed
    // b1's committed intervals and then threw; now the replay recomputes
    // against the as-of-b1 store state and reproduces itself exactly
    Scd.updateScdStore(b1, root, "b1")
    val after = Scd.loadScd(spark, root).collect().toSet
    assert(after == before, "non-latest replay must leave the resolved view unchanged")
    // a genuinely-late batch under a NEW token still refuses loudly AND
    // leaves the store untouched (guard before any mutation)
    val late = obs(Seq((1L, "2024-01-02 00:00:00", "q", 9L)))
    intercept[IllegalArgumentException](Scd.updateScdStore(late, root, "b3"))
    assert(Scd.loadScd(spark, root).collect().toSet == before,
      "a refused batch must not have deleted or altered any committed intervals")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/intervals/batch=b3")),
      "a refused batch must not leave a batch dir behind")
  }

  test("scdAsOf: a legitimately-null interval serves null, not the previous value") {
    val obs = Seq(
      (1L, "2024-01-01 00:00:00", Option("a"), 1L),
      (1L, "2024-01-03 00:00:00", Option.empty[String], 2L), // null IS a value
      (1L, "2024-01-05 00:00:00", Option("b"), 3L)
    ).toDF("ent", "t", "attr", "seq")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"), col("seq"))
    val scd = Scd.scdIntervals(obs, "ent", "t", Seq("attr"), Seq("seq"))
    val spine = Seq((1L, "2024-01-04 00:00:00"), (1L, "2024-01-06 00:00:00"))
      .toDF("ent", "t").select(col("ent"), col("t").cast("timestamp").as("t"))
    val out = Scd.scdAsOf(spine, scd, "ent", "t", Seq("attr"))
      .orderBy(col("t")).collect().map(r => Option(r.getString(2)).orNull)
    assert(out.toSeq == Seq(null, "b"),
      "a spine instant inside the null interval must see null, never 'a'")
  }

  test("scdAsOf refuses a spine column that collides with a tracked attr") {
    val obs = Seq((1L, "2024-01-01 00:00:00", "a", 1L)).toDF("ent", "t", "attr", "seq")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"), col("seq"))
    val scd = Scd.scdIntervals(obs, "ent", "t", Seq("attr"), Seq("seq"))
    val spine = Seq((1L, "2024-01-02 00:00:00", "spinal"))
      .toDF("ent", "t", "attr")
      .select(col("ent"), col("t").cast("timestamp").as("t"), col("attr"))
    val e = intercept[IllegalArgumentException](
      Scd.scdAsOf(spine, scd, "ent", "t", Seq("attr")))
    assert(e.getMessage.contains("collide"))
  }

  test("SCD2 store refuses a batch row between the last change and the last observation") {
    val root = tmpDir("scdlastobs")
    val base = Seq(
      (1L, "2024-01-01 00:00:00", "A", 1L),
      (1L, "2024-01-05 00:00:00", "A", 2L) // repeat: discarded by change
    ).toDF("ent", "t", "attr", "seq_id") // capture, but still an observation
      .select(col("ent"), col("t").cast("timestamp").as("t"),
        col("attr"), col("seq_id"))
    Scd.buildScdStore(base, "ent", "t", Seq("attr"), Seq("seq_id"), root)
    // t=01-03 is after the open interval's valid_from (01-01) but BEFORE
    // the last observation (01-05): a rebuild would order it between the
    // two 'A' observations — the incremental path must refuse, not
    // silently diverge
    val sneaky = Seq((1L, "2024-01-03 00:00:00", "B", 3L))
      .toDF("ent", "t", "attr", "seq_id")
      .select(col("ent"), col("t").cast("timestamp").as("t"),
        col("attr"), col("seq_id"))
    val e = intercept[IllegalArgumentException](
      Scd.updateScdStore(sneaky, root, "b1"))
    assert(e.getMessage.contains("OLDER"))
    // and exactly AT the last observation is refused too (ambiguous order)
    val tied = Seq((1L, "2024-01-05 00:00:00", "B", 4L))
      .toDF("ent", "t", "attr", "seq_id")
      .select(col("ent"), col("t").cast("timestamp").as("t"),
        col("attr"), col("seq_id"))
    val e2 = intercept[IllegalArgumentException](
      Scd.updateScdStore(tied, root, "b1"))
    assert(e2.getMessage.contains("OLDER"))
    // strictly after passes and matches the one-shot capture
    val ok = Seq((1L, "2024-01-06 00:00:00", "B", 5L))
      .toDF("ent", "t", "attr", "seq_id")
      .select(col("ent"), col("t").cast("timestamp").as("t"),
        col("attr"), col("seq_id"))
    Scd.updateScdStore(ok, root, "b1")
    val got = Scd.loadScd(spark, root)
    val oneShot = Scd.scdIntervals(base.unionByName(ok), "ent", "t",
      Seq("attr"), Seq("seq_id"))
    assert(got.exceptAll(oneShot).isEmpty && oneShot.exceptAll(got).isEmpty)
  }

  test("scdIntervals physical plan windows partition by the entity (no global sort)") {
    val df = spark.range(1000).select(
      (col("id") % 50).as("ent"),
      timestamp_seconds(col("id") * 60).as("t"),
      (col("id") % 3).cast("string").as("attr"),
      col("id").as("seq"))
    val out = Scd.scdIntervals(df, "ent", "t", Seq("attr"), tieCols = Seq("seq"))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("SinglePartition"),
      s"SCD2 must never plan a single-partition window:\n$phys")
    assert(out.count() > 0)
  }

  test("balancedPerm deals energy-ranked dims round-robin; balanced PQ finds planted dups") {
    import graft.operators.SimilarityOps
    // 8 dims; energy rank order by construction: dim 3 > 1 > 6 > 0 > rest
    // equal (ties by index: 2, 4, 5, 7)
    val vecs = (0 until 50).map { r =>
      (r.toLong, Array(2f, 4f, 1f, 8f, 1f, 1f, 3f, 1f).map(_ * (1f + r % 3)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val perm = {
      val m = classOf[SimilarityOps.type].getDeclaredMethods
        .find(_.getName == "balancedPerm").get
      m.setAccessible(true)
      m.invoke(SimilarityOps,
        df.select(SimilarityOps.quantize(col("embedding")).as("v")), Int.box(4))
        .asInstanceOf[Array[Int]]
    }
    // ranked = [3,1,6,0,2,4,5,7]; m=4: j0 gets ranks 0,4 -> dims 3,2;
    // j1 ranks 1,5 -> 1,4; j2 ranks 2,6 -> 6,5; j3 ranks 3,7 -> 0,7
    assert(perm.toSeq == Seq(3, 2, 1, 4, 6, 5, 0, 7), s"got ${perm.toSeq}")

    // end-to-end: planted near-identical pair must surface as rank-1
    def pseudo(i: Int, d: Int): Float =
      (((i * 7919 + d * 104729 + i * d * 53) % 1009) % 13 - 6).toFloat
    val base = (0 until 64).map(d => pseudo(0, d)).toArray
    val corpus = ((0 until 200).map { i =>
      (i.toLong, (0 until 64).map(d => pseudo(i, d)).toArray)
    } :+ (999L, base.map(_ + 0.01f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.pqTopKBalanced(corpus,
      corpus.where(col("vec_id") === 0L), "vec_id", "embedding", 5,
      m = 4, ksub = 8, refineIters = 1)
    val top = out.orderBy(col("rank")).head()
    assert(top.getLong(1) == 999L,
      s"planted near-dup of query 0 must be rank 1, got ${top.getLong(1)}")
  }

  test("profileDrift-style share math: drift report ppm is exact integer floor") {
    // direct unit of the binning + ppm arithmetic used by profileDrift
    val u = Seq((10.0, 0), (30.0, 0), (30.0, 0), (60.0, 1)).toDF("value", "__w")
    val bin = least(greatest(floor((col("value") - lit(0.0)) / lit(25.0)).cast("bigint"),
      lit(0L)), lit(19L))
    val h = u.select(bin.as("bin"), col("__w")).groupBy("bin")
      .agg(sum(when(col("__w") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("__w") === 1, 1L).otherwise(0L)).as("n_cur"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val out = h.withColumn("__tr", sum(col("n_ref")).over(all))
      .select(col("bin"), expr("n_ref * 1000000 div __tr").as("ref_ppm"))
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 333333L), (1L, 666666L), (2L, 0L)))
  }
}

package graft

import graft.functions.{LongDotProduct, NfcNormalize}
import org.apache.spark.sql.functions._

/** Custom codegen'd expression: graft_dot_long. */
class FunctionsSpec extends SparkTestBase {

  test("dot product matches the interpreted higher-order formulation") {
    LongDotProduct.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextLong() % 1000000), Array.fill(64)(rnd.nextLong() % 1000000))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      call_function(LongDotProduct.name, col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, p) => acc + p).as("slow"))
    assert(out.where(col("fast") =!= col("slow")).count() == 0)
  }

  test("null inputs yield null; SQL surface works") {
    LongDotProduct.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(1L)))).toDF("a", "b")
    val got = df.selectExpr(s"${LongDotProduct.name}(a, b) as d").collect()
    assert(got(0).getLong(0) == 11L)
    assert(got(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    LongDotProduct.register(spark)
    val df = spark.range(10)
      .selectExpr("array(id, id + 1) as a", "array(2L, 3L) as b")
      .selectExpr(s"${LongDotProduct.name}(a, b) as d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
    assert(df.orderBy("d").head().getLong(0) == 3L) // id=0: 0*2 + 1*3
  }

  test("md5_prefix60 equals the conv(substring(md5)) formulation on random strings") {
    graft.functions.Md5Prefix60.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val strs = (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(30) + 1).mkString)
    val df = strs.toDF("s").select(
      call_function(graft.functions.Md5Prefix60.name, col("s")).as("fast"),
      expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)").as("slow"))
    assert(df.where(col("fast") =!= col("slow")).count() == 0)
    assert(df.where(col("fast") < 0).count() == 0) // 60 bits, never negative
  }

  test("quantize_vec matches the interpreted transform formulation, int and mixed dots agree") {
    graft.functions.QuantizeVec.register(spark)
    graft.functions.LongDotProduct.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 100).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 4 - 2)))
      .toDF("id", "v")
    val q = df.select(
      call_function(graft.functions.QuantizeVec.name, col("v"), lit(1000000L)).as("fast"),
      transform(col("v"), x => floor(x.cast("double") * 1000000L).cast("int")).as("slow"))
    assert(q.where(col("fast") =!= col("slow")).count() == 0)
    // dot over (int, int) equals dot over (bigint, bigint) of the same values
    val d = q.select(
      call_function(graft.functions.LongDotProduct.name, col("fast"), col("fast")).as("ii"),
      call_function(graft.functions.LongDotProduct.name,
        transform(col("slow"), _.cast("bigint")), transform(col("slow"), _.cast("bigint"))).as("ll"))
    assert(d.where(col("ii") =!= col("ll")).count() == 0)
  }

  test("type mismatch is a clean analysis error") {
    LongDotProduct.register(spark)
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1L))).toDF("a", "b")
    val e = intercept[Exception](df.selectExpr(s"${LongDotProduct.name}(a, b)").collect())
    assert(e.getMessage.contains("dot_long") || e.getMessage.toLowerCase.contains("type"))
  }

  test("ivf_best_cell == the joined max_by(cell, struct(cos, -cell)) shape, ties to lowest") {
    graft.functions.IvfBestCell.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 8
    val nc = 5
    val cents = Seq.tabulate(nc)(g => Seq.fill(dim)(rnd.nextInt(2001) - 1000L))
    val flat = cents.flatten
    val cns = cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    // vectors: random ones plus EXACT copies of centroids scaled 2x (cosine
    // ties with the centroid itself are exercised via duplicate centroids)
    val dupCents = cents :+ cents.head // cell 5 duplicates cell 0 -> tie
    val dupFlat = dupCents.flatten
    val dupCns = cns :+ cns.head
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextInt(2001) - 1000L))) ++
      cents.zipWithIndex.map { case (c, i) => (100L + i, c.map(_ * 2)) }
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
      call_function(graft.functions.IvfBestCell.name, col("v"),
        typedLit(dupFlat), typedLit(dupCns)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // driver-side reference: max cos, ties to lowest index
    def best(v: Seq[Long]): Int = {
      val nrm = math.sqrt(v.map(x => x * x).sum.toDouble)
      val cos = dupCents.zip(dupCns).map { case (c, cn) =>
        v.zip(c).map { case (a, b) => a * b }.sum.toDouble / (nrm * cn) }
      cos.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
    }
    vecs.foreach { case (id, v) => assert(got(id) == best(v), s"id $id") }
    // the scaled centroid copies must pick their own cell, and the
    // duplicated centroid's tie must resolve to the LOWER index (0, not 5)
    assert(got(100L) == 0)
    (1 until nc).foreach(i => assert(got(100L + i) == i))
  }

  test("graft_nfc composes decomposed forms, codegen'd, ASCII/NFC pass through") {
    import spark.implicits._
    NfcNormalize.register(spark)
    val composed = "café"                 // é as one code point
    val decomposed = "café"              // e + COMBINING ACUTE
    val df = Seq(("a", composed), ("b", decomposed), ("c", "plain ascii"),
      ("d", null: String)).toDF("id", "s")
      .selectExpr("id", s"${NfcNormalize.name}(s) as n")
    // local relations constant-fold; prove the codegen path on a range scan
    val cg = spark.range(3).selectExpr(s"${NfcNormalize.name}(cast(id as string)) as n")
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
    assert(cg.collect().map(_.getString(0)).sorted.sameElements(Array("0", "1", "2")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") == composed)
    assert(got("b") == composed, "decomposed input must compose to NFC")
    assert(got("c") == "plain ascii")
    assert(got("d") == null)
    // dedup consequence: the two spellings fingerprint identically after nfc
    val fp = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val cleaned = graft.operators.TextOps.cleanText(fp, "doc_id", "text")
    val probed = graft.operators.DedupOps.exactDedupMap(cleaned, "doc_id", "text")
      .select("canonical_id").distinct().count()
    assert(probed == 1L, "NFC-cleaned spellings must share one canonical id")
  }
}

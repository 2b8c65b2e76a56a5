package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** LLM-pipeline operators: dedup, similarity, text analysis, multimodal.
  * Uses the sf0.001 driver tables as fixtures.
  */
class OperatorsSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.documents(spark, dir)
  lazy val emb = Tables.embeddings(spark, dir)

  test("minhash LSH pairs == brute-force exact jaccard pairs on this corpus") {
    val lsh = DedupOps.minhashLshPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupOps.exactJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == exact) // j≈0.99 pairs: miss probability (1-j^4)^32 ≈ 0
  }

  test("exact dedup map: identical texts collapse to one canonical id") {
    import spark.implicits._
    val withDup = docs.select("doc_id", "text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"), $"text").limit(5))
    val m = DedupOps.exactDedupMap(withDup, "doc_id", "text")
    val dups = m.where($"canonical_id" =!= $"doc_id").collect()
    assert(dups.length == 5)
    assert(dups.forall(r => r.getAs[Long]("doc_id") == r.getAs[Long]("canonical_id") + 100000))
  }

  test("simhash: near-dup pairs have smaller hamming distance than random pairs") {
    import spark.implicits._
    val sigs = docs.select($"doc_id", DedupOps.simhashBits($"text").as("sh"))
    val nearPairs = DedupOps.exactJaccardPairs(docs, "doc_id", "text").select("id_a", "id_b")
    val nearDist = nearPairs
      .join(sigs.select($"doc_id".as("id_a"), $"sh".as("sa")), Seq("id_a"))
      .join(sigs.select($"doc_id".as("id_b"), $"sh".as("sb")), Seq("id_b"))
      .agg(avg(DedupOps.hammingDistance($"sa", $"sb"))).head().getDouble(0)
    val randDist = sigs.as("x").join(sigs.as("y"),
        col("x.doc_id") + 7 === col("y.doc_id")) // arbitrary disjoint pairing
      .agg(avg(DedupOps.hammingDistance(col("x.sh"), col("y.sh")))).head().getDouble(0)
    assert(nearDist < randDist / 2,
      s"near-dup hamming $nearDist should be far below random $randDist")
  }

  test("brute-force topk: cosine in [-1,1], self excluded, ranks dense per query") {
    val topk = SimilarityOps.bruteForceTopK(emb, emb.where(col("vec_id") < 5),
      "vec_id", "embedding", 10).collect()
    assert(topk.length == 50)
    assert(topk.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0))
    assert(topk.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val ranks = topk.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("rank")).sorted
    assert(ranks.toSeq == (1L to 10L))
  }

  test("IVF topk achieves high recall vs brute force with generous probes") {
    val queries = emb.where(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    val ivf = pairs(SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nCells = 8, nProbe = 8)) // nProbe = nCells → scans everything → exact
    assert(ivf == exact)
    val ivfApprox = pairs(SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding", 10,
      nCells = 8, nProbe = 4))
    val recall = (ivfApprox & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low even for half-probe")
  }

  test("text stats: counts consistent and quality bounded") {
    val st = TextOps.textStats(docs, "doc_id", "text").collect()
    assert(st.length == docs.count())
    st.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_tokens") - 1)
      assert(r.getAs[Long]("n_stopwords") <= r.getAs[Long]("n_tokens"))
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of range")
    }
  }

  test("langId picks marker-majority language deterministically") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and the dog is here"),
      (2L, "der hund und die katze ist nicht da und der vogel"),
      (3L, "xyzzy plugh frobozz"), // no markers anywhere
      (4L, "le chat est sur les toits et une souris")).toDF("id", "text")
    val out = samples.select($"id", TextOps.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "unknown", 4L -> "fr"))
  }

  test("multimodal: decode stub is deterministic; frame sampling shapes correct") {
    val media = MultimodalOps.asMediaTable(docs, "doc_id", "text")
    val f1 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.id)
    val f2 = MultimodalOps.decodeFeatures(media).collect().sortBy(_.id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(r => r.n_bytes > 0 && r.width >= 16 && r.height >= 16))
    val frames = MultimodalOps.sampleFrames(media, blockSize = 64, stride = 4).collect()
    assert(frames.forall(_.frame_bytes.length == 64))
    assert(frames.forall(_.frame_idx % 4 == 0))
  }
}

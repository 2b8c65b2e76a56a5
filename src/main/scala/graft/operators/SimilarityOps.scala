package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle. The baseline.
  *  - [[ivfTopK]]: IVF-style scale path — corpus pre-assigned to coarse
  *    cells (one cheap pass); at query time only `nProbe` cells per query
  *    are scanned (partition-pruned by the cell join), then exact rerank.
  *    ~nProbe/nCells of the corpus touched per query.
  *
  * Determinism contract: vectors are quantized to fixed-point ints
  * (floor(x * 1e6)) so dot products and norms are integer-exact regardless
  * of accumulation order or engine; the final cosine is a single IEEE
  * divide of exact doubles — bit-reproducible anywhere (norms < 2^53).
  */
object SimilarityOps {

  val Scale = 1000000L

  /** array<float> → array<bigint> fixed-point. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * Scale).cast("bigint"))

  /** Integer dot product of two quantized vectors. */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** Exact cosine between quantized vectors, as double. */
  def cosineQ(a: Column, b: Column): Column =
    dotInt(a, b).cast("double") /
      (sqrt(dotInt(a, a).cast("double")) * sqrt(dotInt(b, b).cast("double")))

  /** Exact top-k neighbors for each query vector (excluding self-matches).
    * `queries` must be small enough to broadcast — the corpus streams by
    * once with no shuffle until the final per-query top-k aggregation.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineQ(col("qv"), col("cv")))
    topKPerQuery(scored, k)
  }

  /** IVF: assign corpus rows to their nearest of `nCells` coarse centroids
    * (deterministically seeded from the corpus itself: the rows with the
    * smallest ids act as centroids — kmeans iterations can refine this but
    * aren't needed for the plumbing); queries scan only their `nProbe`
    * closest cells, then rerank exactly.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cq = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
    val centroids = cq.orderBy(col("id")).limit(nCells)
      .select(col("id").as("cell"), col("v").as("cv")).collect()
    val centroidArr = array(centroids.map(r =>
      struct(lit(r.getLong(0)).as("cell"),
        array(r.getSeq[Long](1).map(lit): _*).as("cv"))): _*)

    // rank cells per vector by cosine; corpus keeps 1, queries keep nProbe
    def cellRanks(v: Column, n: Int): Column =
      slice(reverse(array_sort(transform(centroidArr, c =>
        struct(cosineQ(v, c.getField("cv")).as("cos"), c.getField("cell").as("cell"))))),
        1, n)

    val assigned = cq.withColumn("cell",
      cellRanks(col("v"), 1).getItem(0).getField("cell"))
    val probes = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("cell", explode(transform(cellRanks(col("qv"), nProbe),
        c => c.getField("cell"))))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosineQ(col("qv"), col("v")).as("cosine"), col("qv"), col("v"))
    topKPerQuery(scored, k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold (brute force
    * over a broadcastable side; LSH-bucket first at scale).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("v"))
    v.as("a").join(broadcast(v.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineQ(col("a.v"), col("b.v")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.select(col("query_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("bigint").as("rank"), col("cosine"))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing — schema, partitioning, iterator-based batch
  * processing, typed encoders — is real and tested; the actual byte→pixels/
  * samples decode is STUBBED with a deterministic fake (this environment has
  * no image/audio codecs): [[MultimodalOps.fakeDecode]] derives "features"
  * from a rolling hash of the bytes. Swap `fakeDecode` for a real codec
  * call; nothing else changes.
  */
object MultimodalOps {

  case class MediaRow(id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(id: Long, n_bytes: Long, width: Int, height: Int,
      feature: Array[Double])
  case class Frame(id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Wrap any (id, string-payload) frame as a media table: payload bytes as
    * the opaque `media` binary + derived metadata. Stands in for
    * `spark.read.format("binaryFile")` when no real media files exist.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      format: String = "fake/rgb8"): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit(format).as("format"))

  /** First 8 hex chars of md5(bytes) as a non-negative 32-bit value in a
    * Long — the same digest any SQL engine can derive via
    * `CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)`, which is what the
    * `mm_decode_features` oracle does.
    */
  private def md5Prefix32(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    // first 4 digest bytes == first 8 hex chars of the lowercase digest
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** STUB decode: deterministic pseudo-features from the media bytes.
    * A real implementation would decode pixels/samples here.
    *
    * The fake is deliberately oracle-expressible: each full 64-byte block
    * gets a 32-bit md5-prefix digest; `feature(k)` is the exact sum of the
    * digests of blocks `i` with `i % dims == k` (integral, exact in a
    * Double — ≤2^32 per block keeps even thousands of blocks under 2^53);
    * width/height come from the whole-payload digest. A SQL oracle
    * reproduces all of it with substring+md5 (see SparkEntry's
    * `mm_decode_features` oracle).
    */
  def fakeDecode(bytes: Array[Byte], dims: Int,
      md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")): (Int, Int, Array[Double]) = {
    // ??? real codec goes here; deterministic fake below
    val acc = new Array[Long](dims)
    val nBlocks = bytes.length / 64
    var i = 0
    while (i < nBlocks) {
      acc(i % dims) += md5Prefix32(md, bytes.slice(i * 64, (i + 1) * 64))
      i += 1
    }
    val h = md5Prefix32(md, bytes)
    val width = 16 + (h % 16).toInt // fake "decoded" dimensions
    val height = 16 + ((h / 16) % 16).toInt
    (width, height, acc.map(_.toDouble))
  }

  /** Batched per-partition "decode + featurize" over the media table.
    * mapPartitions (not a per-row UDF) so a real codec can amortize
    * model/codec init per batch — the Scala analogue of a pandas-batch UDF.
    */
  def decodeFeatures(media: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("media"), col("format")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init happens once here (codec handles, model weights)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val (w, h, feat) = fakeDecode(r.media, dims, md)
          MediaFeatures(r.id, r.media.length.toLong, w, h, feat)
        }
      }
  }

  /** STUB frame sampling: every `stride`-th fixed-size block of the payload
    * acts as a "frame" (a real impl samples video frames / audio windows).
    */
  def sampleFrames(media: DataFrame, blockSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("media"), col("format")).as[MediaRow]
      .flatMap { r =>
        val nBlocks = r.media.length / blockSize
        (0 until nBlocks by stride).map { b =>
          Frame(r.id, b, r.media.slice(b * blockSize, (b + 1) * blockSize))
        }
      }
  }

  /** Metadata-only pass: exact byte length + format, no decode. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("id"), length(col("media")).cast("bigint").as("n_bytes"), col("format"))
}

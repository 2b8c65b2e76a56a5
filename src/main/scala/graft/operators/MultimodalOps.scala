package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * IMAGE decode is REAL: [[decodeImageStats]] runs the JDK's built-in PNG
  * codec (`javax.imageio`, public and dependency-free) over the binary
  * column inside the batched mapPartitions plumbing — actual pixels out of
  * actual compressed bytes. AUDIO decode is REAL too:
  * [[decodeAudioStats]] parses WAV containers with the JDK's
  * `javax.sound.sampled` and folds the 16-bit PCM stream into exact
  * integer statistics. Only VIDEO remains STUBBED with a deterministic
  * fake ([[MultimodalOps.fakeDecode]], a rolling hash of the bytes) because
  * this environment ships no video codecs; the Spark-side plumbing —
  * schema, partitioning, iterator-based batch processing, typed encoders —
  * is identical for all three, so swapping the fake for a real codec call
  * changes nothing else.
  */
object MultimodalOps {

  case class MediaRow(id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(id: Long, n_bytes: Long, width: Int, height: Int,
      feature: Array[Double])
  case class Frame(id: Long, frame_idx: Int, frame_bytes: Array[Byte])
  case class ImageStats(id: Long, width: Long, height: Long, channel: Long,
      pix_sum: Long)
  case class AudioStats(id: Long, n_samples: Long, sum_val: Long,
      sum_abs: Long, min_val: Long, max_val: Long, zero_cross: Long)

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

  // ---------------------------------------------------------------------
  // REAL image path (JDK javax.imageio — PNG codec ships with the JVM)
  // ---------------------------------------------------------------------

  /** Deterministic RGB pixel value for the synthetic test images:
    * `v(id, x, y, c) = (id·31 + x·7 + y·13 + c·101) mod 256`. Closed-form,
    * so a SQL oracle reproduces the DECODED pixel statistics arithmetically
    * without ever touching a codec — the PNG round trip is lossless, which
    * is exactly what makes the decode verifiable end-to-end.
    */
  private def synthPixel(id: Long, x: Int, y: Int, c: Int): Int =
    (((id * 31 + x * 7L + y * 13L + c * 101L) % 256 + 256) % 256).toInt

  /** Synthetic image dimensions for an id: 8–16 px per side, both derived
    * from the id so every image differs.
    */
  def synthDims(id: Long): (Int, Int) =
    (8 + ((id % 9 + 9) % 9).toInt, 8 + ((id / 9 % 9 + 9) % 9).toInt)

  /** A REAL PNG payload (JDK encoder) whose pixels follow [[synthPixel]].
    * PNG is lossless: decoding these bytes with any conformant codec
    * returns the formula's exact pixel values.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (synthPixel(id, x, y, 0) << 16) |
            (synthPixel(id, x, y, 1) << 8) |
            synthPixel(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of real PNG payloads, one per id — GENERATED IN EXECUTORS
    * (mapPartitions): at fixture scale this is a convenience, at 100 TB the
    * same shape is "encode/transcode a media column distributedly" with no
    * driver involvement and no shuffle (narrow map over the id frame).
    */
  def syntheticImageTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids => ids.map(id => (id, syntheticPng(id), "image/png")) }
      .toDF("id", "media", "format")
  }

  /** REAL image decode over the opaque binary column: `javax.imageio` parses
    * the compressed payload into pixels; per image we emit one row per RGB
    * channel with the exact integer pixel sum — (id, width, height, channel,
    * pix_sum). mapPartitions keeps the batched-codec shape (decoder state,
    * real codecs' native buffers, amortize per partition, not per row);
    * an undecodable payload fails loudly with the offending id rather than
    * silently dropping rows.
    */
  def decodeImageStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"decodeImageStats: undecodable image payload for id=$id")
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Long](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sums(0) += (rgb >> 16) & 0xff
              sums(1) += (rgb >> 8) & 0xff
              sums(2) += rgb & 0xff
              x += 1
            }
            y += 1
          }
          (0 until 3).map(c => ImageStats(id, w.toLong, h.toLong, c.toLong, sums(c)))
        }
      }
  }

  /** Synthetic 16-bit PCM sample for (id, index): a closed-form value in
    * [-32768, 32767]. WAV stores PCM losslessly, so — like [[synthPixel]]
    * for PNG — a SQL oracle reproduces the DECODED sample statistics
    * arithmetically without a codec.
    */
  private def synthSample(id: Long, i: Int): Int =
    ((((id * 31 + i.toLong * 7) % 65536) + 65536) % 65536).toInt - 32768

  /** Synthetic clip length in samples: 400–1000, id-derived. */
  def synthAudioLen(id: Long): Int = 400 + ((id % 7 + 7) % 7).toInt * 100

  /** A REAL WAV payload (JDK `javax.sound.sampled` encoder): mono 16 kHz
    * 16-bit signed little-endian PCM whose samples follow [[synthSample]].
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = synthAudioLen(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media table of real WAV payloads, one per id — generated in executors
    * (narrow map over the id frame), mirroring [[syntheticImageTable]].
    */
  def syntheticAudioTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids => ids.map(id => (id, syntheticWav(id), "audio/wav")) }
      .toDF("id", "media", "format")
  }

  /** REAL audio decode over the opaque binary column: the JDK WAV parser
    * streams the container back into PCM frames; per clip we fold the
    * samples into exact integer statistics — count, sum, sum of absolute
    * values, min, max, and sign-change (zero-crossing) count, where a
    * crossing at index i≥1 means `(s(i) >= 0) != (s(i-1) >= 0)`. All-Long
    * output keeps the DuckDB oracle exact. mapPartitions keeps the batched
    * codec shape; an unparsable payload or an unexpected PCM layout fails
    * loudly with the offending id.
    */
  def decodeAudioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"decodeAudioStats: id=$id is not mono 16-bit LE signed PCM ($fmt)")
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var sum = 0L; var sumAbs = 0L; var zc = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var prevNonNeg = false
          var i = 0
          while (i < n) {
            val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong
            sum += s; sumAbs += math.abs(s)
            if (s < mn) mn = s
            if (s > mx) mx = s
            val nonNeg = s >= 0
            if (i > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            i += 1
          }
          require(n > 0, s"decodeAudioStats: empty PCM payload for id=$id")
          AudioStats(id, n.toLong, sum, sumAbs, mn, mx, zc)
        }
      }
  }
}

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
  * integer statistics. VIDEO decode is REAL as of round 7:
  * [[decodeVideoStats]] demuxes a RIFF/AVI container in-engine (public
  * chunk arithmetic — no codec library needed for the container) and
  * decodes each sampled frame as a self-contained still through
  * `javax.imageio` — Motion-PNG for the lossless oracle-exact gate,
  * Motion-JPEG byte-exactly through the same demux (spec-verified). The
  * historical [[fakeDecode]] stays only as the oracle-expressible
  * pseudo-feature path of `mm_decode_features`; no modality is stubbed
  * anymore. The Spark-side plumbing — schema, partitioning,
  * iterator-based batch processing, typed encoders — is identical for
  * all three modalities.
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
    // real decodes live in decodeImageStats / decodeAudioStats /
    // decodeVideoStats; this digest-based fake remains ONLY because it is
    // oracle-expressible for the feature-vector plumbing gate
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

  /** Perceptual difference-hash (dHash) of each image — the image-dedup
    * primitive: decode the payload with `javax.imageio`, sample a fixed
    * 9×8 grid by nearest-neighbor (`X(x) = ⌊x·w/9⌋`, `Y(y) = ⌊y·h/8⌋` —
    * integer arithmetic, no resampling filter, so the hash is
    * codec-independent and SQL-replayable), take grayness as the exact
    * channel sum r+g+b (no division — stays integer-exact), and emit
    * bit(y·8+x) = gray(X(x+1),Y(y)) > gray(X(x),Y(y)), row-major.
    *
    * Returned as `(id, simhash)` with the hash in the 64-char bitstring
    * currency of the SimHash machinery, so
    * [[DedupOps.simhashPairsFromSigs]] pigeonhole-bands these directly:
    * image near-dup = dHash + the existing banded hamming search. Scale:
    * a narrow map over the media column (batched codec state per
    * partition), then the banding's one packed-bucket shuffle.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"imageDHash: undecodable image payload for id=$id")
          val w = img.getWidth
          val h = img.getHeight
          def gray(gx: Int, gy: Int): Int = {
            val rgb = img.getRGB(gx, gy)
            ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          }
          val sb = new java.lang.StringBuilder(64)
          var y = 0
          while (y < 8) {
            val gy = y * h / 8
            var x = 0
            while (x < 8) {
              sb.append(
                if (gray((x + 1) * w / 9, gy) > gray(x * w / 9, gy)) '1' else '0')
              x += 1
            }
            y += 1
          }
          (id, sb.toString)
        }
      }.toDF("id", "simhash")
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

  // ---------------------------------------------------------------------
  // REAL video path: RIFF/AVI container (public arithmetic — RIFF chunk
  // grammar + the AVI main/stream headers) muxed and demuxed in-engine,
  // each frame a self-contained still decoded by javax.imageio. PNG
  // frames (fourcc MPNG, Motion-PNG) are lossless, so the decoded
  // per-frame pixel statistics equal the synthesis formula and the gate
  // oracle reproduces them arithmetically; MJPEG (fourcc MJPG) rides the
  // SAME mux/demux byte-exactly — the container hands back each frame's
  // payload untouched (spec-verified) — but JPEG's lossy round trip makes
  // its pixel sums codec-dependent, so the oracle-exact gate uses MPNG.
  // ---------------------------------------------------------------------

  case class VideoStats(id: Long, frame: Long, width: Long, height: Long,
      channel: Long, pix_sum: Long)
  case class VideoFrame(id: Long, frame_idx: Long, frame_bytes: Array[Byte])

  /** Synthetic clip length in frames: 3–6, id-derived. */
  def synthFrameCount(id: Long): Int = 3 + ((id % 4 + 4) % 4).toInt

  /** Frame f of video id reuses [[synthPixel]] with the id shifted by
    * f·1000003 — closed form, so a SQL oracle reproduces every frame's
    * decoded channel sums: v = ((id + f·1000003)·31 + x·7 + y·13 + c·101)
    * mod 256 over the video's [[synthDims]] grid.
    */
  private def synthVideoPixel(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
    synthPixel(id + f * 1000003L, x, y, c)

  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def writeFcc(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4); s.foreach(c => o.write(c.toInt & 0xff))
  }
  private def chunk(fcc: String, data: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    writeFcc(o, fcc); writeLe32(o, data.length.toLong); o.write(data)
    if (data.length % 2 == 1) o.write(0) // RIFF chunks are word-aligned
    o.toByteArray
  }
  private def list(listType: String, payload: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    writeFcc(o, "LIST"); writeLe32(o, (payload.length + 4).toLong)
    writeFcc(o, listType); o.write(payload)
    o.toByteArray
  }

  /** Mux pre-encoded still frames into a REAL AVI container: RIFF('AVI ')
    * { LIST(hdrl){ avih, LIST(strl){ strh, strf=BITMAPINFOHEADER } },
    * LIST(movi){ 00dc... }, idx1 }. One video stream, every frame a
    * keyframe (self-contained still — the Motion-JPEG/Motion-PNG model).
    * All fields little-endian per the RIFF spec; odd-length frame chunks
    * pad to word alignment.
    */
  def muxAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      handler: String = "MPNG", fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "muxAvi: need at least one frame")
    val maxFrame = frames.map(_.length).max.toLong
    val avih = {
      val o = new java.io.ByteArrayOutputStream()
      writeLe32(o, 1000000L / fps) // dwMicroSecPerFrame
      writeLe32(o, maxFrame * fps) // dwMaxBytesPerSec (upper bound)
      writeLe32(o, 0)              // dwPaddingGranularity
      writeLe32(o, 0x10)           // dwFlags: AVIF_HASINDEX
      writeLe32(o, frames.size.toLong) // dwTotalFrames
      writeLe32(o, 0)              // dwInitialFrames
      writeLe32(o, 1)              // dwStreams
      writeLe32(o, maxFrame)       // dwSuggestedBufferSize
      writeLe32(o, w.toLong)       // dwWidth
      writeLe32(o, h.toLong)       // dwHeight
      (0 until 4).foreach(_ => writeLe32(o, 0)) // dwReserved
      chunk("avih", o.toByteArray)
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream()
      writeFcc(o, "vids"); writeFcc(o, handler)
      writeLe32(o, 0); writeLe32(o, 0) // flags, priority+language
      writeLe32(o, 0)                  // initialFrames
      writeLe32(o, 1); writeLe32(o, fps.toLong) // scale, rate → rate/scale fps
      writeLe32(o, 0); writeLe32(o, frames.size.toLong) // start, length
      writeLe32(o, maxFrame)           // suggestedBufferSize
      writeLe32(o, 0xffffffffL)        // quality (default)
      writeLe32(o, 0)                  // sampleSize (varies per frame)
      writeLe32(o, 0); writeLe32(o, (h.toLong << 16) | w.toLong) // rcFrame
      chunk("strh", o.toByteArray)
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream()
      writeLe32(o, 40)          // biSize
      writeLe32(o, w.toLong); writeLe32(o, h.toLong)
      writeLe32(o, (24L << 16) | 1L) // biPlanes=1, biBitCount=24
      writeFcc(o, handler)      // biCompression = codec fourcc
      writeLe32(o, maxFrame)    // biSizeImage (upper bound, informative)
      writeLe32(o, 0); writeLe32(o, 0); writeLe32(o, 0); writeLe32(o, 0)
      chunk("strf", o.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.toArray.flatten)
    val idx1 = {
      val o = new java.io.ByteArrayOutputStream()
      var off = 4L // offsets are relative to the 'movi' fourcc
      frames.zip(moviChunks).foreach { case (f, ck) =>
        writeFcc(o, "00dc"); writeLe32(o, 0x10) // AVIIF_KEYFRAME
        writeLe32(o, off); writeLe32(o, f.length.toLong)
        off += ck.length
      }
      chunk("idx1", o.toByteArray)
    }
    val body = hdrl ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream()
    writeFcc(out, "RIFF"); writeLe32(out, (body.length + 4).toLong)
    writeFcc(out, "AVI "); out.write(body)
    out.toByteArray
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def fcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** Demux an AVI: walk the RIFF chunk tree WITHOUT trusting idx1 (the
    * index is advisory; the movi list is the data of record), return
    * (width, height, declaredFrames, frame payloads byte-identical to the
    * muxed chunks). Fails loudly on a malformed container.
    */
  def demuxAvi(bytes: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
    require(bytes.length >= 12 && fcc(bytes, 0) == "RIFF" &&
      fcc(bytes, 8) == "AVI ", "demuxAvi: not a RIFF/AVI payload")
    var w = -1; var h = -1; var declared = -1
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fcc(bytes, off)
        val size = le32(bytes, off + 4).toInt
        val dataOff = off + 8
        if (id == "LIST") {
          val lt = fcc(bytes, dataOff)
          if (lt == "hdrl" || lt == "movi" || lt == "strl")
            walk(dataOff + 4, dataOff + size)
        } else if (id == "avih") {
          declared = le32(bytes, dataOff + 16).toInt
          w = le32(bytes, dataOff + 32).toInt
          h = le32(bytes, dataOff + 36).toInt
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size)
        }
        off = dataOff + size + (size % 2) // word alignment
      }
    }
    walk(12, bytes.length)
    require(w > 0 && h > 0 && declared >= 0,
      "demuxAvi: missing avih main header")
    require(frames.size == declared,
      s"demuxAvi: header declares $declared frames, movi carries ${frames.size}")
    (w, h, declared, frames.toSeq)
  }

  /** One frame of the synthetic video, encoded by the requested still
    * codec ("png" → lossless, the oracle path; "jpg" → real MJPEG).
    */
  private def encodeFrame(id: Long, f: Int, w: Int, h: Int,
      still: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (synthVideoPixel(id, f, x, y, 0) << 16) |
            (synthVideoPixel(id, f, x, y, 1) << 8) |
            synthVideoPixel(id, f, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, still, bos)
    bos.toByteArray
  }

  /** A REAL AVI payload for an id: [[synthFrameCount]] frames of
    * [[synthDims]] stills following [[synthVideoPixel]], muxed by
    * [[muxAvi]]. `still = "png"` (default) is the lossless/oracle path
    * (fourcc MPNG); `still = "jpg"` produces true Motion-JPEG.
    */
  def syntheticAvi(id: Long, still: String = "png"): Array[Byte] = {
    val (w, h) = synthDims(id)
    val frames = (0 until synthFrameCount(id)).map(encodeFrame(id, _, w, h, still))
    muxAvi(frames, w, h, if (still == "png") "MPNG" else "MJPG")
  }

  /** Media table of real AVI payloads, one per id — generated in executors
    * (narrow map over the id frame), mirroring [[syntheticImageTable]].
    */
  def syntheticVideoTable(df: DataFrame, idCol: String,
      still: String = "png"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { ids =>
        ids.map(id => (id, syntheticAvi(id, still), "video/avi"))
      }
      .toDF("id", "media", "format")
  }

  /** REAL video decode over the opaque binary column: demux the AVI
    * container, decode every `stride`-th frame (frame SAMPLING — the
    * standard pre-processing step: training pipelines never decode all
    * frames) with `javax.imageio`, and emit exact per-channel integer
    * pixel sums — (id, frame, width, height, channel, pix_sum).
    * mapPartitions keeps the batched-codec shape; a malformed container, a
    * frame/header count mismatch, or a frame whose decoded dimensions
    * disagree with the container header fails loudly with the offending
    * id. At 100 TB this is a narrow map over the media column — no
    * shuffle, decoder state amortized per partition.
    */
  def decodeVideoStats(media: DataFrame, stride: Int = 1): Dataset[VideoStats] = {
    require(stride >= 1, s"decodeVideoStats: stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (w, h, _, frames) = demuxAvi(bytes)
          frames.zipWithIndex
            .filter(_._2 % stride == 0)
            .flatMap { case (fb, f) =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(fb))
              require(img != null,
                s"decodeVideoStats: undecodable frame $f of id=$id")
              require(img.getWidth == w && img.getHeight == h,
                s"decodeVideoStats: id=$id frame $f is ${img.getWidth}x" +
                  s"${img.getHeight}, container says ${w}x$h")
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
              (0 until 3).map(c =>
                VideoStats(id, f.toLong, w.toLong, h.toLong, c.toLong, sums(c)))
            }
        }
      }
  }

  /** Frame EXTRACTION without decode — the transcode/shipping shape: every
    * `stride`-th frame's still payload, byte-identical to what was muxed
    * (the container adds nothing around the codec payload).
    */
  def sampleVideoFrames(media: DataFrame, stride: Int = 1): Dataset[VideoFrame] = {
    require(stride >= 1, s"sampleVideoFrames: stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val (_, _, _, frames) = demuxAvi(bytes)
          frames.zipWithIndex.collect {
            case (fb, f) if f % stride == 0 => VideoFrame(id, f.toLong, fb)
          }
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, and a decode/feature-extract stage shaped for
  * distributed execution (SURVEY §2.9 design op).
  *
  * The Spark-side contract is real and tested (schema, partition-preserving
  * mapPartitions, batch shape). [[MediaDecoder.decode]] is REAL for the
  * codec-free P6/PPM and PCM WAV formats (hand-rolled plain-JVM parsers)
  * and for JPEG/PNG/BMP/GIF via the JDK's own javax.imageio (java.desktop
  * ships the codecs; headless-safe; zero added dependencies); formats
  * whose codecs genuinely are absent (video, compressed audio) fail
  * loudly at the same seam — swap in a codec (JNI/FFmpeg) without
  * touching the plan shape. [[MediaDecoder.fakeDecode]] remains the
  * deterministic stand-in for the text-bytes demo pipeline.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
    header: Array[Byte], features: Array[Float])
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  final case class ResizedFeatures(doc_id: Long, features: Array[Float])

  /** The decode seam. REAL for the codec-free P6/PPM raster format
    * (netpbm: ASCII header + raw RGB bytes — decodable in plain JVM, no
    * image library required), for 16-bit PCM WAV, and for the JDK's own
    * javax.imageio rasters (JPEG/PNG/BMP/GIF); formats whose codecs are
    * genuinely absent (video, compressed audio) fail loudly instead of
    * silently faking, keeping the seam visible. [[fakeDecode]] remains
    * the deterministic stand-in for the text-bytes demo pipeline. */
  object MediaDecoder {

    final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])

    /** P6 parser: `P6 <ws> width <ws> height <ws> 255 <one ws> raster`,
      * with `#` comments allowed in the header per the netpbm spec. */
    def decodePpm(bytes: Array[Byte]): PpmImage = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        "not a P6 PPM")
      var pos = 2
      def skipWsAndComments(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val b = bytes(pos)
          if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
          else if (b == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else go = false
        }
      }
      def readInt(): Int = {
        skipWsAndComments()
        var v = 0
        var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        }
        require(any, "malformed PPM header")
        v
      }
      val w = readInt()
      val h = readInt()
      val maxv = readInt()
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(maxv == 255, "only 8-bit-per-channel PPM supported")
      pos += 1 // exactly one whitespace byte separates maxval from raster
      val need = w * h * 3
      require(bytes.length >= pos + need, "truncated raster")
      PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
    }

    /** Nearest-neighbor resize over real pixels — the thumbnail stage. */
    def resizePpm(img: PpmImage, outW: Int, outH: Int): PpmImage = {
      require(outW > 0 && outH > 0)
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * img.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * img.width / outW).toInt
          val s = (sy * img.width + sx) * 3
          val d = (y * outW + x) * 3
          out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
          x += 1
        }
        y += 1
      }
      PpmImage(outW, outH, out)
    }

    /** Features from decoded pixels: [w, h, meanR, meanG, meanB, grayMean]
      * — integer accumulation with one divide at the end, so the result
      * is partitioning-stable. */
    def ppmFeatures(img: PpmImage): Array[Float] = {
      val n = img.width.toLong * img.height
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < n) {
        r += img.rgb(3 * i) & 0xff
        g += img.rgb(3 * i + 1) & 0xff
        b += img.rgb(3 * i + 2) & 0xff
        i += 1
      }
      Array(img.width.toFloat, img.height.toFloat,
        r.toFloat / n, g.toFloat / n, b.toFloat / n,
        (r + g + b).toFloat / (3L * n))
    }

    /** JDK-native compressed-raster decode: `javax.imageio` ships in the
      * JDK's java.desktop module (headless-safe — no display needed), so
      * JPEG/PNG/BMP/GIF decode with ZERO added dependencies. Decoded
      * pixels land in the same [[PpmImage]] shape as the P6 path, so
      * resize and feature extraction are codec-agnostic downstream; a
      * byte stream no installed reader claims fails loudly (null from
      * ImageIO.read), keeping the seam's no-silent-fakes rule. The JDK
      * decoder is deterministic for given bytes, so features stay
      * partitioning-stable like the hand-rolled parsers. */
    def decodeImageIo(bytes: Array[Byte]): PpmImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "ImageIO found no decoder for these bytes")
      val w = img.getWidth; val h = img.getHeight
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y) // sRGB regardless of the file's raster model
          val d = (y * w + x) * 3
          rgb(d) = ((p >> 16) & 0xff).toByte
          rgb(d + 1) = ((p >> 8) & 0xff).toByte
          rgb(d + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      PpmImage(w, h, rgb)
    }

    final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

    /** RIFF/WAVE parser for 16-bit PCM — like P6, a codec-free container
      * decodable in plain JVM: walk the chunk list, read `fmt ` (must be
      * PCM, 16-bit), then the `data` payload as little-endian shorts.
      * Unknown chunks are skipped by their declared size (LIST/INFO
      * metadata is common in real files). */
    def decodeWav(bytes: Array[Byte]): WavAudio = {
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
      require(bytes.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        "not a RIFF/WAVE file")
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0
      var samples: Array[Short] = null
      while (pos + 8 <= bytes.length && (samples == null || sampleRate == 0)) {
        val id = ascii(pos, 4)
        val sz = le32(pos + 4)
        require(sz >= 0 && pos + 8 + sz <= bytes.length, s"truncated '$id' chunk")
        id match {
          case "fmt " =>
            require(sz >= 16, "short fmt chunk")
            require(le16(pos + 8) == 1, "only PCM (format tag 1) supported")
            channels = le16(pos + 10)
            sampleRate = le32(pos + 12)
            bits = le16(pos + 22)
            require(bits == 16, "only 16-bit PCM supported")
          case "data" =>
            val n = sz / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = le16(pos + 8 + 2 * i).toShort; i += 1 }
            samples = out
          case _ => () // skip LIST/INFO/fact/...
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(sampleRate > 0 && channels > 0, "missing fmt chunk")
      require(samples != null, "missing data chunk")
      WavAudio(sampleRate, channels, samples)
    }

    /** Features from decoded samples: [sampleRate, channels, nSamples,
      * durationMs, meanAbs, rms] — exact integer accumulation (|s| and s²
      * sums), float only at the final divides/sqrt, so the result is
      * partitioning-stable like [[ppmFeatures]]. */
    def wavFeatures(a: WavAudio): Array[Float] = {
      val n = a.samples.length
      var sumAbs = 0L; var sumSq = 0L
      var i = 0
      while (i < n) {
        val s = a.samples(i).toLong
        sumAbs += math.abs(s); sumSq += s * s
        i += 1
      }
      val frames = n / math.max(a.channels, 1)
      Array(a.sampleRate.toFloat, a.channels.toFloat, n.toFloat,
        (frames * 1000L).toFloat / a.sampleRate,
        if (n == 0) 0f else sumAbs.toFloat / n,
        if (n == 0) 0f else math.sqrt(sumSq.toDouble / n).toFloat)
    }

    /** Format-dispatched decode: real for the codec-free formats (P6
      * raster, PCM WAV) AND the JDK-decodable compressed rasters
      * (JPEG/PNG/BMP/GIF via javax.imageio); loud failure for formats
      * whose codecs genuinely are absent (video, compressed audio). */
    def decode(media: Array[Byte], format: String): Array[Float] = format match {
      case "ppm" => ppmFeatures(decodePpm(media))
      case "jpeg" | "jpg" | "png" | "bmp" | "gif" => ppmFeatures(decodeImageIo(media))
      case "wav" => wavFeatures(decodeWav(media))
      case other => throw new NotImplementedError(
        s"no '$other' codec in this container (video/compressed audio need native libs); " +
          "ppm, jpeg, png, bmp, gif, and wav decode natively")
    }

    /** Decode to PIXELS (the near-dup path needs the raster, not the
      * summary features) — same codec dispatch and loud-failure seam as
      * [[decode]]. */
    def decodeImage(media: Array[Byte], format: String): PpmImage = format match {
      case "ppm" => decodePpm(media)
      case "jpeg" | "jpg" | "png" | "bmp" | "gif" => decodeImageIo(media)
      case other => throw new NotImplementedError(
        s"no '$other' image codec in this container; ppm, jpeg, png, bmp, gif decode natively")
    }

    /** 9×8 luma grid of an image: nearest-neighbor thumbnail through the
      * real resize path, then integer BT.601 luma (299r + 587g + 114b —
      * NO division, so the grid is exact integer arithmetic and
      * partitioning-stable; one "gray level" ≈ 1000 units). */
    def lumaGrid9x8(img: PpmImage): Array[Int] = {
      val t = resizePpm(img, 9, 8)
      val out = new Array[Int](72)
      var i = 0
      while (i < 72) {
        out(i) = 299 * (t.rgb(3 * i) & 0xff) +
          587 * (t.rgb(3 * i + 1) & 0xff) + 114 * (t.rgb(3 * i + 2) & 0xff)
        i += 1
      }
      out
    }

    /** 64-bit dHash over a 9×8 luma grid: bit(y,x) = luma(x+1,y) >
      * luma(x,y) — the sign of the horizontal gradient, the classic
      * perceptual hash that survives re-encoding, scaling, and small
      * brightness shifts (the gradient comparison cancels global
      * offsets). Pure integer pipeline end-to-end: the same pixels
      * always produce the same 64 bits, on any partitioning. */
    def dHash64(grid: Array[Int]): Long = {
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (grid(y * 9 + x + 1) > grid(y * 9 + x)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

    /** Deterministic fake: 8 features from byte statistics. Stable across
      * partitionings and engines (pure integer math until the final cast). */
    def fakeDecode(media: Array[Byte]): Array[Float] = {
      val n = media.length
      val feats = new Array[Float](8)
      var i = 0
      while (i < n) {
        feats(i % 8) += (media(i) & 0xff).toFloat
        i += 1
      }
      var j = 0
      while (j < 8) { feats(j) = feats(j) / math.max(n, 1); j += 1 }
      feats
    }
  }

  /** Build a media table from documents (text bytes stand in for blobs). */
  def mediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text").cast("binary").as("media"), lit("utf8").as("format"))
      .as[MediaRow]
  }

  /** Frame sampling: every `stride`-th fixed-size window of the blob — the
    * video-frame-extraction shape. One input row fans out to ⌈n/stride⌉
    * frame rows but stays a NARROW transform (flatMap, no shuffle): frame
    * parallelism comes from the upstream partitioning of the media table,
    * which is how a 100 TB video corpus keeps decode embarrassingly
    * parallel. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(frameSize > 0 && stride > 0)
    media.flatMap { r =>
      val n = r.media.length
      (0 until n by stride).iterator.map { off =>
        MediaFrame(r.doc_id, off / stride,
          java.util.Arrays.copyOfRange(r.media, off, math.min(off + frameSize, n)))
      }
    }
  }

  /** Resize: deterministic average-pool of a feature vector down to k
    * dims — the image-thumbnail / embedding-downsample stand-in (pure
    * float math over equal inputs ⇒ stable across partitionings). */
  def resizeFeatures(feats: Dataset[MediaFeatures], k: Int): Dataset[ResizedFeatures] = {
    val spark = feats.sparkSession
    import spark.implicits._
    require(k > 0)
    feats.map { f =>
      val n = f.features.length
      val out = new Array[Float](k)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val b = (i.toLong * k / math.max(n, 1)).toInt.min(k - 1)
        out(b) += f.features(i)
        counts(b) += 1
        i += 1
      }
      var j = 0
      while (j < k) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      ResizedFeatures(f.doc_id, out)
    }
  }

  /** Decode/feature-extract as a partition-preserving narrow transform: no
    * shuffle, codec state initialized once per partition (the expensive
    * part with a real codec), rows streamed through. This is the Scala
    * analogue of a pandas-batched UDF stage. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec handle)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.format, r.media.length,
          r.media.take(4), MediaDecoder.fakeDecode(r.media))
      }
    }
  }

  /** IMAGE NEAR-DUP DEDUP (r14 verdict #3 — the pixel tier of the dedup
    * stack, beside text MinHash/SimHash and embedding-cosine): decode →
    * 9×8 luma thumbnail → 64-bit dHash, all exact integer arithmetic,
    * as ONE narrow mapPartitions pass (decode parallelism rides the
    * media table's partitioning — the 100 TB shape); candidates come
    * from the SAME 16-bit-chunk pigeonhole banding SimHash dedup uses
    * (recall-complete for hamming ≤ 3, never all-pairs), and each
    * candidate pair is CONFIRMED against the actual luma grids (total
    * abs-diff budget — re-encodes land at 0, unrelated images that
    * collide in a band are rejected by pixels, not by hash luck).
    * Returns (da, db, hamming, px_diff). */
  def imageNearDup(media: Dataset[MediaRow], maxHamming: Int = 3,
      maxLumaDiff: Long = 144000L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.mapPartitions { rows =>
      rows.map { r =>
        val grid = MediaDecoder.lumaGrid9x8(
          MediaDecoder.decodeImage(r.media, r.format))
        (r.doc_id, MediaDecoder.dHash64(grid), grid)
      }
    }.toDF("doc_id", "dhash", "luma")
      // the chunk self-join consumes the decode on both sides; without
      // the cache the whole decode pipeline runs twice (the SimHash
      // signature-build precedent)
      .persist()
    val pairs = SimHashDedup.pairsFromSignatures(hashed.select(
      col("doc_id"), col("dhash")), "doc_id", "dhash", maxHamming)
    val la = hashed.select(col("doc_id").as("da"), col("luma").as("__la"))
    val lb = hashed.select(col("doc_id").as("db"), col("luma").as("__lb"))
    pairs.join(la, "da").join(lb, "db")
      .withColumn("px_diff", expr(
        "aggregate(zip_with(__la, __lb, (a, b) -> abs(a - b)), 0L, (acc, x) -> acc + x)"))
      .filter(col("px_diff") <= maxLumaDiff)
      .select(col("da"), col("db"), col("hamming"),
        col("px_diff").cast("long").as("px_diff"))
  }

  /** Deterministic synthetic P6 image: every pixel is an integer hash of
    * (seed, index) — two images share pixels iff they share `seed`, and
    * distinct seeds give effectively independent 64-bit dHashes (the
    * planted-twin oracle's zero-unplanned-pairs argument). `comment`
    * injects a netpbm header comment so a twin's BYTES differ while its
    * pixels are identical — the re-encode shape. */
  def syntheticPpm(seed: Long, w: Int, h: Int, comment: Boolean): Array[Byte] = {
    val header = (s"P6\n${if (comment) "# twin re-encode\n" else ""}$w $h\n255\n")
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    val n = w * h * 3
    while (i < n) {
      // splitmix64-style integer mix of (seed, i) — deterministic on
      // any JVM, no RNG state
      var z = seed * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(header.length + i) = ((z >>> 33) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Same stage, REAL format-dispatched decode ([[MediaDecoder.decode]]):
    * ppm rows produce actual pixel statistics; rows of a codec-less
    * format fail the task loudly. MultimodalSpec drives generated P6
    * images through this distributed path and checks the features against
    * a driver-side reference. */
  def extractRealFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.format, r.media.length,
          r.media.take(4), MediaDecoder.decode(r.media, r.format))
      }
    }
  }
}

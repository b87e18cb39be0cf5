package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The decode stage is stubbed (no codecs in this container) but the
  * Spark-side plumbing — schema, narrow partition-preserving transform,
  * determinism under repartitioning — is real and tested. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("media feature extraction: schema, byte counts, determinism") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.columns.toSeq ==
      Seq("doc_id", "format", "n_bytes", "header", "features"))
    val rows = feats.collect()
    assert(rows.nonEmpty && rows.forall(_.features.length == 8))
    // ascii corpus: byte length == char length
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.n_bytes == chars(r.doc_id)))
    // narrow transform must be partitioning-invariant
    val again = Multimodal.extractFeatures(
      Multimodal.mediaTable(docs.repartition(7))).collect()
    val key = (m: Multimodal.MediaFeatures) => (m.doc_id, m.features.toSeq)
    assert(rows.map(key).sortBy(_._1).toSeq == again.map(key).sortBy(_._1).toSeq)
  }

  test("frame sampling: count formula, sizes, narrow determinism") {
    val docs = Tables.documents(spark, sf)
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(docs), frameSize = 16, stride = 32)
    val byDoc = frames.collect().groupBy(_.doc_id)
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, fs) =>
      val n = chars(id)
      assert(fs.length == ((n + 31) / 32), s"doc $id frame count")
      assert(fs.forall(_.frame.length <= 16))
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }

  test("resize: average-pool to k dims, exact on a known vector") {
    import spark.implicits._
    val one = Seq(Multimodal.MediaFeatures(1L, "utf8", 8, Array[Byte](0),
      Array(2f, 4f, 6f, 8f, 1f, 3f, 5f, 7f))).toDS()
    val out = Multimodal.resizeFeatures(one, 4).collect().head
    assert(out.features.toSeq == Seq(3f, 7f, 2f, 6f)) // pairwise means
    val docs = Tables.documents(spark, sf)
    val all = Multimodal.resizeFeatures(
      Multimodal.extractFeatures(Multimodal.mediaTable(docs)), 4).collect()
    assert(all.nonEmpty && all.forall(_.features.length == 4))
  }

  /** Deterministic P6 image: pixel (x,y) channel c = (x*7 + y*13 + id + c) mod 256. */
  private def ppmBytes(id: Long, w: Int, h: Int, comment: Boolean = false): Array[Byte] = {
    val header = if (comment) s"P6\n# doc $id\n$w $h\n255\n" else s"P6\n$w $h\n255\n"
    val raster = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      raster((y * w + x) * 3 + c) = ((x * 7 + y * 13 + id + c) % 256).toByte
    header.getBytes("US-ASCII") ++ raster
  }

  test("real P6 decode: distributed features match a driver-side reference") {
    import spark.implicits._
    val imgs = (0L until 40L).map(id =>
      Multimodal.MediaRow(id, ppmBytes(id, 8 + (id % 5).toInt, 6 + (id % 3).toInt,
        comment = id % 4 == 0), "ppm"))
    val got = Multimodal.extractRealFeatures(imgs.toDS().repartition(5))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    for (r <- imgs) {
      val img = Multimodal.MediaDecoder.decodePpm(r.media)
      val n = img.width * img.height
      val sums = Array(0L, 0L, 0L)
      for (i <- 0 until n; c <- 0 until 3) sums(c) += img.rgb(3 * i + c) & 0xff
      val expect = Seq(img.width.toFloat, img.height.toFloat,
        sums(0).toFloat / n, sums(1).toFloat / n, sums(2).toFloat / n,
        sums.sum.toFloat / (3L * n))
      assert(got(r.doc_id) == expect, s"doc ${r.doc_id}")
    }
  }

  test("P6 resize: nearest-neighbor picks exact source pixels") {
    val img = Multimodal.MediaDecoder.decodePpm(ppmBytes(3L, 4, 4))
    val small = Multimodal.MediaDecoder.resizePpm(img, 2, 2)
    assert(small.width == 2 && small.height == 2 && small.rgb.length == 12)
    // output (x,y) samples source (x*4/2, y*4/2) = (2x, 2y)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3) {
      val s = ((2 * y) * 4 + 2 * x) * 3 + c
      assert(small.rgb((y * 2 + x) * 3 + c) == img.rgb(s), s"px ($x,$y,$c)")
    }
    // upscale is total too (no divide-by-zero / index drift)
    val big = Multimodal.MediaDecoder.resizePpm(img, 7, 5)
    assert(big.rgb.length == 7 * 5 * 3)
  }

  private def wavBytes(id: Long, nFrames: Int, channels: Int = 1,
      rate: Int = 8000, withListChunk: Boolean = false): Array[Byte] = {
    val n = nFrames * channels
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (((i * 31 + id * 17) % 4001) - 2000).toShort // deterministic, signed
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val list = if (withListChunk)
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "INFO".getBytes("US-ASCII")
    else Array.emptyByteArray
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ list ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("real WAV decode: distributed features match a driver-side reference") {
    import spark.implicits._
    val clips = (0L until 30L).map(id =>
      Multimodal.MediaRow(id, wavBytes(id, 50 + (id % 7).toInt,
        channels = 1 + (id % 2).toInt, withListChunk = id % 3 == 0), "wav"))
    val got = Multimodal.extractRealFeatures(clips.toDS().repartition(5))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    for (r <- clips) {
      val a = Multimodal.MediaDecoder.decodeWav(r.media)
      val n = a.samples.length
      val sumAbs = a.samples.map(s => math.abs(s.toLong)).sum
      val sumSq = a.samples.map(s => s.toLong * s.toLong).sum
      val expect = Seq(a.sampleRate.toFloat, a.channels.toFloat, n.toFloat,
        ((n / a.channels) * 1000L).toFloat / a.sampleRate,
        sumAbs.toFloat / n, math.sqrt(sumSq.toDouble / n).toFloat)
      assert(got(r.doc_id) == expect, s"clip ${r.doc_id}")
    }
  }

  test("WAV parser rejects malformed input") {
    intercept[IllegalArgumentException] { // not RIFF
      Multimodal.MediaDecoder.decodeWav("JUNK".getBytes ++ new Array[Byte](20))
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      val full = wavBytes(1L, 10)
      Multimodal.MediaDecoder.decodeWav(full.take(full.length - 5))
    }
    intercept[IllegalArgumentException] { // non-PCM format tag
      val b = wavBytes(1L, 4)
      b(20) = 3 // fmt tag offset in this fixed layout: IEEE float
      Multimodal.MediaDecoder.decodeWav(b)
    }
  }

  test("P6 parser rejects malformed input; codec-less formats fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.decodePpm("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.MediaDecoder.decodePpm("P6\n4 4\n255\n".getBytes ++ new Array[Byte](5))
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.MediaDecoder.decodePpm("P6\n1 1\n65535\n".getBytes ++ new Array[Byte](6))
    }
    intercept[NotImplementedError] { // video codecs really are absent
      Multimodal.MediaDecoder.decode(Array[Byte](1, 2), "h264")
    }
    intercept[IllegalArgumentException] { // jpeg dispatches to ImageIO, which must reject garbage
      Multimodal.MediaDecoder.decode(Array[Byte](1, 2, 3, 4), "jpeg")
    }
  }

  /** Known-pattern image encoded by the JDK's own writer — PNG is
    * lossless, so decoded pixels must equal the pattern exactly. */
  private def imageBytes(id: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 7 + id.toInt) % 256) << 16) |
        (((y * 13 + id.toInt) % 256) << 8) | ((x + y) % 256))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("real PNG decode via JDK ImageIO: distributed features equal exact pattern means") {
    import spark.implicits._
    val imgs = (0L until 30L).map(id =>
      Multimodal.MediaRow(id, imageBytes(id, 8 + (id % 5).toInt, 6 + (id % 3).toInt, "png"), "png"))
    val got = Multimodal.extractRealFeatures(imgs.toDS().repartition(4))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    for (r <- imgs) {
      val id = r.doc_id
      val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
      val sums = Array(0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sums(0) += (x * 7 + id.toInt) % 256
        sums(1) += (y * 13 + id.toInt) % 256
        sums(2) += (x + y) % 256
      }
      val n = w * h
      val expect = Seq(w.toFloat, h.toFloat,
        sums(0).toFloat / n, sums(1).toFloat / n, sums(2).toFloat / n,
        sums.sum.toFloat / (3L * n))
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("real JPEG decode via JDK ImageIO: distributed features match a driver-side reference") {
    import spark.implicits._
    // JPEG is lossy: the reference is the SAME decoder on the same bytes,
    // which is also the distributed-vs-driver determinism pin
    val imgs = (0L until 20L).map(id =>
      Multimodal.MediaRow(id, imageBytes(id, 16, 12, "jpeg"), "jpeg"))
    val got = Multimodal.extractRealFeatures(imgs.toDS().repartition(4))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    for (r <- imgs) {
      val expect = Multimodal.MediaDecoder
        .ppmFeatures(Multimodal.MediaDecoder.decodeImageIo(r.media)).toSeq
      assert(got(r.doc_id) == expect, s"doc ${r.doc_id}")
      assert(expect(0) == 16f && expect(1) == 12f)
    }
  }

  test("image near-dup: re-encode and 1-px shift pair through the distributed path") {
    import spark.implicits._
    // a SMOOTH image (constant positive horizontal gradient) so a 1-px
    // crop shift perturbs the 9×8 luma thumbnail minimally — the shape
    // dHash is built to survive; noise images (below) must NOT pair
    def smoothPpm(w: Int, h: Int, xOff: Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      for (y <- 0 until h; x <- 0 until w) {
        // gradient 1/px: a 1-px shift moves every luma cell by exactly
        // one gray level (72 × 1000 total — inside the confirm budget)
        val v = ((x + xOff + y) % 256).toByte
        val d = header.length + (y * w + x) * 3
        out(d) = v; out(d + 1) = v; out(d + 2) = v
      }
      out
    }
    val rows = Seq(
      Multimodal.MediaRow(0L, Multimodal.syntheticPpm(0L, 32, 24, comment = false), "ppm"),
      // re-encode: same pixels, different bytes (header comment)
      Multimodal.MediaRow(1L, Multimodal.syntheticPpm(0L, 32, 24, comment = true), "ppm"),
      // 1-px shift of a smooth gradient
      Multimodal.MediaRow(2L, smoothPpm(32, 24, 0), "ppm"),
      Multimodal.MediaRow(3L, smoothPpm(32, 24, 1), "ppm"),
      // unrelated noise — must never pair with anything
      Multimodal.MediaRow(4L, Multimodal.syntheticPpm(99L, 32, 24, comment = false), "ppm"))
    val got = Multimodal.imageNearDup(rows.toDS().repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((0L, 1L), (2L, 3L)),
      s"re-encode and shifted pairs only, got $got")
    val reenc = got.find(p => p._1 == 0L).get
    assert(reenc._3 == 0L && reenc._4 == 0L,
      s"a re-encode is pixel-identical: hamming 0, px_diff 0, got $reenc")
    val shifted = got.find(p => p._1 == 2L).get
    assert(shifted._3 <= 3L,
      s"a 1-px shift of a smooth image stays within the hamming budget: $shifted")
    // distributed dHash == the driver-side reference, any partitioning
    val refHash = Multimodal.MediaDecoder.dHash64(
      Multimodal.MediaDecoder.lumaGrid9x8(
        Multimodal.MediaDecoder.decodePpm(rows.head.media)))
    val twinHash = Multimodal.MediaDecoder.dHash64(
      Multimodal.MediaDecoder.lumaGrid9x8(
        Multimodal.MediaDecoder.decodePpm(rows(1).media)))
    assert(refHash == twinHash, "identical pixels must hash identically")
  }

  test("ImageIO-decoded pixels feed the shared resize path") {
    val img = Multimodal.MediaDecoder.decodeImageIo(imageBytes(5L, 8, 8, "png"))
    val small = Multimodal.MediaDecoder.resizePpm(img, 4, 4)
    assert(small.width == 4 && small.height == 4 && small.rgb.length == 48)
    // nearest-neighbor: output (x,y) samples source (2x, 2y) — PNG is
    // lossless so the sampled pixel is the constructed pattern value
    for (y <- 0 until 4; x <- 0 until 4) {
      val d = (y * 4 + x) * 3
      assert((small.rgb(d) & 0xff) == (2 * x * 7 + 5) % 256)
      assert((small.rgb(d + 1) & 0xff) == (2 * y * 13 + 5) % 256)
      assert((small.rgb(d + 2) & 0xff) == (2 * x + 2 * y) % 256)
    }
  }
}

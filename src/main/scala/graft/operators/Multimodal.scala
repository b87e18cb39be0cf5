package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, and a decode/feature-extract stage shaped for
  * distributed execution (SURVEY §2.9 design op).
  *
  * The Spark-side contract is real and tested (schema, partition-preserving
  * mapPartitions, batch shape); the actual codec is STUBBED —
  * image/audio libraries are not in this container — behind
  * [[MediaDecoder.decode]], which ships a deterministic fake so the
  * pipeline is end-to-end runnable. Swap the fake for a real decoder
  * (JNI/FFmpeg/ImageIO) without touching the plan shape.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
    header: Array[Byte], features: Array[Float])
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  final case class ResizedFeatures(doc_id: Long, features: Array[Float])

  /** The decode seam. Real implementation intentionally absent (???);
    * [[fakeDecode]] is the deterministic stand-in used by the pipeline. */
  object MediaDecoder {
    /** Real codec hook — NOT implemented in this container. */
    def decode(media: Array[Byte], format: String): Array[Float] = ???

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
}

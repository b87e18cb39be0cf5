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

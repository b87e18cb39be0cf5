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

  test("real decoder seam is explicitly unimplemented") {
    intercept[NotImplementedError] {
      Multimodal.MediaDecoder.decode(Array[Byte](1, 2), "jpeg")
    }
  }
}

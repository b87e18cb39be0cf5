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

  test("real decoder seam is explicitly unimplemented") {
    intercept[NotImplementedError] {
      Multimodal.MediaDecoder.decode(Array[Byte](1, 2), "jpeg")
    }
  }
}

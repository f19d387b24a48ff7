package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mapPartitions decode pass agrees with the relational metadata") {
    val decoded = Multimodal.decodeAll(spark, sfDir).collect()
      .map(m => m.docId -> m).toMap
    val rel = Multimodal.blobMeta(spark, sfDir).collect()
    assert(rel.nonEmpty)
    rel.foreach { r =>
      val m = decoded(r.getLong(0))
      assert(m.nBytes == r.getLong(1))
      assert(m.contentHash == r.getString(2))
      assert(m.width == r.getInt(3))
      assert(m.height == r.getInt(4))
      assert(m.channels == r.getInt(5))
    }
  }

  test("decode stub is deterministic and dimension-bounded") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val a = Multimodal.decodeStub(1L, bytes)
    val b = Multimodal.decodeStub(1L, bytes)
    assert(a == b)
    assert(a.width >= 1 && a.width <= 640)
    assert(a.height >= 1 && a.height <= 480)
    assert(a.channels >= 1 && a.channels <= 3)
  }

  test("frame sampling fans out deterministically; features are bounded") {
    import SparkTestSession._
    val n = 4
    val frames = graft.multimodal.Multimodal
      .sampleFrames(spark, sfDir, n).collect()
    val perDoc = frames.groupBy(_.docId).view.mapValues(_.length).toMap
    assert(perDoc.values.forall(_ == n), "every doc yields n frames")
    assert(frames.forall(_.frameBytes.length == 16), "stub frame = md5")
    // deterministic: a second run produces identical bytes
    val again = graft.multimodal.Multimodal
      .sampleFrames(spark, sfDir, n).collect()
      .map(f => (f.docId, f.frameIdx) -> f.frameBytes.toSeq).toMap
    assert(frames.forall(f =>
      again((f.docId, f.frameIdx)) == f.frameBytes.toSeq))
    val feats = graft.multimodal.Multimodal.extractFeatures(
      graft.multimodal.Multimodal.sampleFrames(spark, sfDir, n))
    val rows = feats.collect()
    assert(rows.length == frames.length)
    rows.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length == graft.multimodal.Multimodal.FeatureDim)
      assert(v.forall(x => x >= 0.0f && x < 1.0f))
    }
  }

  test("frame features feed the embedding near-dup path (cross-modal)") {
    import SparkTestSession._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.multimodal.Multimodal
    def md5(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    // identical frame bytes → identical features → cosine exactly 1;
    // md5 is fixed, so the whole test is deterministic
    val frames = Seq(
      Multimodal.Frame(1L, 0, md5("same-content")),
      Multimodal.Frame(2L, 0, md5("same-content")),
      Multimodal.Frame(3L, 0, md5("other-content"))).toDS()
    val feats = Multimodal.extractFeatures(frames)
      .select((col("doc_id") * 100 + col("frame_idx")).as("vec_id"),
        expr("concat(transform(features, x -> CAST(x AS DOUBLE)), " +
          "array_repeat(0D, 56))").as("vd")) // pad to the embedding dim
    val pairs = graft.mining.VectorSimilarity
      .nearDupPairsBucketedOn(feats, 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 200L)),
      s"only the identical frames pair at cosine ≥ 0.999: $pairs")
  }

  test("resize bounds every frame to w*h bytes, deterministically") {
    import SparkTestSession._
    val M = graft.multimodal.Multimodal
    val (w, h) = (6, 5)
    val resized = M.resizeFrames(M.sampleFrames(spark, sfDir, 2), w, h)
      .collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.frameBytes.length == w * h),
      "every resized frame is exactly w*h bytes")
    val again = M.resizeFrames(M.sampleFrames(spark, sfDir, 2), w, h)
      .collect().map(f => (f.docId, f.frameIdx) -> f.frameBytes.toSeq).toMap
    assert(resized.forall(f =>
      again((f.docId, f.frameIdx)) == f.frameBytes.toSeq))
    // resized frames feed the same downstream feature extractor
    val feats = M.extractFeatures(
      M.resizeFrames(M.sampleFrames(spark, sfDir, 2), w, h)).collect()
    assert(feats.length == resized.length)
  }
}

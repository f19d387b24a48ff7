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
}

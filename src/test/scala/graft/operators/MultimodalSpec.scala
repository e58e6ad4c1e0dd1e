package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

class MultimodalSpec extends AnyFunSuite {

  test("media metadata is deterministic, typed, and covers every doc") {
    val rows = Multimodal.mediaMeta(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getBoolean(6))) // all payloads "decode"
    val types = rows.map(_.getString(1)).toSet
    assert(types == Set("image", "audio", "video"))
    // header-derived dims in the stub's documented ranges
    rows.foreach { r =>
      assert(r.getInt(3) >= 160 && r.getInt(3) < 288)
      assert(r.getInt(4) >= 90 && r.getInt(4) < 218)
    }
    // images have no duration; audio/video do
    rows.foreach { r =>
      if (r.getString(1) == "image") assert(r.getLong(5) == 0L)
      else assert(r.getLong(5) > 0L)
    }
  }

  test("frame sampling fans out video rows by stride and is batch-stable") {
    val frames = Multimodal.frameSample(spark, sfDir, stride = 2).collect()
    assert(frames.nonEmpty)
    // only videos; frame indices follow the stride
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.values.foreach { fs =>
      val idxs = fs.map(_.getInt(1)).sorted.toSeq
      assert(idxs == idxs.indices.map(_ * 2), s"stride-2 indices, got $idxs")
    }
    // stability: running again yields identical rows (no partition-
    // dependent state in the codec path)
    val again = Multimodal.frameSample(spark, sfDir, stride = 2).collect()
    assert(frames.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}

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

  test("RiffCodec synthesizes spec-conformant BMP/WAV and parses them back exactly") {
    // BMP: header fields round-trip, file size matches the spec's
    // 4-byte row padding formula
    val bmp = Multimodal.RiffCodec.synthBmp(width = 17, height = 11)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val pb = Multimodal.RiffCodec.parse(1L, bmp)
    assert(pb.kind == "bmp" && pb.width == 17 && pb.height == 11 && pb.bits == 24)
    assert(pb.n_bytes == 54 + 11 * (((3 * 17 + 3) / 4) * 4))
    // WAV: duration reconstructs exactly from byteRate and data size
    val wav = Multimodal.RiffCodec.synthWav(sampleRate = 11000, channels = 2, durMs = 230)
    val pw = Multimodal.RiffCodec.parse(2L, wav)
    assert(pw.kind == "wav" && pw.sample_rate == 11000 && pw.channels == 2)
    assert(pw.bits == 16 && pw.duration_ms == 230L)
    assert(pw.n_bytes == 44 + 230 * (11000 * 2 * 2 / 1000))
    // garbage is rejected, not misparsed
    assert(Multimodal.RiffCodec.parse(3L, Array[Byte](1, 2, 3)).kind == "unknown")
    // distributed path: every doc parses as the kind its id dictates
    val parsed = Multimodal.mediaParse(spark, sfDir).collect()
    assert(parsed.length == 500)
    parsed.foreach { r =>
      val d = r.getLong(0)
      assert(r.getString(1) == (if (d % 2 == 0) "bmp" else "wav"))
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

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

class MultimodalSpec extends AnyFunSuite {

  test("media metadata decodes real headers, covers every doc, flags corrupt payloads") {
    val rows = Multimodal.mediaMeta(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val d = r.getLong(0)
      if (d % 13 == 0) {
        // truncated payloads are rejected, not misparsed
        assert(!r.getBoolean(6) && r.getString(1) == "unknown")
        assert(r.getInt(2) == (d % 7).toInt)
        assert(r.getInt(3) == 0 && r.getInt(4) == 0 && r.getLong(5) == 0L)
      } else if (d % 2 == 0) {
        // BMP: width/height come from the actual BITMAPINFOHEADER
        assert(r.getBoolean(6) && r.getString(1) == "image")
        assert(r.getInt(3) == 16 + (d % 32).toInt)
        assert(r.getInt(4) == 9 + (d % 16).toInt)
        assert(r.getLong(5) == 0L)
      } else {
        // WAV: duration reconstructs from byteRate and data length
        assert(r.getBoolean(6) && r.getString(1) == "audio")
        assert(r.getInt(3) == 0 && r.getInt(4) == 0)
        assert(r.getLong(5) == 100L + (d % 20) * 10L)
      }
    }
    // both failure and both success branches actually occur
    assert(rows.count(!_.getBoolean(6)) > 0)
    assert(rows.count(_.getString(1) == "image") > 0)
    assert(rows.count(_.getString(1) == "audio") > 0)
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

  test("frame sampling reads real BMP pixel rows by stride and is batch-stable") {
    val frames = Multimodal.frameSample(spark, sfDir, stride = 2).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getLong(0))
    // only BMPs (even doc_ids) fan out
    assert(byDoc.keySet.forall(_ % 2 == 0))
    byDoc.foreach { case (d, fs) =>
      // sampled file rows follow the stride and cover ceil(h/2) rows
      val h = 9 + (d % 16)
      val ys = fs.map(_.getLong(2)).sorted.toSeq
      assert(ys == (0L until h by 2).toSeq, s"doc $d rows $ys")
      // pixel sums match the gradient's closed form w(w-1) + 2wy —
      // i.e. the sampler summed the ACTUAL payload bytes
      val w = 16 + (d % 32)
      fs.foreach { r =>
        assert(r.getLong(5) == w * (w - 1) + 2 * w * r.getLong(2),
          s"doc $d row ${r.getLong(2)} pixel sum ${r.getLong(5)}")
        assert(r.getLong(3) == 54 + r.getLong(2) * r.getLong(4))
      }
    }
    // a different stride changes the fan-out accordingly
    val s3 = Multimodal.frameSample(spark, sfDir, stride = 3).collect()
    val byDoc3 = s3.groupBy(_.getLong(0))
    byDoc3.foreach { case (d, fs) =>
      val h = 9 + (d % 16)
      assert(fs.map(_.getLong(2)).sorted.toSeq == (0L until h by 3).toSeq)
    }
    // stability: running again yields identical rows (no partition-
    // dependent state in the codec path)
    val again = Multimodal.frameSample(spark, sfDir, stride = 2).collect()
    assert(frames.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}

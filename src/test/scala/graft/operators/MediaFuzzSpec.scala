package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark
import graft.operators.Multimodal.{MediaRow, RiffCodec}

/** Hostile-header media fuzz (round-14 verdict item 4): magic bytes
  * prove nothing about the header FIELDS. The codec path previously
  * exercised only truncation (every 13th payload); these plants carry
  * syntactically valid magic with LYING geometry — negative/zero/huge
  * dimensions, bpp ≠ 24, declared sizes past the actual payload,
  * byteRate inconsistent with rate·channels·2, Int-overflow bait —
  * and every one must land `unknown`/valid=false (and produce zero
  * downstream frame/stat rows) rather than throw, wedge a core, or
  * read off the end of the buffer.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** A structurally complete 54-byte BMP header (+ some body bytes)
    * with arbitrary declared geometry. */
  private def lyingBmp(width: Int, height: Int, bpp: Short, body: Int = 64): Array[Byte] = {
    val b = le(54 + body)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + body)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(bpp)
      .putInt(0).putInt(body).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array()
  }

  /** A structurally complete 44-byte WAV header (+ body) with
    * arbitrary declared PCM parameters. */
  private def lyingWav(channels: Short, rate: Int, byteRate: Int, bits: Short,
      dataLen: Int, body: Int = 64): Array[Byte] = {
    val b = le(44 + body)
    b.put("RIFF".getBytes).putInt(36 + body).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels).putInt(rate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(bits)
    b.put("data".getBytes).putInt(dataLen)
    b.array()
  }

  private val hostileBmps: Seq[(String, Array[Byte])] = Seq(
    "negative width"   -> lyingBmp(-16, 9, 24),
    "negative height"  -> lyingBmp(16, -9, 24),
    "zero width"       -> lyingBmp(0, 9, 24),
    "zero height"      -> lyingBmp(16, 0, 24),
    // 3·width overflows Int; rowSize·height overflows twice over
    "overflow width"   -> lyingBmp(Int.MaxValue / 2, 9, 24),
    "overflow height"  -> lyingBmp(16, Int.MaxValue / 2, 24),
    // both inside the cap but geometry demands ~3 GB that isn't there
    "size > payload"   -> lyingBmp(10000, 10000, 24),
    // plausible dims, but one pixel row longer than the actual body
    "one row short"    -> lyingBmp(16, 9, 24, body = ((3 * 16 + 3) / 4) * 4 * 9 - 1),
    "bpp 0"            -> lyingBmp(16, 9, 0),
    "bpp 1"            -> lyingBmp(16, 9, 1),
    "bpp 32"           -> lyingBmp(16, 9, 32))

  /** A RIFF whose chunk layout is NOT the canonical WAVE/fmt/data
    * order but whose numeric fields at the canonical offsets all pass
    * the consistency checks — the round-17 advice scenario: without
    * tag validation this would be "parsed" with offset-40 bytes of a
    * LIST chunk read as the data length (in-bounds, silently wrong).
    */
  private def nonCanonicalRiff(chunkTag: String): Array[Byte] = {
    val canonical = lyingWav(1, 8000, 16000, 16, dataLen = 32)
    val b = java.nio.ByteBuffer.wrap(canonical).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.position(36)
    b.put(chunkTag.getBytes.take(4))
    canonical
  }

  private val hostileWavs: Seq[(String, Array[Byte])] = Seq(
    "dataLen > payload"  -> lyingWav(1, 8000, 16000, 16, Int.MaxValue - 50),
    "LIST chunk at 36"   -> nonCanonicalRiff("LIST"),
    "JUNK chunk at 36"   -> nonCanonicalRiff("JUNK"),
    "dataLen just past"  -> lyingWav(1, 8000, 16000, 16, 65),
    "negative dataLen"   -> lyingWav(1, 8000, 16000, 16, -8),
    "zero rate"          -> lyingWav(1, 0, 0, 16, 64),
    "zero channels"      -> lyingWav(0, 8000, 0, 16, 64),
    "negative rate"      -> lyingWav(1, -8000, -16000, 16, 64),
    "byteRate mismatch"  -> lyingWav(1, 8000, 999, 16, 64),
    // byteRate field that only matches rate·ch·2 after Int overflow
    "byteRate overflow"  -> lyingWav(2, Int.MaxValue / 2, Int.MaxValue - 1, 16, 64),
    "bits 8"             -> lyingWav(1, 8000, 8000, 8, 64),
    "bits 0"             -> lyingWav(1, 8000, 0, 0, 64))

  test("every lying header parses as unknown — no throw, no trusted geometry") {
    (hostileBmps ++ hostileWavs).foreach { case (name, payload) =>
      val p = RiffCodec.parse(1L, payload)
      assert(p.kind == "unknown", s"hostile '$name' parsed as ${p.kind}")
      assert(p.n_bytes == payload.length)
    }
  }

  test("well-formed containers still parse exactly (hardening is not a behavior change)") {
    val bmp = RiffCodec.parse(2L, RiffCodec.synthBmp(16, 9))
    assert(bmp.kind == "bmp" && bmp.width == 16 && bmp.height == 9 && bmp.bits == 24)
    val wav = RiffCodec.parse(3L, RiffCodec.synthWav(8000, 2, 150))
    assert(wav.kind == "wav" && wav.sample_rate == 8000 && wav.channels == 2 &&
      wav.bits == 16 && wav.duration_ms == 150L)
  }

  test("frame sampler yields zero frames for hostile bitmaps, real frames for real ones") {
    import spark.implicits._
    val rows = hostileBmps.zipWithIndex.map { case ((_, p), i) => MediaRow(100L + i, "bmp", p) } :+
      MediaRow(999L, "bmp", RiffCodec.synthBmp(16, 9))
    val out = Multimodal.frameSampleFor(spark, spark.createDataset(rows)).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 999L),
      s"hostile bitmap produced frames: ${out.mkString(", ")}")
    assert(out.length == 5) // h=9, stride 2 -> rows 0,2,4,6,8
  }

  test("audio stats yield zero rows for hostile wavs, real stats for real ones") {
    import spark.implicits._
    val rows = hostileWavs.zipWithIndex.map { case ((_, p), i) => MediaRow(200L + i, "wav", p) } :+
      MediaRow(998L, "wav", RiffCodec.synthWav(8000, 1, 100))
    val out = Multimodal.mediaAudioStatsFor(spark, spark.createDataset(rows)).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(998L),
      s"hostile wav produced stats: ${out.mkString(", ")}")
    assert(out(0).getAs[Long]("n_samples") == 800L) // 100ms at 8kHz mono 16-bit
  }

  test("an empty-but-valid data chunk reports no stats row rather than NaN") {
    import spark.implicits._
    val empty = lyingWav(1, 8000, 16000, 16, dataLen = 0)
    val out = Multimodal.mediaAudioStatsFor(spark,
      spark.createDataset(Seq(MediaRow(1L, "wav", empty)))).collect()
    assert(out.isEmpty)
  }

  test("audio dedup fingerprints reject every hostile wav and the empty data chunk") {
    import spark.implicits._
    val rows = hostileWavs.zipWithIndex.map { case ((_, p), i) => MediaRow(300L + i, "wav", p) } ++
      Seq(MediaRow(400L, "wav", lyingWav(1, 8000, 16000, 16, dataLen = 0)),
        MediaRow(997L, "wav", RiffCodec.synthWav(8000, 1, 100)),
        MediaRow(996L, "wav", RiffCodec.synthWav(8000, 1, 100)))
    val out = Multimodal.mediaAudioDedupFor(spark, spark.createDataset(rows)).collect()
    // only the two (identical) real clips survive: one group, rep =
    // min doc_id, sz 2, no dup partner — hostile geometry and the
    // zero-sample chunk contribute no fingerprint at all
    assert(out.length == 1 && out(0).getLong(0) == 996L && out(0).getLong(1) == 2L &&
      out(0).isNullAt(3),
      s"hostile wavs leaked into the fingerprint relation: ${out.mkString(", ")}")
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark
import graft.operators.Multimodal.{MediaRow, RiffCodec}

/** Perceptual-hash image near-dup (round-15 verdict item 4): the
  * block-mean hash over real decoded BMP pixels must put
  * 1-px-perturbed images within the Hamming threshold, keep
  * structurally different images out, ignore payloads the validated
  * parse rejects, and stay exact under the 4×16 pigeonhole blocking.
  */
class MediaDedupSpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark

  private def hashOf(payload: Array[Byte]): Option[Long] =
    Multimodal.blockMeanHash(payload, RiffCodec.parse(0L, payload))

  private def pairs(rows: Seq[MediaRow]): Seq[(Long, Long, Int, Long, Long)] = {
    import spark.implicits._
    Multimodal.mediaDedupFor(spark, spark.createDataset(rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("hash is a pure function of pixels; corpus classes (16,9) and (44,21) collide") {
    val h1 = hashOf(RiffCodec.synthBmp(16, 9)).get
    val h2 = hashOf(RiffCodec.synthBmp(16, 9)).get
    assert(h1 == h2)
    // measured property of the gradient corpus (prototype + oracle
    // both reproduce it): the 8x8 block-mean bits of (16,9) and
    // (44,21) agree on all 64 cells — different pixels, equal hash,
    // one GROUP (not a pair) in the contracted relation
    assert(h1 == hashOf(RiffCodec.synthBmp(44, 21)).get)
  }

  test("a 1-px perturbation stays within Hamming 3 of the original") {
    val base = RiffCodec.synthBmp(20, 13)
    val h0 = hashOf(base).get
    // brighten one pixel's blue byte mid-image by 40: one cell's sum
    // moves by 40 of a ~6000 total — at most that cell's bit flips
    val perturbed = base.clone()
    val rowSize = ((3 * 20 + 3) / 4) * 4
    val off = 54 + 6 * rowSize + 3 * 10
    perturbed(off) = ((perturbed(off) & 0xFF) + 40).min(255).toByte
    val h1 = hashOf(perturbed).get
    assert(ham(h0, h1) <= 3, s"1-px edit drifted hamming ${ham(h0, h1)}")
  }

  test("near-dups pair, far images don't, invalid payloads vanish") {
    // (16,9) vs (18,11): hamming 1 in the gradient family (measured,
    // and recomputed by the driver oracle); (16,9) vs (28,21): 5
    val a = RiffCodec.synthBmp(16, 9)   // docs 0, 2 — exact dups, one group
    val b = RiffCodec.synthBmp(18, 11)  // doc 4 — near-dup of a
    val c = RiffCodec.synthBmp(28, 21)  // doc 6 — beyond the threshold
    val ha = hashOf(a).get; val hb = hashOf(b).get; val hc = hashOf(c).get
    assert(ham(ha, hb) <= 3 && ham(ha, hc) > 3 && ham(hb, hc) > 3,
      s"gradient family drifted: ${ham(ha, hb)} ${ham(ha, hc)} ${ham(hb, hc)}")
    val lying = { // valid magic, geometry demands bytes that aren't there
      val l = a.clone(); val bb = java.nio.ByteBuffer.wrap(l)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(22, 1 << 14); l // height 16384 on a (16,9) payload
    }
    val out = pairs(Seq(
      MediaRow(0L, "bmp", a), MediaRow(2L, "bmp", a),
      MediaRow(4L, "bmp", b), MediaRow(6L, "bmp", c),
      MediaRow(8L, "bmp", lying)))
    // exactly one pair: group{0,2} (rep 0, sz 2) vs group{4} (rep 4);
    // c is out of range, the lying payload contributes nothing
    assert(out === Seq((0L, 4L, ham(ha, hb), 2L, 1L)), s"got $out")
  }

  test("128-bit cross-multiply compare is exact where long products overflow") {
    // private mulGt is exercised through blockMeanHash on MaxDim-scale
    // numbers indirectly; verify the boundary algebra via BigInt here
    val cases = Seq(
      (3000000000000000000L, 4L, 2000000000000000000L, 7L),
      (765L << 40, 1L << 30, 765L << 40, 1L << 30),
      ((1L << 62) + 1, 2L, 1L << 62, 2L),
      (123456789L, 987654321L, 987654321L, 123456789L))
    cases.foreach { case (a, b, c, d) =>
      val expected = BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
      assert(Multimodal.mulGt(a, b, c, d) == expected, s"($a,$b,$c,$d)")
    }
  }
}

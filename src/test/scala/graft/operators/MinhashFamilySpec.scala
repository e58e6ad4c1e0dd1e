package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** Pins the bit-equality of the Scala-side LSH family mirror
  * (Dedup.shinglesOf / bandKeysOf — the streaming band index's
  * per-document path) against the Catalyst batch path
  * (ngramsFromTextExpr / bandBucketsOf). Equality here is what lets
  * the streaming candidates inherit the batch family's verified
  * FN-freeness instead of introducing a second hash family.
  */
class MinhashFamilySpec extends AnyFunSuite {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a b b c",
    "one two  three four", // double space → empty token is KEPT
    "trailing space ends here ",
    "café 😀 unicode café tokens here",
    "exactly three tokens")

  test("Scala xxhash64 mirror matches the Catalyst function") {
    import spark.implicits._
    val got = texts.toDF("t").select(xxhash64(col("t"))).collect().map(_.getLong(0)).toSeq
    val want = texts.map(Dedup.xxh64String(_))
    assert(got == want)
  }

  test("shinglesOf matches ngramsFromTextExpr tokenization exactly") {
    import spark.implicits._
    val got = texts.toDF("text")
      .select(array_distinct(expr(graft.functions.ngramsFromTextExpr("text", 3))).as("s"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val want = texts.map(t => Dedup.shinglesOf(t).toSeq)
    assert(got == want)
  }

  test("Scala band keys are bit-equal to the Catalyst banding") {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }
    val sh = docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(array_distinct(expr(
        graft.functions.ngramsFromTextExpr("text", 3)))).as("shingle"))
    val catalyst = Dedup.bandBucketsOf(sh).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val mirror = docs.flatMap { case (id, t) =>
      val s = Dedup.shinglesOf(t)
      if (s.isEmpty) Seq.empty
      else Dedup.bandKeysOf(s).zipWithIndex.map { case (k, b) => (id, b, k) }
    }.toSet
    assert(catalyst == mirror,
      s"family mismatch: catalyst-only=${(catalyst -- mirror).take(3)} mirror-only=${(mirror -- catalyst).take(3)}")
  }
}

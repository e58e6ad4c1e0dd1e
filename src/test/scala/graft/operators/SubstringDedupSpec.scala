package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark

/** Exact variable-length substring dedup (round-15 verdict item 3):
  * planted corpora prove the character-granular semantics dedup_span's
  * fixed token 10-grams cannot express — short-token long-char
  * repeats, non-token-aligned spans, within-doc repeats, and the
  * distinct-text contraction with clone expansion.
  */
class SubstringDedupSpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark

  /** Write a documents table with the driver schema into a temp dir
    * and return the dir (Tables.documents reads `documents.parquet`).
    */
  private def corpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_subdup").toString
    docs.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
    Dedup.dedupSubstring(spark, corpus(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  // distinct filler with no 40-char repeat anywhere (every token unique)
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a shared 60-char span is found at its exact per-doc offsets") {
    val span = "the quick brown fox jumps over the lazy dog again and once"
    assert(span.length >= 40)
    // boundary chars around the planted span differ per doc (x/w, y/z)
    // so the shared region is exactly " " + span + " "
    val a = filler("alpha", 10) + "x " + span + " y" + filler("beta", 10)
    val b = filler("gamma", 20) + "w " + span + " z" + filler("delta", 5)
    val out = run(Seq(1L -> a, 2L -> b))
    // the flanking spaces are shared too: maximal span = " " + span + " "
    val sl = span.length + 2L
    val pa = a.indexOf(span) + 1L - 1 // 1-based code-point position of the leading space
    val pb = b.indexOf(span) + 1L - 1
    assert(out === Seq(
      (1L, pa, pa + sl - 1, sl),
      (2L, pb, pb + sl - 1, sl)))
  }

  test("sub-10-token long-word repeat: dedup_substring finds what dedup_span misses") {
    // 3 tokens, 66 chars — far beyond L=40 but invisible to token
    // 10-gram document frequency
    val phrase = "supercalifragilisticexpialidocious pneumonoultramicroscopicsilico"
    assert(phrase.length >= 40 && phrase.split(" ").length < 10)
    val docs = Seq(
      1L -> (filler("left", 12) + " " + phrase + " " + filler("right", 12)),
      2L -> (filler("up", 15) + " " + phrase + " " + filler("down", 9)))
    val subs = run(docs)
    assert(subs.map(_._1).sorted === Seq(1L, 2L), s"substring dedup must flag both docs: $subs")
    // flanking spaces shared in both docs => span = " " + phrase + " "
    assert(subs.forall(_._4 == phrase.length.toLong + 2))
    // dedup_span (token 10-grams) sees zero duplicated windows here
    val dir = corpus(docs)
    val spanOut = Curation.dedupSpan(spark, dir).collect()
    assert(spanOut.forall(_.getAs[Long]("n_dup_windows") == 0L),
      "token 10-gram dedup_span must NOT see the 3-token repeat")
  }

  test("within-doc verbatim repeat yields two spans in one doc") {
    val chunk = "abcdefghij" * 5 // 50 chars, repeated twice inside one doc
    val doc = chunk + " " + filler("mid", 30) + " " + chunk
    val out = run(Seq(7L -> doc))
    // both occurrences are duplicated sites; the unique filler between
    // them is > L chars so the islands stay separate.
    // NOTE: chunk is itself periodic (period 10), so inside each
    // occurrence every 40-char window is the same string — still just
    // counted as sites of the same window value.
    assert(out.size == 2, s"expected two maximal spans, got $out")
    assert(out.forall { case (id, s, e, l) => id == 7L && l == e - s + 1 && l >= 50 })
  }

  test("clone docs inherit their rep's spans; pure clones alone are not spans") {
    val span = "zzz " * 15 // 60 chars incl trailing space handling
    val base = filler("solo", 12) + " " + span.trim + " " + filler("tail", 12)
    // docs 3 and 4 are EXACT clones; doc 5 is distinct text sharing the span
    val out = run(Seq(3L -> base, 4L -> base, 5L -> (filler("other", 9) + " " + span.trim)))
    // clone pair (3,4) contributes ONE distinct text; the span repeats
    // across the two distinct texts, so all three docs report it
    assert(out.map(_._1).distinct.sorted === Seq(3L, 4L, 5L),
      s"clone images must inherit the rep's spans: $out")
    // and the two clones report identical span geometry
    val s3 = out.filter(_._1 == 3L).map(t => (t._2, t._3, t._4))
    val s4 = out.filter(_._1 == 4L).map(t => (t._2, t._3, t._4))
    assert(s3 === s4)
  }

  test("exact clones with unique content produce no spans (distinct-text semantics)") {
    val doc = filler("unique", 25)
    assert(doc.length >= 40)
    val out = run(Seq(10L -> doc, 11L -> doc))
    assert(out.isEmpty,
      "window occurrences are counted over DISTINCT texts; exact dups are dedup_exact's job")
  }

  test("no shared 40-char substring => empty") {
    val out = run(Seq(1L -> filler("aaa", 40), 2L -> filler("bbb", 40)))
    assert(out.isEmpty)
  }

  test("positions are code points: astral emoji prefix offsets correctly") {
    val span = "shared astral span content for dedup forty!"
    assert(span.length >= 40)
    val emoji = "😀🚀" // 2 code points, 4 UTF-16 units
    val a = emoji + " " + span + " " + filler("xx", 10)
    val b = filler("yy", 10) + " " + span
    val out = run(Seq(1L -> a, 2L -> b))
    // shared substring = " " + span (b ends at the span; only a has a
    // trailing space). doc 1: emoji = 2 code points, shared region
    // starts at the space = code point 3
    val sl = span.length + 1L
    assert(out.contains((1L, 3L, 3L + sl - 1, sl)), s"got $out")
    val pb = b.indexOf(span) + 1L - 1 // ASCII prefix, leading shared space
    assert(out.contains((2L, pb, pb + sl - 1, sl)))
  }
}

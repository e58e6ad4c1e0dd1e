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

  // ------------------------------------------------------------------
  // dedup_substring_apply (round-16 verdict item 2): the span
  // relation's consumer — cut duplicated spans, keep one canonical
  // occurrence per duplicated window value.
  // ------------------------------------------------------------------

  private def runApply(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    Dedup.dedupSubstringApply(spark, corpus(docs))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("apply: canonical copy survives intact, later doc's span is cut") {
    val span = "the quick brown fox jumps over the lazy dog again and once"
    val a = filler("alpha", 10) + "x " + span + " y" + filler("beta", 10)
    val b = filler("gamma", 20) + "w " + span + " z" + filler("delta", 5)
    val shared = " " + span + " " // maximal duplicated region (flank chars differ)
    val out = runApply(Seq(1L -> a, 2L -> b))
    assert(out(1L) === ((a, 0L, 0L)), "doc 1 holds every canonical window site")
    val cleanedB = b.replace(shared, "")
    assert(out(2L) === ((cleanedB, shared.length.toLong, shared.length.toLong)))
  }

  test("apply: a doc that is entirely a duplicated span cleans to empty string") {
    val span = "unique aperiodic duplicated content block of forty plus characters!"
    assert(span.length >= 40)
    val a = filler("host", 12) + " " + span + " " + filler("rest", 12)
    val out = runApply(Seq(1L -> a, 2L -> span))
    assert(out(1L)._1 === a)
    assert(out(2L) === (("", span.length.toLong, span.length.toLong)))
  }

  test("apply: within-doc verbatim repeat keeps the first occurrence") {
    // aperiodic 50-char chunk: every 40-window value occurs once per
    // occurrence, so the first occurrence is fully canonical
    val chunk = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 qA qB qC qD qE q" // 47 chars
    val doc = chunk + "## " + filler("mid", 30) + " ##" + chunk
    assert(doc.indexOf(chunk) != doc.lastIndexOf(chunk))
    val out = runApply(Seq(7L -> doc))
    val (cleaned, removed, _) = out(7L)
    assert(removed == chunk.length.toLong, s"second occurrence cut exactly: $out")
    assert(cleaned === doc.substring(0, doc.length - chunk.length),
      "the SECOND occurrence is the non-canonical one")
  }

  test("apply: exact clones inherit the rep's cleaned text") {
    val span = "shared span content used across distinct texts forty chars plus"
    val a = filler("first", 12) + " " + span + " " + filler("more", 12)
    val b = filler("clonebase", 14) + " " + span
    val out = runApply(Seq(1L -> a, 3L -> b, 4L -> b))
    assert(out(1L)._1 === a)
    assert(out(3L) === out(4L), "clone images inherit the rep's cleaned text")
    assert(out(3L)._1 === b.replace(" " + span, ""),
      s"shared region incl. the flanking space is cut: ${out(3L)}")
  }

  test("apply: multibyte spans report bytes_removed > chars_removed") {
    val span = "😀🚀 astral emoji span with enough characters for forty minimum 😀"
    assert(span.codePointCount(0, span.length) >= 40)
    val a = filler("keep", 12) + "x" + span + "y" + filler("tail", 12)
    val b = filler("drop", 15) + "w" + span + "z"
    val out = runApply(Seq(1L -> a, 2L -> b))
    assert(out(1L)._1 === a)
    val (cleanedB, chars, bytes) = out(2L)
    assert(cleanedB === b.replace(span, ""))
    val spanChars = span.codePointCount(0, span.length).toLong
    val spanBytes = span.getBytes("UTF-8").length.toLong
    assert(chars === spanChars && bytes === spanBytes && bytes > chars)
  }

  test("apply: corpus with no duplicated windows passes through unchanged") {
    val docs = Seq(1L -> filler("aaa", 40), 2L -> filler("bbb", 40), 3L -> "tiny")
    val out = runApply(docs)
    assert(out === docs.map { case (id, t) => id -> ((t, 0L, 0L)) }.toMap)
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

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

class CurationSpec extends AnyFunSuite {

  test("hash sampling is deterministic, content-keyed, and near the target rate") {
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    val a = Curation.sampleHash(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val b = Curation.sampleHash(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample must be deterministic across runs")
    val rate = a.length.toDouble / total
    // 26/256 = 10.2% expected; generous band for a 500-doc corpus
    assert(rate > 0.03 && rate < 0.25, s"sample rate $rate out of band")
    // widening the bound strictly grows the sample (prefix property)
    val wide = Curation.sampleHash(spark, sfDir, hexBound = "40")
      .collect().map(_.getLong(0)).toSet
    assert(a.toSet.subsetOf(wide), "narrow sample must nest in the wide one")
  }

  test("ngram stats survive empty and single-word documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world hello world"),
      (2L, "hello"), // single token: no bigrams
      (3L, ""),      // empty text
      (4L, "hello world")
    ).toDF("doc_id", "text")
    val rows = Curation.ngramTopFor(docs).collect()
    val byBigram = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBigram("hello world") == 2, s"got $byBigram")
    assert(!byBigram.contains("hello"), "unigrams must not appear")
  }

  test("top bigrams are document-frequency ranked with deterministic ties") {
    val rows = Curation.ngramTop(spark, sfDir).collect()
    assert(rows.length == 25)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse), "not sorted by df desc")
    // every reported bigram must actually occur in some document
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .collect().map(_.getString(1))
    val top = rows.head.getString(0)
    assert(corpus.exists(_.contains(top)), s"top bigram '$top' not found in corpus")
  }

  test("repetition signals hit closed-form values on planted documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),           // pure repetition
      (2L, "a b c d"),           // no repetition
      (3L, "spam ham spam ham spam"), // alternating: every bigram repeated
      (4L, "solo")               // < 2 words: dropped
    ).toDF("doc_id", "text")
    val got = Curation.textRepetitionFor(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(!got.contains(4L), "sub-2-word docs must be dropped")
    // doc 1: 4 words len 1; bigrams = ["a a"]*3 -> dup frac 1 - 1/3
    assert(got(1L) == ((4L, 1.0, 0.6667, 1.0)), s"got ${got(1L)}")
    // doc 2: all distinct
    assert(got(2L) == ((4L, 1.0, 0.0, 0.25)), s"got ${got(2L)}")
    // doc 3: bigrams = [spam ham, ham spam, spam ham, ham spam] -> 1 - 2/4
    val (n3, mwl3, dup3, top3) = got(3L)
    assert(n3 == 5L && dup3 == 0.5 && top3 == 0.6, s"got ${got(3L)}")
    assert(mwl3 == math.rint(10000.0 * 18 / 5) / 10000)
  }

  test("stratified sample keeps the per-source budgets of the md5 prefix rule") {
    val got = Curation.stratifiedSample(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute per-doc membership driver-side with the same rule
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val bound = if (src.replaceAll("\\D", "").toInt % 2 == 0) "40" else "20"
      val kept = ds.count { case (_, text) =>
        val hex = md.digest(text.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 2)
        hex < bound
      }
      src -> ((ds.length.toLong, kept.toLong))
    }
    assert(got == expected)
    // every source is audited and budgets bind: kept <= total
    assert(got.keySet == docs.map(_._1).toSet)
    got.values.foreach { case (n, k) => assert(k <= n) }
  }
}

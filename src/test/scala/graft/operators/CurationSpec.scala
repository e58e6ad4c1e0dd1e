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
}

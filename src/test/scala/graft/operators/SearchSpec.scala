package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

class SearchSpec extends AnyFunSuite {

  test("BM25 ranks higher-tf docs first and weights rare terms more") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join join filler filler"),
      (2L, "join filler filler filler filler"),
      (3L, "hash filler filler filler filler"),
      (4L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val rows = Search.bm25TopKFor(docs, Seq("join", "hash"), k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // docs without any query term never appear
    assert(!rows.exists(_._1 == 4L), "doc 4 has no query terms")
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L))
    val byId = rows.map(r => r._1 -> r).toMap
    // same document length, higher tf -> higher score; output is ranked
    assert(byId(1L)._2 > byId(2L)._2, s"tf=3 must outrank tf=1: $rows")
    val scores = rows.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse), "output must be ordered by score desc")
    // 'hash' (df=1) is rarer than 'join' (df=2): at equal tf and dl the
    // rare term scores higher
    assert(byId(3L)._2 > byId(2L)._2, s"rare term must outrank common: $rows")
    assert(rows.forall(_._3 == 1L), "each doc matches exactly one term here")
    assert(rows.forall(_._2 > 0), "BM25 with non-negative idf is positive")
  }

  test("corpus BM25 entry: hits contain the terms, scores ranked, k bounded") {
    val rows = Search.bm25TopK(spark, sfDir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "not sorted by score")
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      assert(Search.queryTerms.exists(term => t.split(" ").contains(term)),
        s"doc ${r.getLong(0)} in top-k but contains no query term")
    }
  }

  test("LM perplexity flags the out-of-distribution document") {
    import spark.implicits._
    // 9 docs share a tight bigram distribution; doc 99 is noise
    val common = (1 to 9).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val outlier = Seq((99L, "zyx wvu tsr qpo nml kji hgf edc ba"))
    val docs = (common ++ outlier).toDF("doc_id", "text")
    val got = TextAnalysis.lmPerplexityFor(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val commonMax = (1 to 9).map(i => got(i.toLong)).max
    assert(got(99L) > 2 * commonMax,
      s"outlier ppl ${got(99L)} not above common docs (max $commonMax)")
    // perplexity is positive and finite everywhere
    got.values.foreach(p => assert(p > 0 && !p.isInfinite))
  }

  test("int8 quantization audit: codes bounded, reconstruction within half-step") {
    val rows = Similarity.vecQuantize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(2)
      val sse = r.getDouble(4)
      assert(scale > 0, s"vec ${r.getLong(0)}: zero scale")
      // per-element |err| <= scale/2 (+ rounding slack on scale8)
      val bound = 64.0 * math.pow((scale + 1e-7) / 2, 2) * 1.01
      assert(sse <= bound, s"vec ${r.getLong(0)}: sse $sse exceeds $bound")
      // position-weighted checksum is bounded by all-max codes
      assert(math.abs(r.getLong(3)) <= 127L * 64 * 65 / 2)
    }
    // deterministic across runs (no RNG, no order sensitivity)
    val again = Similarity.vecQuantize(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}

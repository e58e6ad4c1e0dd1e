package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

/** Cross-checks the approximate operators against their exact
  * counterparts on real data (sf0.001) — the guarantees the oracle
  * can't express in SQL.
  */
class DedupSimilaritySpec extends AnyFunSuite {

  test("minhash-LSH finds every exact-Jaccard>=0.8 pair (verified candidates => no false positives)") {
    val exact = Dedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dup pairs")
    // verification step makes every reported pair truly >= 0.8
    assert(lsh.subsetOf(exact), "no unverified pairs")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (128 perms, 32 bands)")
  }

  test("simhash blocks have exact recall for hamming<=3 (pigeonhole) and pairs overlap jaccard dups") {
    val rows = Dedup.simhash(spark, sfDir).collect()
    assert(rows.forall(_.getInt(2) <= 3))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == rows.length, "pairs are distinct")
    val exact = Dedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical documents should collide under simhash too
    assert((pairs & exact).size >= exact.size / 2,
      s"simhash found ${(pairs & exact).size} of ${exact.size} jaccard dups")
  }

  test("IVF kNN attains reasonable recall vs brute force") {
    val brute = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ivf = Similarity.knnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = brute.keys.map(q => (brute(q) & ivf.getOrElse(q, Set.empty)).size).sum
    val recall = hits.toDouble / (brute.size * 5)
    assert(recall >= 0.3, s"IVF recall@5 $recall below 0.3 (nprobe=2 of 8)")
    // every IVF result must be a genuine corpus vector with rank 1..5
    assert(ivf.values.forall(s => s.size <= 5))
  }

  test("embedding dedup pairs are symmetric-free and above threshold") {
    val rows = Dedup.embeddingDedup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.45 - 1e-6)
    }
  }

  test("exact dedup returns empty on dup-free corpus") {
    assert(Dedup.exact(spark, sfDir).count() == 0)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

class BpeSpec extends AnyFunSuite {

  /** Independent reference BPE on a word-frequency dict: same greedy
    * left-to-right merge and (count desc, pair lexicographic)
    * tie-break, written against the algorithm definition rather than
    * the operator code.
    */
  private def referenceBpe(
      wordFreq: Map[String, Long], merges: Int): Seq[(Int, String, String, Long)] = {
    var dict = wordFreq.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 0 until merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (toks, f) =>
        toks.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step, l, r, c))
        dict = dict.map { case (toks, f) =>
          val merged = toks.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
            else acc :+ t
          }
          (merged, f)
        }
      }
    }
    out.toSeq
  }

  test("BPE merges match the reference implementation on the Sennrich corpus") {
    import spark.implicits._
    // the word-frequency dict from the BPE paper's worked example
    val words = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val docs = words.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f)(w).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Bpe.bpeTrainFor(docs, merges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = referenceBpe(words.map { case (w, f) => w -> f.toLong }.toMap, 6)
    assert(got == expected, s"got $got\nexpected $expected")
    // the famous first merges: ('e','s') over newest+widest, then ('es','t')
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t" && got(1)._4 == 9L)
  }

  test("BPE encode applies the merge sequence exactly (reference token counts)") {
    import spark.implicits._
    val words = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val docs = words.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f)(w).mkString(" "))
    }.toDF("doc_id", "text")
    val merges = referenceBpe(words.map { case (w, f) => w -> f.toLong }.toMap, 6)
      .map(m => (m._2, m._3))
    // reference encode: replay merges per word
    def encode(w: String): Int = {
      var toks = w.split("").toVector
      merges.foreach { case (l, r) =>
        toks = toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
          else acc :+ t
        }
      }
      toks.size
    }
    val got = Bpe.bpeApplyFor(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    words.zipWithIndex.foreach { case ((w, f), i) =>
      val perWord = encode(w)
      val (nWords, nTok, ratio) = got(i.toLong)
      assert(nWords == f.toLong, s"doc $i word count")
      assert(nTok == f.toLong * perWord, s"doc $i: expected ${f * perWord} tokens, got $nTok")
      assert(math.abs(ratio - w.length.toDouble / perWord) < 1e-3, s"doc $i ratio $ratio")
    }
    // after 6 merges 'newest' and 'widest' encode shorter than chars
    assert(encode("newest") < "newest".length)
  }

  test("BPE at 120 merges: bounded plan growth, parser-hostile tokens, reference parity") {
    import spark.implicits._
    // enough pair vocabulary for 120+ merges, and characters that
    // would break a string-interpolated SQL literal (backslash,
    // quote) — the merge lambdas must treat tokens as data
    val alphabet = Vector("a", "b", "c", "\\", "'", "d")
    def word(i: Int): String =
      (0 until 14).map { j =>
        var z = i.toLong * 2654435769L + j.toLong * 40503L + 97L
        z = (z ^ (z >>> 13)) * 0x9E3779B97F4A7C15L
        alphabet(((z >>> 17) % alphabet.size).toInt.abs)
      }.mkString
    val words = (0 until 200).map(word).distinct.zipWithIndex
      .map { case (w, i) => w -> (i % 9 + 1).toLong }
    val docs = words.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f.toInt)(w).mkString(" "))
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Bpe.bpeTrainFor(docs, merges = 120).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = referenceBpe(words.toMap, 120).take(got.size)
    assert(got == expected, s"first mismatch: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.size >= 100, s"corpus only supported ${got.size} merges")
    // apply the full merge sequence through the chunked encode path
    val enc = Bpe.bpeApplyFor(docs, got.map(m => (m._2, m._3))).collect()
    assert(enc.length == words.size)
    val wallSec = (System.nanoTime() - t0) / 1e9
    // linear-in-merges materialized loop: far under the quadratic
    // analysis blowup an unchunked fold would show (generous bound —
    // host noise up to 5x per CLAUDE.md)
    assert(wallSec < 300, s"120-merge train+encode took ${wallSec}s")
  }

  test("BPE on the corpus is deterministic and merges have monotone utility") {
    val a = Bpe.bpeTrain(spark, sfDir, merges = 4).collect().map(_.toSeq).toSeq
    val b = Bpe.bpeTrain(spark, sfDir, merges = 4).collect().map(_.toSeq).toSeq
    assert(a == b, "BPE training must be deterministic across runs")
    assert(a.size == 4)
    // merged symbols grow: every later merge's pair existed only after
    // earlier merges or in the base alphabet; counts are positive
    a.foreach(row => assert(row(3).asInstanceOf[Long] > 0))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables

class InsightsGraphSpec extends AnyFunSuite {

  test("fuzzy join finds planted typos (positive path) with exact distances") {
    import spark.implicits._
    val docs = Seq(
      (1L, "algorithm distributed partition clustered"),
      (2L, "algorithim distributed partition"),   // insertion
      (3L, "algorithm distributad"),              // substitution
      (4L, "partitio clustered"),                 // deletion
      (5L, "clusterde unrelatedword")             // transposition: dist 2, must NOT match
    ).toDF("doc_id", "text")
    val rows = Dedup.editDistanceJoinFor(docs, minLen = 8).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val expected = Set(
      ("algorithim", "algorithm", 1L, 2L, 1),
      ("distributad", "distributed", 1L, 2L, 1),
      ("partitio", "partition", 1L, 2L, 1))
    assert(rows.toSet == expected, s"got ${rows.toSet}")
    // the real corpus draws from a fixed wordlist: the driver oracle
    // passes vacuously, verified non-flaky at every SF
    assert(Dedup.editDistanceJoin(spark, sfDir).count() == 0)
  }

  test("incremental dedup exact leg flags delta docs whose text exists in history") {
    import spark.implicits._
    // delta = doc_id % 4 == 0; docs 4 and 8 re-crawl history texts,
    // doc 12 is fresh, doc 3 duplicates history but is itself history
    val docs = Seq(
      (1L, "history page one"), (2L, "history page two"), (3L, "history page one"),
      (4L, "history page one"), (8L, "history page two"), (12L, "fresh delta page"))
      .toDF("doc_id", "text")
    val flagged = Dedup.incrementalExactForDocs(docs).collect()
      .map(_.getLong(0)).toSet
    assert(flagged == Set(4L, 8L), s"got $flagged")
    // the full operator's exact column is all-false on the dup-free
    // driver corpus; its near-dup leg is driver-oracled
    val full = Dedup.dedupIncremental(spark, sfDir).collect()
    assert(full.forall(!_.getBoolean(1)))
    assert(full.nonEmpty && full.forall(_.getDouble(3) >= 0.8))
  }

  test("kmeans cluster report matches a driver-side reference Lloyd from the same seeds") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val eDf = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        graft.functions.arrayNorm(col("embedding")).as("nrm"))
    var cents = KMeans.hashSeeds(eDf, 8).map(_.toArray)
    def assign(v: Array[Double]): Int =
      cents.indices.minBy { c =>
        (v.zip(cents(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }
    for (_ <- 0 until 3) {
      val byC = e.groupBy { case (_, v) => assign(v) }
      cents = cents.indices.map { c =>
        byC.get(c) match {
          case Some(vs) =>
            val dim = vs.head._2.length
            Array.tabulate(dim)(p => vs.map(_._2(p)).sum / vs.length)
          case None => cents(c)
        }
      }.toArray
    }
    val refSizes = e.groupBy { case (_, v) => assign(v) }.view.mapValues(_.length.toLong).toMap
    val refInertia = e.map { case (_, v) =>
      val c = cents(assign(v)); v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    val got = Similarity.kmeansClusters(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.view.mapValues(_._1).toMap == refSizes,
      s"sizes ${got.view.mapValues(_._1).toMap} vs $refSizes")
    val gotInertia = got.values.map(_._2).sum
    assert(math.abs(gotInertia - refInertia) < 1e-3 * (1 + refInertia),
      s"inertia $gotInertia vs $refInertia")
  }

  test("co-occurrence lift satisfies marginal bounds") {
    val rows = Insights.cooccurLift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, na, nb, nab, lift) =>
      assert(a < b)
      assert(nab <= math.min(na, nb), s"pair ($a,$b): n_ab $nab exceeds a marginal")
      assert(lift > 0)
    }
  }

  test("per-user EWMA matches a driver-side reference fold") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ref = ev.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      def ewma(a: Double) = vs.tail.foldLeft(vs.head)((acc, x) => a * x + (1 - a) * acc)
      u -> (vs.length.toLong,
        BigDecimal(ewma(0.3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(ewma(0.1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Insights.ewmaUser(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (u, (n, fast, slow)) =>
      val (gn, gf, gs) = got(u)
      assert(gn == n, s"user $u count")
      assert(math.abs(gf - fast) < 2e-6, s"user $u fast: $gf vs $fast")
      assert(math.abs(gs - slow) < 2e-6, s"user $u slow: $gs vs $slow")
    }
  }

  test("equi-depth deciles are balanced, ordered, and cover all orders") {
    val rows = Insights.equiDepthHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_._2).sum == total)
    // depths differ by at most one; bucket ranges never overlap
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3 + 1e-9, s"deciles ${a._1}/${b._1} overlap")
      case _           =>
    }
  }

  test("tfidf keywords: ranks well-formed, scores non-increasing per doc") {
    val rows = Insights.tfidfKeywords(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, ks) =>
      val sorted = ks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to ks.length), s"doc $doc ranks")
      assert(sorted.map(_._6).sliding(2).forall {
        case Array(a, b) => a >= b - 1e-9
        case _           => true
      }, s"doc $doc scores not sorted")
      ks.foreach { case (_, _, w, tf, df, _) =>
        assert(w.length >= 4 && tf >= 1 && df >= 1)
      }
    }
  }

  test("pagerank matches a driver-side reference power iteration") {
    // reference on the sf0.001 trade graph, built independently
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val od = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = cs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val out = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = out.keys.toSeq.sorted
    val n = nodes.length
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      val in = scala.collection.mutable.Map.empty[Long, Double]
      edges.foreach { case (src, dst) =>
        in(dst) = in.getOrElse(dst, 0.0) + rank(src) / out(src)
      }
      rank = nodes.map(v => v -> (0.15 / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    val refTop = rank.toSeq
      .map { case (v, r) => (v, math.rint(r * n * 1e6) / 1e6) }
      .sortBy { case (v, r) => (-r, v) }.take(50).toMap
    val got = Graph.pagerank(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == refTop.keySet,
      s"top-50 differs: extra=${got.keySet -- refTop.keySet} missing=${refTop.keySet -- got.keySet}")
    got.foreach { case (v, r) =>
      assert(math.abs(r - refTop(v)) < 2e-6, s"node $v: $r vs ${refTop(v)}")
    }
  }

  test("native session_window sessions equal the lag/sum sessionize construction") {
    val native = Relational.sessionWindowNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // project the lag-based sessionize onto the same shape
    val lag = Relational.sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2), r.getDouble(5))).toSet
    assert(native == lag, s"native ${native.size} vs lag ${lag.size} sessions")
  }

  test("incremental aggregate merge equals the full recompute exactly") {
    val merged = Warehouse.incrAggMerge(spark, sfDir).collect().map(_.toSeq).toSeq
    val full = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .withColumn("avg_price", round(col("sum_price") / col("n_orders"), 6))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(merged == full)
  }

  test("gap-filled series is a dense grid with zero rows at the gaps") {
    val rows = Warehouse.timeseriesGapfill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hours = rows.map(_._1).distinct.sorted
    val types = rows.map(_._2).distinct
    // dense: every (hour, type) cell exists exactly once
    assert(rows.length == hours.length * types.length)
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600L * 1000000 },
      "hour grid has holes")
    // zero-filling actually fired and non-zero cells sum to the corpus
    assert(rows.exists(_._3 == 0L), "no gap was filled — grid vacuous")
    assert(rows.map(_._3).sum == Tables.events(spark, sfDir).count())
  }

  test("MAD outlier audit: robust stats sane, outliers beyond threshold") {
    val rows = Warehouse.madOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, med, mad, out) =>
      assert(n > 0 && mad >= 0, s"type $t")
      assert(out <= n / 2, s"type $t: MAD flagged $out of $n — not robust")
      // recompute one group's count from raw data
      val vs = Tables.events(spark, sfDir).filter(col("event_type") === t)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      def q50(a: Array[Double]): Double = {
        val h = (a.length - 1) * 0.5
        val i = h.toInt
        if (i + 1 < a.length) a(i) + (h - i) * (a(i + 1) - a(i)) else a(i)
      }
      val m = q50(vs)
      val adev = vs.map(v => math.abs(v - m)).sorted
      val expect = vs.count(v => math.abs(v - m) > 4.4478 * q50(adev))
      assert(out == expect.toLong, s"type $t: $out vs $expect")
    }
  }

  test("z-order buckets are locality-tight on both dimensions") {
    val rows = Warehouse.zorderLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 16L))
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum == total)
    // the whole point of Z-ORDER: each equi-depth bucket spans a small
    // rectangle of (part x supplier) space. A random layout would span
    // ~255 on both axes in every bucket; interleaved bits cap the
    // average span near a quarter of the range.
    val pSpan = rows.map(r => r._4 - r._3).sum.toDouble / rows.length
    val sSpan = rows.map(r => r._6 - r._5).sum.toDouble / rows.length
    info(f"mean part-span $pSpan%.1f, mean supp-span $sSpan%.1f of 255")
    assert(pSpan <= 160, f"part spans too wide ($pSpan%.1f) — no locality")
    assert(sSpan <= 160, f"supplier spans too wide ($sSpan%.1f) — no locality")
  }

  test("triangle census matches a driver-side count on the similarity graph") {
    val pairs = Dedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val es = pairs.toSeq
    val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = es.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.length.toLong)
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val tris = (for {
      (a, b) <- es; (b2, c) <- es if b2 == b
      if pairs.contains((a, c))
    } yield 1).size
    val row = Graph.triangleCount(spark, sfDir).collect()(0)
    assert(row.getLong(0) == nodes.length.toLong)
    assert(row.getLong(1) == es.length.toLong)
    assert(row.getLong(2) == tris.toLong, s"triangles ${row.getLong(2)} vs $tris")
    assert(row.getLong(3) == wedges)
  }
}

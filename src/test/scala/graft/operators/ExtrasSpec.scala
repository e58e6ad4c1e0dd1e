package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables
import graft.streaming.StreamingJobs

class ExtrasSpec extends AnyFunSuite {

  test("SCD2 versions are contiguous, ordered, and end open per customer") {
    val rows = RelationalExtras.scd2Dim(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toSeq == (1 to vs.length).toSeq, s"cust $cust versions")
      // each closed version's eff_to equals the next version's eff_from
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._4.contains(b._3), s"cust $cust: range ${a._2} not contiguous")
        assert(!a._5, s"cust $cust: non-final version flagged current")
      }
      // exactly the last version is open and current
      assert(sorted.last._4.isEmpty && sorted.last._5, s"cust $cust tail")
      assert(sorted.count(_._5) == 1, s"cust $cust: multiple current versions")
    }
  }

  test("chunk packing corpus invariants: offsets in budget, spans ordered, per-source monotone") {
    val rows = Curation.packChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, n, start, end, off) =>
      assert(off >= 0 && off < 512, s"doc $id offset $off")
      assert(start <= end, s"doc $id span $start..$end")
      // span length matches the token count laid out from the offset
      assert(end == start + (off + n - 1) / 512, s"doc $id span arithmetic")
    }
    // within a source, chunk starts never go backwards in doc_id order
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val starts = ds.sortBy(_._1).map(_._4)
      assert(starts.zip(starts.tail).forall { case (a, b) => a <= b },
        s"source $src: chunk_start not monotone")
    }
  }

  test("distributedNtile is bit-identical to the ntile window, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // heavy ties straddling every bucket boundary: 40 rows, 7 distinct values
    val tied = (1 to 40).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    for (k <- Seq(3, 5, 8, 50)) { // 50 > n exercises the q=0 branch
      val dist = RelationalExtras.distributedNtile(
          tied, Seq(col("v").desc, col("id")), k, "s")
        .select($"id", $"s".cast("long")).as[(Long, Long)].collect().toMap
      val win = tied.withColumn("s", ntile(k).over(W.orderBy(col("v").desc, col("id"))))
        .select($"id", $"s".cast("long")).as[(Long, Long)].collect().toMap
      assert(dist == win, s"k=$k")
    }
  }

  test("rfm_segment (distributed) matches the ntile-window formulation exactly") {
    val dist = RelationalExtras.rfmSegment(spark, sfDir).collect().toSeq
    val win = RelationalExtras.rfmSegmentWindowed(spark, sfDir).collect().toSeq
    assert(dist == win)
    // the corpus genuinely exercises ties: some frequency value repeats
    val freqs = dist.map(_.getLong(2))
    assert(freqs.distinct.length < freqs.length, "corpus has no frequency ties")
  }

  test("salted join is row-identical to the plain join") {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("event_id"), col("event_type"))
    val uo = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val plain = ev.join(uo, "user_id")
      .select("event_id", "n_orders").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedJoin(ev, uo, "user_id", 8, hash(col("event_id")))
      .select("event_id", "n_orders").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain, s"salted ${salted.size} vs plain ${plain.size}")
    assert(plain.nonEmpty)
  }

  test("approx stats are within sketch error of exact values") {
    val approx = RelationalExtras.approxStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (d, p50, p95)) =>
      val (ad, ap50, ap95) = approx(k)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$k distinct: $ad vs $d")
      assert(math.abs(ap50 - p50) / p50 < 0.02, s"$k p50: $ap50 vs $p50")
      assert(math.abs(ap95 - p95) / p95 < 0.02, s"$k p95: $ap95 vs $p95")
    }
  }

  test("approx_stats keeps a priceless returnflag group with NULL quantiles (left-join branch)") {
    // a returnflag whose every price is <= 0 (failed-feed shape): the
    // log-bucket quantile relation is EMPTY for it, and only the
    // round-15 left join keeps the group in the profile. Mirrored by
    // the relfuzz "Z" plant (round 16); this is the deterministic gate
    // on the NULL-quantile output path.
    val dir = java.nio.file.Files.createTempDirectory("graft_priceless").toString
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val s = base.schema
    val plants = base.limit(3).collect().zipWithIndex.map { case (r, i) =>
      val vals = r.toSeq.toArray
      vals(s.fieldIndex("l_returnflag")) = "Z"
      vals(s.fieldIndex("l_extendedprice")) = if (i == 1) -100.0 else 0.0
      vals(s.fieldIndex("l_orderkey")) = 900000L + i
      org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
    }
    base.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(plants.toIndexedSeq, 1), s))
      .write.parquet(s"$dir/lineitem.parquet")
    val out = RelationalExtras.approxStats(spark, dir).collect()
    val z = out.filter(_.getString(0) == "Z")
    assert(z.length == 1, s"priceless group vanished from the profile: ${out.mkString(", ")}")
    assert(z(0).getLong(1) == 3L, s"distinct-order estimate must survive: ${z(0)}")
    assert(z(0).isNullAt(2) && z(0).isNullAt(3),
      s"priceless group must report NULL quantiles, got ${z(0)}")
    assert(out.filter(_.getString(0) != "Z").forall(r => !r.isNullAt(2) && !r.isNullAt(3)),
      "priced groups must keep their quantiles")
  }

  test("streaming dedup (keep-earliest) equals batch groupBy-min") {
    val streamed = StreamingJobs.streamDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.LocalSpark.withSessionConf(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
      StreamingJobs.dedupTransform(spark.read.parquet(s"$sfDir/events.parquet"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("bucketed range join handles interval boundaries and week-bucket crossings") {
    import spark.implicits._
    // 2020-01-06 is a Monday; the [lo, lo+7) interval crosses an
    // epoch-week boundary (weeks are anchored at Thu 1970-01-01), so
    // matches on both sides of the boundary prove the 2-bucket explode
    val iv = Seq((1L, java.sql.Date.valueOf("2020-01-06")))
      .toDF("o_orderkey", "lo")
    val probe = Seq(
      "2020-01-06", // = lo: in
      "2020-01-08", // epoch-week of lo ends Wed night; Thu 01-09 starts the next
      "2020-01-09", // next epoch-week, still < hi: in (bucket crossing)
      "2020-01-12", // = hi - 1 day: in
      "2020-01-13", // = hi: OUT (half-open)
      "2020-01-05"  // < lo: out
    ).map(java.sql.Date.valueOf).map(Tuple1(_)).toDF("d")
    val got = RelationalExtras.rangeJoinFor(iv, probe).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 4L), s"got $got")
    // an interval with zero matches yields no row (inner-join shape)
    val empty = RelationalExtras.rangeJoinFor(
      Seq((9L, java.sql.Date.valueOf("1995-05-01"))).toDF("o_orderkey", "lo"), probe)
    assert(empty.count() == 0)
  }

  test("exact group percentiles interpolate like a sorted-array reference") {
    val got = RelationalExtras.groupPercentiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    def pct(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      val frac = rank - lo
      val v = if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
      math.rint(v * 1e4) / 1e4
    }
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val xs = vs.map(_._2)
      val (q1, med, q3) = got(k)
      assert(q1 == pct(xs, 0.25) && med == pct(xs, 0.5) && q3 == pct(xs, 0.75),
        s"$k: ($q1, $med, $q3) vs reference")
    }
  }

  test("events_json parses every props row (no nulls) and sums match a string-extract cross-check") {
    val got = RelationalExtras.eventsJson(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val check = Tables.events(spark, sfDir)
      .select(col("event_type"),
        regexp_extract(col("props"), "\\d+", 0).cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == check, s"json parse disagrees with regex extract: $got vs $check")
    assert(got.values.map(_._1).sum > 0)
  }
}

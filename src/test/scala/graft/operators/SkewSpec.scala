package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** Planted-skew behavior of the two hot-key join paths (SURVEY §2.3
  * skew_join_salted + the AQE built-in): a key owning ~100× the
  * median key's rows must not serialize the join into one straggler
  * task. The corpus tables are too uniform to exercise this, so the
  * skew is planted: key 0 gets 60k rows, 200 cold keys get 100 each.
  */
class SkewSpec extends AnyFunSuite {

  private val hotRows = 60000L
  private val coldKeys = 200
  private val coldRowsPerKey = 100L

  private def plantedLeft = {
    val hot = spark.range(hotRows).select(
      lit(0L).as("k"), col("id").as("row_id"),
      concat(lit("payload_"), col("id")).as("payload"))
    val cold = spark.range(coldKeys * coldRowsPerKey).select(
      (col("id") % coldKeys + 1).as("k"), col("id").as("row_id"),
      concat(lit("payload_"), col("id")).as("payload"))
    hot.unionAll(cold)
  }

  private def plantedRight = spark.range(coldKeys + 1)
    .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("dim"))

  test("salted join spreads a 100x hot key across the salt space with a per-task bound") {
    val salts = 8
    // the salted LEFT's reduce groups are keyed (k, _salt): the hot
    // key's 60k rows must land in ~60k/8 per group, not 60k in one
    val salted = plantedLeft.withColumn("_salt",
      pmod(hash(col("row_id")), lit(salts)))
    val groups = salted.groupBy("k", "_salt").count()
      .filter(col("k") === 0).collect().map(_.getLong(2))
    assert(groups.length == salts, s"hot key used ${groups.length}/$salts salt buckets")
    val perTaskBound = (hotRows / salts * 1.3).toLong // hash variance head-room
    assert(groups.max <= perTaskBound,
      s"hot key's largest salted group ${groups.max} exceeds the per-task bound $perTaskBound " +
        s"(unsalted it would be $hotRows)")
    // and the join result is row-identical to the plain join
    val plainCnt = plantedLeft.join(plantedRight, "k").count()
    val saltedCnt = SkewJoin.saltedJoin(
      plantedLeft, plantedRight, "k", salts, hash(col("row_id"))).count()
    assert(saltedCnt == plainCnt && plainCnt == hotRows + coldKeys * coldRowsPerKey)
  }

  test("AQE skew-join split engages on the planted hot key (the built-in alternative)") {
    graft.LocalSpark.withSessionConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-sized thresholds: the planted hot partition is ~MBs, the
      // cold ones ~100s of KB — production keeps the 256 MB defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072",
      // force a shuffle join: a broadcast join has no skewed exchange
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = plantedLeft.join(plantedRight.hint("shuffle_merge"), "k")
      // collect() (not count()) so THIS QueryExecution runs to completion:
      // count() spawns a separate execution and would leave joined's AQE
      // plan unfinalized (isFinalPlan=false, no skew split to observe)
      val n = joined.collect().length
      assert(n == hotRows + coldKeys * coldRowsPerKey)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE never split the skewed partition; final plan:\n$finalPlan")
    }
    graft.LocalSpark.assertSessionHygiene("SkewSpec AQE test")
  }

  // range_join hot-bucket defense (r11 verdict watch item): a corpus
  // whose dates concentrate into ONE epoch week turns the bucket
  // equi-join's hot bucket into a single straggler partition on the
  // non-broadcast path. The salted variant must (a) return exactly the
  // broadcast path's rows, (b) spread the hot bucket across the salt
  // space, and (c) actually shuffle on (bucket, salt) when broadcast
  // is off — visible in the executed plan.
  test("salted range join defends a planted hot week and matches the broadcast path") {
    import graft.operators.RelationalExtras.rangeJoinFor
    // 90 intervals all overlapping the same week; 70k probe dates
    // uniform over that week's 7 days
    val intervals = spark.range(90).select(
      col("id").as("o_orderkey"),
      date_add(to_date(lit("2024-01-01")), (col("id") % 3).cast("int")).as("lo"))
    val probe = spark.range(70000).select(
      date_add(to_date(lit("2024-01-01")), (col("id") % 7).cast("int")).as("d"))
    val expected = rangeJoinFor(intervals, probe).collect().toSeq
    assert(expected.nonEmpty && expected.map(_.getLong(1)).sum > 70000L,
      "planted corpus degenerate: every interval should match tens of thousands of probe rows")
    graft.LocalSpark.withSessionConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val salts = 8
      val salted = rangeJoinFor(intervals, probe, saltBuckets = salts)
      val got = salted.collect().toSeq
      assert(got == expected, "salted range join diverged from the broadcast path")
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("salt"), s"no salt key in the executed join plan:\n${plan.take(2000)}")
      // the hot week's probe mass must spread: 7 distinct dates hash
      // into >=4 of 8 salts, and no salt group may hold more than ~2
      // dates' worth (2/7 ~ 29%; 45% leaves hash-collision headroom)
      val groups = probe
        .withColumn("salt", pmod(xxhash64(col("d")), lit(salts.toLong)).cast("int"))
        .groupBy("salt").count().collect().map(_.getLong(1))
      assert(groups.length >= 4, s"hot week used only ${groups.length}/$salts salt buckets")
      assert(groups.max <= (70000 * 0.45).toLong,
        s"largest salted slice ${groups.max} still holds >45% of the hot bucket")
    }
    graft.LocalSpark.assertSessionHygiene("SkewSpec salted range join test")
  }

  test("withSessionConf restores null-default keys and survives a crashing body") {
    val conf = spark.conf
    // adaptive.autoBroadcastJoinThreshold has a NULL default: restoring it
    // must unset, never conf.set(k, null) (which throws and, in round 9,
    // stranded broadcast-disabled confs for every later suite)
    intercept[RuntimeException] {
      graft.LocalSpark.withSessionConf(
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        sys.error("deliberate crash mid-body")
      }
    }
    assert(scala.util.Try(conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.flatMap(Option(_)).isEmpty,
      "null-default key not restored to unset")
    assert(conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "broadcast threshold stranded at -1 after a crashing body")
    graft.LocalSpark.assertSessionHygiene("SkewSpec crash-resistance test")
  }
}

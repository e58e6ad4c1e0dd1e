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

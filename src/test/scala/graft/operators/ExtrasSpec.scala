package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables
import graft.streaming.StreamingJobs

class ExtrasSpec extends AnyFunSuite {

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

  test("streaming dedup (keep-earliest) equals batch groupBy-min") {
    val streamed = StreamingJobs.streamDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = StreamingJobs.dedupTransform(spark.read.parquet(s"$sfDir/events.parquet"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}

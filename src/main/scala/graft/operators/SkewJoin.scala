package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted join for skewed keys (the manual fallback when AQE's
  * skew-join split isn't enough — e.g. one user owning 10% of a
  * 100 TB event table).
  *
  * `saltedJoin(left, right, key, salts)` replicates each RIGHT row
  * `salts` times (tagged 0..salts-1) and scatters LEFT rows randomly
  * across the salt space with a deterministic per-row hash, so a hot
  * key's rows spread over `salts` reducers instead of one. Result is
  * row-identical to the plain equi-join.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, salts: Int,
      saltSeed: Column): DataFrame = {
    val l = left.withColumn("_salt", pmod(saltSeed, lit(salts)))
    val r = right.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Driver-facing demo on real data: per-user event×order-count join
    * with 8-way salting; deterministic salt from event_id. Equality
    * with the unsalted join is asserted in the spec; the SQL oracle
    * is the plain join (salting must be invisible in the result).
    */
  def skewJoinDemo(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val userOrders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"))
      // decimal accumulation: the hot user's total is corpus-magnitude
      // on the skew tier and exchange-reordered (round-15 skew-oracle
      // catch; scale-4 cast absorbs half-cent plants, rescale-2 keeps
      // the decimal→double conversion single-rounding)
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("decimal(38,2)").cast("double").as("orders_total"))
    // pmod already maps negative hashes into [0, salts); abs() would
    // throw ARITHMETIC_OVERFLOW under ANSI mode at hash==Int.MinValue.
    saltedJoin(ev, userOrders, "user_id", salts = 8,
      saltSeed = hash(col("event_id")))
      .select("event_id", "user_id", "event_type", "n_orders", "orders_total")
      .orderBy("event_id")
  }

  val skewJoinDemoSql: String =
    """SELECT event_id, user_id, event_type, n_orders, orders_total
      |FROM events
      |JOIN (
      |  SELECT o_custkey AS user_id, count(*) AS n_orders,
      |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS orders_total
      |  FROM orders GROUP BY o_custkey
      |) USING (user_id)
      |ORDER BY event_id""".stripMargin
}

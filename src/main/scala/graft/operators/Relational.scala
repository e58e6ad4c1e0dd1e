package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational analytics over the star schema (SURVEY.md §2.3).
  *
  * Scale notes (100 TB mindset):
  *  - dims (region/nation/supplier/part/customer at dim-scale) are
  *    broadcast explicitly; only fact-fact joins shuffle;
  *  - all aggregates are native (map-side partial agg for free);
  *  - filters are plain column predicates so they reach the parquet
  *    scan (PushedFilters);
  *  - every query has a deterministic total order (ties broken by a
  *    key) so results are reproducible under any parallelism.
  *
  * Doubles that aggregate across many rows are rounded to 4 dp in BOTH
  * the Spark query and the DuckDB oracle: FP sums are order-dependent
  * and a distributed sum must not hash-mismatch a sequential one.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: filter + groupBy + 7 aggregates. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // DECIMAL sums, not double: the sf×100 magnitude gate caught the
    // 4dp-rounded double sums flipping their last digit at ~3e11
    // (exchange fold-order drift; any dp is a coin flip near a
    // boundary — CLAUDE.md). Inputs are exact at 2dp, so decimal
    // accumulation is exact and associative; one final correctly-
    // rounded cast to DOUBLE agrees bit-for-bit with DuckDB at any
    // scale. Averages are quotients of those exact sums, rounded with
    // the floor pattern (identical IEEE op sequence on both engines).
    val qtyD   = col("l_quantity").cast("decimal(18,2)")
    val priceD = col("l_extendedprice").cast("decimal(18,2)")
    val discD  = col("l_discount").cast("decimal(3,2)")
    val taxD   = col("l_tax").cast("decimal(3,2)")
    val one2   = lit(BigDecimal(1)).cast("decimal(3,2)")
    def floor4(x: Column) = floor(x * lit(10000.0) + lit(0.5)) / lit(10000.0)
    li.filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qtyD).as("sq"),
        sum(priceD).as("sp"),
        sum(priceD * (one2 - discD)).as("sdp"),
        sum(priceD * (one2 - discD) * (one2 + taxD)).as("sc"),
        sum(discD).as("sd"),
        count(lit(1)).as("count_order"))
      // product sums carry scale 4/6; re-round to scale 2 (exact
      // half-up decimal arithmetic, identical in both engines) BEFORE
      // the double cast: decimal→double is single-rounding only while
      // the unscaled value fits 2^53, and scale 6 blows that at ~3e10
      // (1-ulp cross-engine flip observed at the ×10 tier)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("double").as("sum_qty"),
        col("sp").cast("double").as("sum_base_price"),
        col("sdp").cast("decimal(38,2)").cast("double").as("sum_disc_price"),
        col("sc").cast("decimal(38,2)").cast("double").as("sum_charge"),
        floor4(col("sq").cast("double") / col("count_order")).as("avg_qty"),
        floor4(col("sd").cast("double") / col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
      |    AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
      |           (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE)
      |    AS sum_charge,
      |  floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
      |    AS avg_qty,
      |  floor(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
      |    AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 open orders by revenue for one segment.
    * customer is a dim here -> broadcast; orders⋈lineitem shuffles on
    * the order key only.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1999-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer (dim) broadcast; lineitem⋈orders is a shuffle join on
    // the order key — orders is a filtered FACT table, broadcasting
    // it would not survive 100 TB (AQE may still choose broadcast at
    // small SF on its own).
    li.join(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinAggSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation, all five dims broadcast, the
    * single shuffle is lineitem⋈orders on the order key.
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(spark, dir).select("r_regionkey", "r_name")

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      // exact decimal revenue (sf×100 gate: 4dp double sums flip at
      // ~2e9 per-nation magnitude; decimal sum + one DOUBLE cast is
      // bit-identical cross-engine at any scale)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("decimal(38,2)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultiJoinSql: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Top-3 parts per brand by revenue (partitioned window). */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_name")
    // DECIMAL accumulation (CLAUDE.md round-11 rule): the skew tier
    // concentrates ~63% of lineitem on one hot part, making this a
    // corpus-magnitude sum — round(sum(double), 4) flipped under
    // exchange reordering there (skew layout gate, round 14). The
    // scale-4 product sum is exact and associative — but the FINAL
    // cast must re-round to scale 2 first: the hot part's revenue at
    // skew×100 is 2.09e12, whose scale-4 unscaled value (2.09e16)
    // blows the 2^53 single-rounding bound and the engines disagreed
    // in the last ulp (round-16 skew×100 oracle gate — the exact
    // refinement the round-15 rules predicted).
    // CONTRACT (round-15 advice): the decimal(3,2) cast on l_discount
    // assumes the generator's 2-decimal discount domain. A 3-decimal
    // value near a half (0.015) would round differently cross-engine
    // (Spark decimal cast = HALF_UP on the shortest decimal string;
    // DuckDB CAST rounds the binary double). All corpus tiers and the
    // relfuzz plants (0.03/0.07/0.08 — RelFuzz.scala) keep 2dp; a
    // 3dp-discount corpus needs the floor(x*100+0.5) pattern instead.
    val rev = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("decimal(38,2)").cast("double").as("revenue"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("p_brand", "p_partkey", "p_name", "revenue", "rnk")
      .orderBy(col("p_brand"), col("rnk"))
  }

  val topnPerGroupSql: String =
    """SELECT p_brand, p_partkey, p_name, revenue, rnk FROM (
      |  SELECT p_brand, p_partkey, p_name, revenue,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY revenue DESC, p_partkey) AS rnk
      |  FROM (
      |    -- exact decimal sum, round(...) not CAST for the rescale
      |    -- (DuckDB decimal CAST truncates — CLAUDE.md)
      |    SELECT p_brand, p_partkey, p_name,
      |      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey, p_name
      |  )
      |) WHERE rnk <= 3
      |ORDER BY p_brand, rnk""".stripMargin

  /** Event sessionization: a session break is a >30 min gap per user;
    * one shuffle by user_id, then two window passes — the batch form
    * of a streaming sessionizer. Timestamps are compared at
    * microsecond precision (parquet ns is truncated identically by
    * Spark and by the oracle's ::TIMESTAMP cast).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    ev.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(30L * 60 * 1000000), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        // the hot user's session is a CORPUS-magnitude sum at the skew
        // tiers (3e9 at skew x100) - round(sum(double), 4) flipped
        // cross-engine there (round-16 skew x100 oracle gate). The
        // value domain is 2-decimal (generator + relfuzz plants), so
        // the DECIMAL(18,4) sum is exact and the one double cast is
        // single-rounding at any tier (unscaled <= 5e13 << 2^53).
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value FROM events
      |), flagged AS (
      |  SELECT user_id, ts_us, value,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
      |), sessions AS (
      |  SELECT user_id, ts_us, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id,
      |  count(*) AS n_events,
      |  min(ts_us) AS start_us,
      |  max(ts_us) AS end_us,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Sessionization through Spark's NATIVE session_window: ONE
    * shuffle + one aggregate — no window-function passes at all. The
    * engine merges events into [first, last + gap) sessions inside
    * the aggregation operator (the same machinery streaming session
    * windows use), which beats the lag/sum formulation's two sorted
    * window passes at scale. A new session starts when the gap is
    * STRICTLY greater than 30 minutes — same boundary rule as
    * [[sessionize]] — so the oracle reuses the lag-based session
    * construction keyed by the session's first event time.
    */
  def sessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        // same hot-session magnitude class as sessionize (decimal rule)
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "start_us")

  val sessionWindowNativeSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value FROM events
      |), flagged AS (
      |  SELECT user_id, ts_us, value,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
      |), sessions AS (
      |  SELECT user_id, ts_us, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id,
      |  min(ts_us) AS start_us,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, start_us""".stripMargin

  /** As-of join: each event picks the latest order of the same
    * customer with o_orderdate <= event ts.
    *
    * Implemented with the union-tag merge: tag both sides, sort within
    * user partitions by (time, side), carry the last seen order
    * forward with last_value(ignoreNulls). One shuffle + sort — the
    * distributed equivalent of a sort-merge as-of join; never builds
    * the event×order cross product.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id").as("k"), unix_micros(col("ts")).as("t"),
      col("event_id"), col("event_type"))
      .withColumn("side", lit(1))
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
    val ord = Tables.orders(spark, dir).select(
      col("o_custkey").as("k"),
      // o_orderdate reads as TIMESTAMP_NTZ; session tz is UTC so the
      // cast preserves the instant and unix_micros accepts it.
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("string").as("event_type"),
      lit(0).as("side"), col("o_orderkey"), col("o_totalprice"))
    val unioned = ev.unionByName(ord)
    // orders sort before events at identical t (side 0 < 1): an order
    // placed exactly at the event time is visible to the event.
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("event_type"),
        col("last_orderkey").as("o_orderkey"), col("last_totalprice").as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """SELECT e.event_id, e.user_id, e.event_type,
      |  o.o_orderkey, o.o_totalprice
      |FROM events e
      |ASOF LEFT JOIN (
      |  -- dedupe identical order timestamps per customer the same way
      |  -- the engine does: keep the max orderkey at equal t
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      |  FROM orders
      |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                             ORDER BY o_orderkey DESC) = 1
      |) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** Forward as-of join (lead-time): each event picks the EARLIEST
    * order of the same customer at-or-after the event — the
    * time-to-next-conversion join. Same union-tag merge as
    * [[asofJoin]], with the window reversed ([current, unbounded
    * following]) and events sorting before same-instant orders so an
    * order at exactly the event time is matched. One shuffle + sort,
    * no cross product.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id").as("k"), unix_micros(col("ts")).as("t"),
      col("event_id"), col("event_type"))
      .withColumn("side", lit(0))
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("o_totalprice", lit(null).cast("double"))
    val ord = Tables.orders(spark, dir).select(
      col("o_custkey").as("k"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("string").as("event_type"),
      lit(1).as("side"), col("o_orderkey"), col("o_totalprice"))
    // REVERSED running frame (round 14): a [current, unbounded
    // following] frame is O(partition²) in Spark — the frame
    // re-aggregates the whole tail for every row
    // (UnboundedFollowingWindowFunctionFrame), and the skew tier's hot
    // user (63% of events in ONE partition) wedged a core for an hour
    // on it. Sorting DESCENDING with a running [unbounded preceding,
    // current] frame and last(ignoreNulls) computes the identical
    // "earliest order at-or-after" in O(n): the running frame
    // accumulates one row at a time. Tie groups are unaffected — rows
    // tying on (t, side, o_orderkey) are all events (orders never tie
    // with events on side), and events carry NULL order columns.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").desc, col("side").desc, col("o_orderkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("next_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("next_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("k").as("user_id"), col("event_type"),
        col("next_orderkey").as("o_orderkey"), col("next_totalprice").as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  val asofForwardSql: String =
    """WITH ev AS (
      |  SELECT user_id AS k, epoch_us(ts::TIMESTAMP) AS t, event_id, event_type,
      |    0 AS side, NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice
      |  FROM events
      |), ord AS (
      |  SELECT o_custkey, epoch_us(o_orderdate), NULL::BIGINT, NULL::VARCHAR,
      |    1, o_orderkey, o_totalprice
      |  FROM orders
      |), u AS (
      |  SELECT * FROM ev UNION ALL SELECT * FROM ord
      |), m AS (
      |  SELECT *,
      |    first_value(o_orderkey IGNORE NULLS) OVER w AS next_orderkey,
      |    first_value(o_totalprice IGNORE NULLS) OVER w AS next_totalprice
      |  FROM u
      |  WINDOW w AS (PARTITION BY k ORDER BY t, side, o_orderkey
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id, k AS user_id, event_type,
      |  next_orderkey AS o_orderkey, next_totalprice AS o_totalprice
      |FROM m WHERE side = 0 ORDER BY event_id""".stripMargin

  /** Funnel: users reaching signup -> view -> purchase in ts order. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val stages = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "signup", col("ts_us"))).as("t_signup"),
      min(when(col("event_type") === "view", col("ts_us"))).as("t_view"),
      min(when(col("event_type") === "purchase", col("ts_us"))).as("t_purchase"))
    stages.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_signup").isNotNull, 1).otherwise(0)).as("n_signup"),
      sum(when(col("t_signup") < col("t_view"), 1).otherwise(0)).as("n_signup_view"),
      sum(when(col("t_signup") < col("t_view") && col("t_view") < col("t_purchase"), 1)
        .otherwise(0)).as("n_full_funnel"))
  }

  val eventFunnelSql: String =
    """WITH stages AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts::TIMESTAMP) END) AS t_signup,
      |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts::TIMESTAMP) END) AS t_view,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts::TIMESTAMP) END) AS t_purchase
      |  FROM events
      |  WHERE event_type IN ('signup', 'view', 'purchase')
      |  GROUP BY user_id
      |)
      |SELECT count(*) AS n_users,
      |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN t_signup < t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
      |  CAST(sum(CASE WHEN t_signup < t_view AND t_view < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM stages""".stripMargin
}

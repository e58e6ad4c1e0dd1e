package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Engine-breadth relational operators beyond SURVEY §2.3: grouping
  * sets, running windows, pivots, approximate aggregates. Same scale
  * rules as Relational: native aggs (map-side partials), pushdown-
  * friendly predicates, deterministic orderings.
  */
object RelationalExtras {

  /** ROLLUP over (returnflag, linestatus): per-group, per-flag and
    * grand totals in one pass — Spark computes grouping sets in a
    * single shuffle with partial aggregation.
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        // exact decimal sums (sf×100 magnitude rule): the grand-total
        // row reaches ~3e12 at the ×100 tier, where ANY dp rounding of
        // a double sum is a boundary coin flip; decimal accumulation +
        // one DOUBLE cast is bit-identical cross-engine WHILE the
        // final unscaled decimal fits 2^53 (~9e13 at scale 2 — about
        // 30× past the verified ×100 tier; beyond that DuckDB's
        // decimal→double double-rounds and a larger tier must be
        // re-verified, CLAUDE.md refinement 1)
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val aggRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping sets in
    * one pass — same single-shuffle grouping-sets machinery as the
    * ROLLUP, with the extra (NULL, linestatus) marginal.
    */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** TPC-H Q4 shape (EXISTS semi-join): order-priority counts over
    * orders with at least one returned lineitem. The lineitem side
    * reduces to distinct orderkeys BEFORE the join (semi-join build
    * side carries one narrow column), and the returnflag predicate
    * is pushed to its scan.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Trailing-30-day customer spend: an event-time RANGE frame (not
    * ROWS) per order — the sliding-interval aggregation pattern.
    * The frame bound is integer µs on BOTH engines, so peer handling
    * and the window arithmetic agree exactly.
    *
    * Scale: one shuffle by customer key; the frame is evaluated
    * inside each partition with a sliding two-pointer pass, never a
    * self-join.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy("o_custkey").orderBy(col("ts_us"))
      .rangeBetween(-30L * dayUs, 0L)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
      // decimal accumulation — hot-key trailing sums are corpus-
      // magnitude and DuckDB's segment-tree window fold diverges from
      // Spark's (round-15 skew-oracle catch; see windowRunning)
      .withColumn("trailing_spend",
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("decimal(38,2)").cast("double"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .orderBy("o_custkey", "ts_us", "o_orderkey")
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  epoch_us(o_orderdate) AS ts_us,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS trailing_spend,
      |  count(*) OVER w AS n_trailing
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
      |  RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, ts_us, o_orderkey""".stripMargin

  /** Cohort retention matrix: users grouped by first-activity week,
    * counted per subsequent activity week — the
    * (cohort, week-offset) → distinct-user grid every growth
    * dashboard renders. Week truncation and the day/7 offset are
    * exact integer arithmetic on both engines (both date_trunc to
    * Monday), so no calendar drift.
    *
    * Scale: one user-keyed aggregate for cohort assignment, one
    * broadcast-join back (first-activity relation ≪ events), one
    * bounded groupBy over (weeks × offsets) cells.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    ev.join(broadcast(first), "user_id")
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("wk"),
        date_trunc("week", col("first_ts")).as("cw"))
      .withColumn("week_offset", expr("datediff(wk, cw) div 7"))
      .groupBy("cw", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("cw")).as("cohort_week_us"),
        col("week_offset").cast("long").as("week_offset"), col("n_users"))
      .orderBy("cohort_week_us", "week_offset")
  }

  val eventsRetentionSql: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', min(ts::TIMESTAMP)) AS cw
      |  FROM events GROUP BY user_id
      |), j AS (
      |  SELECT e.user_id, date_trunc('week', e.ts::TIMESTAMP) AS wk, f.cw
      |  FROM events e JOIN f USING (user_id)
      |)
      |SELECT epoch_us(cw) AS cohort_week_us,
      |  CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM j GROUP BY cw, week_offset
      |ORDER BY cohort_week_us, week_offset""".stripMargin

  /** Exact global ntile(k) without a single-task sort. Range-shuffle
    * on the order keys, rank within each range partition in parallel,
    * add per-partition row-count offsets (a numPartitions-sized piece
    * of driver state), then apply ntile's split formula to the global
    * rank. Because the order keys form a total order (callers append
    * a unique tiebreak key), the result is bit-identical to
    * `ntile(k).over(Window.orderBy(keys))` INCLUDING tie handling —
    * which an approx_percentile-cuts + CASE plan cannot reproduce
    * (tied values straddling a quintile boundary get split by rank,
    * not value). Every stage is shuffle-parallel: this is the 10⁹-row
    * plan, and it's exact, so there is no small/large path switch.
    *
    * The range-partitioned relation is eagerly lineage-cut
    * ([[graft.Lineage.cut]]) so the partition-id assignment seen by
    * the count pass and the rank pass is the same frozen physical
    * layout (range boundaries come from a sample) — and, unlike a
    * persist(), superseded blocks are freed by the ContextCleaner
    * instead of accumulating across a multi-query session.
    */
  private[operators] def distributedNtile(
      df: DataFrame, orderCols: Seq[Column], k: Int, scoreName: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = math.max(spark.sparkContext.defaultParallelism, 1)
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Lineage.cut)
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val q = n / k
    val rem = n % k
    val qSafe = math.max(q, 1L) // else-branch divisor; unreachable rows when q=0
    val localW = Window.partitionBy("__pid").orderBy(orderCols: _*)
    ranged
      .withColumn("__rank", row_number().over(localW).cast("long"))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__rank", col("__rank") + col("__off"))
      .withColumn(scoreName,
        when(col("__rank") <= lit(rem * (q + 1)),
          expr(s"(__rank - 1) DIV ${q + 1} + 1"))
          .otherwise(expr(s"$rem + (__rank - 1 - ${rem * (q + 1)}) DIV $qSafe + 1")))
      .drop("__pid", "__rank", "__off")
  }

  /** RFM customer segmentation: recency/frequency/monetary quintile
    * scores (fully tie-broken by customer key so both engines cut
    * identically) + the concatenated segment label.
    *
    * Scale plan: each score is an exact [[distributedNtile]] — a
    * range shuffle of a 2-column projection plus a per-partition
    * rank, no global single-task Window sort — then three customer-
    * keyed joins reassemble the scores. Bit-identical to the ntile
    * window formulation (parity spec in ExtrasSpec), so the DuckDB
    * ntile oracle verifies this plan directly.
    */
  def rfmSegment(spark: SparkSession, dir: String): DataFrame = {
    val per = rfmPerCustomer(spark, dir)
    def score(metric: String, name: String): DataFrame =
      distributedNtile(
        per.select(col("o_custkey"), col(metric)),
        Seq(col(metric).desc, col("o_custkey")), 5, name)
        .select(col("o_custkey"), col(name))
    per
      .join(score("last_order", "r_score"), Seq("o_custkey"))
      .join(score("frequency", "f_score"), Seq("o_custkey"))
      .join(score("monetary", "m_score"), Seq("o_custkey"))
      .select(col("o_custkey"),
        unix_micros(col("last_order").cast("timestamp")).as("last_order_us"),
        col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
      .orderBy("o_custkey")
  }

  private def rfmPerCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        // decimal accumulation: the skew tier's hot customer is a
        // corpus-magnitude exchange-reordered sum (round-15 catch)
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("decimal(38,2)").cast("double").as("monetary"))

  /** The single-task ntile-window formulation rfmSegment must match
    * bit-for-bit — kept as the parity reference for ExtrasSpec, not
    * used by any query entry (it is the scale-killer plan).
    */
  private[operators] def rfmSegmentWindowed(spark: SparkSession, dir: String): DataFrame = {
    val per = rfmPerCustomer(spark, dir)
    val rW = Window.orderBy(col("last_order").desc, col("o_custkey"))
    val fW = Window.orderBy(col("frequency").desc, col("o_custkey"))
    val mW = Window.orderBy(col("monetary").desc, col("o_custkey"))
    per
      .withColumn("r_score", ntile(5).over(rW))
      .withColumn("f_score", ntile(5).over(fW))
      .withColumn("m_score", ntile(5).over(mW))
      .select(col("o_custkey"),
        unix_micros(col("last_order").cast("timestamp")).as("last_order_us"),
        col("frequency"), col("monetary"),
        col("r_score").cast("long").as("r_score"),
        col("f_score").cast("long").as("f_score"),
        col("m_score").cast("long").as("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
      .orderBy("o_custkey")
  }

  val rfmSegmentSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |    count(*) AS frequency,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY o_custkey
      |), s AS (
      |  SELECT o_custkey, last_order, frequency, monetary,
      |    ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
      |    ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      |  FROM per
      |)
      |SELECT o_custkey, epoch_us(last_order) AS last_order_us,
      |  CAST(frequency AS BIGINT) AS frequency, monetary,
      |  CAST(r_score AS BIGINT) AS r_score,
      |  CAST(f_score AS BIGINT) AS f_score,
      |  CAST(m_score AS BIGINT) AS m_score,
      |  r_score || f_score || m_score AS segment
      |FROM s ORDER BY o_custkey""".stripMargin

  /** Per-customer running order totals: cumulative sum + row index
    * over an event-time window — one shuffle by customer.
    *
    * DECIMAL accumulation (round-15 skew-ORACLE gate catch): the hot
    * customer's running total reaches ~5.7e9 on the 63%-head-mass
    * corpus, and DuckDB computes windowed sums with a SEGMENT TREE
    * (different fold shape than Spark's sequential accumulation) —
    * round(sum(double), 4) flipped its last digit cross-engine.
    * Scale 4 absorbs the relfuzz half-cent price plants exactly on
    * both engines; the final rescale to 2 keeps the decimal→double
    * conversion single-rounding (2^53 refinement, CLAUDE.md).
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("decimal(38,2)").cast("double"))
      .select("o_custkey", "o_orderkey", "order_seq", "running_total")
      .orderBy("o_custkey", "order_seq")
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS order_seq,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** Event-type pivot: per-user counts as columns. Expressed as
    * conditional aggregation so the single-shuffle plan (and the
    * oracle) is explicit — Spark's `.pivot` would plan the same.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type")
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t")
    ev.groupBy("user_id")
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
      .orderBy("user_id")
  }

  val pivotEventsSql: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** TPC-H Q18-style: orders whose total quantity exceeds a
    * threshold — aggregate-then-semi-join; the HAVING runs before
    * the join so only qualifying orderkeys flow into it.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity")), 4).as("total_qty"))
      .filter(col("total_qty") > 300)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
      .orderBy("o_orderkey")
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
      |)
      |SELECT o_orderkey, o_custkey, o_totalprice, total_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Anti-join (NOT EXISTS shape): customers with no orders since
    * 2000 — the filter is pushed into the anti-join's build side.
    */
  def custNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val custNoOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Sketch-based aggregates: HLL distinct counts + a log-bucket
    * quantile sketch (the DDSketch construction). The 100 TB answer to
    * COUNT(DISTINCT) / exact percentiles — fixed-size mergeable state
    * instead of a giant shuffle. The quantile side deliberately does
    * NOT use percentile_approx: QuantileSummaries compression is
    * scan-layout-dependent once the buffer overflows (the ×10
    * multi-file corpus flipped its tier-4 pin, round 14), while the
    * DDSketch state is counter-sums over fixed log-γ buckets — exact,
    * associative, a pure function of the input multiset at any
    * partitioning, so it pins at every tier. γ = 1.02 bounds relative
    * error at (γ−1)/(γ+1) ≈ 1% (spec asserts < 2% vs exact).
    */
  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gamma = 1.02
    val li = Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
    val hll = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
    // bucket index ⌈log_γ x⌉ (prices are positive); one map-side
    // combinable groupBy → ~hundreds of (flag, bucket) counters
    val bkt = li.filter(col("l_extendedprice") > 0)
      .groupBy(col("l_returnflag"),
        ceil(log(col("l_extendedprice")) / log(lit(gamma))).cast("int").as("b"))
      .agg(count(lit(1)).as("c"))
    // quantile = midpoint 2γ^b/(γ+1) of the first bucket whose
    // cumulative count reaches ⌈q·n⌉ — buckets are distinct per flag
    // after the groupBy, so the cumulative order is total
    val ranked = bkt
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("l_returnflag").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("c")).over(Window.partitionBy("l_returnflag")))
    val qs = ranked.groupBy("l_returnflag").agg(
      min(when(col("cum") >= ceil(col("total") * lit(0.5)), col("b"))).as("b50"),
      min(when(col("cum") >= ceil(col("total") * lit(0.95)), col("b"))).as("b95"))
    def midpoint(b: Column): Column =
      round(lit(2.0) * pow(lit(gamma), b) / lit(gamma + 1.0), 2)
    // qs is bounded by construction (one row per l_returnflag value) —
    // explicit hint, because the planner sizes it from its corpus-wide
    // child and chose SMJ at the ×10 tier (CLAUDE.md bounded-grid rule).
    // LEFT join (round-15 advice): qs only contains flags with at
    // least one positive price — a group whose prices are all
    // NULL/non-positive must still report its distinct-order estimate
    // (with NULL quantiles), not vanish from the profile.
    hll.join(broadcast(qs), Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("approx_orders"),
        midpoint(col("b50")).as("p50_price"),
        midpoint(col("b95")).as("p95_price"))
      .orderBy("l_returnflag")
  }

  /** Semi-structured column handling: `events.props` is a JSON string;
    * `from_json` with an explicit schema parses it ONCE into a typed
    * struct inside codegen (no UDF, no second parse per field), then
    * ordinary aggregation. At 100 TB the parse is embarrassingly
    * parallel map-side work and only (event_type, k) reaches the
    * exchange.
    */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy("event_type")

  val eventsJsonSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Non-equi interval join done the scale-safe way: a naive
    * point-in-range join is a cartesian (every probe row against
    * every interval). Bucketing both sides to epoch weeks turns it
    * into an EQUI-join on the bucket — each 7-day interval explodes
    * into the ≤2 week buckets it overlaps, each ship date lands in
    * exactly one — with the precise range predicate applied after the
    * hash match. Shuffle volume is O(probe + 2·intervals), never
    * O(probe × intervals); a probe row can match a given interval
    * through only one bucket, so no dedup is needed.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeJoinFor(
      Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 97 === 1)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("lo")),
      Tables.lineitem(spark, dir).select(to_date(col("l_shipdate")).as("d")))

  /** Core of [[rangeJoin]] over any ((o_orderkey, lo: date),
    * (d: date)) pair of relations; intervals are [lo, lo + 7 days).
    *
    * Hot-bucket defense (`saltBuckets > 1`): the default path
    * broadcasts the interval side, so bucket skew cannot serialize
    * anything — work stays scan-partitioned on the probe. When the
    * interval side is too large to broadcast the join shuffles on
    * `bucket`, and a corpus that concentrates its dates into few weeks
    * would turn the hot week into one straggler partition. The salted
    * path splits every bucket `saltBuckets` ways — probe rows take
    * salt = xxhash64(d) mod S (deterministic, so results stay
    * oracle-stable), the interval side replicates each bucket row S
    * ways — bounding any partition at ~1/S of the hot bucket. Residual
    * limitation, by construction: probe rows with the SAME date always
    * share a salt, so a corpus concentrated on one single DAY needs a
    * row-unique salt column instead (pass such a corpus through
    * [[graft.operators.SkewJoin.saltedJoin]] with an explicit salt
    * expression).
    */
  private[graft] def rangeJoinFor(intervals: DataFrame, probe: DataFrame,
      saltBuckets: Int = 1): DataFrame = {
    val anchor = to_date(lit("1970-01-01"))
    val iv = intervals
      .withColumn("hi", date_add(col("lo"), 7))
      // weeks covered by [lo, hi): week(lo) .. week(hi - 1 day)
      .withColumn("bucket", explode(sequence(
        floor(datediff(col("lo"), anchor) / 7).cast("long"),
        floor(datediff(date_sub(col("hi"), 1), anchor) / 7).cast("long"))))
    val bucketedProbe = probe
      .withColumn("bucket", floor(datediff(col("d"), anchor) / 7).cast("long"))
    val matched =
      if (saltBuckets <= 1) bucketedProbe.join(broadcast(iv), "bucket")
      else bucketedProbe
        .withColumn("salt", pmod(xxhash64(col("d")), lit(saltBuckets.toLong)).cast("int"))
        .join(iv.withColumn("salt", explode(sequence(lit(0), lit(saltBuckets - 1)))),
          Seq("bucket", "salt"))
    matched
      .filter(col("d") >= col("lo") && col("d") < col("hi"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  val rangeJoinSql: String =
    """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
      |FROM orders o JOIN lineitem l
      |  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
      | AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE) + 7
      |WHERE o.o_orderkey % 97 = 1
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin

  /** Exact per-group quartiles — the oracled counterpart of
    * approxStats' sketch path (Spark `percentile` and DuckDB
    * `quantile_cont` both linearly interpolate). Exact percentiles
    * cost a per-group sort; at 100 TB prefer approxStats unless the
    * group cardinality is small, which (returnflag, linestatus) is.
    */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"),
        round(expr("percentile(l_quantity, 0.50)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("q3_qty"),
        round(expr("percentile(l_extendedprice, 0.50)"), 4).as("median_price"))
      .orderBy("l_returnflag", "l_linestatus")

  val groupPercentilesSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty,
      |  round(quantile_cont(l_quantity, 0.50), 4) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS q3_qty,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS median_price
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Join-key skew audit — the diagnostic run BEFORE choosing a skew
    * strategy (salting, AQE skew-join, broadcast): per candidate join
    * key, the heavy-hitter share and the max/mean group ratio. One
    * bounded aggregate per key column; at 100 TB you'd sample the
    * scan first, but the aggregate shape is already the scalable one
    * (partial map-side counts, key-space-bounded exchange).
    */
  def keySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, table: String, key: String): DataFrame =
      df.groupBy(col(key).as("key_value"))
        .agg(count(lit(1)).as("cnt"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_key_rows"),
          round(max(col("cnt")) / (sum(col("cnt")) / count(lit(1))), 4)
            .as("skew_ratio"))
        .select(lit(table).as("table_name"), lit(key).as("key_name"),
          col("n_keys"), col("n_rows"), col("max_key_rows"), col("skew_ratio"))
    audit(Tables.lineitem(spark, dir), "lineitem", "l_orderkey")
      .unionAll(audit(Tables.lineitem(spark, dir), "lineitem", "l_partkey"))
      .unionAll(audit(Tables.orders(spark, dir), "orders", "o_custkey"))
      .unionAll(audit(Tables.events(spark, dir)
        .select(col("user_id")), "events", "user_id"))
      .orderBy("table_name", "key_name")
  }

  val keySkewAuditSql: String =
    """WITH a AS (
      |  SELECT 'lineitem' AS table_name, 'l_orderkey' AS key_name, count(*) AS cnt
      |  FROM lineitem GROUP BY l_orderkey
      |), b AS (
      |  SELECT 'lineitem', 'l_partkey', count(*) FROM lineitem GROUP BY l_partkey
      |), c AS (
      |  SELECT 'orders', 'o_custkey', count(*) FROM orders GROUP BY o_custkey
      |), d AS (
      |  SELECT 'events', 'user_id', count(*) FROM events GROUP BY user_id
      |), u AS (
      |  SELECT * FROM a UNION ALL SELECT * FROM b
      |  UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d
      |)
      |SELECT table_name, key_name,
      |  count(*) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  CAST(max(cnt) AS BIGINT) AS max_key_rows,
      |  round(max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)), 4) AS skew_ratio
      |FROM u GROUP BY table_name, key_name
      |ORDER BY table_name, key_name""".stripMargin

  /** Data-quality profile of a table: per column, row/non-null/exact-
    * distinct counts — the ingest health report. Each column is one
    * aggregate over a pruned single-column scan; the union is K tiny
    * results, not K scans of the full width (column pruning reaches
    * the parquet reader).
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass for the whole profile (r19, guide §1.2): the
    // former per-column union re-scanned orders once per profiled
    // column (4 scans + 4 aggregates). Multiple DISTINCT aggregates in
    // one agg plan as a single scan + Expand (one projection per
    // distinct column) + 2-stage agg, and the 1-row result unpivots to
    // the per-column rows with stack() — exact integer outputs,
    // bit-identical to the union form.
    val cols = Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c")))
    val one = Tables.orders(spark, dir).select(cols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, " +
          cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ") +
          ") AS (col_name, n_nonnull, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"), col("n_distinct"))
      .orderBy("col_name")
  }

  val dqProfileSql: String =
    """WITH u AS (
      |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
      |    count(o_orderkey) AS n_nonnull, count(DISTINCT o_orderkey) AS n_distinct
      |  FROM orders
      |  UNION ALL SELECT 'o_custkey', count(*), count(o_custkey),
      |    count(DISTINCT o_custkey) FROM orders
      |  UNION ALL SELECT 'o_orderdate', count(*), count(o_orderdate),
      |    count(DISTINCT o_orderdate) FROM orders
      |  UNION ALL SELECT 'o_totalprice', count(*), count(o_totalprice),
      |    count(DISTINCT o_totalprice) FROM orders
      |)
      |SELECT col_name, n_rows, n_nonnull, n_distinct
      |FROM u ORDER BY col_name""".stripMargin

  /** First-touch attribution: every purchase is credited to the FIRST
    * event type of its session (30-min-gap sessionization, same rule
    * as `sessionize`) — the marketing-analytics rollup of which entry
    * channel leads to purchases. One shuffle by user, three window
    * passes inside the user partition, one bounded groupBy(channel);
    * ties inside a session break on (ts, event_id) so "first" is
    * deterministic on both engines.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("event_type"), col("value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sess = ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(30L * 60 * 1000000), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_us"), col("event_id"))
    sess
      .withColumn("first_touch", first(col("event_type")).over(bySess))
      .filter(col("event_type") === "purchase")
      .groupBy("first_touch")
      .agg(
        count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id"), col("session_id")).as("n_sessions"),
        // per-channel purchase totals are corpus-magnitude at the
        // skew tiers (decimal rule, r16 — 2-decimal value domain)
        sum(col("value").cast("decimal(18,4)")).cast("double").as("purchase_value"))
      .orderBy("first_touch")
  }

  val attributionSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id, event_type, value
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                  OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
      |             THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), sessions AS (
      |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |), touched AS (
      |  SELECT *, first_value(event_type) OVER (PARTITION BY user_id, session_id
      |    ORDER BY ts_us, event_id) AS first_touch
      |  FROM sessions
      |)
      |SELECT first_touch,
      |  count(*) AS n_purchases,
      |  CAST(count(DISTINCT (user_id, session_id)) AS BIGINT) AS n_sessions,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value
      |FROM touched WHERE event_type = 'purchase'
      |GROUP BY first_touch ORDER BY first_touch""".stripMargin

  /** TPC-H Q10-style: top-20 customers by revenue lost to returned
    * items in one quarter. Dims (customer, nation) broadcast; the
    * only shuffle is orders ⋈ lineitem on orderkey, with the order-
    * date range and the return flag both pushed to the scans.
    * Revenue is rounded before ranking so the top-20 cut is
    * engine-independent.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** SCD type-2 dimension build: each customer's orders become
    * versioned rows with [eff_from, eff_to) validity ranges (the
    * next order closes the previous version; the last version stays
    * open, flagged current). The warehouse pattern for turning an
    * event/order log into a point-in-time joinable dimension.
    *
    * Scale: one window shuffle partitioned by customer key —
    * versions are computed inside each partition with lead(), no
    * self-join; customer keys are high-cardinality so the exchange
    * is balanced.
    */
  def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("eff_from"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("eff_from"), col("o_totalprice"))
      .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
      .select(
        col("o_custkey"),
        row_number().over(w).as("version"),
        unix_micros(col("eff_from")).as("eff_from_us"),
        unix_micros(col("eff_to")).as("eff_to_us"),
        col("eff_to").isNull.as("is_current"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "version")
  }

  val scd2DimSql: String =
    """SELECT o_custkey,
      |  row_number() OVER w AS version,
      |  epoch_us(o_orderdate) AS eff_from_us,
      |  epoch_us(lead(o_orderdate, 1) OVER w) AS eff_to_us,
      |  lead(o_orderdate, 1) OVER w IS NULL AS is_current,
      |  o_orderkey, o_totalprice
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version""".stripMargin

  /** TPC-H Q6 shape: forecast-revenue-change — a pure scan-side
    * filter + two global aggregates, zero joins. The point at 100 TB
    * is the plan: all three predicates (ship-date range, discount
    * band, quantity cap) push to the parquet scan (PushedFilters +
    * row-group min/max skipping), and the aggregate is a map-side
    * partial into a 1-row exchange.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      // exact decimal sum (sf×100 magnitude rule): price and discount
      // are exact at 2dp, so the product sum is exact integer
      // arithmetic; one DOUBLE cast agrees cross-engine at any scale
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") * col("l_discount").cast("decimal(3,2)"))
          .cast("decimal(38,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q6ForecastSql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q14 shape: promo revenue share for one ship month. part is
    * the small side — broadcast — so lineitem never shuffles; the
    * date range prunes the scan. The division happens once on the
    * driver-visible 1-row result (round 6: FP ratio).
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("promo_pct"),
        count(lit(1)).as("n_items"))

  val q14PromoSql: String =
    """SELECT round(100.0 *
      |    sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
      |    sum(l_extendedprice * (1.0 - l_discount)), 6) AS promo_pct,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  /** TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across the
    * join (brand × size × quantity bands). Catalyst extracts the
    * common conjuncts (quantity ≤ 30, size ≥ 1) below the join and
    * CNF-converts enough of the disjunction to push scan-side
    * filters; part is broadcast so the fact side stays shuffle-free.
    */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val pt = broadcast(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size")))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3"  && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
          .cast("decimal(38,2)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19DisjunctSql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** MERGE INTO (SCD type-1 upsert): a dimension snapshot receives a
    * change feed — matched keys update in place, unmatched keys
    * insert. The pre-existing dim is simulated as the customers with
    * c_custkey % 3 != 0 (a dim missing a third of today's keys), the
    * change feed is the full current snapshot enriched with order
    * spend since 2000; output is the post-merge dim with the action
    * taken per row.
    *
    * Scale: the whole merge is ONE equi-join on the dimension key
    * (change feed left-joined to target) — no per-row lookups, no
    * driver loop. On a real lakehouse table the same plan becomes a
    * shuffle-free bucket-local join when the dim is bucketed by key
    * (see bucketed_join), and only changed partitions rewrite.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      // decimal accumulation (round-15 skew-oracle class): hot-key
      // spend is corpus-magnitude; the later acctbal + spend round(4)
      // is safe because both addends are exact 2-decimal values
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("decimal(38,2)").cast("double").as("spend"))
    val source = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
    val target = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("t_custkey"), col("c_acctbal").as("t_acctbal"))
    source.join(target, col("c_custkey") === col("t_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"),
        round(coalesce(col("t_acctbal"), col("c_acctbal")) + col("spend"), 4).as("acctbal"),
        col("n_orders"),
        when(col("t_custkey").isNull, "insert").otherwise("update").as("action"))
      .orderBy("c_custkey")
  }

  val mergeUpsertSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS spend
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY o_custkey
      |), source AS (
      |  SELECT c_custkey, c_name, c_acctbal,
      |    coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend
      |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
      |), target AS (
      |  SELECT c_custkey AS t_custkey, c_acctbal AS t_acctbal
      |  FROM customer WHERE c_custkey % 3 != 0
      |)
      |SELECT c_custkey, c_name,
      |  round(coalesce(t_acctbal, c_acctbal) + spend, 4) AS acctbal,
      |  n_orders,
      |  CASE WHEN t_custkey IS NULL THEN 'insert' ELSE 'update' END AS action
      |FROM source LEFT JOIN target ON c_custkey = t_custkey
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // Remaining classic TPC-H plan shapes, adapted to this dataset's
  // reduced schema (no partsupp / c_phone): Q13 left-join-with-zeros
  // distribution, Q15 view + scalar-subquery argmax, Q17 correlated
  // per-group average, Q2-style correlated min-cost supplier, Q22
  // scalar subquery + anti join.
  // -------------------------------------------------------------------

  /** Q13: distribution of customers by order count, INCLUDING the
    * zero-order customers a plain inner join would drop — the
    * left-outer + double-aggregation shape. One shuffle per
    * aggregate; the left join keys on custkey.
    */
  def q13OrderDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("c_count")) // count(col) skips the nulls
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("c_count").desc)
  }

  val q13OrderDistSql: String =
    """WITH per AS (
      |  SELECT c_custkey, count(o_custkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |)
      |SELECT c_count, count(*) AS n_customers
      |FROM per GROUP BY c_count
      |ORDER BY n_customers DESC, c_count DESC""".stripMargin

  /** Q15: top supplier(s) by revenue in a shipdate quarter — the
    * revenue "view" + scalar-subquery max shape. The max is a 1-row
    * aggregate broadcast into the filter; ties surface every
    * argmax supplier exactly as Q15 requires.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("mx"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17: small-quantity-order revenue — lines with quantity under
    * 20% of their part's average. The correlated per-part average
    * becomes one aggregate + an equi-join back (never a per-row
    * subquery). Quantities are small exact integers in doubles, so
    * sum/count per part is bit-identical across engines and the
    * 0.2·avg comparison cannot straddle engines.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(avgQ, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      // exact decimal sum, then the /7 quotient rounds with the floor
      // pattern (sf×100 rule: the sum reaches 4e10 there, and a
      // round()ed double-sum quotient is a boundary coin flip)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"))
      .select(col("n_lines"),
        (floor(col("sp").cast("double") / lit(7.0) * lit(100.0) + lit(0.5)) / lit(100.0))
          .as("avg_yearly"))
  }

  val q17SmallQtySql: String =
    """WITH a AS (
      |  SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT count(*) AS n_lines,
      |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 * 100 + 0.5) / 100
      |    AS avg_yearly
      |FROM lineitem JOIN a USING (l_partkey)
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** Q2-style min-cost supplier per part (no partsupp table in this
    * dataset, so the observed per-(part, supplier) mean unit price
    * from lineitem stands in for ps_supplycost): the correlated-min
    * shape — cost aggregate, per-part min join-back, supplier/nation
    * dimension joins, deterministic (cost, suppkey) tie-break. Unit
    * prices are rounded 4dp BEFORE the argmin on both engines
    * (round-before-rank discipline).
    */
  def q2MinCost(spark: SparkSession, dir: String, topn: Int = 100): DataFrame = {
    // floor-based 4dp rounding, NOT round(): a 2-decimal price over a
    // small integer quantity lands on exact .xxxx5 halves, where Spark
    // rounds the shortest-decimal string (BigDecimal.valueOf) but
    // DuckDB rounds the binary double - they disagree at the boundary
    // (bit us: 22057.26/16 = 1378.57875). floor(x*1e4 + 0.5)/1e4 is
    // the same IEEE op sequence on both engines.
    val cost = Tables.lineitem(spark, dir)
      // zero-quantity (cancelled) lines carry no unit price: without
      // this filter the division throws under ANSI (relfuzz gate
      // finding R1 — planted l_quantity = 0) and DuckDB would yield
      // inf, so EXCLUDE the line from the estimate on both engines
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((floor((sum(col("l_extendedprice") / col("l_quantity")) / count(lit(1)))
        * 10000.0 + 0.5) / 10000.0).as("unit_cost"))
    val minCost = cost.groupBy("l_partkey").agg(min(col("unit_cost")).as("mc"))
    cost.join(minCost, "l_partkey")
      .filter(col("unit_cost") === col("mc"))
      .groupBy("l_partkey")
      .agg(min(col("l_suppkey")).as("s_key"), first(col("mc")).as("mc")) // tie-break
      .join(Tables.supplier(spark, dir), col("s_key") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("mc").as("unit_cost"))
      .orderBy("p_partkey")
      .limit(topn)
  }

  val q2MinCostSql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    floor(sum(l_extendedprice / l_quantity) / count(*) * 10000 + 0.5) / 10000
      |      AS unit_cost
      |  FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
      |), mc AS (
      |  SELECT l_partkey, min(unit_cost) AS mc FROM cost GROUP BY l_partkey
      |), pick AS (
      |  SELECT cost.l_partkey, min(l_suppkey) AS s_key, min(cost.mc) AS mc
      |  FROM (SELECT cost.*, mc.mc FROM cost JOIN mc USING (l_partkey)
      |        WHERE unit_cost = mc) cost
      |  GROUP BY cost.l_partkey
      |)
      |SELECT p_partkey, p_brand, s_name, n_name, mc AS unit_cost
      |FROM pick
      |JOIN supplier ON s_key = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |ORDER BY p_partkey
      |LIMIT 100""".stripMargin

  /** Q22-style lapsed high-value customers: acctbal above the
    * positive-balance average (scalar subquery → broadcast 1-row)
    * AND no orders in the dataset's last two years (anti join),
    * grouped by nation. The average's FP drift (~1e-10 relative) is
    * far below the cent-granular gaps between acctbals, so the
    * comparison cannot straddle engines.
    */
  def q22Lapsed(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-08-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("n_name")
  }

  val q22LapsedSql: String =
    """WITH ab AS (
      |  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
      |), recent AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1999-08-01'
      |)
      |SELECT n_name,
      |  count(*) AS n_custs,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |CROSS JOIN ab
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > ab
      |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
      |GROUP BY n_name ORDER BY n_name""".stripMargin
}

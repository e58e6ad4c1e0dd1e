package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Warehouse-maintenance operators: incremental aggregate merge
  * (materialized-view upkeep), time-series gap fill, robust MAD
  * outlier audit, and Z-order layout assessment. The recurring scale
  * themes: mergeable partial aggregates instead of recompute, grids
  * built from 1-row bounds + sequence explode (never a driver loop),
  * exact-integer or identically-derived FP statistics so DuckDB
  * recomputes every value bit-for-bit.
  */
object Warehouse {

  /** Incremental aggregate maintenance: the base relation's partial
    * aggregate state (count/sum/min/max per group) merges with a
    * delta batch's partials — avg derives at READ time from merged
    * sums, never stored. This is the materialized-view update path:
    * the delta pass touches only new data, the merge is group-keyed
    * state combination, and the result is IDENTICAL to a full
    * recompute — which is exactly what the oracle runs.
    * (Split rule: delta = o_orderkey % 5 = 0, standing in for the
    * newly-arrived partition.)
    */
  def incrAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          // DECIMAL partial sums: a double sum drifts with accumulation
          // order (merged-partial vs direct recompute flipped 2dp at the
          // sfx1 tier's 7e10 magnitude, and ANY dp is a coin flip when
          // the sum lands near a rounding boundary); decimal addition is
          // exact and associative, so partial-merge ≡ recompute
          // bit-exactly at any scale
          sum(col("o_totalprice").cast("decimal(18,2)")).as("s"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
    val base  = partials(orders.filter(col("o_orderkey") % 5 =!= 0))
    val delta = partials(orders.filter(col("o_orderkey") % 5 === 0))
    base.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(
        sum(col("n")).as("n_orders"),
        sum(col("s")).cast("double").as("sum_price"),
        min(col("lo")).as("min_price"),
        max(col("hi")).as("max_price"))
      // floor-pattern quotient rounding (CLAUDE.md): same IEEE op
      // sequence on both engines, no decimal-string detour
      .withColumn("avg_price",
        floor(col("sum_price") * lit(1e6) / col("n_orders") + lit(0.5)) / lit(1e6))
      .orderBy("o_orderpriority")
  }

  val incrAggMergeSql: String =
    """WITH a AS (
      |  SELECT o_orderpriority,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    min(o_totalprice) AS min_price,
      |    max(o_totalprice) AS max_price
      |  FROM orders GROUP BY o_orderpriority
      |)
      |SELECT o_orderpriority, n_orders, sum_price, min_price, max_price,
      |  floor(sum_price * 1e6 / n_orders + 0.5) / 1e6 AS avg_price
      |FROM a ORDER BY o_orderpriority""".stripMargin

  /** Hourly event counts per type with the gaps filled: the grid is
    * (every hour in the corpus span) × (every type), built from a
    * 1-row min/max aggregate + a sequence explode — no driver loop,
    * no assumption the data is dense. Missing cells surface as
    * explicit zero rows, which is what downstream charting/anomaly
    * jobs need.
    */
  def timeseriesGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val hours = bounds.select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy("h", "event_type").agg(count(lit(1)).as("n"))
    hours.crossJoin(types) // grid: hours × |type vocabulary| — bounded
      .join(counts, Seq("h", "event_type"), "left")
      .select(unix_micros(col("h")).as("hour_us"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("hour_us", "event_type")
  }

  val timeseriesGapfillSql: String =
    """WITH ev AS (
      |  SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS h, event_type
      |  FROM events
      |), b AS (
      |  SELECT min(h) AS lo, max(h) AS hi FROM ev
      |), hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
      |), types AS (
      |  SELECT DISTINCT event_type FROM ev
      |), c AS (
      |  SELECT h, event_type, count(*) AS n FROM ev GROUP BY h, event_type
      |)
      |SELECT epoch_us(hours.h) AS hour_us, types.event_type,
      |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
      |FROM hours CROSS JOIN types
      |LEFT JOIN c ON c.h = hours.h AND c.event_type = types.event_type
      |ORDER BY hour_us, types.event_type""".stripMargin

  /** Robust outlier audit per event type: median + MAD (median
    * absolute deviation) and the count beyond the 3σ-equivalent
    * threshold 4.4478·MAD — the outlier report that, unlike
    * mean/stddev, is not itself corrupted by the outliers it hunts.
    *
    * Determinism: exact `percentile` interpolation matches DuckDB's
    * quantile_cont bit-for-bit (the group_percentiles precedent);
    * the threshold constant is written literally as 4.4478 on both
    * sides so no multiply-order drift enters the comparison.
    *
    * Scale: two group-keyed aggregates with a broadcast median join
    * between them — the group cardinality (type vocabulary) is tiny;
    * at true scale you'd swap percentile for approx_percentile and
    * accept the documented error band.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = withMed.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        expr("percentile(adev, 0.5)").as("mad"))
    val outliers = withMed
      .join(broadcast(mad.select(col("event_type"), col("mad"))), "event_type")
      .filter(col("adev") > lit(4.4478) * col("mad"))
      .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
    mad.join(outliers, Seq("event_type"), "left")
      .select(col("event_type"), col("n"),
        round(col("med"), 6).as("median_v"),
        round(col("mad"), 6).as("mad_v"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  val madOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type
      |), d AS (
      |  SELECT e.event_type, abs(e.value - med.med) AS adev, med.med
      |  FROM events e JOIN med USING (event_type)
      |), mad AS (
      |  SELECT event_type, count(*) AS n, any_value(med) AS med,
      |    quantile_cont(adev, 0.5) AS mad
      |  FROM d GROUP BY event_type
      |)
      |SELECT mad.event_type, CAST(mad.n AS BIGINT) AS n,
      |  round(mad.med, 6) AS median_v,
      |  round(mad.mad, 6) AS mad_v,
      |  CAST(coalesce(sum(CASE WHEN d.adev > 4.4478 * mad.mad THEN 1 END), 0)
      |    AS BIGINT) AS n_outliers
      |FROM mad JOIN d USING (event_type)
      |GROUP BY mad.event_type, mad.n, mad.med, mad.mad
      |ORDER BY mad.event_type""".stripMargin

  /** Z-order layout assessment: interleave the bits of two bucketed
    * dimensions (part, supplier) into a Z-value, range-partition the
    * fact rows into 16 equi-depth Z-buckets (via the distributed
    * exact ntile — no global single-task sort), and report each
    * bucket's min/max span per dimension. Tight spans are the whole
    * point of Z-ORDER clustering: every layout bucket covers a small
    * rectangle of (part × supplier) space, so min/max file statistics
    * can skip most buckets for a predicate on EITHER dimension (the
    * Delta/Iceberg OPTIMIZE ZORDER mechanic, measurable here).
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val b = li.agg(
      min(col("l_partkey")).as("pLo"), max(col("l_partkey")).as("pHi"),
      min(col("l_suppkey")).as("sLo"), max(col("l_suppkey")).as("sHi"))
      .collect()(0)
    val (pLo, pHi, sLo, sHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // genuine integer division (Spark DIV ≡ DuckDB //): Column `/`
    // is double division + truncating cast, which only matches the
    // oracle while (c-lo)*256 < 2^53 — DIV matches by construction
    def bucket(name: String, lo: Long, hi: Long): Column =
      expr(s"($name - ${lo}L) * 256L DIV ${hi - lo + 1}L")
    val withZ = li
      .withColumn("p_b", bucket("l_partkey", pLo, pHi))
      .withColumn("s_b", bucket("l_suppkey", sLo, sHi))
      .withColumn("z", (0 until 8).map(k =>
        shiftleft(shiftright(col("p_b"), k) bitwiseAND lit(1L), 2 * k + 1) +
          shiftleft(shiftright(col("s_b"), k) bitwiseAND lit(1L), 2 * k))
        .reduce(_ + _))
    RelationalExtras.distributedNtile(withZ,
        Seq(col("z"), col("l_orderkey"), col("l_linenumber")), 16, "zbucket")
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("p_b")).as("part_lo"), max(col("p_b")).as("part_hi"),
        min(col("s_b")).as("supp_lo"), max(col("s_b")).as("supp_hi"))
      .orderBy("zbucket")
  }

  val zorderLayoutSql: String = {
    val zTerms = (0 until 8).map(k =>
      s"(((p_b >> $k) & 1) << ${2 * k + 1}) + (((s_b >> $k) & 1) << ${2 * k})")
      .mkString(" + ")
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |    min(l_suppkey) AS slo, max(l_suppkey) AS shi
       |  FROM lineitem
       |), z AS (
       |  SELECT l_orderkey, l_linenumber, p_b, s_b, $zTerms AS z
       |  FROM (
       |    SELECT l_orderkey, l_linenumber,
       |      (l_partkey - b.plo) * 256 // (b.phi - b.plo + 1) AS p_b,
       |      (l_suppkey - b.slo) * 256 // (b.shi - b.slo + 1) AS s_b
       |    FROM lineitem CROSS JOIN b
       |  )
       |), t AS (
       |  SELECT p_b, s_b,
       |    ntile(16) OVER (ORDER BY z, l_orderkey, l_linenumber) AS zbucket
       |  FROM z
       |)
       |SELECT CAST(zbucket AS BIGINT) AS zbucket,
       |  count(*) AS n_rows,
       |  CAST(min(p_b) AS BIGINT) AS part_lo, CAST(max(p_b) AS BIGINT) AS part_hi,
       |  CAST(min(s_b) AS BIGINT) AS supp_lo, CAST(max(s_b) AS BIGINT) AS supp_hi
       |FROM t GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }
}

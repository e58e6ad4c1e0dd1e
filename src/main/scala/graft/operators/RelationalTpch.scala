package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The remaining TPC-H query shapes (Q7/Q8/Q9/Q11/Q12/Q16/Q20/Q21),
  * adapted to this dataset's reduced schema the same way q2_min_cost
  * and q17_small_qty were (no partsupp table, no
  * l_commitdate/l_receiptdate/l_shipmode columns — lineitem-derived
  * stand-ins keep each query's SHAPE: the join graph, the
  * subquery/aggregation nesting, and the predicate structure).
  *
  * Scale notes (100 TB mindset), same discipline as Relational.scala:
  * dims broadcast, the single fact-fact shuffle is lineitem⋈orders on
  * the order key, corpus-magnitude money sums accumulate in DECIMAL
  * (exact + associative ⇒ bit-identical cross-engine at any
  * parallelism — CLAUDE.md decimal-sum rule) with ONE re-rounded cast
  * to DOUBLE, quotients of exact sums round with the floor pattern,
  * and integer-day arithmetic stays integral end to end.
  */
object RelationalTpch {

  private def priceD = col("l_extendedprice").cast("decimal(18,2)")
  private def discD  = col("l_discount").cast("decimal(3,2)")
  private def one2   = lit(BigDecimal(1)).cast("decimal(3,2)")
  /** Exact decimal line revenue: extprice·(1−disc), scale 4. */
  private def revD   = priceD * (one2 - discD)
  /** Re-round a decimal sum to scale 2, then ONE cast to double
    * (single-rounding holds while the unscaled value fits 2^53). */
  private def dbl2(c: org.apache.spark.sql.Column) =
    c.cast("decimal(38,2)").cast("double")
  private def floor6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Q7 volume shipping: revenue flow between two trading nations by
    * (supplier nation, customer nation, ship year). Dims broadcast;
    * the nation pair filter lands on the broadcast sides so the fact
    * scan is pruned before the one orderkey shuffle.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
        revD.as("rev"))
    val ord  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n1 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dbl2(sum(col("rev"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') OR
      |       (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 market share: NATION_3's share of EUROPE-customer PROMO-part
    * revenue per order year. Share = quotient of two EXACT decimal
    * sums (a conditional one over the same rows), floor-rounded 6dp —
    * the round()ed-double-ratio version is a boundary coin flip at
    * corpus magnitude.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revD.as("rev"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val part = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val natR = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey"))
    val suppN = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val num = sum(when(col("supp_nation") === "NATION_3", col("rev"))
      .otherwise(lit(BigDecimal(0)).cast("decimal(22,4)")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(natR), col("c_nationkey") === col("c_nkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(num.as("nm"), sum(col("rev")).as("dn"))
      .select(col("o_year"),
        when(dbl2(col("dn")) === 0.0, lit(null).cast("double"))
          .otherwise(floor6(dbl2(col("nm")) / dbl2(col("dn")))).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """WITH base AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev,
      |    n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region   ON n2.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01'
      |), sums AS (
      |  SELECT o_year,
      |    CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
      |                        ELSE CAST(0 AS DECIMAL(22,4)) END), 2) AS DOUBLE) AS nm,
      |    CAST(round(sum(rev), 2) AS DOUBLE) AS dn
      |  FROM base GROUP BY o_year
      |)
      |SELECT o_year,
      |  CASE WHEN dn = 0 THEN NULL
      |       ELSE floor(nm / dn * 1000000 + 0.5) / 1000000 END AS mkt_share
      |FROM sums ORDER BY o_year""".stripMargin

  /** Q9 product-type profit: per (supplier nation, order year) profit
    * on widget parts. No partsupp ⇒ supply cost stands in as
    * 0.6·p_retailprice·quantity (exact decimal arithmetic end to
    * end). The profit sum mixes scales (revenue scale 4, cost scale
    * 3) — Spark unifies exactly; one re-rounded cast at the end.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice").cast("decimal(18,2)").as("retailD"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revD.as("rev"), col("l_quantity").cast("decimal(4,0)").as("qtyD"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val suppN = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val costFactor = lit(BigDecimal("0.6")).cast("decimal(2,1)")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(dbl2(sum(col("rev") - costFactor * col("retailD") * col("qtyD"))).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name, year(o_orderdate) AS o_year,
      |  CAST(round(sum(
      |    CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) -
      |    CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(4,0))), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY n_name, o_year DESC""".stripMargin

  /** Q11 important stock: parts whose traded value exceeds 1.2× the
    * average part's (scalar-subquery threshold ⇒ broadcast 1-row
    * cross join; the per-part aggregate and the global total share
    * one scan shape). The original's fixed fraction-of-total cutoff
    * empties out as the part count scales with SF; the
    * relative-to-average cutoff keeps a stable ~16% tail at every
    * tier. The comparison is value·10·nparts > total·12 — everything
    * stays an EXACT bounded-precision decimal on BOTH engines (a
    * fractional threshold has no exact binary form, and DuckDB's
    * DECIMAL(38,2) sum would overflow precision 38 on the multiply,
    * silently converting to double).
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), priceD.as("p"))
    val perPart = li.groupBy(col("l_partkey")).agg(sum(col("p")).as("valueD"))
    val total = li.agg(sum(col("p")).cast("decimal(30,2)").as("totalD"),
      countDistinct(col("l_partkey")).as("np"))
    perPart.join(broadcast(total))
      .filter(col("valueD").cast("decimal(24,2)") *
        (col("np") * lit(10L)).cast("decimal(10,0)") >
        col("totalD") * lit(12).cast("decimal(2,0)"))
      .select(col("l_partkey"), dbl2(col("valueD")).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11ImportantStockSql: String =
    """SELECT l_partkey,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS part_value
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) *
      |    CAST(10 * (SELECT count(DISTINCT l_partkey) FROM lineitem) AS DECIMAL(10,0)) >
      |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(30,2))
      |   FROM lineitem) * CAST(12 AS DECIMAL(2,0))
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** Q12 shipping-delay priority audit: order-to-ship delay bucketed
    * to integer days (no l_shipmode/commitdate ⇒ the delay bucket is
    * the category), counting critical- vs normal-priority lines per
    * bucket. Day arithmetic is DATE-cast integer subtraction on both
    * engines — no timestamp division, no FP.
    */
  def q12ShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_shipdate"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
      .withColumn("delay_bucket",
        when(col("delay_days") <= 7, "0-within_week")
          .when(col("delay_days") <= 30, "1-within_month")
          .otherwise("2-late"))
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("delay_bucket")
  }

  val q12ShipDelaySql: String =
    """WITH d AS (
      |  SELECT date_diff('day', o_orderdate::DATE, l_shipdate::DATE) AS delay_days,
      |    o_orderpriority
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
      |)
      |SELECT CASE WHEN delay_days <= 7 THEN '0-within_week'
      |            WHEN delay_days <= 30 THEN '1-within_month'
      |            ELSE '2-late' END AS delay_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
      |    AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
      |    AS low_line_count
      |FROM d
      |GROUP BY 1 ORDER BY delay_bucket""".stripMargin

  /** Q16 supplier diversity: distinct suppliers per (brand, type,
    * size) over observed (part, supplier) trade pairs, minus a
    * blacklist (NOT IN ⇒ left-anti; acctbal stands in for the
    * complaints predicate). The distinct pair set collapses map-side
    * before the count-distinct shuffle.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val blacklist = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 1500.0).select(col("s_suppkey").as("bl_suppkey"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(blacklist), col("l_suppkey") === col("bl_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 dominant-flow suppliers: suppliers carrying > 30% of a
    * part's 1997 shipped quantity (nested correlated aggregate ⇒ one
    * pair-level aggregate equi-joined back to its part-level rollup,
    * then a distinct semi-join into the dims — never a per-row
    * subquery). Quantity sums are small-integer doubles: exact below
    * 2^53, so the 0.3· threshold is the same IEEE product on both
    * engines.
    */
  def q20PartShare(spark: SparkSession, dir: String): DataFrame = {
    val li97 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val pairQty = li97.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("pair_qty"))
    val partQty = pairQty.groupBy(col("l_partkey"))
      .agg(sum(col("pair_qty")).as("part_qty"))
    val dominant = pairQty.join(partQty, "l_partkey")
      .filter(col("pair_qty") > lit(0.3) * col("part_qty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  val q20PartShareSql: String =
    """WITH pair AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  GROUP BY l_partkey, l_suppkey
      |), tot AS (
      |  SELECT l_partkey, sum(pair_qty) AS part_qty FROM pair GROUP BY l_partkey
      |)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM pair JOIN tot USING (l_partkey)
      |  WHERE pair_qty > 0.3 * part_qty)
      |ORDER BY s_name""".stripMargin

  /** Q21 waiting suppliers: on finished multi-supplier orders, the
    * supplier whose line shipped > 60 days after the order while
    * every OTHER supplier shipped on time — the exists/not-exists
    * pair expressed as ONE per-order aggregate (distinct suppliers,
    * distinct late suppliers, the single late supplier id), which is
    * the shape that scales: no self-join of lineitem against itself.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val ordF = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val perOrder = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) > 60)
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
    val numwait = perOrder
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
    // keyed by (s_suppkey, s_name), not name alone: supplier names are
    // only unique per key in TPC-H by convention, and the ×10 ScaleUp
    // corpus legitimately repeats each name under 10 remapped keys — a
    // name-only grouping silently merges them (caught by the r13 sfx1
    // gate; green at every driver tier)
    Tables.supplier(spark, dir)
      .join(numwait, col("s_suppkey") === col("late_supp"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"), col("s_suppkey"))
      .limit(20)
  }

  val q21WaitingSql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
      |                        THEN l_suppkey END) AS n_late,
      |    min(CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
      |             THEN l_suppkey END) AS late_supp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F' AND l_shipdate IS NOT NULL
      |  GROUP BY l_orderkey
      |)
      |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM per_order JOIN supplier ON late_supp = s_suppkey
      |WHERE n_supp >= 2 AND n_late = 1
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_name, s_suppkey
      |LIMIT 20""".stripMargin
}

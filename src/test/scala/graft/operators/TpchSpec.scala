package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables

/** Semantic invariants for the round-13 TPC-H shapes (RelationalTpch).
  * The DuckDB oracles pin cross-engine value equality; these specs pin
  * the SEMANTICS against independent recomputations — in particular
  * q21's one-pass aggregate against the literal exists/not-exists
  * self-join formulation it replaces at scale.
  */
class TpchSpec extends AnyFunSuite {

  test("q7 returns exactly the requested nation pairs and years, revenue positive") {
    val rows = RelationalTpch.q7Volume(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pair = (r.getString(0), r.getString(1))
      assert(pair == ("NATION_3", "NATION_8") || pair == ("NATION_8", "NATION_3"), s"pair $pair")
      assert(Set(1996, 1997).contains(r.getInt(2)), s"year ${r.getInt(2)}")
      assert(r.getDouble(3) > 0, s"revenue ${r.getDouble(3)}")
    }
  }

  test("q8 shares are well-formed and match an independent double recompute") {
    val rows = RelationalTpch.q8MarketShare(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(1996, 1997))
    rows.values.foreach(s => assert(s >= 0.0 && s <= 1.0, s"share $s"))
    // independent plain-double recompute (engine-internal, so double FP
    // drift is ~1e-12 relative — far inside the 1e-6 tolerance)
    val li = Tables.lineitem(spark, sfDir)
    val check = li
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, sfDir)
          .join(Tables.nation(spark, sfDir)
            .select(col("n_nationkey").as("snk"), col("n_name").as("sn")),
            col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("sn")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .withColumn("rev", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg((sum(when(col("sn") === "NATION_3", col("rev")).otherwise(0.0)) / sum(col("rev")))
        .as("share"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (y, s) =>
      assert(math.abs(s - check(y)) < 1e-6, s"year $y: $s vs ${check(y)}")
    }
  }

  test("q9 covers exactly the widget (nation, year) groups; one group recomputes") {
    val out = RelationalTpch.q9ProductProfit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val base = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .withColumn("profit",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity"))
    val groups = base.groupBy(col("n_name"), year(col("o_orderdate")).as("y"))
      .agg(sum(col("profit")).as("p"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == groups.keySet)
    groups.foreach { case (k, p) =>
      assert(math.abs(out(k) - p) < math.max(1e-6 * math.abs(p), 1e-4), s"group $k")
    }
  }

  test("q11 keeps exactly the parts above 1.2x the average part value") {
    val kept = RelationalTpch.q11ImportantStock(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val values = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val total = values.values.map(BigDecimal(_)).sum
    val n = values.size
    val expect = values.filter { case (_, v) => BigDecimal(v) * 10 * n > total * 12 }
    assert(kept.keySet == expect.keySet,
      s"kept ${kept.size} vs expected ${expect.size}")
    assert(kept.nonEmpty && kept.size < n, "threshold should keep a strict subset")
  }

  test("q12 buckets partition the joined line set; counts split by priority") {
    val rows = RelationalTpch.q12ShipDelay(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totalLines = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(r => r._2 + r._3).sum == totalLines, "buckets must partition all lines")
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)), "bucket order")
    rows.foreach { case (_, hi, lo) => assert(hi >= 0 && lo >= 0) }
  }

  test("q16 never counts a blacklisted supplier and matches a direct recompute") {
    val out = RelationalTpch.q16SupplierCnt(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    val blacklist = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 1500.0)
      .collect().map(_.getLong(0)).toSet
    assert(blacklist.nonEmpty, "corpus should exercise the blacklist branch")
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
      .select("p_brand", "p_type", "p_size", "l_suppkey")
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3)))
      .filterNot { case (_, s) => blacklist.contains(s) }
    val expect = pairs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.length.toLong }
    assert(out == expect)
  }

  test("q20 suppliers are exactly those with a dominant 1997 part share") {
    val out = RelationalTpch.q20PartShare(spark, sfDir).collect().map(_.getLong(0)).toSet
    val li97 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairQty = li97.groupBy(t => (t._1, t._2)).map { case (k, vs) => k -> vs.map(_._3).sum }
    val partQty = li97.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._3).sum }
    val expectSet = pairQty.collect {
      case ((p, s), q) if q > 0.3 * partQty(p) => s
    }.toSet
    assert(out == expectSet, s"got $out expected $expectSet")
    assert(out.nonEmpty, "corpus should produce dominant suppliers")
  }

  test("q21 one-pass aggregate equals the literal exists/not-exists self-join shape") {
    val out = RelationalTpch.q21Waiting(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // the literal TPC-H formulation: late line l1 on an F order,
    // EXISTS another-supplier line l2 on the same order,
    // NOT EXISTS another-supplier LATE line l3 on the same order
    val ordF = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) > 60)
      .select("l_orderkey", "l_suppkey", "late")
    val l1 = li.filter(col("late"))
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")).distinct()
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2")).distinct()
    val l3 = li.filter(col("late"))
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3")).distinct()
    val waiting = l1
      .join(l2, col("o") === col("o2") && col("s") =!= col("s2"), "left_semi")
      .join(l3, col("o") === col("o3") && col("s") =!= col("s3"), "left_anti")
    val numwait = waiting.groupBy(col("s")).agg(count(lit(1)).as("nw"))
      .join(Tables.supplier(spark, sfDir), col("s") === col("s_suppkey"))
      .collect().map(r => ((r.getLong(r.fieldIndex("s_suppkey")),
        r.getString(r.fieldIndex("s_name"))), r.getLong(r.fieldIndex("nw"))))
      .sortBy { case ((k, n), w) => (-w, n, k) }.take(20).toMap
    assert(out == numwait)
    assert(out.nonEmpty, "corpus should produce waiting suppliers")
  }
}

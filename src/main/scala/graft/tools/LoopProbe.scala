package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling probe for the pagerank loop shape (r18):
  * prints the per-iteration executed plan and per-iteration wall
  * times so the co-partitioning claim is checkable.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROBE_CONF="k=v;k=v" — session conf overrides for loop-shape
    // experiments (e.g. spark.sql.adaptive.enabled=false)
    sys.env.get("PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.sources.Tables
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val od = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(od, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(cs.select(col("s").as("src"), col("c").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    var t0 = System.nanoTime()
    val withDeg0 = edges.join(deg, "src").persist()
    val nEdges = withDeg0.count()
    println(f"[probe] build+count: ${(System.nanoTime()-t0)/1e9}%.2f s, edges=$nEdges")
    val eParts = math.max(1L, math.min(nEdges / 500000L + 1L, 32L)).toInt
    t0 = System.nanoTime()
    val withDeg = graft.Lineage.cut(withDeg0.repartition(eParts, col("src")))
    println(f"[probe] withDeg cut: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n = withDeg0.agg(countDistinct(col("src"))).collect()(0).getLong(0)
    withDeg0.unpersist()
    println(f"[probe] countDistinct: ${(System.nanoTime()-t0)/1e9}%.2f s, n=$n")
    val rankLoop = new graft.Lineage.Loop
    t0 = System.nanoTime()
    var ranks = rankLoop.cut(
      withDeg.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1.0 / n).as("rank")))
    println(f"[probe] rank init (from withDeg): ${(System.nanoTime()-t0)/1e9}%.2f s")
    def step(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      withDeg
        .join(r, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("out_deg")).as("contrib"))
        .repartition(eParts, col("dst"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("in_mass"))
        .select(col("dst").as("node"),
          (lit(0.15 / n) + lit(0.85) * col("in_mass")).as("rank"))
    val cutEvery = sys.env.getOrElse("PROBE_CUT_EVERY", "1").toInt
    var since = 0
    for (i <- 1 to 10) {
      t0 = System.nanoTime()
      ranks = step(ranks)
      since += 1
      if (since >= cutEvery || i == 10) { ranks = rankLoop.cut(ranks); since = 0 }
      println(f"[probe] iter $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    println(f"[probe] checksum: ${ranks.agg(sum(col("rank"))).collect()(0).getDouble(0)}%.9f")
    spark.stop()
  }
}

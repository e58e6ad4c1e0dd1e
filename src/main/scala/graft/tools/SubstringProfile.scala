package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing split for dedup_substring (r16 verdict #6):
  * attribute the warm cost across (a) the contraction + window
  * explode + digest aggregation (the duplicate test), (b) the
  * collision-check window over duplicated sites, and (c) the islands
  * merge + expansion. Each stage is timed TWICE warm (allTextGroups
  * persists on first touch); read the second number.
  *
  * `runMain graft.tools.SubstringProfile [sfDir]`
  */
object SubstringProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val L = 40

    import graft.operators.Dedup
    val g = Dedup.allTextGroups(spark, dir)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[substring-profile] $name%-28s run$i rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    time("textGroups (cached)")(g)
    // the raw site stream: window explode + digest projection only
    val sites = g.select(col("rep"),
      posexplode(graft.functions.charWindows(col("text"), L)).as(Seq("pidx", "win")))
      .select(col("rep"), xxhash64(col("win")).as("wk1"))
    time("site explode + hash")(sites)
    // + the duplicate-test aggregation (count per digest)
    val dupKeys = g.select(
        posexplode(graft.functions.charWindows(col("text"), L)).as(Seq("pidx", "win")))
      .select(xxhash64(col("win")).as("wk1"), xxhash64(lit(42L), col("win")).as("wk2"))
      .groupBy("wk1", "wk2").agg(count(lit(1)).as("nw")).filter(col("nw") >= 2)
    time("+ duplicate-test agg")(dupKeys)
    // the full dupWindowSites (adds the semi-join back + collision window)
    time("full dupWindowSites")(Dedup.dupWindowSites(g, L, withCanon = false))
    // islands merge on top
    time("+ islands")(Dedup.islandSpans(
      Dedup.dupWindowSites(g, L, withCanon = false).select("rep", "p"), L))
    // end-to-end queries for reference
    time("dedup_substring e2e")(graft.SparkEntry.queries("dedup_substring")(spark, dir))
    time("dedup_substring_apply e2e")(graft.SparkEntry.queries("dedup_substring_apply")(spark, dir))
    spark.stop()
  }
}

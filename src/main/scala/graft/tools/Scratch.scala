package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.entry(spark)
    println(s"[scratch] rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s"); df.collect().take(3).foreach(r => println(s"[scratch] row: $r")); println(s"[scratch] n_events total=${df.agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0)}")
    df.explain("formatted")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

object ScratchCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.dedupGroups(spark, dir).count()
      println(s"[scratch-cc] pass=$pass rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}

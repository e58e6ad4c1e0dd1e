package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract):
  * `runMain graft.tools.Scratch <sfDir> <query...>` prints each named
  * SparkEntry query's formatted plan and timed row count.
  */
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
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("hmm_decode_events")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(s"[scratch] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
      df.explain("formatted")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: per-query wall time at SPARK_GRAFT_SF_DIR.
  *
  * Hygiene: execution is forced through the `noop` datasource sink —
  * a `.count()` would let Catalyst prune projections, benchmarking
  * narrow per-row queries (text_*, scoring pipelines) as little more
  * than scan+count. Each query gets one untimed warm-up run (first
  * -touch parquet IO + the per-dir memoized caches), then the median
  * of SPARK_GRAFT_BENCH_RUNS (default 3) timed runs is reported, to
  * damp host-contention outliers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      once(fn) // warm-up, untimed
      val times = (1 to runs).map(_ => once(fn)).sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

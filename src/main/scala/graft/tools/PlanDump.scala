package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/profiling capture for the optimization rounds (not part of
  * the driver contract):
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <query...>
  *
  * For each named SparkEntry query: writes the `.explain("formatted")`
  * output to `<outDir>/<query>.txt` and prints a noop-sink wall time
  * (guide §1.4 — the noop sink computes every column of every row, so
  * narrow per-row work is actually timed, unlike count()). Sessions
  * mirror Bench's conf (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus) so the captured plans are the plans the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <query...>")
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      // `name#part` resolves the pre-cut build plans (SparkEntry.auditPlans)
      val fn = graft.SparkEntry.queries.getOrElse(name,
        graft.SparkEntry.auditPlans.getOrElse(name,
          sys.error(s"unknown query '$name'")))
      spark.sparkContext.setJobDescription(s"plandump: $name")
      // one untimed pass first: parquet footer/page-cache warm-up plus
      // the per-(session, dir) memoized relations, matching the state
      // Bench's timed passes see
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // explain AFTER execution so AQE-finalized choices are visible in
      // the text where the plan is adaptive
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"),
        f"-- $name%s  noop-sink warm time: $sec%.3f s  ($dir%s)\n" + plan)
      println(f"[plandump] $name%-32s $sec%8.3f s -> $outDir/$name.txt")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}

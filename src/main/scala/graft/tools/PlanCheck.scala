package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: print plan summaries for recently-added operators. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val flags = Seq(
        "TakeOrderedAndProject" -> p.contains("TakeOrderedAndProject"),
        "GlobalSort" -> p.contains("Sort ["),
        "CartesianProduct" -> p.contains("CartesianProduct"),
        "BroadcastHashJoin" -> p.contains("BroadcastHashJoin"),
        "SortMergeJoin" -> p.contains("SortMergeJoin"),
        "WholeStageCodegen" -> p.contains("WholeStageCodegen"))
      println(s"[plan] $name: " + flags.collect { case (k, true) => k }.mkString(", "))
      val rs = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq.distinct
      rs.foreach(s => println(s"[plan]   $s"))
    }
    audit("sample_hash", graft.operators.Curation.sampleHash(spark, dir))
    audit("ngram_top", graft.operators.Curation.ngramTop(spark, dir))
    audit("knn_ivf", graft.operators.Similarity.knnIvf(spark, dir))
    audit("events_json", graft.operators.RelationalExtras.eventsJson(spark, dir))
    audit("range_join", graft.operators.RelationalExtras.rangeJoin(spark, dir))
    audit("group_percentiles", graft.operators.RelationalExtras.groupPercentiles(spark, dir))
    audit("stratified_sample", graft.operators.Curation.stratifiedSample(spark, dir))
    audit("text_repetition", graft.operators.Curation.textRepetition(spark, dir))
    audit("media_framesample", graft.operators.Multimodal.frameSample(spark, dir))
    spark.stop()
  }
}

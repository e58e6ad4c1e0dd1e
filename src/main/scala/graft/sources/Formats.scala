package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage: CSV and JSON round trips with
  * explicit schemas (never inference — inference drifts types), and a
  * partitioned parquet sink (the layout a 100 TB table actually uses:
  * partition directories enable partition pruning at read time).
  */
object Formats {

  /** Scratch dir keyed by (input dir, process): concurrent gate runs
    * over different datasets (sf0.001 fast loop alongside sf0.01
    * verify) must not interleave overwrite-and-read on one path.
    */
  private def tmp(name: String, dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      f"${name}_${(dir.hashCode & 0x7fffffff)}%x_p${ProcessHandle.current().pid()}").toString

  /** customer → CSV → (schema-checked read) → JSON → read → dump.
    * Hash-equality with the original table proves both text formats
    * round-trip losslessly under explicit schemas.
    */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val orig = Tables.customer(spark, dir)
    val schema = orig.schema
    val csvPath = tmp("graft_fmt_csv", dir)
    val jsonPath = tmp("graft_fmt_json", dir)
    orig.write.mode("overwrite").option("header", "true").csv(csvPath)
    val fromCsv = spark.read.schema(schema).option("header", "true").csv(csvPath)
    fromCsv.write.mode("overwrite").json(jsonPath)
    spark.read.schema(schema).json(jsonPath).orderBy("c_custkey")
  }

  val formatRoundtripSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** lineitem → parquet partitioned by l_returnflag → read back →
    * per-partition aggregate. The scan of one flag touches one
    * directory (partition pruning); the oracle aggregates the
    * unpartitioned original.
    */
  def sinkPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp("graft_sink_part", dir)
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    spark.read.parquet(path)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val sinkPartitionedSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming jobs (SURVEY.md §2.8) — the streaming analog
  * of the batch sessionize/window aggregations: readStream over the
  * events parquet, event-time tumbling window + watermark, windowed
  * aggregate.
  *
  * The driver-facing queries run the stream to completion over the
  * static directory (processAllAvailable on a memory sink) in
  * COMPLETE output mode so the full result is comparable to the batch
  * equivalent. Note: complete mode retains all aggregation state (the
  * watermark is declared but does not evict) — fine for a finite test
  * corpus. Pointing the same transform at an unbounded production
  * source requires `update`/`append` output mode, where the declared
  * 30-minute watermark DOES bound state to the horizon, partitioned
  * by group key across executors.
  */
object StreamingJobs {

  /** events.parquet schema as stored (ts is TIMESTAMP(NANOS), read as
    * long under nanosAsLong — same handling as Tables.events).
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos under nanosAsLong
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming transform, defined once so batch parity tests run
    * the identical logic on a batch DataFrame.
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Streaming dedup as keep-earliest: first event time per
    * (user_id, event_type). Expressed as a streaming min-aggregate —
    * unlike dropDuplicates, the result is deterministic under any
    * arrival order, so it is directly comparable to the batch result
    * (at scale, in update mode, state is fixed-size per key and
    * watermark-bounded; complete mode here is for the finite corpus).
    */
  def dedupTransform(events: DataFrame): DataFrame =
    events
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), col("event_type"))
      .agg(unix_micros(min(col("ts"))).as("first_ts_us"))

  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sink = s"stream_dedup_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val query = dedupTransform(stream)
      .writeStream.outputMode("complete").format("memory").queryName(sink).start()
    try query.processAllAvailable() finally query.stop()
    spark.table(sink).orderBy("user_id", "event_type")
  }

  /** Run the windowed aggregation as a real stream over the static
    * events dir (one file per microbatch) into a memory sink, then
    * return the completed result.
    */
  def sessionAggStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sink = s"stream_session_agg_${System.nanoTime()}"
    // file-source streaming needs a directory: stream the sf dir,
    // glob-filtered to the events table (one file per microbatch)
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val query = windowAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sink)
      .start()
    try {
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sink)
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start_us", "event_type")
  }
}

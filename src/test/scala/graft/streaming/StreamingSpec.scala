package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {

  test("streaming windowed agg equals the batch result over the same data") {
    val streamed = StreamingJobs.sessionAggStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // identical transform applied in batch (ts arrives as long nanos)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchEvents = spark.read.parquet(s"$sfDir/events.parquet")
    val batch = StreamingJobs.windowAgg(batchEvents)
      .select(unix_micros(col("window.start")).as("s"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch, s"stream ${streamed.size} rows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
  }
}

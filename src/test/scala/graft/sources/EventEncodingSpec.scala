package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.streaming.StreamingJobs

/** The physical encoding of events.ts is not under graft's control and
  * has ALREADY changed underneath us once (INT64 TIMESTAMP(NANOS) →
  * parquet timestamp[us]/NTZ, which red-flagged 34 components in round
  * 8). This spec freezes the contract: the SAME event data written in
  * all three encodings a customer parquet lake can carry — int64
  * nanos-as-long, µs TIMESTAMP_NTZ, µs TIMESTAMP_LTZ — must produce
  * IDENTICAL results through both the batch reader (Tables.events) and
  * a streaming job (schema-probed reader). It also guards the worst
  * failure class: a misdeclared schema that reads successfully with
  * wrong values (the January-1970 collapse) — timestamps must land in
  * the corpus's actual era.
  */
class EventEncodingSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toFile.getAbsolutePath

  /** Write as a SINGLE file named events.parquet (the driver's table
    * layout — the streaming glob matches leaf files, not dirs). */
  private def writeSingle(df: DataFrame, dir: String): Unit = {
    val stage = s"$dir/_stage"
    df.coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
  }

  /** The same slice of real corpus events, written three ways. */
  private lazy val dirs: Map[String, String] = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") < 20) // small deterministic slice
    val ltz = tmp("graft_enc_ltz")
    val ntz = tmp("graft_enc_ntz")
    val ns  = tmp("graft_enc_ns")
    writeSingle(ev, ltz)
    writeSingle(ev.withColumn("ts", col("ts").cast("timestamp_ntz")), ntz)
    writeSingle(ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L)), ns) // int64 ns
    Map("ltz" -> ltz, "ntz" -> ntz, "ns" -> ns)
  }

  private def batchKey(dir: String): Set[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("Tables.events returns the identical instants under all three ts encodings") {
    val got = dirs.map { case (k, d) => k -> batchKey(d) }
    assert(got("ltz").nonEmpty)
    assert(got("ntz") == got("ltz"), "NTZ read diverged from LTZ")
    assert(got("ns") == got("ltz"), "int64-nanos read diverged from LTZ")
  }

  test("a streaming job returns the identical result under all three ts encodings") {
    val got = dirs.map { case (k, d) =>
      k -> StreamingJobs.streamDedup(spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(got("ltz").nonEmpty)
    assert(got("ntz") == got("ltz"), "NTZ stream diverged from LTZ")
    assert(got("ns") == got("ltz"), "int64-nanos stream diverged from LTZ")
  }

  test("event timestamps land in the corpus era, not 1970 (silent-collapse guard)") {
    val yrs = Tables.events(spark, sfDir)
      .select(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .collect().head
    val (lo, hi) = (yrs.getInt(0), yrs.getInt(1))
    assert(lo >= 2000 && hi <= 2100,
      s"event years [$lo, $hi] outside the plausible corpus era — " +
        "a misread timestamp encoding collapses to 1970 or explodes past 2100")
    // and the streaming path agrees with batch on absolute time
    val streamMax = StreamingJobs.streamDedup(spark, sfDir)
      .agg(max(col("first_ts_us"))).collect().head.getLong(0)
    val batchMax = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val y2000us = 946684800L * 1000000L
    assert(streamMax > y2000us, s"stream timestamps collapsed: $streamMax µs")
    assert(math.abs(streamMax - batchMax) < 365L * 24 * 3600 * 1000000,
      s"stream ($streamMax) and batch ($batchMax) disagree on absolute time")
  }
}

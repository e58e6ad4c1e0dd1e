package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables

class StreamingSpec extends AnyFunSuite {

  /** Write row chunks as chunk<i>.parquet files into a fresh dir —
    * one file per microbatch under maxFilesPerTrigger=1, written in
    * order so arrival tracks event time.
    */
  private def writeChunkDir(
      chunks: Seq[Seq[org.apache.spark.sql.Row]],
      schema: org.apache.spark.sql.types.StructType): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunks").toFile.getAbsolutePath
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataFrame(spark.sparkContext.parallelize(chunk, 1), schema)
      val stage = s"$tmp/stage$i"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/chunk$i.parquet"))
    }
    tmp
  }

  test("update-mode windowed agg: the watermark bounds state across microbatches") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1600000000L * 1000000000L // ns epoch, hour-aligned enough
    val hourNs = 3600L * 1000000000L
    val nHours = 12
    // 5 events per hour, one chunk per 2 hours -> 6 microbatches; every
    // 1-hour window's data lives inside a single chunk
    val chunks = (0 until nHours).grouped(2).map(_.flatMap(h =>
      (0 until 5).map(i => Row(
        h * 100L + i, base + h * hourNs + i * 300L * 1000000000L,
        1L, "click", 1.0, "{}")): Seq[Row]).toSeq).toSeq
    val dir = writeChunkDir(chunks, schema)
    val (sinkRows, states) = StreamingJobs.runWindowAggUpdate(spark, dir, "chunk*.parquet")
    val collected = sinkRows.collect()
    // every window was emitted, with its full per-window aggregate
    val byWindow = collected.groupBy(_.getStruct(0).getTimestamp(0))
    assert(byWindow.size == nHours, s"expected $nHours windows, saw ${byWindow.size}")
    byWindow.foreach { case (w, rows) =>
      assert(rows.exists(_.getLong(2) == 5L), s"window $w never reached n_events=5")
    }
    // the actual point: state must NOT accumulate one row per window
    // forever (complete mode would end at >= nHours rows). With a
    // 30-min watermark advancing 2h per batch, closed windows are
    // evicted and in-flight state stays a couple of windows deep.
    assert(states.nonEmpty, "no state-operator progress recorded")
    assert(states.max < nHours,
      s"state grew to ${states.max} rows — watermark never evicted (progress: $states)")
    assert(states.max <= 4,
      s"state not bounded near the watermark horizon: $states")
  }

  test("update-mode top-k leaderboard: upsert converges to complete mode, state bounded") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val baseSec = 1599998400L // exactly hour-aligned (444444 * 3600)
    val hourNs = 3600L * 1000000000L
    val minNs = 60L * 1000000000L
    val base = baseSec * 1000000000L
    val nHours = 12
    def ev(id: Long, tsNs: Long, tpe: String) = Row(id, tsNs, 1L, tpe, 1.0, "{}")
    // chunk k holds hours 2k and 2k+1 (3 clicks + 2 views each) plus,
    // for k >= 1, two straggler views for hour 2k-1 at minute 50 —
    // still ahead of the 30-minute watermark when chunk k processes,
    // so a CLOSED-LOOKING window's count is updated in a later
    // microbatch and the odd hours' leaderboard flips from
    // click-first to view-first only after the straggler batch: the
    // upsert sink must keep the latest emission per key.
    val chunks = (0 until nHours / 2).map { k =>
      val main = Seq(2 * k, 2 * k + 1).flatMap { h =>
        (0 until 3).map(i => ev(h * 100L + i, base + h * hourNs + i * 5 * minNs, "click")) ++
          (0 until 2).map(i => ev(h * 100L + 10 + i, base + h * hourNs + (10 + i) * minNs, "view"))
      }
      val stragglers =
        if (k == 0) Seq.empty
        else {
          val h = 2 * k - 1
          (0 until 2).map(i => ev(h * 100L + 20 + i, base + h * hourNs + (50 + i) * minNs, "view"))
        }
      (main ++ stragglers): Seq[Row]
    }
    val dir = writeChunkDir(chunks, schema)
    val (board, states) =
      StreamingJobs.streamTopkUpdate(spark, dir, k = 3, glob = "chunk*.parquet")
    val rows = board.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    (0 until nHours).foreach { h =>
      val ws = (baseSec + h * 3600L) * 1000000L
      val forH = rows.filter(_._1 == ws).sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq
      val expect =
        if (h % 2 == 1 && h < 11) Seq(("view", 4L, 1), ("click", 3L, 2))
        else Seq(("click", 3L, 1), ("view", 2L, 2))
      assert(forH == expect, s"hour $h: $forH")
    }
    // the update-mode upsert converges to the complete-mode answer
    val complete = StreamingJobs.streamTopk(spark, dir, k = 3, glob = "chunk*.parquet")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(rows.toSet == complete)
    // state stays near the watermark horizon, not leaderboard-sized
    // (complete mode would retain all nHours x 2 key rows)
    assert(states.nonEmpty, "no state-operator progress recorded")
    assert(states.max < nHours * 2, s"state never evicted: $states")
    assert(states.max <= 8, s"state not bounded near the horizon: $states")
  }

  test("append-mode session windows emit exactly the watermark-closed batch sessions") {
    import graft.operators.Relational
    val emitted = StreamingJobs.sessionWindowStream(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // batch truth with session END times (sessionize: user, sid, n,
    // start, end, value); closure rule: the final watermark is
    // maxTs - 30min and a session closes when watermark passes
    // end + 30min gap => emitted iff end < maxTs - 60min
    val batch = Relational.sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2), r.getDouble(5), r.getLong(4)))
    val maxTs = batch.map(_._5).max
    val horizon = maxTs - 60L * 60 * 1000000
    val closed = batch.filter(_._5 < horizon).map(t => (t._1, t._2, t._3, t._4)).toSet
    val open = batch.filter(_._5 >= horizon).map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(emitted == closed,
      s"emitted ${emitted.size} vs closed ${closed.size}; " +
        s"missing=${(closed -- emitted).take(3)} extra=${(emitted -- closed).take(3)}")
    // the tail is genuinely withheld (append semantics, not a bug)
    assert(open.nonEmpty && (emitted & open).isEmpty)
  }

  test("streaming windowed agg equals the batch result over the same data") {
    val streamed = StreamingJobs.sessionAggStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // identical transform applied in batch, on the RAW scan (whatever
    // ts encoding the files carry — windowAgg normalizes internally)
    val batch = graft.LocalSpark.withSessionConf(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true") {
      val batchEvents = spark.read.parquet(s"$sfDir/events.parquet")
      StreamingJobs.windowAgg(batchEvents)
        .select(unix_micros(col("window.start")).as("s"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    }
    assert(streamed == batch, s"stream ${streamed.size} rows vs batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("streaming HLL distinct equals the batch sketch estimate exactly") {
    // registers are per-bucket maxima, so microbatch-merged state must
    // land on the SAME registers as one batch pass — estimate equality
    // is exact, not approximate
    val streamed = StreamingJobs.streamHllDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .orderBy(col("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "streaming HLL state diverged from the batch sketch registers")
  }

  test("stateful sessionizer over >=3 microbatches with timeouts equals the single-batch result") {
    val ev = Tables.events(spark, sfDir) // ts normalized to TimestampType
    val schema = ev.schema
    val tsIdx = schema.fieldIndex("ts")
    val rows = ev.orderBy("ts").collect()
    val maxTsMs = rows.map(_.getTimestamp(tsIdx).getTime).max
    // sentinel far-future event (fake user -1): pushes the watermark
    // past every open session so event-time timeouts flush them
    val sentinel = org.apache.spark.sql.Row(
      -1L, new java.sql.Timestamp(maxTsMs + 2L * 3600 * 1000), -1L, "click", 0.0, "{}")
    val tmp = java.nio.file.Files.createTempDirectory("graft_msb").toFile.getAbsolutePath
    val chunkCount = 3
    val per = (rows.length + chunkCount - 1) / chunkCount
    // time-ordered chunks -> one file per microbatch (arrival tracks
    // event time, so the watermark advances monotonically)
    (rows.grouped(per).map(_.toSeq).toSeq :+ Seq(sentinel)).zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(chunk, 1), schema)
      val stage = s"$tmp/stage$i"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/chunk$i.parquet"))
    }
    val multi = StreamingJobs.runSessionizeStream(
      spark, tmp, glob = "chunk*.parquet", emitOpen = false, maxFilesPerTrigger = Some(1))
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val single = StreamingJobs.sessionizeStream(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(multi == single,
      s"multi-batch ${multi.size} sessions vs single-batch ${single.size}")
    assert(multi.nonEmpty)
    // session ids must stay unique per user across microbatches (the
    // bug this guards: per-invocation numbering restarting at 1)
    val keyed = multi.toSeq.map(s => (s._1, s._2))
    assert(keyed.distinct.size == keyed.size, "duplicate (user, session_id) keys")
  }

  test("timeout flush keeps the session counter for users who return later") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingJobs.{SessEvent, SessState}
    def ev(tsUs: Long, id: Long) =
      SessEvent(7L, tsUs, id, Some(1.0), new java.sql.Timestamp(tsUs / 1000))
    // an open session (counter at 3) times out with no new data:
    // it must be emitted as session 3 and the counter must SURVIVE
    val timedOut = TestGroupState.create[SessState](
      Optional.of(SessState(List(ev(1000000L, 1L)), 3L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(10L * 3600 * 1000)), hasTimedOut = true)
    val flushed = StreamingJobs.sessionizeFn(emitOpen = false)(
      7L, Iterator.empty, timedOut).toList
    assert(flushed.map(_.session_id) == List(3L))
    assert(timedOut.exists, "counter state must survive the timeout flush")
    assert(timedOut.get == SessState(Nil, 4L))
    // the user returns much later: the next closed session continues
    // at 4, not back at 1
    val returned = TestGroupState.create[SessState](
      Optional.of(SessState(Nil, 4L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), hasTimedOut = false)
    val later = 100L * 3600 * 1000000L // 100h, in micros
    val gap = StreamingJobs.SessionGapUs
    val out = StreamingJobs.sessionizeFn(emitOpen = false)(
      7L, Iterator(ev(later, 2L), ev(later + 2 * gap, 3L)), returned).toList
    assert(out.map(_.session_id) == List(4L), s"numbering restarted: $out")
    assert(returned.get.nextSessionId == 5L)
  }

  test("dropDuplicatesWithinWatermark keeps one row per key; equals min-agg under ordered arrival") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1600000000L * 1000000000L
    val minNs = 60L * 1000000000L
    // 3 chunks in event-time order; keys repeat across chunks
    val chunks = (0 until 3).map(c => (0 until 4).map(i =>
      Row(c * 10L + i, base + (c * 10 + i) * minNs,
        (i % 2).toLong, if (i < 2) "click" else "view", 1.0, "{}")))
    val dir = writeChunkDir(chunks, schema)
    val got = StreamingJobs.runDedupWithinWatermark(spark, dir, "chunk*.parquet")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    // exactly one row per (user, event_type) key
    assert(got.map(_._1).distinct.length == got.length, "duplicate keys survived")
    assert(got.map(_._1).toSet ==
      Set((0L, "click"), (1L, "click"), (0L, "view"), (1L, "view")))
    // ordered arrival (chunk replay) => first-arrived IS earliest event
    // time, so the kept timestamps equal the min-aggregate's
    val expectedTs = Map(
      (0L, "click") -> 0L, (1L, "click") -> 1L,
      (0L, "view") -> 2L, (1L, "view") -> 3L
    ).map { case (k, i) => k -> (base / 1000 + i * 60L * 1000000) }
    got.foreach { case (k, ts) =>
      assert(ts == expectedTs(k), s"key $k kept $ts, expected ${expectedTs(k)}")
    }
  }

  test("stream-stream join: results match batch semantics and join state is evicted") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1600000000L * 1000000000L // ns epoch
    val hourNs = 3600L * 1000000000L
    val minNs = 60L * 1000000000L
    val nHours = 10
    // per hour: one signup at :01 and purchases at :20 and :40 — each
    // purchase matches the signups of its own and the previous hour
    // (2h window), never older ones
    def signup(h: Int) =
      Row(h * 10L, base + h * hourNs + 1 * minNs, 1L, "signup", 1.0, "{}")
    def purchase(h: Int, k: Int) =
      Row(h * 10L + k, base + h * hourNs + (20 * k) * minNs, 1L, "purchase", 1.0, "{}")
    val chunks = (0 until nHours).map(h => Seq(signup(h), purchase(h, 1), purchase(h, 2)))
    val dir = writeChunkDir(chunks, schema)
    val (out, states) = StreamingJobs.runStreamJoin(spark, dir, "chunk*.parquet")
    val got = out.collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet // (s_event_id, p_event_id)
    // closed form: purchase (h, k) at h:20k matches signup h (h:01)
    // and signup h-1 ((h-1):01, gap 1h19 or 1h39 <= 2h)
    val expected = (for {
      h <- 0 until nHours; k <- 1 to 2
      sh <- Seq(h, h - 1) if sh >= 0
    } yield (sh * 10L, h * 10L + k)).toSet
    assert(got == expected,
      s"missing ${expected -- got}, spurious ${got -- expected}")
    // eviction: state must never hold everything seen, and must end
    // well below the 30 buffered rows (watermark 30min + 2h range ->
    // only the last ~3 hours of signups and ~1 hour of purchases
    // remain, modulo the 1-batch watermark lag)
    assert(states.nonEmpty)
    assert(states.max < 30, s"join state grew unbounded: $states")
    assert(states.last <= 15, s"final state not evicted: $states")
  }

  test("foreachBatch upsert over 3 microbatches keeps the global latest, not the last write") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1600000000L * 1000000000L
    val minNs = 60L * 1000000000L
    // user 1: monotone updates across all 3 batches (latest = batch 3)
    // user 2: batch 3 delivers a LATE event older than batch 1's —
    //         a blind last-write-wins overwrite would get this wrong
    // user 3: appears only in batch 2
    val chunks = Seq(
      Seq(Row(10L, base + 10 * minNs, 1L, "view", 1.0, "{}"),
          Row(11L, base + 50 * minNs, 2L, "purchase", 2.0, "{}")),
      Seq(Row(20L, base + 20 * minNs, 1L, "click", 3.0, "{}"),
          Row(21L, base + 30 * minNs, 3L, "signup", 4.0, "{}")),
      Seq(Row(30L, base + 40 * minNs, 1L, "purchase", 5.0, "{}"),
          Row(31L, base + 5 * minNs, 2L, "view", 6.0, "{}")) // late
    )
    val dir = writeChunkDir(chunks, schema)
    val got = StreamingJobs.streamUpsertGlob(spark, dir, "chunk*.parquet")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    val usBase = base / 1000
    assert(got(1L) == (("purchase", usBase + 40 * minNs / 1000, 5.0)), s"got ${got(1L)}")
    assert(got(2L) == (("purchase", usBase + 50 * minNs / 1000, 2.0)),
      s"late arrival must not win: ${got(2L)}")
    assert(got(3L) == (("signup", usBase + 30 * minNs / 1000, 4.0)), s"got ${got(3L)}")
    assert(got.size == 3)
  }
}

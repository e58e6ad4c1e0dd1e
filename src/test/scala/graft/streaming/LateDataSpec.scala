package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** Round-17 adversarial axis: WALL-CLOCK-SKEWED replay — event time
  * regresses across microbatches (a crawler backlog flush, a delayed
  * partition, a replayed kafka segment). The watermark is computed
  * from what already ARRIVED, so a skewed replay makes "late" rows out
  * of perfectly good data. These specs pin the exact semantics of
  * every production streaming path under that skew, so the behavior
  * is a documented contract, not an assumption:
  *
  *   - watermarked AGGREGATIONS (windowed agg, update mode): late
  *     filtering is EVICTION-based, with exactly one batch of slack —
  *     a beyond-watermark row whose window state is still live (the
  *     watermark advanced only at the previous batch END, eviction at
  *     that batch's commit) still AGGREGATES; once the state is
  *     evicted, the same row is dropped. Both halves pinned below —
  *     this one-batch slack is batch-boundary-dependent, which is
  *     exactly why the driver entries replay the corpus in ONE batch;
  *   - flatMapGroupsWithState: Spark does NOT filter late rows at all
  *     (the watermark drives timeouts only) — the group function SEES
  *     beyond-watermark events and owns the policy. The sessionizer's
  *     policy: a late event after its session's state was flushed
  *     starts a NEW session (counted, never silently lost) — the
  *     crawl-backlog behavior;
  *   - the corpus-replay ENTRIES are immune by construction: they
  *     ingest all files in ONE batch (no watermark has advanced yet),
  *     which is WHY the oracle can model them — re-asserted here on
  *     skewed chunk content;
  *   - stream_doc_dedup's first-seen is ARRIVAL-ordered by definition
  *     (no watermark): under skewed arrival the rep is the first
  *     ARRIVED doc, not the min id — pinned as intended semantics.
  */
class LateDataSpec extends AnyFunSuite {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val baseNs = 1600000000L * 1000000000L // hour-aligned ns epoch
  private def atMin(m: Long): Long = baseNs + m * 60L * 1000000000L

  private def writeChunkDir(chunks: Seq[Seq[Row]], schema: StructType): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_late").toFile.getAbsolutePath
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val stage = s"$tmp/stage$i"
      spark.createDataFrame(spark.sparkContext.parallelize(chunk, 1), schema)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/chunk$i.parquet"))
      // the file source orders by modification time: distinct mtimes
      // make the skewed delivery order deterministic
      Thread.sleep(1100)
    }
    tmp
  }

  private def ev(id: Long, min: Long, user: Long = 1L) =
    Row(id, atMin(min), user, "click", 1.0, "{}")

  // base (1600000000s) is NOT hour-aligned: windows start at
  // base − 1600 s. Key emissions by the minute offset of the window's
  // START from that grid.
  private def windowStartMin(r: Row): Long =
    (r.getStruct(0).getTimestamp(0).getTime * 1000L - (baseNs / 1000L - 1600L * 1000000L)) / 60000000L

  test("update-mode agg: a beyond-watermark row AGGREGATES while its window state is live (the one-batch eviction slack)") {
    // chunk 0: @5,@10 (window A) + @120 → watermark 90min is computed
    // at batch 0's END, so window A's state (end < 90) is still live
    // when batch 1 runs. chunk 1's @20 is beyond the watermark but
    // MERGES into the live state — count reaches 3. This is Spark's
    // actual update-mode contract (eviction-based, not input-filter-
    // based): batch-boundary-dependent, hence the single-batch corpus
    // replay convention for every oracled entry.
    val dir = writeChunkDir(Seq(
      Seq(ev(1, 5), ev(2, 10), ev(3, 120)),
      Seq(ev(4, 20), ev(5, 100))), evSchema)
    val (sink, _) = StreamingJobs.runWindowAggUpdate(spark, dir, "chunk*.parquet")
    val byWindow = sink.collect().groupBy(windowStartMin)
      .map { case (m, rs) => m -> rs.map(_.getLong(2)).max }
    assert(byWindow == Map(0L -> 3L, 120L -> 2L),
      s"one-batch-slack contract moved: $byWindow (expected @20 merged while state live)")
  }

  test("update-mode agg: once state is evicted, a beyond-watermark row is DROPPED deterministically") {
    // batch 0 as above (wm → 90 at its end); batch 1 (@100) lets the
    // commit evict window A (end 33min < wm 90); batch 2's @20 then
    // has no state to join and is dropped — no new emission, no
    // resurrected window.
    val dir = writeChunkDir(Seq(
      Seq(ev(1, 5), ev(2, 10), ev(3, 120)),
      Seq(ev(5, 100)),
      Seq(ev(4, 20))), evSchema)
    val (sink, states) = StreamingJobs.runWindowAggUpdate(spark, dir, "chunk*.parquet")
    val rows = sink.collect()
    val byWindow = rows.groupBy(windowStartMin).map { case (m, rs) => m -> rs.map(_.getLong(2)).max }
    assert(byWindow == Map(0L -> 2L, 120L -> 2L),
      s"post-eviction drop contract broke: $byWindow (expected @20 dropped)")
    assert(rows.count(windowStartMin(_) == 0L) == 1,
      "window A must not be re-emitted (or resurrected) after eviction")
    assert(states.lastOption.contains(1L),
      s"window A's state must stay evicted: $states")
  }

  test("flatMapGroupsWithState receives beyond-watermark rows — the group fn owns the late policy") {
    // chunk 0: user 1 @0,@5; user 2 @120 pushes the watermark to 90min.
    // chunk 1: user 1 @10 — beyond the watermark, but Spark does NOT
    // filter FMGWS input (the watermark drives timeouts only): the
    // function sees it and, its session state being gone, opens a NEW
    // session for it. The event is COUNTED, never silently dropped —
    // the policy a crawl-backlog flush wants.
    val dir = writeChunkDir(Seq(
      Seq(ev(1, 0), ev(2, 5), ev(3, 120, user = 2L)),
      Seq(ev(4, 10))), evSchema)
    val got = StreamingJobs.runSessionizeStream(spark, dir, "chunk*.parquet",
        emitOpen = true, maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // batch 0 emits (1,1,n=2) and (2,1,n=1); batch 1 emits the late
    // event as a fresh user-1 session (emitOpen's replay convention
    // resets numbering — the checkpointed production path keeps the
    // counter, RecoverySpec territory)
    assert(got.count { case (u, _, n) => u == 1L && n == 1L } == 1,
      s"the late @10 event must surface as its own session: $got")
    assert(got.contains((1L, 1L, 2L)) && got.contains((2L, 1L, 1L)),
      s"pre-skew sessions must be intact: $got")
  }

  test("the corpus-replay convention is immune: one batch sees everything, skew or not") {
    // same skewed content, ingested the way the driver entries ingest
    // (all files in one batch): nothing is late because no watermark
    // has advanced yet — the batch-oracle equivalence the gate relies on
    val dir = writeChunkDir(Seq(
      Seq(ev(1, 5), ev(2, 10), ev(3, 120)),
      Seq(ev(4, 20), ev(5, 100))), evSchema)
    val got = StreamingJobs.runSessionizeStream(spark, dir, "chunk*.parquet",
        emitOpen = true, maxFilesPerTrigger = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: @5,@10,@20 gap<=30 one session; @100,@120 second session
    assert(got == Map((1L, 1L) -> 3L, (1L, 2L) -> 2L),
      s"single-batch replay must see every row: $got")
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("stream_doc_dedup first-seen is arrival-ordered under skewed id arrival (documented semantics)") {
    val t = "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10"
    def doc(id: Long) = Row(id, t, "en", "web", t.length.toLong)
    val dir = writeChunkDir(Seq(Seq(doc(10), doc(11)), Seq(doc(1))), docSchema)
    // batch verification side reads the full corpus
    val all = Seq(doc(10), doc(11), doc(1))
    val stage = s"$dir/stage_docs"
    spark.createDataFrame(spark.sparkContext.parallelize(all, 1), docSchema)
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/documents.parquet"))

    val got = StreamingJobs.streamDocDedup(spark, dir,
        srcGlob = "chunk*.parquet", maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // arrival order is 10, 11, 1: doc 10 is FIRST SEEN (not min-id doc
    // 1, which arrives last and is flagged a dup) — a crawl's
    // first-seen is ingest order, which is exactly what the
    // single-batch driver replay + in-batch sort normalizes to id
    // order for the oracle
    assert(got == Map(10L -> false, 11L -> true, 1L -> true),
      s"arrival-ordered first-seen contract broke: $got")
  }

  test("stream_doc_dedup near-count is ID-ordered even under skewed arrival (documented semantics)") {
    // r18 (r17 ADVICE): the near-neighbor count keys "earlier" on the
    // neighbor's rep doc_id (nrep < doc_id), NOT on arrival — a near
    // text that ARRIVES later but carries a smaller id still counts as
    // an earlier neighbor. That is the contract the id-arithmetic
    // oracle (rep < doc_id) computes at every tier, so it is pinned
    // here under the adversarial arrival order instead of silently
    // differing from it. first_seen/exact_dup stay arrival-ordered
    // (previous test) — the two verdicts deliberately use different
    // orders, both now pinned.
    val base = (1 to 40).map(i => f"w$i%02d")
    val tA = base.mkString(" ")                      // 38 shingles
    val tB = (base.init :+ "zz").mkString(" ")       // differs in last token: J = 35/41 ≈ 0.854
    val dir = writeChunkDir(Seq(
      Seq(Row(10L, tA, "en", "web", tA.length.toLong)),
      Seq(Row(1L, tB, "en", "web", tB.length.toLong))), docSchema)
    val all = Seq(Row(10L, tA, "en", "web", tA.length.toLong),
      Row(1L, tB, "en", "web", tB.length.toLong))
    val stage = s"$dir/stage_docs"
    spark.createDataFrame(spark.sparkContext.parallelize(all, 1), docSchema)
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/documents.parquet"))

    val got = StreamingJobs.streamDocDedup(spark, dir,
        srcGlob = "chunk*.parquet", maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // doc 10 (arrived FIRST) counts rep 1 as an earlier near neighbor
    // because 1 < 10 in id order; doc 1 (arrived second) counts none.
    assert(got == Map(10L -> ((false, 1L)), 1L -> ((false, 0L))),
      s"id-ordered near-count contract broke: $got")
  }
}

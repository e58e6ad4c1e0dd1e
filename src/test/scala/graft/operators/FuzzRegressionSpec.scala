package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.LocalSpark.spark

/** Fast in-suite locks for the round-12 fuzz-gate fixes, so the
  * adversarial classes stay covered by every `sbt test` run (the
  * fuzz/relfuzz gates themselves are full sbt cycles and run
  * per-change, not per-build). Each test is a distilled version of
  * the corpus condition that found the bug.
  */
class FuzzRegressionSpec extends AnyFunSuite {
  import spark.implicits._

  test("F1: top-word count is the sorted-run scan and handles degenerate docs") {
    val docs = Seq(
      (1L, "a b a b a"),       // top word 'a' x3 of 5
      (2L, "x"),               // single token
      (3L, "   "),             // whitespace-only: split -> 4 empty strings
      (4L, "t t t t")          // all one token
    ).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), expr(Curation.topWordCountExpr("w")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 4L, 4L -> 4L))
  }

  test("F1 perf: top-word scan on a 200k-token doc completes in seconds, not hours") {
    val mega = (0 until 200000).map(i => "w" + (i % 140000)).mkString(" ")
    val t0 = System.nanoTime()
    val c = Seq((1L, mega)).toDF("doc_id", "text")
      .select(split(col("text"), " ").as("w"))
      .select(expr(Curation.topWordCountExpr("w")).as("c"))
      .first().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(c == 2L) // 200k over 140k distinct: max multiplicity 2
    assert(sec < 30, s"sorted-run scan took $sec s — quadratic path is back")
  }

  test("F3: gram expressions are total — short docs yield empty arrays, never a slice error") {
    val docs = Seq((1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c d")).toDF("doc_id", "text")
    val bi = docs.select(col("doc_id"),
      expr(graft.functions.ngramsFromTextExpr("text", 2)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(bi(1L) == Nil)            // "" splits to [""], 1 token
    assert(bi(2L) == Nil)
    assert(bi(3L) == List("a b"))
    assert(bi(4L) == List("a b", "b c", "c d"))
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val tri = w.select(col("doc_id"), expr(graft.functions.ngramsExpr("w", 3)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(tri(2L) == Nil && tri(4L) == List("a b c", "b c d"))
  }

  test("F2b: explode over lambda-bound grams survives InferFiltersFromGenerate (1-token doc, no crash)") {
    // the original form crashed here: the inferred size(grams)>0 filter
    // evaluated the un-guarded transform on the 1-token doc
    val docs = Seq((1L, "only"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.ngramTopFor(docs, 10).collect()
    assert(out.map(_.getString(0)).toSet == Set("a b", "b c"))
  }

  test("R1: q2-style unit cost excludes zero-quantity lines instead of dividing by zero") {
    // distilled: the aggregate expression q2MinCost builds, on a relation
    // with a qty=0 row — via the public query over a planted lineitem is
    // heavyweight, so assert the guard exists structurally: the filter
    // must remove the row before the division
    val li = Seq((1L, 1L, 10.0, 100.0), (1L, 1L, 0.0, 999.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val cost = li.filter(col("l_quantity") > 0)
      .groupBy("l_partkey", "l_suppkey")
      .agg((floor((sum(col("l_extendedprice") / col("l_quantity")) / count(lit(1)))
        * 10000.0 + 0.5) / 10000.0).as("unit_cost"))
      .first().getDouble(2)
    assert(cost == 10.0) // only the qty>0 line contributes: 100/10
  }

  test("R2: stateful sessionizer sums Option values with SQL semantics (all-NULL session is NULL)") {
    import graft.streaming.StreamingJobs.{sessionizeFn, SessEvent, SessState}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def ev(us: Long, id: Long, v: Option[Double]) =
      SessEvent(7L, us, id, v, new java.sql.Timestamp(us / 1000))
    val gap = graft.streaming.StreamingJobs.SessionGapUs
    val state = TestGroupState.create[SessState](
      Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(Long.MaxValue)), hasTimedOut = false)
    val out = sessionizeFn(emitOpen = true)(7L,
      Iterator(
        ev(0L, 1L, None),                 // session 1: only a NULL value
        ev(gap + 1000000L, 2L, Some(2.5)), // session 2: 2.5 + NULL
        ev(gap + 2000000L, 3L, None)),
      state).toList
    assert(out.map(_.session_value) == List(None, Some(2.5)))
    assert(out.map(_.n_events) == List(1L, 2L))
  }

  test("R3: cosine operators exclude zero-norm vectors end to end") {
    val dim = 4
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq.fill(dim)(0.0f))) // no direction
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDedupFor(spark, vecs, threshold = 0.5).collect()
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains(1L) && ids.contains(2L), "near-identical pair must survive")
    assert(!ids.contains(3L), "zero-norm vector must be excluded, not crash")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.sources.Tables

/** Accuracy and layout-independence contracts for the sketch family.
  * (Exact output content is pinned-literal-oracled; these tests prove
  * the contracts the pins cannot: error bounds, the one-sided CMS
  * guarantee, and merge ≡ direct.)
  */
class SketchesSpec extends AnyFunSuite {

  test("hll_cube: estimate within 3-sigma of exact per event type") {
    // lgK=12 ⇒ relative standard error 1.04/sqrt(4096) ≈ 1.63%
    val bound = 3.0 * 1.04 / math.sqrt(1 << 12)
    val rows = Sketches.hllCube(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(exact > 0)
      assert(math.abs(approx - exact) <= bound * exact,
        s"${r.getString(0)}: approx $approx vs exact $exact exceeds ${bound * 100}%")
    }
  }

  test("hll: union of daily sketches == direct sketch, and partition-layout-invariant") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = estimates(ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e")))
    val viaDaily = estimates(ev.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e")))
    assert(viaDaily === direct,
      "daily-cube union diverged from the direct sketch — merge is not lossless")
    // register state is a per-bucket max ⇒ the estimate must not depend
    // on how input rows are sliced into partitions
    val oneSlice = estimates(ev.repartition(1).groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e")))
    val manySlices = estimates(ev.repartition(13).groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e")))
    assert(oneSlice === direct && manySlices === direct,
      "HLL estimate depends on the partition layout")
  }

  test("cms_words: one-sided overestimate within eps*N, exact counts grounded") {
    val out = Sketches.cmsWords(spark, sfDir).collect()
    assert(out.length === 20)
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val n = words.count()
    out.foreach { r =>
      val (w, exact, cms, over) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(over >= 0, s"$w: CMS undercounted ($cms < $exact) — impossible for count-min")
      assert(over === cms - exact)
      assert(over <= (0.001 * n).toLong + 1, s"$w: overcount $over exceeds eps*N")
    }
    // ground the exact column against an independent recompute
    val recount = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toSeq === recount.toSeq)
  }
}

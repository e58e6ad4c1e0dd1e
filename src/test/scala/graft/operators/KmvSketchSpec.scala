package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KmvSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}
import graft.functions.{kmvEstimate, kmvIntersect, kmvSketch, kmvUnion}
import graft.sources.Tables

/** Contracts for the bottom-k (KMV) sketch family: exactness below k,
  * layout-invariance of the BINARY sketch, union composability,
  * intersection accuracy on planted sets, and the SQL registration.
  */
class KmvSketchSpec extends AnyFunSuite {

  import spark.implicits._

  test("exact mode: estimate equals countDistinct while distinct < k") {
    val df = (1L to 500L).flatMap(i => Seq(i, i)).toDF("v") // duplicates collapse
    val est = df.agg(kmvEstimate(kmvSketch(col("v"))).as("e")).head.getDouble(0)
    assert(est === 500.0)
  }

  test("sketch bytes are identical under any partition layout") {
    val ev = Tables.events(spark, sfDir).select(col("user_id"))
    def bytes(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.agg(kmvSketch(col("user_id")).as("sk")).head.getAs[Array[Byte]](0).toSeq
    val one = bytes(ev.repartition(1))
    val many = bytes(ev.repartition(13))
    assert(one === many, "bottom-k sketch depends on the partition layout")
  }

  test("union of per-type sketches == sketch of all users (bit-identical)") {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("user_id"))
    val whole = ev.agg(kmvSketch(col("user_id")).as("sk")).head.getAs[Array[Byte]](0)
    val parts = ev.groupBy(col("event_type"))
      .agg(kmvSketch(col("user_id")).as("sk"))
      .agg(org.apache.spark.sql.functions.reduce(
        collect_list(col("sk")),
        first(col("sk")), // non-empty by construction; seed = any element
        (acc, x) => kmvUnion(acc, x)).as("merged"))
      .head.getAs[Array[Byte]](0)
    assert(parts.toSeq === whole.toSeq,
      "kmv_union of partial sketches diverged from the direct sketch")
  }

  test("estimation mode: planted 60k-distinct set within 4-sigma of exact") {
    // k=1024 ⇒ relative standard error ≈ 1/sqrt(k-2) ≈ 3.1%
    val n = 60000L
    val df = (1L to n).toDF("v")
    val est = df.agg(kmvEstimate(kmvSketch(col("v"))).as("e")).head.getDouble(0)
    val bound = 4.0 / math.sqrt(1022.0)
    assert(math.abs(est - n) <= bound * n, s"estimate $est vs exact $n")
  }

  test("intersection: planted overlap estimated within bounds; disjoint sets at ~0") {
    // A = [1, 40000], B = [20001, 60000] ⇒ |A∩B| = 20000, |A∪B| = 60000
    val a = (1L to 40000L).toDF("v").agg(kmvSketch(col("v")).as("sk")).head.getAs[Array[Byte]](0)
    val b = (20001L to 60000L).toDF("v").agg(kmvSketch(col("v")).as("sk")).head.getAs[Array[Byte]](0)
    val (ka, ha) = KmvSketch.deserialize(a)
    val (kb, hb) = KmvSketch.deserialize(b)
    assert(ka === 1024 && kb === 1024)
    val est = KmvSketch.intersectEstimate(1024, ha, hb)
    // ρ/k is a binomial proportion around 1/3 ⇒ give the compounded
    // estimator a generous 20% relative band (deterministic given the
    // hash family, so this can never flake — it either holds or not)
    assert(math.abs(est - 20000.0) <= 4000.0, s"overlap estimate $est vs exact 20000")
    val c = (100001L to 140000L).toDF("v").agg(kmvSketch(col("v")).as("sk")).head.getAs[Array[Byte]](0)
    val (_, hc) = KmvSketch.deserialize(c)
    val estDisjoint = KmvSketch.intersectEstimate(1024, ha, hc)
    assert(estDisjoint <= 0.01 * 80000.0, s"disjoint sets estimated at $estDisjoint")
  }

  test("sketch_kmv_overlap: estimates track the exact columns per pair") {
    val rows = Sketches.kmvOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (estA, estB, estOv) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (exA, exB, exOv) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(math.abs(estA - exA) <= 0.15 * exA + 1)
      assert(math.abs(estB - exB) <= 0.15 * exB + 1)
      assert(math.abs(estOv - exOv) <= 0.2 * math.max(exA, exB) + 1,
        s"${r.getString(0)}x${r.getString(1)}: est $estOv vs exact $exOv")
    }
  }

  test("SQL surface: graft_kmv family registered via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val est = spark.sql(
      "SELECT graft_kmv_estimate(graft_kmv(user_id)) AS e FROM " +
        s"parquet.`$sfDir/events.parquet`").head.getDouble(0)
    val exact = Tables.events(spark, sfDir)
      .agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(est === exact.toDouble || math.abs(est - exact) <= 0.13 * exact)
    val inter = spark.sql(
      "SELECT graft_kmv_intersect(graft_kmv(user_id, 256), graft_kmv(user_id, 256)) AS i " +
        s"FROM parquet.`$sfDir/events.parquet`").head.getDouble(0)
    assert(inter > 0.0)
  }
}

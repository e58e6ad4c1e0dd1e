package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark
import graft.operators.RelationDigest

/** The digest companions (hmm_*_digest, stream_session_window_digest)
  * carry the driver's exact-hash signal for row sets too large to pin,
  * so the digest itself must be (a) insensitive to everything Spark is
  * allowed to vary — row order, partitioning, fold order — and (b)
  * sensitive to everything a correctness bug would change — any value,
  * row count, duplicates, nulls.
  */
class RelationDigestSpec extends AnyFunSuite {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = RelationDigest.digest(df).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private val base = Seq((1L, "a", 1.5), (2L, "b", 2.25), (3L, "c", -0.75))

  test("digest is invariant to row order and partitioning") {
    val df = base.toDF("id", "s", "x")
    val d0 = one(df)
    assert(one(df.orderBy($"id".desc)) === d0)
    assert(one(df.repartition(7)) === d0)
    assert(one(df.repartition(1)) === d0)
  }

  test("digest is sensitive to any single value change and to row count") {
    val d0 = one(base.toDF("id", "s", "x"))
    val changed = one(Seq((1L, "a", 1.5), (2L, "b", 2.25), (3L, "c", -0.7500001)).toDF("id", "s", "x"))
    assert(changed !== d0)
    val dropped = one(base.take(2).toDF("id", "s", "x"))
    assert(dropped !== d0)
  }

  test("an even number of duplicated rows cancels in XOR but is caught by n and sig_sum") {
    val df = base.toDF("id", "s", "x")
    val (n0, _, sum0) = one(df)
    val (n1, xor1, sum1) = one(df.union(df))
    assert(xor1 === 0L) // XOR alone would be blind here — why sig_sum exists
    assert(n1 === 2 * n0 && sum1 === 2 * sum0)
  }

  test("null is distinguished from adjacent-column collisions and from the string rendering") {
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("y"))).toDF("id", "s")
    val withStr  = Seq((1L, Some("null")), (2L, Some("y"))).toDF("id", "s")
    assert(one(withNull) !== one(withStr))
    // concat_ws would silently DROP a null column — (1, null, "y") must
    // not collide with (1, "y", null)
    val leftNull  = Seq((1L, Option.empty[String], Some("y"))).toDF("id", "a", "b")
    val rightNull = Seq((1L, Some("y"), Option.empty[String])).toDF("id", "a", "b")
    assert(one(leftNull) !== one(rightNull))
  }

  test("digest of the live decode queries is 1 row with non-degenerate signatures") {
    val d = RelationDigest.digest(
      graft.hmm.HmmQueries.viterbi(spark, LocalSpark.sfDir)).collect()
    assert(d.length === 1)
    assert(d.head.getLong(0) > 0 && d.head.getLong(2) > 0)
  }
}

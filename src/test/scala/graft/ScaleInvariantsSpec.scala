package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark
import graft.tools.{ScaleInvariants, ScaleUp}

/** The scaled-tier gate (SCALE_GATE_r11.md) books nine queries as
  * DuckDB-oracle-infeasible at ~sf1; [[ScaleInvariants]] closes them
  * with closed-form blow-up expectations derived from the base tier.
  * This spec runs the whole machinery at sf0.001 × 6 so the invariant
  * DERIVATIONS themselves are test-guarded: a wrong formula (clique
  * term, count scaling, canonical-label rule) fails here in seconds,
  * not at the manual ~sf1 run.
  *
  * K = 6 is the smallest K that keeps every check live (knn_brute needs
  * K−1 ≥ 5 clones to pin the full top-5 at cos 1.0).
  */
class ScaleInvariantsSpec extends AnyFunSuite {

  test("closed-form scaled invariants hold on a K=6 sf0.001 corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft_scaleinv").toString
    ScaleUp.scale(spark, LocalSpark.sfDir, out, copies = 6)
    val results = ScaleInvariants.run(spark, LocalSpark.sfDir, out, copies = 6)
    val fails = results.collect { case (n, f: ScaleInvariants.Fail) => s"$n: ${f.detail}" }
    assert(fails.isEmpty, s"invariant failures:\n${fails.mkString("\n")}")
    // every check except pagerank must actually run on this corpus —
    // a Skip here means a precondition derivation regressed, not data
    val mayNotSkip = results.filter(_._1 != "pagerank")
    val skips = mayNotSkip.collect { case (n, s: ScaleInvariants.Skip) => s"$n: ${s.reason}" }
    assert(skips.isEmpty, s"unexpected skips:\n${skips.mkString("\n")}")
    // pagerank may Skip only on its booked rank-tie boundary precondition
    results.toMap.apply("pagerank") match {
      case ScaleInvariants.Pass | ScaleInvariants.Skip(_) => ()
      case other => fail(s"pagerank: $other")
    }
  }
}

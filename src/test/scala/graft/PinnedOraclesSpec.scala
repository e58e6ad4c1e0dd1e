package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

/** Drift tripwire for the pinned-literal oracles (PinnedOracleData):
  * recomputes every pinned query from the distributed path at sf0.001
  * and requires STRING-equal rendered rows. A Spark upgrade that
  * changes any pinned-against knob (xxhash64 family, sum/avg fold
  * order, java.util.Random stream, round()/toString rendering — see
  * PinnedOracles) fails here with a row-level diff, locally, instead
  * of as an opaque hash mismatch at the driver.
  */
class PinnedOraclesSpec extends AnyFunSuite {

  private def recomputeDiffs(tier: Int, dir: String): Seq[String] =
    PinnedOracleData.byName.toSeq.sortBy(_._1)
      .filter(_._2.hasTier(tier)) // a pin may lack a tier-4 capture (size guard)
      .flatMap { case (name, pin) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val live = df.collect().map(r => PinnedOracles.renderRow(r, df.schema)).toSeq
      val pinned = pin.rowsFor(tier)
      if (live == pinned) None
      else {
        val firstBad = live.zipAll(pinned, "<missing>", "<missing>")
          .indexWhere { case (a, b) => a != b }
        Some(s"$name: live ${live.size} rows vs pinned ${pinned.size}, first diff at row " +
          s"$firstBad: live='${live.lift(firstBad).getOrElse("")}' " +
          s"pinned='${pinned.lift(firstBad).getOrElse("")}'")
      }
    }

  test("every pinned oracle matches a fresh distributed recompute at sf0.001") {
    val diffs = recomputeDiffs(1, sfDir)
    assert(diffs.isEmpty,
      "pinned oracles drifted (regenerate with graft.tools.PinGen after " +
        s"confirming the cause is a deliberate version/knob change):\n${diffs.mkString("\n")}")
  }

  // Tier-2/3 pins are normally exercised only by the driver gate; this
  // opt-in sweep (used by the verify skill's pin-regeneration recipe)
  // recomputes tier 2 locally so a tier-specific drift fails here with a
  // row diff instead of as an opaque driver hash mismatch.
  test("tier-2 pins match a recompute at sf0.01 (opt-in: GRAFT_PIN_TIER2=1)") {
    assume(sys.env.get("GRAFT_PIN_TIER2").contains("1"),
      "set GRAFT_PIN_TIER2=1 to run the tier-2 pin sweep")
    val diffs = recomputeDiffs(2, "/root/testdata/sf0.01")
    assert(diffs.isEmpty, s"tier-2 pinned oracles drifted:\n${diffs.mkString("\n")}")
  }

  // Tier 4 = the ScaleUp ×10 self-scaled corpus (ephemeral, /tmp) —
  // the round-12 scaled pin tier that runs the trainer family and the
  // ANN stack through an exact-content check at 10× the driver's
  // largest SF. Opt-in like tier 2; additionally requires the corpus
  // (rebuild: graft.tools.ScaleUp, deterministic map-only transform).
  test("tier-4 pins match a recompute on the sfx1 corpus (opt-in: GRAFT_PIN_SFX1=1)") {
    assume(sys.env.get("GRAFT_PIN_SFX1").contains("1"),
      "set GRAFT_PIN_SFX1=1 to run the tier-4 pin sweep")
    val dir = sys.env.getOrElse("GRAFT_SFX1_DIR", "/tmp/graft_sfx1")
    assume(new java.io.File(dir).isDirectory, s"$dir missing — run graft.tools.ScaleUp first")
    val diffs = recomputeDiffs(4, dir)
    assert(diffs.isEmpty, s"tier-4 pinned oracles drifted:\n${diffs.mkString("\n")}")
  }

  // Tier 5 = the ScaleUp ×100 corpus (round 15): the pinned surface —
  // the reference's own HMM family, kmeans/PQ/IVF, BPE, the sketches —
  // content-checked at the tier that keeps finding bugs. Heavy (the
  // trainers run over 10M events); opt-in like tier 4.
  test("tier-5 pins match a recompute on the sfx10 corpus (opt-in: GRAFT_PIN_SFX10=1)") {
    assume(sys.env.get("GRAFT_PIN_SFX10").contains("1"),
      "set GRAFT_PIN_SFX10=1 to run the tier-5 pin sweep")
    val dir = sys.env.getOrElse("GRAFT_SFX10_DIR", "/tmp/graft_sfx10")
    assume(new java.io.File(dir).isDirectory, s"$dir missing — run graft.tools.ScaleUp first")
    val diffs = recomputeDiffs(5, dir)
    assert(diffs.isEmpty, s"tier-5 pinned oracles drifted:\n${diffs.mkString("\n")}")
  }

  test("pinned SQL embeds the tier discriminator iff the result is corpus-dependent") {
    PinnedOracleData.byName.foreach { case (name, pin) =>
      val tiered = pin.rows.size > 1
      assert(pin.sql.contains("FROM lineitem") == tiered, s"$name: tiered=$tiered but sql disagrees")
      // seeded, dir-independent models must have collapsed to one tier
      if (Set("hmm_random_model", "hmm_model_from_distributions")(name))
        assert(!tiered, s"$name is dir-independent but captured as tiered")
    }
  }
}

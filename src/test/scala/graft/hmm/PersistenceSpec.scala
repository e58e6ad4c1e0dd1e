package graft.hmm

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.{sfDir, spark}

/** Model persistence, checkpoint/resume, and the CLI training driver
  * (reference surface: BaumWelchUtils model IO, BaumWelchDriver
  * model-N checkpoints + CLI).
  */
class PersistenceSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toFile.getAbsolutePath

  test("named model round-trips exactly through ModelIO parquet") {
    val m = HmmModel.random(3, 4, seed = 7L)
      .withNames(Seq("idle", "browse", "buy"), Seq("a", "b", "c", "d"))
    val path = s"${tmp("graft_mio")}/model"
    ModelIO.save(spark, m, path, logLiks = Seq(-10.5, -9.25))
    val (loaded, lls) = ModelIO.load(spark, path)
    loaded.validate()
    assert(loaded.numStates == 3 && loaded.numSymbols == 4)
    assert(loaded.pi.toSeq == m.pi.toSeq)
    assert(loaded.a.flatten[Double].toSeq == m.a.flatten[Double].toSeq)
    assert(loaded.b.flatten[Double].toSeq == m.b.flatten[Double].toSeq)
    assert(loaded.stateNames.contains(IndexedSeq("idle", "browse", "buy")))
    assert(loaded.symbolNames.contains(IndexedSeq("a", "b", "c", "d")))
    assert(lls.toSeq == Seq(-10.5, -9.25))
    assert(loaded.stateName(2) == "buy" && loaded.symbolName(0) == "a")
  }

  test("unnamed model round-trips with default names and no name rows") {
    val m = HmmModel.random(2, 3, seed = 11L)
    val path = s"${tmp("graft_mio_un")}/model"
    ModelIO.save(spark, m, path)
    val (loaded, lls) = ModelIO.load(spark, path)
    assert(loaded.stateNames.isEmpty && loaded.symbolNames.isEmpty)
    assert(loaded.stateName(1) == "s1" && loaded.symbolName(2) == "o2")
    assert(lls.isEmpty)
    assert(loaded.frobeniusDistance(m) == 0.0)
  }

  test("checkpointed fit resumed mid-run converges to the uninterrupted trajectory") {
    import spark.implicits._
    val m = Sequencer.vocab(spark, sfDir).count().toInt
    val seqs = Sequencer.sequenceDs(spark, sfDir).map(_._2.toArray).rdd.cache()
    try {
      val init = HmmModel.random(3, m, seed = 5L)
      val full = BaumWelch.fit(seqs, init, maxIterations = 8, epsilon = 0.0)
      val ckpt = tmp("graft_ckpt")
      // crash after 3 iterations, then resume to 8
      BaumWelch.fit(seqs, init, maxIterations = 3, epsilon = 0.0,
        checkpointDir = Some(ckpt))
      assert(BaumWelch.latestCheckpoint(spark, ckpt).map(_._1).contains(3))
      val resumed = BaumWelch.fit(seqs, init, maxIterations = 8, epsilon = 0.0,
        checkpointDir = Some(ckpt), resume = true)
      assert(resumed.iterations == 8)
      assert(resumed.logLikPerIter.length == full.logLikPerIter.length)
      resumed.logLikPerIter.zip(full.logLikPerIter).foreach { case (r, f) =>
        assert(math.abs(r - f) < 1e-6, s"loglik diverged: $r vs $f")
      }
      assert(resumed.model.frobeniusDistance(full.model) < 1e-9,
        "resumed model differs from the uninterrupted one")
      // the resume really did skip work: checkpoints now reach iter 8
      assert(BaumWelch.latestCheckpoint(spark, ckpt).map(_._1).contains(8))
    } finally seqs.unpersist()
  }

  test("a fresh checkpointed fit clears stale model-N dirs from earlier runs") {
    import spark.implicits._
    val m = Sequencer.vocab(spark, sfDir).count().toInt
    val seqs = Sequencer.sequenceDs(spark, sfDir).map(_._2.toArray).rdd.cache()
    try {
      val ckpt = tmp("graft_stale")
      BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 1L),
        maxIterations = 4, epsilon = 0.0, checkpointDir = Some(ckpt))
      assert(BaumWelch.latestCheckpoint(spark, ckpt).map(_._1).contains(4))
      // a NEW run (resume=false, different seed, fewer iterations)
      // must not leave the old model-3/model-4 behind as resume bait
      val fresh = BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 2L),
        maxIterations = 2, epsilon = 0.0, checkpointDir = Some(ckpt))
      assert(BaumWelch.latestCheckpoint(spark, ckpt).map(_._1).contains(2),
        "stale higher-numbered checkpoints survived a fresh run")
      // resume now extends THIS trajectory, not the old one
      val resumed = BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 2L),
        maxIterations = 3, epsilon = 0.0, checkpointDir = Some(ckpt), resume = true)
      assert(resumed.iterations == 3)
      assert(resumed.logLikPerIter.take(2).toSeq == fresh.logLikPerIter.toSeq)
    } finally seqs.unpersist()
  }

  test("resume skips partial checkpoints and respects a persisted converged flag") {
    import spark.implicits._
    val m = Sequencer.vocab(spark, sfDir).count().toInt
    val seqs = Sequencer.sequenceDs(spark, sfDir).map(_._2.toArray).rdd.cache()
    try {
      val ckpt = tmp("graft_partial")
      BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 5L),
        maxIterations = 3, epsilon = 0.0, checkpointDir = Some(ckpt))
      // simulate a driver crash mid-write: model-4 exists but never
      // committed (no _SUCCESS) -> resume must fall back to model-3
      val partial = new java.io.File(s"$ckpt/model-4")
      assert(partial.mkdirs())
      assert(BaumWelch.latestCheckpoint(spark, ckpt).map(_._1).contains(3),
        "partial checkpoint without _SUCCESS must be skipped")

      // converged flag survives the round trip: a run converging early
      // must resume as converged and take zero extra EM steps
      val ckpt2 = tmp("graft_conv")
      val first = BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 5L),
        maxIterations = 20, epsilon = 1e3, checkpointDir = Some(ckpt2))
      assert(first.converged && first.iterations < 20)
      val resumed = BaumWelch.fit(seqs, HmmModel.random(3, m, seed = 5L),
        maxIterations = 20, epsilon = 1e3, checkpointDir = Some(ckpt2), resume = true)
      assert(resumed.converged)
      assert(resumed.iterations == first.iterations,
        s"resume of a converged run took extra steps: ${resumed.iterations} vs ${first.iterations}")
      assert(resumed.model.frobeniusDistance(first.model) == 0.0)
    } finally seqs.unpersist()
  }

  test("TrainHmm CLI trains from events and writes a loadable named model") {
    val out = tmp("graft_cli_out")
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out,
      "--states", "3", "--max-iterations", "5", "--restarts", "2", "--seed", "42")))
    assert(res.logLikPerIter.nonEmpty)
    val (model, lls) = ModelIO.load(spark, s"$out/model")
    model.validate(1e-6)
    assert(model.numStates == 3)
    assert(lls.toSeq == res.logLikPerIter.toSeq)
    // emitted symbols are named by their event types, in vocab order
    val vocab = Sequencer.vocab(spark, sfDir).collect()
      .sortBy(_.getInt(1)).map(_.getString(0)).toIndexedSeq
    assert(model.symbolNames.contains(vocab))
    assert(model.stateNames.contains(IndexedSeq("s0", "s1", "s2")))
  }

  test("TrainHmm arg parsing rejects junk and requires paths") {
    intercept[IllegalArgumentException](TrainHmm.parse(Seq("--bogus", "x")))
    intercept[IllegalArgumentException](TrainHmm.parse(Seq("--input", "a")))
    val cfg = TrainHmm.parse(Seq("--input", "a", "--output", "b",
      "--epsilon", "0.01", "--checkpoint-dir", "c", "--resume"))
    assert(cfg.epsilon == 0.01 && cfg.checkpointDir.contains("c") && cfg.resume)
  }

  test("TrainHmm --model-in warm-starts from a saved model (reference modelInOption)") {
    // first pass: train 4 iterations from random init and save
    val out1 = tmp("graft_warm1")
    val first = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out1,
      "--states", "3", "--max-iterations", "4", "--restarts", "1", "--seed", "7")))
    // second pass: fine-tune FROM the saved model on the same data
    val out2 = tmp("graft_warm2")
    val cfg2 = TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out2,
      "--max-iterations", "4", "--model-in", s"$out1/model"))
    assert(cfg2.modelIn.contains(s"$out1/model"))
    val second = TrainHmm.run(spark, cfg2)
    // EM monotonicity: the warm run's FIRST loglik is the data loglik
    // under the saved FINAL model, which must be >= the first run's
    // last recorded loglik (computed one M-step earlier)
    assert(second.logLikPerIter.head >= first.logLikPerIter.last - 1e-9,
      s"warm start lost likelihood: ${second.logLikPerIter.head} < ${first.logLikPerIter.last}")
    // ...and the warm trajectory keeps improving from there
    assert(second.logLikPerIter.last >= second.logLikPerIter.head - 1e-9)
    // the fine-tuned model is itself loadable and valid
    val (m2, _) = ModelIO.load(spark, s"$out2/model")
    m2.validate(1e-6)
    assert(m2.numStates == first.model.numStates)
  }

  test("TrainHmm --model-in K overrides --states and rejects bad combos") {
    // save a 4-state model, then warm-start with --states 2: K must
    // come from the model, not the flag
    val out = tmp("graft_warmk")
    TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out,
      "--states", "4", "--max-iterations", "2", "--restarts", "1")))
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", tmp("graft_warmk2"),
      "--states", "2", "--max-iterations", "2", "--model-in", s"$out/model")))
    assert(res.model.numStates == 4)

    // mutually exclusive flag combinations fail at parse time
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--model-in", "m", "--resume")))
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--model-in", "m", "--restarts", "3")))
    // a symbol-count mismatch fails loudly before training
    val bad = tmp("graft_warmbad")
    ModelIO.save(spark, HmmModel.random(3, 99, seed = 1L), s"$bad/model")
    intercept[IllegalArgumentException](TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", tmp("graft_warmbad2"),
      "--model-in", s"$bad/model"))))
  }

  test("TrainHmm --model-in fine-tunes a slice whose vocabulary is a SUBSET of the model's") {
    import org.apache.spark.sql.functions.col
    // full-corpus model: symbol space = the complete event_type vocab
    val out1 = tmp("graft_sup1")
    val first = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out1,
      "--states", "3", "--max-iterations", "3", "--restarts", "1", "--seed", "42")))
    val types = Sequencer.vocab(spark, sfDir).collect()
      .sortBy(_.getInt(1)).map(_.getString(0)).toIndexedSeq
    assert(types.length >= 2, "corpus needs >= 2 event types for a proper slice")
    // carve a slice missing the LAST vocab entry (so slice symbol ids
    // would differ from the model's without the name-map alignment)
    val dropped = types.last
    val slice = tmp("graft_sup_slice")
    graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") =!= dropped)
      .write.mode("overwrite").parquet(s"$slice/events.parquet")
    // fine-tune: model vocab (superset) must be accepted and kept
    val out2 = tmp("graft_sup2")
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", slice, "--output", out2,
      "--max-iterations", "4", "--model-in", s"$out1/model")))
    assert(res.model.numSymbols == types.length,
      "fine-tuned model must keep the full symbol space")
    assert(res.model.symbolNames.contains(types))
    // EM stayed monotone on the slice
    res.logLikPerIter.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9, s"loglik dropped: $a -> $b")
      case _         =>
    }
    // the fine-tuned model round-trips and stays stochastic
    val (m2, _) = ModelIO.load(spark, s"$out2/model")
    m2.validate(1e-6)
    assert(m2.symbolNames.contains(types))
    // a slice with an event type the model has never seen still fails:
    // rename one slice type to something outside the model vocabulary
    val alien = tmp("graft_sup_alien")
    graft.sources.Tables.events(spark, sfDir)
      .withColumn("event_type",
        org.apache.spark.sql.functions.when(
          col("event_type") === types.head,
          org.apache.spark.sql.functions.lit("never_seen_type"))
          .otherwise(col("event_type")))
      .write.mode("overwrite").parquet(s"$alien/events.parquet")
    val ex = intercept[IllegalArgumentException](TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", alien, "--output", tmp("graft_sup_alien_out"),
      "--model-in", s"$out1/model"))))
    assert(ex.getMessage.contains("never_seen_type"))
    assert(first.model.numSymbols == types.length)
  }

  test("TrainHmm --trainer viterbi with --pseudo-count matches the library trainer") {
    import spark.implicits._
    val out = tmp("graft_vit_cli")
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", out,
      "--states", "3", "--max-iterations", "4", "--restarts", "2",
      "--seed", "42", "--trainer", "viterbi", "--pseudo-count", "0.5")))
    res.model.validate(1e-6)
    val m = Sequencer.vocab(spark, sfDir).count().toInt
    val seqs = Sequencer.sequenceDs(spark, sfDir).map(_._2.toArray).rdd.cache()
    try {
      val direct = BaumWelch.fitViterbiBest(seqs, numStates = 3, numSymbols = m,
        restarts = 2, seed = 42L, maxIterations = 4, epsilon = 1e-4,
        pseudoCount = 0.5)
      assert(res.model.frobeniusDistance(direct.model) < 1e-9,
        "CLI viterbi training diverged from BaumWelch.fitViterbiBest")
    } finally seqs.unpersist()
    // the model dir is loadable and keeps the corpus vocabulary
    val (loaded, _) = ModelIO.load(spark, s"$out/model")
    assert(loaded.symbolNames.isDefined && loaded.numSymbols == m)
    // flag validation: pseudo-count is viterbi-only; viterbi has no
    // checkpointing (reference parity: trainer families are distinct)
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--pseudo-count", "0.5")))
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--trainer", "viterbi",
      "--checkpoint-dir", "c")))
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--trainer", "gibbs")))
  }

  test("TrainHmm --input-format seqfile trains on the reference's native corpus format") {
    import spark.implicits._
    // serialize the corpus exactly as the reference driver consumes it
    val seqPath = s"${tmp("graft_seqcli")}/corpus"
    graft.sources.SequenceFiles.writeIntArray(
      Sequencer.sequenceDs(spark, sfDir).toDF("seq_id", "syms"), seqPath)
    val out = tmp("graft_seqcli_out")
    val res = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", seqPath, "--output", out,
      "--input-format", "seqfile",
      "--states", "3", "--max-iterations", "3", "--restarts", "1", "--seed", "7")))
    // same training on the events-format input: the sequences are
    // identical, so the trained models agree (1e-6 — partitioning
    // differs, so treeAggregate combine order drifts ulps per iter)
    val events = TrainHmm.run(spark, TrainHmm.parse(Seq(
      "--input", sfDir, "--output", tmp("graft_seqcli_ev"),
      "--states", "3", "--max-iterations", "3", "--restarts", "1", "--seed", "7")))
    assert(res.model.frobeniusDistance(events.model) < 1e-6,
      "seqfile-input training diverged from events-input training")
    assert(res.model.numSymbols == events.model.numSymbols)
    // synthetic o<j> names for an id-space corpus
    assert(res.model.symbolNames.exists(_.forall(_.startsWith("o"))))
    intercept[IllegalArgumentException](TrainHmm.parse(Seq(
      "--input", "a", "--output", "b", "--input-format", "csv")))
  }
}

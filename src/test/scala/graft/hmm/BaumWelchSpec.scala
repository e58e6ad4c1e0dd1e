package graft.hmm

import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** Distributed EM (treeAggregate path) — invariants that must hold
  * regardless of partitioning.
  */
class BaumWelchSpec extends AnyFunSuite {

  private def syntheticSeqs(n: Int, len: Int, seed: Long): Seq[Array[Int]] = {
    // sequences from a planted 2-state HMM with distinct emissions
    val gen = HmmModel.fromDistributions(
      Array(0.5, 0.5),
      Array(Array(0.9, 0.1), Array(0.1, 0.9)),
      Array(Array(0.8, 0.1, 0.1), Array(0.1, 0.1, 0.8)))
    val rng = new java.util.Random(seed)
    def sample(dist: Array[Double]): Int = {
      val u = rng.nextDouble(); var acc = 0.0
      dist.indices.find { i => acc += dist(i); u < acc }.getOrElse(dist.length - 1)
    }
    Seq.fill(n) {
      var state = sample(gen.pi)
      Array.fill(len) {
        val sym = sample(gen.b(state))
        state = sample(gen.a(state))
        sym
      }
    }
  }

  test("fit improves log-likelihood monotonically and stays stochastic, independent of partitioning") {
    val seqs = syntheticSeqs(60, 40, seed = 11L)
    val init = HmmModel.random(2, 3, 5L)
    val rdd4 = spark.sparkContext.parallelize(seqs, 4)
    val res = BaumWelch.fit(rdd4, init, maxIterations = 12, epsilon = 1e-6)
    res.model.validate(1e-9)
    res.logLikPerIter.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, s"loglik decreased $a -> $b")
      case _ =>
    }
    // partitioning must not change the result beyond FP noise
    val rdd1 = spark.sparkContext.parallelize(seqs, 1)
    val res1 = BaumWelch.fit(rdd1, init, maxIterations = 12, epsilon = 1e-6)
    assert(res.model.frobeniusDistance(res1.model) < 1e-8,
      "4-partition and 1-partition training diverged")
  }

  test("multi-restart fit recovers planted emission structure (states emit distinct symbols)") {
    val seqs = syntheticSeqs(80, 60, seed = 23L)
    val rdd = spark.sparkContext.parallelize(seqs, 4).cache()
    val res = BaumWelch.fitBest(rdd, numStates = 2, numSymbols = 3,
      restarts = 5, seed = 7L, maxIterations = 25, epsilon = 1e-6)
    // planted model: one state prefers symbol 0, the other symbol 2
    // (label switching allowed)
    val b = res.model.b
    val s0 = b.indexWhere(r => r(0) == r.max)
    val s2 = b.indexWhere(r => r(2) == r.max)
    assert(s0 >= 0 && s2 >= 0 && s0 != s2,
      s"emission structure not recovered: B=${b.map(_.mkString(",")).mkString(";")}")
    // hard EM blurs the planted 0.8 peaks (the hard path assignment
    // mixes states), so don't over-claim sharpness: require each
    // state's planted symbol to dominate BOTH within its row (with
    // margin) and across states
    assert(b(s0)(0) > b(s0)(1) + 0.05 && b(s2)(2) > b(s2)(1) + 0.05)
    assert(b(s0)(0) > b(s2)(0) + 0.1 && b(s2)(2) > b(s0)(2) + 0.1,
      s"states not separated: B=${b.map(_.mkString(",")).mkString(";")}")
  }

  test("converged flag fires once the Frobenius step falls under epsilon") {
    val seqs = syntheticSeqs(40, 30, seed = 3L)
    val rdd = spark.sparkContext.parallelize(seqs, 2)
    val res = BaumWelch.fit(rdd, HmmModel.random(2, 3, 9L), maxIterations = 200, epsilon = 1e-3)
    assert(res.converged, "should converge well before 200 iterations at eps=1e-3")
    assert(res.iterations < 200)
  }

  /** Asserts the shared named-dump contract of the model-emitting
    * queries: s&lt;i&gt; state names everywhere, symbol names from the
    * given expected list, empty names only on loglik rows.
    */
  private def checkNamedDump(
      rows: Array[org.apache.spark.sql.Row], symbols: IndexedSeq[String]): Unit = {
    val byKind = rows.groupBy(_.getString(0))
    byKind.getOrElse("pi", Array.empty).foreach { r =>
      assert(r.getString(4) == s"s${r.getLong(1)}" && r.getString(5) == "")
    }
    byKind.getOrElse("transition", Array.empty).foreach { r =>
      assert(r.getString(4) == s"s${r.getLong(1)}")
      assert(r.getString(5) == s"s${r.getLong(2)}")
    }
    val em = byKind.getOrElse("emission", Array.empty)
    em.foreach { r =>
      assert(r.getString(4) == s"s${r.getLong(1)}")
      assert(r.getString(5) == symbols(r.getLong(2).toInt),
        s"emission j=${r.getLong(2)} named ${r.getString(5)}")
    }
    // the emitted name set covers the whole symbol space
    assert(em.map(_.getString(5)).toSet == symbols.toSet)
    byKind.getOrElse("loglik_iter", Array.empty).foreach { r =>
      assert(r.getString(4) == "" && r.getString(5) == "")
    }
  }

  test("model dumps carry vocab-consistent state/symbol name maps") {
    import graft.LocalSpark.sfDir
    val vocab = Sequencer.vocab(spark, sfDir).collect()
      .sortBy(_.getInt(1)).map(_.getString(0)).toIndexedSeq
    assert(vocab.nonEmpty && vocab.forall(_.nonEmpty))

    // hmm_baumwelch: data-derived — symbol names ARE the event types
    val bw = HmmQueries.baumWelch(spark, sfDir).collect()
    checkNamedDump(bw, vocab)
    val lls = bw.filter(_.getString(0) == "loglik_iter")
      .sortBy(_.getLong(1)).map(_.getDouble(3))
    assert(lls.nonEmpty, "baum-welch dump must carry its loglik history")
    lls.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-3, s"4dp-rounded loglik fell $a -> $b")
      case _           =>
    }

    // hmm_random_model: no data-derived names — s<i>/o<j> defaults
    val rm = HmmQueries.randomModel(spark, sfDir).collect()
    checkNamedDump(rm, (0 until 5).map(j => s"o$j"))

    // hmm_model_from_distributions: Rabiner 2-state, 3-symbol defaults
    val fd = HmmQueries.fromDistributions(spark, sfDir).collect()
    checkNamedDump(fd, (0 until 3).map(j => s"o$j"))
  }

  test("viterbi training is bitwise deterministic across partitionings (hard counts are integers)") {
    val seqs = syntheticSeqs(60, 40, seed = 17L)
    val init = HmmModel.random(2, 3, 5L)
    def train(parts: Int) = BaumWelch.fitViterbi(
      spark.sparkContext.parallelize(seqs, parts), init,
      maxIterations = 12, epsilon = 1e-6, pseudoCount = 0.1)
    val m4 = train(4).model
    val m1 = train(1).model
    // NOT the soft-EM 1e-9 tolerance: integer count sums are exact
    // and order-independent, so the M-step quotients must agree to
    // the last bit regardless of treeAggregate combine order
    assert(m4.pi.sameElements(m1.pi)
      && m4.a.zip(m1.a).forall { case (x, y) => x.sameElements(y) }
      && m4.b.zip(m1.b).forall { case (x, y) => x.sameElements(y) },
      "hard-EM models differ bitwise across partitionings")
    m4.validate(1e-9)
  }

  test("viterbi training ascends its joint objective and recovers planted emission structure") {
    val seqs = syntheticSeqs(80, 60, seed = 23L)
    val rdd = spark.sparkContext.parallelize(seqs, 4).cache()
    // pure segmental k-means (no smoothing): the joint objective
    // Σ log P(O, path*) is non-decreasing per Juang & Rabiner —
    // a per-trajectory property, so assert it on a single init
    val res = BaumWelch.fitViterbi(rdd, HmmModel.random(2, 3, 7L),
      maxIterations = 25, epsilon = 1e-6, pseudoCount = 0.0)
    res.logLikPerIter.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, s"hard-EM objective fell $a -> $b")
      case _           =>
    }
    // structure recovery is NOT a single-init property (hard EM can
    // collapse both states onto the modal symbol from one random
    // init — expected local-optimum math): assert it on the
    // multi-restart trainer, which is the supported train-me-a-model
    // entry point
    // hard EM's basin of attraction for the planted optimum is small
    // on this corpus (most inits lock to a state-collapsed fixed
    // point within 2 iterations), but the joint objective ranks the
    // recovered structure clearly best (-4253 vs -4597 collapsed), so
    // enough restarts + maxBy finds it deterministically
    val best = BaumWelch.fitViterbiBest(rdd, numStates = 2, numSymbols = 3,
      restarts = 12, seed = 7L, maxIterations = 25, epsilon = 1e-6, pseudoCount = 0.0)
    // planted model: one state prefers symbol 0, the other symbol 2
    val b = best.model.b
    val s0 = b.indexWhere(r => r(0) == r.max)
    val s2 = b.indexWhere(r => r(2) == r.max)
    assert(s0 >= 0 && s2 >= 0 && s0 != s2,
      s"emission structure not recovered: B=${b.map(_.mkString(",")).mkString(";")}")
    assert(b(s0)(0) > 0.5 && b(s2)(2) > 0.5,
      s"planted peaks not dominant: B=${b.map(_.mkString(",")).mkString(";")}")
  }

  test("pseudo-count smoothing keeps every probability strictly positive under hard assignment") {
    // 1-symbol-per-state data starves the cross terms; hard EM with
    // no smoothing would zero them permanently (Mahout's documented
    // reason for the pseudo-count)
    val seqs = Seq.fill(20)(Array.fill(30)(0)) ++ Seq.fill(20)(Array.fill(30)(2))
    val rdd = spark.sparkContext.parallelize(seqs, 2)
    val res = BaumWelch.fitViterbi(rdd, HmmModel.random(2, 3, 11L),
      maxIterations = 10, epsilon = 1e-8, pseudoCount = 0.5)
    val m = res.model
    assert(m.pi.forall(_ > 0) && m.a.flatten.forall(_ > 0) && m.b.flatten.forall(_ > 0),
      "smoothed hard-EM model has zero cells")
    m.validate(1e-9)
  }
}

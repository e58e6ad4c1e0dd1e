package graft.hmm

import org.apache.spark.rdd.RDD

/** Fixed-size dense sufficient statistics for one EM iteration:
  * K + K² + K·M doubles — the commutative-associative payload that
  * replaces the reference's shuffled MapWritable stripes
  * (BaumWelchMapper → Combiner → Reducer).
  */
final class HmmSuffStats(val numStates: Int, val numSymbols: Int) extends Serializable {
  val pi = new Array[Double](numStates)
  val a: Array[Array[Double]] = Array.ofDim[Double](numStates, numStates)
  val b: Array[Array[Double]] = Array.ofDim[Double](numStates, numSymbols)
  var logLik = 0.0
  var nSeq = 0L

  def merge(o: HmmSuffStats): HmmSuffStats = {
    var i = 0
    while (i < numStates) {
      pi(i) += o.pi(i)
      var j = 0
      while (j < numStates) { a(i)(j) += o.a(i)(j); j += 1 }
      j = 0
      while (j < numSymbols) { b(i)(j) += o.b(i)(j); j += 1 }
      i += 1
    }
    logLik += o.logLik
    nSeq += o.nSeq
    this
  }
}

/** Distributed Baum-Welch EM — the Spark-first reshape of the whole
  * reference repo (BaumWelchDriver.java:118-137 iteration loop).
  *
  * Per iteration: broadcast(model) → per-partition accumulation of
  * one mutable HmmSuffStats → `treeAggregate` (depth 2) → driver-side
  * row-normalize → reference convergence test (||ΔA||_F + ||ΔB||_F
  * < ε, BaumWelchUtils.java:238-266).
  *
  * Scale: ZERO shuffle of sequence data — each iteration moves only
  * O(numPartitions · (K²+KM)) doubles to the driver through the tree.
  * At 100 TB / 1000 executors this is one broadcast (≪1 MB) and one
  * sub-second aggregate per iteration; the sequences themselves stay
  * cached and partition-local. This is the same shape MLlib uses for
  * GaussianMixture/LDA EM.
  */
object BaumWelch {

  final case class FitResult(model: HmmModel, logLikPerIter: Array[Double], iterations: Int, converged: Boolean)

  /** Latest COMPLETE `model-N` checkpoint under `dir`, if any — via
    * the Hadoop FileSystem API so checkpoint dirs work on any cluster
    * FS, not just local disk (reference: BaumWelchDriver.java:128
    * writes per-iteration `model-N` dirs for exactly this resume
    * story). A dir without the committer's _SUCCESS marker is a
    * partial write from a crashed driver — skipped, so resume falls
    * back to the newest checkpoint that actually committed.
    */
  def latestCheckpoint(spark: org.apache.spark.sql.SparkSession, dir: String): Option[(Int, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("model-") => n.stripPrefix("model-").toIntOption.map(_ -> n) }
      .flatten
      .filter { case (_, name) =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$name/_SUCCESS")) }
      .sortBy(-_._1)
      .headOption
      .map { case (iter, name) => (iter, s"$dir/$name") }
  }

  /** Distributed EM with optional per-iteration checkpointing.
    *
    * `checkpointDir = Some(dir)` writes the model (full double
    * precision, plus the loglik history) to `dir/model-N` after every
    * iteration. With `resume = true`, training restarts from the
    * newest `model-N` instead of `init` — a driver loss mid-way
    * through a 50-iteration run on a 100 TB corpus costs one
    * iteration, not the whole job.
    */
  def fit(
      sequences: RDD[Array[Int]],
      init: HmmModel,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4,
      checkpointDir: Option[String] = None,
      resume: Boolean = false): FitResult = {
    val sc = sequences.sparkContext
    lazy val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    var model = init
    val logLiks = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var converged = false
    if (resume) checkpointDir.flatMap(latestCheckpoint(spark, _)).foreach {
      case (ckptIter, ckptPath) =>
        val (m, lls, conv) = ModelIO.loadCheckpoint(spark, ckptPath)
        model = m
        logLiks ++= lls
        iter = ckptIter
        // a run that had already converged resumes as converged —
        // without this, resume would take one extra EM step and
        // drift off the uninterrupted trajectory
        converged = conv
    }
    else checkpointDir.foreach { d =>
      // fresh run: clear stale model-N dirs from any previous run, or
      // a later resume would silently pick up the OLD trajectory
      // (worst case as a no-op when its iteration exceeds
      // maxIterations, returning the stale model as "trained")
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(path))
        fs.listStatus(path).filter(_.getPath.getName.startsWith("model-"))
          .foreach(s => fs.delete(s.getPath, true))
    }
    while (iter < maxIterations && !converged) {
      val bc = sc.broadcast(model)
      val k = model.numStates
      val m = model.numSymbols
      val stats = sequences.treeAggregate(new HmmSuffStats(k, m))(
        seqOp = (acc, seq) => { HmmAlgorithms.accumulate(bc.value, seq, acc); acc },
        combOp = (x, y) => x.merge(y),
        depth = 2)
      bc.destroy()
      logLiks += stats.logLik
      val next = mStep(stats, model)
      converged = model.frobeniusDistance(next) < epsilon
      model = next
      iter += 1
      checkpointDir.foreach(d =>
        ModelIO.save(spark, model, s"$d/model-$iter", logLiks.toSeq, converged))
    }
    FitResult(model, logLiks.toArray, iter, converged)
  }

  /** Multi-restart EM: run `fit` from `restarts` seeded random inits
    * and keep the model with the best final log-likelihood — the
    * standard guard against EM local optima. Input should be cached:
    * each restart re-iterates the sequences.
    */
  def fitBest(
      sequences: RDD[Array[Int]],
      numStates: Int,
      numSymbols: Int,
      restarts: Int = 3,
      seed: Long = 42L,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4): FitResult =
    (0 until restarts).map { r =>
      fit(sequences, HmmModel.random(numStates, numSymbols, seed + r), maxIterations, epsilon)
    }.maxBy(_.logLikPerIter.last)

  /** Multi-restart Viterbi training: hard EM is even more prone to
    * local optima than soft EM (the hard assignment can collapse both
    * states onto the corpus-modal symbol from one bad init), so the
    * restart guard is the supported way to ask for a trained model
    * rather than a trajectory. Same maxBy-final-objective selection as
    * [[fitBest]]; input should be cached.
    */
  def fitViterbiBest(
      sequences: RDD[Array[Int]],
      numStates: Int,
      numSymbols: Int,
      restarts: Int = 3,
      seed: Long = 42L,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4,
      pseudoCount: Double = 0.0): FitResult =
    (0 until restarts).map { r =>
      fitViterbi(sequences, HmmModel.random(numStates, numSymbols, seed + r),
        maxIterations, epsilon, pseudoCount)
    }.maxBy(_.logLikPerIter.last)

  /** Viterbi training (hard EM) — Mahout `HmmTrainer.trainViterbi`,
    * the public companion of the reference's soft-EM trainer
    * (BaumWelchDriver.java:53-69 exposes the trainer family).
    *
    * Per iteration: broadcast(model) → per-sequence Viterbi decode +
    * HARD transition/emission counts ([[HmmAlgorithms.accumulateViterbi]])
    * → the same treeAggregate as soft EM → M-step with `pseudoCount`
    * Laplace smoothing on every π/A/B cell (Mahout's pseudo-count
    * guard against states starved by the hard assignment) →
    * reference convergence test (||ΔA||_F + ||ΔB||_F < ε).
    *
    * Scale: identical dataflow to [[fit]] — zero shuffle of sequence
    * data, one sub-MB broadcast + one O(K²+KM) aggregate per
    * iteration. Hard counts are integers, so the trained model is
    * FP-deterministic across partitionings (asserted in the spec) —
    * no rounding-for-stability needed downstream, unlike soft EM.
    */
  def fitViterbi(
      sequences: RDD[Array[Int]],
      init: HmmModel,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4,
      pseudoCount: Double = 0.0): FitResult = {
    val sc = sequences.sparkContext
    var model = init
    val logLiks = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      val bc = sc.broadcast(model)
      val k = model.numStates
      val m = model.numSymbols
      val stats = sequences.treeAggregate(new HmmSuffStats(k, m))(
        seqOp = (acc, seq) => { HmmAlgorithms.accumulateViterbi(bc.value, seq, acc); acc },
        combOp = (x, y) => x.merge(y),
        depth = 2)
      bc.destroy()
      logLiks += stats.logLik
      val next = mStep(stats, model, pseudoCount)
      converged = model.frobeniusDistance(next) < epsilon
      model = next
      iter += 1
    }
    FitResult(model, logLiks.toArray, iter, converged)
  }

  /** Row-normalize summed stripes (BaumWelchReducer.java:133-150),
    * optionally adding `pseudoCount` to every cell first (Viterbi
    * training's Laplace smoothing; soft EM passes 0). A row with
    * zero mass (state never visited) keeps the previous model's row
    * rather than dividing by zero.
    */
  private def mStep(stats: HmmSuffStats, prev: HmmModel, pseudoCount: Double = 0.0): HmmModel = {
    def normRow(row: Array[Double], fallback: Array[Double]): Array[Double] = {
      val smoothed = row.map(_ + pseudoCount)
      val s = smoothed.sum
      if (s > 0) smoothed.map(_ / s) else fallback.clone()
    }
    HmmModel(
      prev.numStates, prev.numSymbols,
      normRow(stats.pi, prev.pi),
      stats.a.zip(prev.a).map { case (r, f) => normRow(r, f) },
      stats.b.zip(prev.b).map { case (r, f) => normRow(r, f) })
  }
}

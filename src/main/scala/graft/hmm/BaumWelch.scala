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

  def fit(
      sequences: RDD[Array[Int]],
      init: HmmModel,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4): FitResult = {
    val sc = sequences.sparkContext
    var model = init
    val logLiks = scala.collection.mutable.ArrayBuffer.empty[Double]
    var converged = false
    var iter = 0
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

  /** Row-normalize summed stripes (BaumWelchReducer.java:133-150).
    * A row with zero mass (state never visited) keeps the previous
    * model's row rather than dividing by zero.
    */
  private def mStep(stats: HmmSuffStats, prev: HmmModel): HmmModel = {
    def normRow(row: Array[Double], fallback: Array[Double]): Array[Double] = {
      val s = row.sum
      if (s > 0) row.map(_ / s) else fallback.clone()
    }
    HmmModel(
      prev.numStates, prev.numSymbols,
      normRow(stats.pi, prev.pi),
      stats.a.zip(prev.a).map { case (r, f) => normRow(r, f) },
      stats.b.zip(prev.b).map { case (r, f) => normRow(r, f) })
  }
}

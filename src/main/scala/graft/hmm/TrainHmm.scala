package graft.hmm

import org.apache.spark.sql.SparkSession

/** Configurable Baum-Welch training driver — the Spark-first
  * counterpart of the reference CLI (BaumWelchDriver.java:53-69:
  * input/output paths, numHidden, maxIterations, convergenceDelta),
  * extended with seeded multi-restart and checkpoint/resume.
  *
  * Reads an `events`-shaped parquet table from --input, builds the
  * symbol vocabulary and per-user sequences (Sequencer), trains to
  * convergence, and writes a loadable named-model directory (ModelIO
  * long form, symbol names = the event types) to --output/model plus
  * the vocabulary to --output/vocab.
  *
  * Usage (sbt "runMain graft.hmm.TrainHmm ..."):
  *   --input DIR --output DIR [--states K]
  *     [--max-iterations N] [--epsilon E] [--restarts R] [--seed S]
  *     [--checkpoint-dir DIR] [--resume]
  */
object TrainHmm {

  final case class Config(
      input: String = "",
      output: String = "",
      numStates: Int = 3,
      maxIterations: Int = 20,
      epsilon: Double = 1e-4,
      restarts: Int = 3,
      seed: Long = 42L,
      checkpointDir: Option[String] = None,
      resume: Boolean = false)

  def parse(args: Seq[String]): Config = {
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case Nil => cfg
      case "--input" :: v :: t          => loop(t, cfg.copy(input = v))
      case "--output" :: v :: t         => loop(t, cfg.copy(output = v))
      case "--states" :: v :: t         => loop(t, cfg.copy(numStates = v.toInt))
      case "--max-iterations" :: v :: t => loop(t, cfg.copy(maxIterations = v.toInt))
      case "--epsilon" :: v :: t        => loop(t, cfg.copy(epsilon = v.toDouble))
      case "--restarts" :: v :: t       => loop(t, cfg.copy(restarts = v.toInt))
      case "--seed" :: v :: t           => loop(t, cfg.copy(seed = v.toLong))
      case "--checkpoint-dir" :: v :: t => loop(t, cfg.copy(checkpointDir = Some(v)))
      case "--resume" :: t              => loop(t, cfg.copy(resume = true))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val cfg = loop(args.toList, Config())
    require(cfg.input.nonEmpty, "--input is required")
    require(cfg.output.nonEmpty, "--output is required")
    require(cfg.numStates > 0 && cfg.maxIterations > 0 && cfg.restarts > 0, "bad sizes")
    cfg
  }

  /** Train per config; returns the fit result after writing the model
    * + vocab dirs. Separated from main so specs drive it in-process.
    *
    * With a checkpoint dir the run is single-restart (a checkpoint
    * identifies one EM trajectory; mixing restarts with resume would
    * silently resume the wrong trajectory) — restarts apply to the
    * fresh, uncheckpointed path.
    */
  def run(spark: SparkSession, cfg: Config): BaumWelch.FitResult = {
    import spark.implicits._
    // collect the (tiny) vocab once; the parquet write below reuses
    // the collected rows instead of re-running the distinct+window
    val vocab = Sequencer.vocab(spark, cfg.input).collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    val numSymbols = vocab.length
    val seqs = Sequencer.sequenceDs(spark, cfg.input).map(_._2.toArray).rdd.cache()
    try {
      val res = cfg.checkpointDir match {
        case Some(ckpt) =>
          BaumWelch.fit(seqs,
            HmmModel.random(cfg.numStates, numSymbols, cfg.seed),
            cfg.maxIterations, cfg.epsilon,
            checkpointDir = Some(ckpt), resume = cfg.resume)
        case None =>
          BaumWelch.fitBest(seqs, cfg.numStates, numSymbols,
            cfg.restarts, cfg.seed, cfg.maxIterations, cfg.epsilon)
      }
      val named = res.model.withNames(
        (0 until cfg.numStates).map(i => s"s$i"),
        vocab.map(_._1).toSeq)
      ModelIO.save(spark, named, s"${cfg.output}/model",
        res.logLikPerIter.toSeq, res.converged)
      vocab.toSeq.toDF("event_type", "sym")
        .write.mode("overwrite").parquet(s"${cfg.output}/vocab")
      res.copy(model = named)
    } finally seqs.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toSeq)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-train-hmm")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val res = run(spark, cfg)
      println(s"converged=${res.converged} iterations=${res.iterations} " +
        s"finalLogLik=${res.logLikPerIter.lastOption.getOrElse(Double.NaN)} " +
        s"model=${cfg.output}/model")
    } finally spark.stop()
  }
}

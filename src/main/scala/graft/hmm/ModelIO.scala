package graft.hmm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HMM model persist/restore in parquet long form — the Spark-first
  * counterpart of the reference's SequenceFile model directories
  * (BaumWelchUtils.WriteModelToDirectory / CreateHmmModel), including
  * the hidden/emitted state-name maps (BaumWelchModel.java:93-94).
  *
  * Schema: (kind, i, j, value, name). Numeric rows (`pi`,
  * `transition`, `emission`, `loglik_iter`) carry name = "";
  * name-map rows (`state_name`, `symbol_name`) carry value = 0.
  * Values are written at full double precision — checkpoints resume
  * bit-exact.
  */
object ModelIO {

  final case class ModelRow(kind: String, i: Long, j: Long, value: Double, name: String)

  def rows(model: HmmModel, logLiks: Seq[Double] = Nil,
           converged: Boolean = false): Seq[ModelRow] = {
    val k = model.numStates
    val m = model.numSymbols
    val piRows = model.pi.zipWithIndex.map { case (v, i) => ModelRow("pi", i, -1, v, "") }
    val aRows = for (i <- 0 until k; j <- 0 until k)
      yield ModelRow("transition", i, j, model.a(i)(j), "")
    val bRows = for (i <- 0 until k; j <- 0 until m)
      yield ModelRow("emission", i, j, model.b(i)(j), "")
    val sNames = model.stateNames.toSeq.flatMap(_.zipWithIndex.map {
      case (n, i) => ModelRow("state_name", i, -1, 0.0, n)
    })
    val oNames = model.symbolNames.toSeq.flatMap(_.zipWithIndex.map {
      case (n, j) => ModelRow("symbol_name", j, -1, 0.0, n)
    })
    val llRows = logLiks.zipWithIndex.map { case (ll, it) =>
      ModelRow("loglik_iter", it, -1, ll, "")
    }
    val convRow =
      if (converged) Seq(ModelRow("converged", 0, -1, 1.0, "")) else Nil
    piRows.toSeq ++ aRows ++ bRows ++ sNames ++ oNames ++ llRows ++ convRow
  }

  def save(spark: SparkSession, model: HmmModel, path: String,
           logLiks: Seq[Double] = Nil, converged: Boolean = false): Unit = {
    import spark.implicits._
    rows(model, logLiks, converged).toDF()
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def asDf(spark: SparkSession, model: HmmModel, logLiks: Seq[Double] = Nil): DataFrame = {
    import spark.implicits._
    rows(model, logLiks).toDF()
  }

  /** Restore a model (+ any checkpointed per-iteration logliks). */
  def load(spark: SparkSession, path: String): (HmmModel, Array[Double]) = {
    val (m, lls, _) = loadCheckpoint(spark, path)
    (m, lls)
  }

  /** Restore a checkpoint: model, loglik history, converged flag. */
  def loadCheckpoint(spark: SparkSession, path: String): (HmmModel, Array[Double], Boolean) = {
    val all = spark.read.parquet(path)
      .selectExpr("kind", "CAST(i AS BIGINT) AS i", "CAST(j AS BIGINT) AS j",
        "CAST(value AS DOUBLE) AS value", "name")
      .collect()
    def grab(kind: String) = all.filter(_.getString(0) == kind)
    val base = HmmModel.fromRows(
      all.filter(r => Set("pi", "transition", "emission")(r.getString(0)))
        .map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getDouble(3)))
        .toSeq)
    val sN = grab("state_name").sortBy(_.getLong(1)).map(_.getString(4))
    val oN = grab("symbol_name").sortBy(_.getLong(1)).map(_.getString(4))
    val logLiks = grab("loglik_iter").sortBy(_.getLong(1)).map(_.getDouble(3))
    val model =
      if (sN.nonEmpty || oN.nonEmpty)
        base.copy(
          stateNames = if (sN.nonEmpty) Some(sN.toIndexedSeq) else None,
          symbolNames = if (oN.nonEmpty) Some(oN.toIndexedSeq) else None)
      else base
    (model, logLiks, grab("converged").nonEmpty)
  }
}

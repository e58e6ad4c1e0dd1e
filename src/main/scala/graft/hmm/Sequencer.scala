package graft.hmm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence construction: events → per-user time-ordered symbol
  * sequences (SURVEY.md §2.2). The reference reads pre-built
  * IntArrayWritable SequenceFiles (IntArrayWritable.java); here the
  * adapter from a raw event table is part of the engine.
  *
  * Scale: the ONLY wide op the HMM pipeline needs — a single shuffle
  * by user_id, with map-side projection to 3 narrow columns
  * (user_id, ts, sym) before the exchange. The vocab is tiny (distinct
  * event types) and broadcast.
  */
object Sequencer {

  /** event_type → contiguous symbol id, deterministic (ordered by
    * event_type). The single-partition window is fine: it runs on the
    * already-distinct vocab, which is small by definition.
    */
  def vocab(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("event_type"))
    Tables.events(spark, dir).select("event_type").distinct()
      .withColumn("sym", row_number().over(w) - 1)
  }

  val vocabSql: String =
    """SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS sym
      |FROM (SELECT DISTINCT event_type FROM events)
      |ORDER BY event_type""".stripMargin

  /** CTE reused by every oracle that needs the symbol mapping. */
  val vocabCte: String =
    """vocab AS (
      |  SELECT event_type, row_number() OVER (ORDER BY event_type) - 1 AS sym
      |  FROM (SELECT DISTINCT event_type FROM events)
      |)""".stripMargin

  /** events projected to (user_id, ts_us, event_id, sym) with the
    * vocab broadcast-joined on.
    */
  def eventsWithSym(spark: SparkSession, dir: String): DataFrame =
    eventsWithVocab(spark, dir, vocab(spark, dir))

  private def eventsWithVocab(spark: SparkSession, dir: String, v: DataFrame): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      .join(broadcast(v), "event_type")

  /** Long-form sequences: (user_id, pos, sym), pos ordered by
    * (ts, event_id). This is the SQL-oracled dump of `sequenceDs`.
    */
  def build(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsWithSym(spark, dir)
      .select(col("user_id"), struct(col("ts_us"), col("event_id"), col("sym")).as("e"))
    e.groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"), posexplode(expr("transform(es, x -> x.sym)")).as(Seq("pos", "sym")))
      .orderBy("user_id", "pos")
  }

  val buildSql: String =
    s"""WITH $vocabCte
       |SELECT user_id,
       |  row_number() OVER (PARTITION BY user_id
       |    ORDER BY epoch_us(ts::TIMESTAMP), event_id) - 1 AS pos,
       |  sym
       |FROM events JOIN vocab USING (event_type)
       |ORDER BY user_id, pos""".stripMargin

  /** Typed sequences for the HMM algorithms: one row per user with
    * the full ordered symbol array. Persisted per dir: every
    * model-driven HMM query iterates the same sequences, and the
    * build (the pipeline's one wide op) should run once per dataset,
    * not once per query — exactly how an EM driver would cache its
    * input on a cluster.
    */
  private val seqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Dataset[(Long, Seq[Int])]]()

  def sequenceDs(spark: SparkSession, dir: String): Dataset[(Long, Seq[Int])] =
    // keyed by (session, dir): the persisted Dataset is bound to its
    // SparkContext (see Dedup.shingled for the same rule)
    seqCache.computeIfAbsent(s"${System.identityHashCode(spark)}|$dir", _ =>
      sequencesFrom(spark, eventsWithSym(spark, dir)).persist())

  /** Sequences under an EXPLICIT event_type → symbol mapping — the
    * warm-start fine-tune path, where the symbol space belongs to the
    * loaded model (a superset of the slice's own vocabulary), not to
    * the data. Unlike [[sequenceDs]] this is not cached: fine-tune
    * slices are one-shot inputs.
    */
  def sequenceDsMapped(
      spark: SparkSession, dir: String,
      mapping: Map[String, Int]): Dataset[(Long, Seq[Int])] = {
    import spark.implicits._
    sequencesFrom(spark, eventsWithVocab(spark, dir,
      mapping.toSeq.toDF("event_type", "sym")))
  }

  private def sequencesFrom(spark: SparkSession, e: DataFrame): Dataset[(Long, Seq[Int])] = {
    import spark.implicits._
    e.select(col("user_id"), struct(col("ts_us"), col("event_id"), col("sym")).as("e"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"), expr("transform(es, x -> x.sym)").as("syms"))
      .as[(Long, Seq[Int])]
  }

  /** Per-sequence length / distinct-symbol / entropy stats.
    * Two keyed aggregations; the entropy p·ln p is exact-double on
    * both engines, rounded 4dp to absorb sum-order differences.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val c = eventsWithSym(spark, dir).groupBy("user_id", "sym").count()
    val w = Window.partitionBy("user_id")
    c.withColumn("n", sum(col("count")).over(w))
      .groupBy("user_id")
      .agg(
        first(col("n")).as("n_events"),
        count(lit(1)).as("n_syms"),
        round(-sum((col("count") / col("n")) * log(col("count") / col("n"))), 4).as("entropy"))
      .orderBy("user_id")
  }

  val statsSql: String =
    s"""WITH $vocabCte,
       |c AS (
       |  SELECT user_id, sym, count(*) AS cnt
       |  FROM events JOIN vocab USING (event_type)
       |  GROUP BY user_id, sym
       |), tot AS (
       |  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY user_id
       |)
       |SELECT t.user_id, t.n AS n_events, count(*) AS n_syms,
       |  round(-sum((cnt / t.n) * ln(cnt / t.n)), 4) AS entropy
       |FROM c JOIN tot t USING (user_id)
       |GROUP BY t.user_id, t.n
       |ORDER BY t.user_id""".stripMargin
}

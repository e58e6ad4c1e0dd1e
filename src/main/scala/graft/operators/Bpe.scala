package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * tokenizer-fitting step of an LLM data pipeline (Sennrich et al.
  * 2016, trained on the word-frequency dictionary, not the raw
  * corpus).
  *
  * Scale shape: the corpus collapses to the (word, freq) dictionary
  * with ONE shuffle — 100 TB of text becomes a ~10M-row dict, and
  * every merge iteration then runs on the dict alone: a pair-count
  * aggregate (bounded by dict size) plus a per-row lambda rewrite.
  * Driver state per iteration is exactly one argmax row (the merge),
  * mirroring the bounded-driver-state policy of the EM trainer.
  * Ties break (count desc, pair lexicographic) so training is
  * deterministic on any cluster layout.
  */
object Bpe {

  /** The learned merge table: one row per merge step. */
  def bpeTrain(spark: SparkSession, dir: String, merges: Int = 10): DataFrame = {
    import spark.implicits._
    learnedFor(spark, dir, merges).toDF("step", "left", "right", "pair_count")
      .orderBy("step")
  }

  // Learned merges are pure data — memoized per (dir, merges) like
  // the supervised HMM model, so train/apply queries share one
  // training pass per process.
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, Long)]]()

  private[graft] def learnedFor(
      spark: SparkSession, dir: String, merges: Int): Seq[(Int, String, String, Long)] =
    mergeCache.computeIfAbsent(s"$dir|$merges", _ =>
      learnMerges(Tables.documents(spark, dir), merges))

  private[graft] def bpeTrainFor(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, merges).toDF("step", "left", "right", "pair_count")
      .orderBy("step")
  }

  private[graft] def learnMerges(
      docs: DataFrame, merges: Int): Seq[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus -> word-frequency dict (the only corpus-sized shuffle)
    // the corpus-sized shuffle runs wide; the RESULT is dict-sized, so
    // coalesce before the merge loop — iteration jobs then run on a
    // partition count matched to the dict, not to the corpus (at 10M
    // dict rows you'd coalesce to a few hundred, same reasoning)
    var dict = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(word, ''), t -> t <> '')").as("tokens"), col("freq"))
      .coalesce(1)
      .persist()
    dict.count() // materialize before the loop
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      // adjacent-pair counts, weighted by word frequency
      val top = dict
        .filter(size(col("tokens")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(tokens) - 2), " +
            "i -> struct(tokens[i] AS l, tokens[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        learned += ((step, l, r, cnt))
        def q(s: String) = s.replace("'", "\\'")
        // rewrite every word's token array, merging adjacent (l, r)
        // left-to-right — a single fold, no UDF
        val next = dict.select(expr(
          s"""aggregate(tokens, CAST(array() AS ARRAY<STRING>), (acc, t) ->
             |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(l)}' AND t = '${q(r)}'
             |       THEN concat(slice(acc, 1, size(acc) - 1), array('${q(l)}${q(r)}'))
             |       ELSE concat(acc, array(t)) END)""".stripMargin).as("tokens"),
          col("freq"))
          .persist()
        next.count()
        dict.unpersist()
        dict = next
        step += 1
      }
    }
    dict.unpersist()
    learned.toSeq
  }

  /** BPE ENCODE: apply the learned merge sequence to every document.
    * The merges replay on the distinct-WORD dictionary (each merge a
    * single array fold, no UDF), and documents join the encoded dict
    * by word — so the per-merge work is dict-sized no matter how big
    * the corpus, and the only corpus-sized operations are the word
    * explode and one (doc_id, word)-keyed aggregate. Output per doc:
    * word count, BPE token count, and the chars-per-token
    * compression ratio the tokenizer report tracks.
    */
  def bpeApply(spark: SparkSession, dir: String, merges: Int = 10): DataFrame =
    bpeApplyFor(Tables.documents(spark, dir),
      learnedFor(spark, dir, merges).map(m => (m._2, m._3)))

  private[graft] def bpeApplyFor(
      docs: DataFrame, mergeSeq: Seq[(String, String)]): DataFrame = {
    def q(s: String) = s.replace("'", "\\'")
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .coalesce(1) // dict-sized relation; see the training-loop note
    val encoded = mergeSeq.foldLeft(
      words.withColumn("tokens", expr("filter(split(word, ''), t -> t <> '')"))) {
      case (df, (l, r)) =>
        df.withColumn("tokens", expr(
          s"""aggregate(tokens, CAST(array() AS ARRAY<STRING>), (acc, t) ->
             |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(l)}' AND t = '${q(r)}'
             |       THEN concat(slice(acc, 1, size(acc) - 1), array('${q(l)}${q(r)}'))
             |       ELSE concat(acc, array(t)) END)""".stripMargin))
    }.select(col("word"), size(col("tokens")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_chars"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(encoded), "word") // dict ≪ corpus: broadcast
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
        round(sum(col("n_chars")).cast("double") / sum(col("n_tok")), 4)
          .as("chars_per_token"))
      .orderBy("doc_id")
  }
}

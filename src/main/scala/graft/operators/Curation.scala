package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Training-data curation operators over `documents` (SURVEY.md §2.4+):
  * reproducible corpus sampling and corpus-level n-gram statistics —
  * the bread-and-butter transforms between dedup and training.
  */
object Curation {

  /** Deterministic content-addressed sampling: keep documents whose
    * md5(text) falls in a fixed hex-prefix range. Content-keyed (not
    * id-keyed) so the sample is stable across re-ingestion,
    * re-partitioning, and engines — md5 hex compares identically
    * everywhere. ~10.2% at the default bound ('1a'/256 buckets).
    *
    * Scale: a narrow scan + filter; no shuffle, no RNG state. The
    * filter rate is exact-in-expectation per content, so a 100 TB
    * corpus samples without coordination.
    */
  def sampleHash(spark: SparkSession, dir: String, hexBound: String = "1a"): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", md5(col("text").cast("binary")))
      .filter(substring(col("h"), 1, 2) < hexBound)
      .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"), col("h").as("md5"))
      .orderBy("doc_id")

  val sampleHashSql: String =
    """SELECT doc_id, lang, length(text) AS text_len, md5(text) AS md5
      |FROM documents
      |WHERE substring(md5(text), 1, 2) < '1a'
      |ORDER BY doc_id""".stripMargin

  /** Corpus-level top-25 word bigrams by document frequency — the
    * n-gram statistic used for contamination checks and boilerplate
    * detection. One explode + one count shuffle; ties broken by
    * bigram text so the top-k is deterministic.
    *
    * Scale: the groupBy key space is bounded by distinct bigrams;
    * partial aggregation collapses per-partition counts before the
    * exchange, and the final top-k is a TakeOrdered, not a full sort.
    */
  def ngramTop(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    ngramTopFor(Tables.documents(spark, dir), k)

  /** Same over any (…, text) relation — spec-testable on synthetic
    * corpora (short/empty documents included).
    */
  def ngramTopFor(docs: DataFrame, k: Int = 25): DataFrame =
    docs
      // tokenize ONCE as a column — Catalyst does not hoist a
      // loop-invariant split() out of a lambda, and sub-2-token docs
      // must be filtered BEFORE sequence(0, size-2) goes negative
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(w) - 2), " +
          "i -> concat_ws(' ', slice(w, i + 1, 2))))").as("bgs"))
      .select(explode(col("bgs")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("bigram"))
      .limit(k)

  val ngramTopSql: String =
    """WITH t AS (
      |  SELECT doc_id, str_split(text, ' ') AS w FROM documents
      |  WHERE len(str_split(text, ' ')) >= 2
      |), bg AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+1], ' ') AS bigram
      |  FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)
      |)
      |SELECT bigram, count(*) AS n_docs
      |FROM bg GROUP BY bigram
      |ORDER BY n_docs DESC, bigram LIMIT 25""".stripMargin
}

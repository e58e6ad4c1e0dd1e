package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus keyword search: BM25-ranked retrieval over the `documents`
  * table (SURVEY.md §2.6+) — the retrieval primitive a curation
  * pipeline uses to pull topical slices out of a crawl ("find the
  * documents about X") and the scoring half of an inverted-index
  * search engine.
  *
  * Scale shape: term frequencies come from one explode + filter —
  * the filter keeps only the query terms, so the exchange carries
  * |terms| × matching docs, not the whole token stream. Corpus
  * constants (N, avgdl) are a 1-row aggregate cross-joined back
  * (broadcast of one row); per-term document frequencies are a
  * |terms|-row aggregate, also broadcast. Nothing in the plan grows
  * with corpus size except the narrow initial scan.
  */
object Search {

  /** Fixed query for the driver entry (terms must be literal so the
    * DuckDB oracle runs the identical query).
    */
  private[graft] val queryTerms = Seq("join", "hash", "window")
  private val K1 = 1.2
  private val B  = 0.75

  /** Top-20 documents by BM25(query) with the Lucene-style
    * (non-negative) idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    * Scores are rounded before ranking so the ordering (and the
    * doc_id tie-break) is engine-independent.
    */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    bm25TopKFor(Tables.documents(spark, dir), queryTerms, k)

  private[graft] def bm25TopKFor(
      docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    // dl as double; sum(dl) is a sum of integer-valued doubles < 2^53,
    // so avgdl is exact in FP — identical in any accumulation order.
    val dls = toks.select(col("doc_id"), size(col("w")).cast("double").as("dl"))
    val stats = dls.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(K1 + 1) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(
        round(sum(col("contrib")), 6).as("bm25"),
        count(lit(1)).cast("long").as("n_terms_hit"))
    scored
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("bm25"), col("n_terms_hit"))
  }

  val bm25TopKSql: String =
    """WITH toks AS (
      |  SELECT doc_id, str_split(text, ' ') AS w FROM documents
      |), dls AS (
      |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks
      |), stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dls
      |), tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(w) AS term FROM toks)
      |  WHERE term IN ('join', 'hash', 'window')
      |  GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
      |), scored AS (
      |  SELECT tf.doc_id,
      |    round(sum(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
      |      * tf.tf * (1.2 + 1) /
      |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dls.dl / stats.avgdl))), 6) AS bm25,
      |    CAST(count(*) AS BIGINT) AS n_terms_hit
      |  FROM tf
      |  JOIN df USING (term)
      |  JOIN dls ON dls.doc_id = tf.doc_id
      |  CROSS JOIN stats
      |  GROUP BY tf.doc_id
      |)
      |SELECT doc_id, bm25, n_terms_hit FROM scored
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text analysis over `documents` (SURVEY.md §2.6). Everything is
  * native `functions._` / higher-order SQL expressions — no Scala
  * UDFs — so the whole pipeline stays inside whole-stage codegen and
  * scales as a single narrow scan (no shuffle at all: every operator
  * here is per-row).
  *
  * Oracle parity notes: token arithmetic is exact-integer or
  * single-division double, identical across engines; order-sensitive
  * double sums are rounded 4dp. Array lambdas use explicit indices —
  * Spark's `transform` index is 0-based, DuckDB's is 1-based, so the
  * SQL uses `i` where Spark uses `i+1`.
  */
object TextAnalysis {

  private def toks = split(col("text"), " ")

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_re_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      round(expr("aggregate(split(text, ' '), 0L, (a, x) -> a + length(x))") / size(toks), 4)
        .as("avg_token_len"))
      .orderBy("doc_id")

  val tokensSql: String =
    """SELECT doc_id,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
      |  len(list_distinct(str_split(text, ' '))) AS n_distinct_tokens,
      |  round(list_sum(list_transform(str_split(text, ' '), x -> length(x)))
      |        / len(str_split(text, ' ')), 4) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring from length / stopword / short-token ratios. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val n = size(toks)
    val stopCnt = size(expr("filter(split(text, ' '), x -> x = 'the' OR x = 'a')"))
    val shortCnt = size(expr("filter(split(text, ' '), x -> length(x) <= 2)"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("n_chars"),
      n.as("n_tokens"),
      round(stopCnt / n, 4).as("stop_ratio"),
      round(shortCnt / n, 4).as("short_ratio"),
      round(log(n) * lit(0.5) - stopCnt / n * 3.0 - shortCnt / n * 2.0, 4).as("quality"))
      .orderBy("doc_id")
  }

  val qualitySql: String =
    """SELECT doc_id, n_chars,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  round(len(list_filter(str_split(text, ' '), x -> x = 'the' OR x = 'a'))
      |        / len(str_split(text, ' ')), 4) AS stop_ratio,
      |  round(len(list_filter(str_split(text, ' '), x -> length(x) <= 2))
      |        / len(str_split(text, ' ')), 4) AS short_ratio,
      |  round(ln(len(str_split(text, ' '))) * 0.5
      |        - len(list_filter(str_split(text, ' '), x -> x = 'the' OR x = 'a'))
      |          / len(str_split(text, ' ')) * 3.0
      |        - len(list_filter(str_split(text, ' '), x -> length(x) <= 2))
      |          / len(str_split(text, ' ')) * 2.0, 4) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stopword-hit language ID: per-language hit counts, deterministic
    * alphabetical tiebreak on the argmax.
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    def hits(words: Seq[String]) = {
      val cond = words.map(w => s"x = '$w'").mkString(" OR ")
      size(expr(s"filter(split(text, ' '), x -> $cond)"))
    }
    val sDe = hits(Seq("der", "und", "die"))
    val sEn = hits(Seq("the", "a", "of"))
    val sEs = hits(Seq("el", "los", "y"))
    val sFr = hits(Seq("le", "la", "et"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      sDe.as("s_de"), sEn.as("s_en"), sEs.as("s_es"), sFr.as("s_fr"),
      when(sDe >= sEn && sDe >= sEs && sDe >= sFr, "de")
        .when(sEn >= sEs && sEn >= sFr, "en")
        .when(sEs >= sFr, "es")
        .otherwise("fr").as("pred_lang"))
      .orderBy("doc_id")
  }

  val langidSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    len(list_filter(str_split(text, ' '), x -> x = 'der' OR x = 'und' OR x = 'die')) AS s_de,
      |    len(list_filter(str_split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'of')) AS s_en,
      |    len(list_filter(str_split(text, ' '), x -> x = 'el' OR x = 'los' OR x = 'y')) AS s_es,
      |    len(list_filter(str_split(text, ' '), x -> x = 'le' OR x = 'la' OR x = 'et')) AS s_fr
      |  FROM documents
      |)
      |SELECT doc_id, s_de, s_en, s_es, s_fr,
      |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
      |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
      |       WHEN s_es >= s_fr THEN 'es'
      |       ELSE 'fr' END AS pred_lang
      |FROM s ORDER BY doc_id""".stripMargin

  /** Order-sensitive document fingerprint: positionally-weighted
    * polynomial over (first-char-code, length) token values. Exact
    * integer arithmetic, bounded ≪ 2^63 — bit-identical across
    * engines. Spark index is 0-based (`i+1`), DuckDB's 1-based (`i`).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      // CAST the index to BIGINT BEFORE multiplying: the product of
      // two INTs overflows 32 bits at ~150k tokens, and ANSI mode
      // (Spark 4 default) turns that into a crash. DuckDB's lambda
      // index is already BIGINT, so this also matches the oracle.
      expr("aggregate(transform(split(text, ' '), (x, i) -> CAST(i + 1 AS BIGINT) * (ascii(x) * 131 + length(x))), 0L, (a, v) -> a + v)")
        .as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  CAST(list_sum(list_transform(str_split(text, ' '),
      |    (x, i) -> i * (ascii(x) * 131 + length(x)))) AS BIGINT) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Bigram-LM perplexity scoring (the CCNet-style quality signal):
    * an add-one-smoothed bigram model is fit on the corpus itself and
    * every document is scored by its perplexity under it — low means
    * in-distribution text, high means noise/boilerplate/outliers.
    *
    * Scale: the model IS two aggregates (bigram and context counts,
    * both vocabulary-bounded); scoring is an equi-join of the
    * document's bigram stream against those model relations (both
    * broadcast — a vocabulary² model is tiny next to the corpus) and
    * one per-doc average. Nothing driver-side, no UDFs.
    */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    lmPerplexityFor(Tables.documents(spark, dir))

  /** Every bigram OCCURRENCE (duplicates kept — counts need them).
    * Lambda-bound tokenization: this feeds an explode, so any alias-
    * substituted copy (InferFiltersFromGenerate) would re-split per
    * element — see functions.ngramsFromTextExpr.
    */
  private def lmBigrams(rawDocs: DataFrame): DataFrame =
    rawDocs.select(col("doc_id"), explode(expr(
      "element_at(transform(array(split(text, ' ')), w0 -> " +
        "CASE WHEN size(w0) >= 2 THEN " +
        "transform(sequence(0, size(w0) - 2), i -> struct(w0[i] AS a, w0[i + 1] AS b)) " +
        "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END), 1)"))
      .as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  /** The pre-cut bigram-count model build — the corpus pass the entry
    * query hides behind its lineage cut. Exposed for the plan audit
    * (SparkEntry.auditPlans).
    */
  private def lmCabFor(bg: DataFrame): DataFrame =
    bg.groupBy("a", "b").agg(count(lit(1)).cast("double").as("cab"))

  private[graft] def lmPerplexityCabBuild(spark: SparkSession, dir: String): DataFrame =
    lmCabFor(lmBigrams(Tables.documents(spark, dir)))

  private[graft] def lmPerplexityFor(rawDocs: DataFrame): DataFrame = {
    val bg = lmBigrams(rawDocs)
    // ca and the vocabulary size derive from the BOUNDED bigram-type
    // relation, not from fresh corpus passes (r18, guide §1.2 "don't
    // compute things twice"): ca(a) = Σ_b cab(a,b) exactly (integer-
    // valued doubles, exact under 2^53), and the token set of every
    // ≥2-word doc is exactly distinct(a) ∪ distinct(b) (a covers all
    // positions but the last, b all but the first).
    //
    // The derivation only pays off if cab is MATERIALIZED first: left
    // as lazy lineage it has 3 consumers (the broadcast model join, ca,
    // both voc branches) and Catalyst replicates the whole corpus-
    // tokenize-aggregate subtree into each one — the r18 fingerprint
    // grew to fileScan=5/shuffle=9/hashAgg=16 and the bench REGRESSED
    // 1.38→2.21 s (r19 VERDICT item 1). Lineage.cut runs the cab build
    // exactly once per invocation (eager, never registered with the
    // CacheManager — no cross-invocation result reuse), so the query
    // is genuinely 2 corpus passes: cab build + final probe.
    val cab = graft.Lineage.cut(lmCabFor(bg))
    val ca = cab.groupBy("a").agg(sum(col("cab")).as("ca"))
    val voc = cab.select(col("a").as("t")).union(cab.select(col("b").as("t")))
      .agg(countDistinct(col("t")).cast("double").as("v"))
    bg.join(broadcast(cab), Seq("a", "b"))
      .join(broadcast(ca), Seq("a"))
      .crossJoin(broadcast(voc))
      .withColumn("lp", log((col("cab") + 1.0) / (col("ca") + col("v"))))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("lp"))), 4).as("ppl"))
      .orderBy("doc_id")
  }

  val lmPerplexitySql: String =
    """WITH t AS (
      |  SELECT doc_id, str_split(text, ' ') AS w FROM documents
      |  WHERE len(str_split(text, ' ')) >= 2
      |), bg AS (
      |  SELECT doc_id,
      |    unnest(w[1:len(w)-1]) AS a,
      |    unnest(w[2:len(w)])   AS b
      |  FROM t
      |), cab AS (
      |  SELECT a, b, CAST(count(*) AS DOUBLE) AS cab FROM bg GROUP BY a, b
      |), ca AS (
      |  SELECT a, CAST(count(*) AS DOUBLE) AS ca FROM bg GROUP BY a
      |), voc AS (
      |  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
      |  FROM (SELECT unnest(w) AS tok FROM t)
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(exp(-avg(ln((cab.cab + 1.0) / (ca.ca + voc.v)))), 4) AS ppl
      |FROM bg
      |JOIN cab USING (a, b)
      |JOIN ca USING (a)
      |CROSS JOIN voc
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // PII scrubbing — the redaction pass a corpus runs before training.
  // -------------------------------------------------------------------

  /** Patterns are the RE2-compatible subset (char classes, bounded
    * repeats, alternation-free) so Java regex (Spark) and RE2
    * (DuckDB) agree by construction.
    */
  private[graft] val emailRe   = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val urlRe     = "https?://[^ ]+"
  private[graft] val longNumRe = "[0-9]{6,}"

  /** PII scrub audit: per-source counts of emails / URLs / long digit
    * runs and the byte delta after redacting them. The driver corpus
    * is synthetic prose with no PII, so the aggregate is a zero
    * audit — the per-row regex machinery still runs on every
    * document, and the planted-PII positive path is exercised by
    * [[scrubFor]] in CurationSpec.
    *
    * Scale: per-row regex over a narrow (source, text) scan, one
    * bounded groupBy(source) — no shuffle of text.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    scrubFor(Tables.documents(spark, dir))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_urls")).as("n_urls"),
        sum(col("n_longnums")).as("n_longnums"),
        sum(col("len_delta")).as("len_delta"))
      .orderBy("source")

  /** Per-document scrub over any (…, source, text) relation: counts
    * per PII class plus the redacted text and the length delta.
    * Redaction order is email → url → longnum (fixed, since an email
    * can contain digits and a URL can contain both).
    */
  private[graft] def scrubFor(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        urlRe, "<URL>"),
      longNumRe, "<NUM>")
    // regexp_count(col, lit(pattern)) keeps the pattern OUT of the SQL
    // parser — an expr() literal would eat the \. escape (Spark SQL
    // strings treat backslash as an escape character).
    docs.select(
      col("doc_id"), col("source"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(urlRe)).cast("long").as("n_urls"),
      regexp_count(col("text"), lit(longNumRe)).cast("long").as("n_longnums"),
      scrubbed.as("scrubbed"),
      (length(col("text")) - length(scrubbed)).cast("long").as("len_delta"))
  }

  val piiScrubSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |      AS n_emails,
      |    len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
      |    len(regexp_extract_all(text, '[0-9]{6,}')) AS n_longnums,
      |    length(text) - length(
      |      regexp_replace(regexp_replace(regexp_replace(text,
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        'https?://[^ ]+', '<URL>', 'g'),
      |        '[0-9]{6,}', '<NUM>', 'g')) AS len_delta
      |  FROM documents
      |)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
      |  CAST(sum(n_urls) AS BIGINT) AS n_urls,
      |  CAST(sum(n_longnums) AS BIGINT) AS n_longnums,
      |  CAST(sum(len_delta) AS BIGINT) AS len_delta
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Log₂-bucketed token-length histogram — the corpus-shape report
    * (length distribution) every ingest run emits. Bucketing uses the
    * binary-string length, NOT floor(log2(x)): libm log2 is not
    * correctly rounded at exact powers of two, so the FP form can
    * put 64 in bucket 5 on one engine and 6 on the other; len(bin(n))
    * − 1 is exact integer arithmetic on both.
    *
    * Scale: per-row arithmetic + a groupBy over ≤64 buckets —
    * map-side partials collapse to a handful of rows.
    */
  def tokenLenHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", (length(bin(col("n_tok"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .withColumn("bucket_lo", pow(lit(2.0), col("bucket")).cast("long"))
      .select("bucket", "bucket_lo", "n_docs", "total_tokens", "min_tokens", "max_tokens")
      .orderBy("bucket")

  val tokenLenHistSql: String =
    """WITH t AS (
      |  SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents WHERE len(str_split(text, ' ')) > 0
      |), b AS (
      |  SELECT n_tok, CAST(length(bin(n_tok)) - 1 AS BIGINT) AS bucket FROM t
      |)
      |SELECT bucket,
      |  CAST(power(2, bucket) AS BIGINT) AS bucket_lo,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(min(n_tok) AS BIGINT) AS min_tokens,
      |  CAST(max(n_tok) AS BIGINT) AS max_tokens
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Zipf-law fit of the corpus vocabulary: least-squares slope of
    * ln(frequency) against ln(rank) over the top-1000 words — the
    * corpus-health scalar (natural language sits near slope −1;
    * boilerplate and generated text drift off it).
    *
    * Scale: the word-count aggregate is the only corpus-sized step;
    * the rank window and the regression sums run over a CAPPED
    * top-k relation (one TakeOrdered), so the global sort never sees
    * the full vocabulary. Ranks are fully tie-broken (count desc,
    * word) so both engines number identically; the regression sums
    * are over 1000 O(1)-magnitude terms — last-ulp libm drift
    * vanishes at the 6 dp rounding.
    */
  def textZipf(spark: SparkSession, dir: String, topK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(topK)
    val ranked = counts
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("freq").desc, col("word"))))
      .select(log(col("rnk").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    ranked.agg(
      count(lit(1)).as("n_vocab"),
      round((count(lit(1)) * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))) /
        (count(lit(1)) * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x"))), 6)
        .as("zipf_slope"),
      round((sum(col("y")) - ((count(lit(1)) * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))) /
        (count(lit(1)) * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x")))) * sum(col("x"))) /
        count(lit(1)), 6).as("zipf_intercept"))
  }

  val textZipfSql: String =
    """WITH c AS (
      |  SELECT word, count(*) AS freq
      |  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) > 0
      |  GROUP BY word ORDER BY freq DESC, word LIMIT 1000
      |), r AS (
      |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, word) AS DOUBLE)) AS x,
      |    ln(CAST(freq AS DOUBLE)) AS y
      |  FROM c
      |)
      |SELECT count(*) AS n_vocab,
      |  round((count(*) * sum(x * y) - sum(x) * sum(y)) /
      |    (count(*) * sum(x * x) - sum(x) * sum(x)), 6) AS zipf_slope,
      |  round((sum(y) - ((count(*) * sum(x * y) - sum(x) * sum(y)) /
      |    (count(*) * sum(x * x) - sum(x) * sum(x))) * sum(x)) / count(*), 6)
      |    AS zipf_intercept
      |FROM r""".stripMargin
}

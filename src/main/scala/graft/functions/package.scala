package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ArrayDotProduct, CharWindows, CutSpans, GraftExprBridge, KmvEstimate, KmvIntersect, KmvSketchAgg, KmvUnion}

/** Public column helpers backed by graft's native Catalyst
  * expressions (no Scala UDFs, no interpreted lambdas in hot paths).
  */
package object functions {

  /** All length-n code-point windows of a string column at stride 1
    * (array<string>; length < n ⇒ empty array). Single byte-buffer
    * pass — O(len·n), never the O(len²) a substring(text, p, n)
    * lambda pays on UTF8String (no random char access). */
  def charWindows(text: Column, n: Int): Column =
    GraftExprBridge.column(CharWindows(GraftExprBridge.expression(text), n))

  /** Remove sorted, disjoint 1-based inclusive code-point ranges
    * (array<long> starts / ends) from a string in one byte pass —
    * O(len + spans), never the O(len·spans) a substring-concat
    * reconstruction pays on UTF8String. */
  def cutSpans(text: Column, starts: Column, ends: Column): Column =
    GraftExprBridge.column(CutSpans(
      GraftExprBridge.expression(text),
      GraftExprBridge.expression(starts),
      GraftExprBridge.expression(ends)))

  /** dot(a, b) as double; a, b are array<float> columns. */
  def arrayDot(a: Column, b: Column): Column =
    GraftExprBridge.column(
      ArrayDotProduct(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** L2 norm of a float-array column. */
  def arrayNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(arrayDot(a, a))

  /** Bottom-k (KMV) distinct sketch aggregate over a long/int/string
    * column → canonical binary (layout-invariant by construction —
    * see org.apache.spark.sql.graft.KmvSketch). */
  def kmvSketch(col: Column, k: Int = 1024): Column =
    GraftExprBridge.column(
      KmvSketchAgg(GraftExprBridge.expression(col), k).toAggregateExpression())

  /** Distinct-count estimate from a KMV sketch (exact below k). */
  def kmvEstimate(sketch: Column): Column =
    GraftExprBridge.column(KmvEstimate(GraftExprBridge.expression(sketch)))

  /** Estimated distinct-intersection size of two KMV sketches — the
    * set operation HLL registers cannot express. */
  def kmvIntersect(a: Column, b: Column): Column =
    GraftExprBridge.column(
      KmvIntersect(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** Merged KMV sketch (canonical binary), for sketch-cube rollups. */
  def kmvUnion(a: Column, b: Column): Column =
    GraftExprBridge.column(
      KmvUnion(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** Space-joined n-gram array over a token-array column, TOTAL in the
    * token count: documents shorter than `n` yield `array()` instead
    * of evaluating `sequence(0, size - n)` with a negative stop.
    *
    * The CASE guard must live INSIDE the expression, not in an
    * upstream `.filter(size(w) >= n)`: when the gram array feeds an
    * `explode`, `InferFiltersFromGenerate` adds
    * `isnotnull(grams) AND size(grams) > 0`, and `FilterExec`
    * evaluates null-intolerant conjuncts BEFORE the original guard —
    * so the un-guarded transform runs on short documents and
    * `slice(w, 0, n)` throws (round-12 fuzz finding F3: a 1-token
    * document crashed ngram_top; the generator corpus never produced
    * one).
    */
  def ngramsExpr(w: String, n: Int): String =
    s"CASE WHEN size($w) >= $n THEN " +
      s"transform(sequence(0, size($w) - $n), i -> concat_ws(' ', slice($w, i + 1, $n))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"

  /** n-gram array computed directly from a raw text column, with the
    * token array bound as a LAMBDA variable (a transform over a
    * one-element array). Use this — not a `split(...).as("w")`
    * projection + [[ngramsExpr]] — whenever the gram array feeds an
    * `explode`.
    *
    * Why: `InferFiltersFromGenerate` clones the generator input into a
    * `size(...) > 0` filter, and predicate pushdown SUBSTITUTES column
    * aliases into that clone — `slice(w, ...)` becomes
    * `slice(split(text), ...)` inside the lambda, and interpreted
    * higher-order functions re-evaluate it per element: O(n²) per
    * document in the FILTER, invisible at normal document lengths
    * (round-12 fuzz finding F2b: a megabyte doc wedged an executor
    * core for 20+ minutes). Alias substitution cannot rewrite a
    * lambda-bound variable, so this form tokenizes exactly once per
    * row under ANY plan transformation.
    */
  def ngramsFromTextExpr(textCol: String, n: Int): String =
    s"element_at(transform(array(split($textCol, ' ')), w0 -> " +
      s"CASE WHEN size(w0) >= $n THEN transform(sequence(0, size(w0) - $n), " +
      s"i -> concat_ws(' ', slice(w0, i + 1, $n))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END), 1)"
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All length-`n` CODE-POINT windows of a string at stride 1, as an
  * array<string> — the suffix-array surrogate dedup_substring explodes.
  *
  * Why an Expression and not `transform(sequence(...), p ->
  * substring(text, p, n))`: UTF8String has no random character access,
  * so each `substring(text, p, n)` scans p code points from byte 0 —
  * O(len²) per document, which wedges an executor core on a megabyte
  * doc (round-12 megadoc rule; observed live on the round-15 fuzz
  * corpus). This expression walks the byte buffer ONCE, records each
  * code point's byte offset, and slices windows by offset — O(len·n)
  * bytes total, the same bound the token-array ngram path has.
  *
  * Unicode: windows are code-point windows (UTF8String
  * numBytesForFirstByte walks whole code points), matching DuckDB's
  * length()/string_split(s, '') semantics on every planted class
  * including astral emoji. Total: length < n yields array() — safe
  * under InferFiltersFromGenerate's cloned size(...) > 0 conjunct.
  *
  * CodegenFallback is deliberate: the expression runs once per row
  * under a Generate (no whole-stage-codegen span to preserve), and
  * its cost is the window materialization itself.
  */
case class CharWindows(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"window length must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_windows"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val bytes = str.getBytes
    // one pass: byte offset of each code point start, plus the end
    var count = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    if (count < n) new GenericArrayData(Array.empty[Any])
    else {
      val offs = new Array[Int](count + 1)
      var c = 0
      i = 0
      while (i < bytes.length) {
        offs(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(count) = bytes.length
      val out = new Array[Any](count - n + 1)
      var p = 0
      while (p <= count - n) {
        val from = offs(p)
        out(p) = UTF8String.fromBytes(bytes, from, offs(p + n) - from)
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharWindows =
    copy(child = newChild)
}

package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k (KMV) distinct sketch — a custom Catalyst
  * `TypedImperativeAggregate` plus scalar estimate / intersect / union
  * expressions, the set-algebra capability HLL lacks (HLL registers
  * can union but never intersect).
  *
  * Design constraint, and why this is NOT a DataSketches theta
  * wrapper: theta's QuickSelect update sketch purges on buffer
  * pressure, so its final (theta, retained-set) — and therefore its
  * estimate — depends on insertion and merge ORDER. This engine's
  * layout-differential gate requires every result to be a pure
  * function of the data, so the sketch here is the classic KMV
  * bottom-k (Beyer et al., SIGMOD 2007; Bar-Yossef et al. 2002): the
  * k smallest distinct xxhash64 values of the input set. A bottom-k
  * set is commutative, associative, duplicate-insensitive, and
  * order-free BY CONSTRUCTION — partial sketches merge to exactly the
  * sketch of the union, at any parallelism, always bit-identical.
  *
  * Estimators (h normalized to (0,1] as an unsigned fraction of 2^64):
  *   distinct(S)  = n                 if n < k (sketch holds ALL hashes — exact)
  *                = (k-1) / frac(h_k) otherwise (unbiased KMV)
  *   |A ∩ B|      = ρ/k · distinct(A ∪ B), ρ = |K_k(A∪B) ∩ A ∩ B|
  * Membership in the intersect estimator is sound because a bottom-k
  * element of the union is necessarily a bottom-k element of every
  * sketch that contains it.
  *
  * Serialized form: [k:int][n:int][n longs, ascending unsigned] — the
  * canonical sorted rendering makes equal sets equal BYTES, so even
  * the binary sketch column is layout-invariant and digest-safe.
  *
  * Lives under org.apache.spark.sql (same reason as ArrayDotProduct):
  * catalyst internals; the public surface is the GraftExtensions SQL
  * functions (graft_kmv / graft_kmv_estimate / graft_kmv_intersect /
  * graft_kmv_union) and graft.functions column helpers.
  */
object KmvSketch {

  val Seed = 42L

  /** Unsigned fraction in (0, 1]: (h + 1) / 2^64 without losing the
    * top bit (double has 53 mantissa bits — fine for an estimator,
    * the formula just has to be FIXED). */
  def frac(h: Long): Double =
    ((h >>> 1).toDouble * 2.0 + (h & 1L).toDouble + 1.0) / 1.8446744073709552E19

  /** Distinct estimate from a canonical (ascending-unsigned) hash
    * array captured with nominal k. */
  def estimate(k: Int, hs: Array[Long]): Double =
    if (hs.length < k) hs.length.toDouble
    else (k - 1).toDouble / frac(hs(hs.length - 1))

  /** k smallest (unsigned) of two canonical arrays, deduplicated. */
  def mergeBottomK(k: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA =
        j >= b.length || (i < a.length && java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
      val v = if (takeA) { val x = a(i); i += 1; x } else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private def contains(hs: Array[Long], h: Long): Boolean = {
    // binary search under unsigned order (arrays are canonical)
    var lo = 0; var hi = hs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(hs(mid), h)
      if (c == 0) return true
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** KMV intersection estimate over two canonical sketches with the
    * same nominal k (Beyer et al. §4): exact when the union sketch is
    * exact (both inputs then retain their full hash sets). */
  def intersectEstimate(k: Int, a: Array[Long], b: Array[Long]): Double = {
    val kk = mergeBottomK(k, a, b)
    var rho = 0
    var i = 0
    while (i < kk.length) {
      if (contains(a, kk(i)) && contains(b, kk(i))) rho += 1
      i += 1
    }
    if (kk.length < k) rho.toDouble // exact mode
    else rho.toDouble / k * estimate(k, kk)
  }

  def serialize(k: Int, hs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * hs.length)
    bb.putInt(k).putInt(hs.length)
    hs.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt(); val n = bb.getInt()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong(); i += 1 }
    (k, hs)
  }
}

/** Mutable bottom-k buffer: a TreeSet under unsigned order, capped at
  * k (insert iff below the current k-th smallest; dedup is free). */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))

  def add(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 && set.add(h)) {
      set.pollLast(); ()
    }

  def toArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** graft_kmv(col[, k]): bottom-k distinct sketch of a LONG/INT/STRING
  * column → canonical binary. Distributed as ObjectHashAggregate:
  * per-partition buffers stream map-side, ONE ≤ 8 KB (k=1024) sketch
  * per group crosses the exchange.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(k >= 16 && k <= (1 << 20), s"kmv nominal k out of range: $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, IntegerType, StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = child.dataType match {
        case LongType    => XXH64.hashLong(v.asInstanceOf[Long], KmvSketch.Seed)
        case IntegerType => XXH64.hashLong(v.asInstanceOf[Int].toLong, KmvSketch.Seed)
        case StringType  =>
          val s = v.asInstanceOf[UTF8String]
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), KmvSketch.Seed)
        case dt => throw new IllegalStateException(s"graft_kmv: unsupported type $dt")
      }
      buf.add(h)
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvBuffer): Any = KmvSketch.serialize(k, buf.toArray)

  override def serialize(buf: KmvBuffer): Array[Byte] =
    KmvSketch.serialize(buf.k, buf.toArray)

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val (kk, hs) = KmvSketch.deserialize(bytes)
    val buf = new KmvBuffer(kk)
    hs.foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** graft_kmv_estimate(sketch): distinct-count estimate (exact when the
  * sketch holds fewer than k hashes). Scalar over group-level rows —
  * CodegenFallback is fine off the hot path. */
case class KmvEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_kmv_estimate"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val (k, hs) = KmvSketch.deserialize(v.asInstanceOf[Array[Byte]])
      KmvSketch.estimate(k, hs)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** graft_kmv_intersect(a, b): estimated distinct-intersection size —
  * the set operation HLL cannot express. */
case class KmvIntersect(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_kmv_intersect"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val (ka, ha) = KmvSketch.deserialize(a.asInstanceOf[Array[Byte]])
      val (kb, hb) = KmvSketch.deserialize(b.asInstanceOf[Array[Byte]])
      KmvSketch.intersectEstimate(math.min(ka, kb), ha, hb)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

/** graft_kmv_union(a, b): merged sketch (canonical binary) — sketches
  * compose into rollups exactly like the HLL cube's hll_union_agg. */
case class KmvUnion(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_kmv_union"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val (ka, ha) = KmvSketch.deserialize(a.asInstanceOf[Array[Byte]])
      val (kb, hb) = KmvSketch.deserialize(b.asInstanceOf[Array[Byte]])
      val k = math.min(ka, kb)
      KmvSketch.serialize(k, KmvSketch.mergeBottomK(k, ha, hb))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnion =
    copy(left = newLeft, right = newRight)
}

package graft.functions

/** Shared deterministic hashing primitives (driver/executor-local). */
object Hashing {

  /** splitmix64 finalizer — one shared copy of the magic constants. */
  def splitmix64(i: Long): Long = {
    var x = i + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** splitmix64 → uniform double in [0, 1). */
  def toUnitDouble(i: Long): Double =
    (splitmix64(i) >>> 11).toDouble / (1L << 53).toDouble
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent content digest of a relation, used to extend the
  * driver's exact-hash oracle signal to decode outputs whose full row
  * sets are too large to pin as `VALUES` literals (the `*_digest`
  * companion entries in SURVEY §2). One output row regardless of input
  * size:
  *
  *   - `n`       — row count
  *   - `sig_xor` — XOR of per-row xxhash64 over the Sep-joined string
  *                 rendering of every column
  *   - `sig_sum` — sum of per-row hash mod 2^31−1 (a second,
  *                 XOR-independent combiner: an even number of
  *                 duplicate rows cancels in XOR but not in the sum)
  *
  * Both combiners are commutative and associative, so the digest is
  * insensitive to row order, partitioning, and aggregate fold order —
  * the only sensitivity left is the rendered row content itself, which
  * is exactly what the companion pin guards. Determinism therefore
  * reduces to the base query's own value-determinism (per-sequence DP
  * from integer-count models, watermark-closed session sums), which is
  * verified by the two-parallelism PinGen capture diff.
  *
  * Scale shape: one narrow map + a single 3-column partial aggregate —
  * no collect, no sort, no shuffle beyond the final 1-row reduce, so
  * the digest of a 100 TB relation costs one scan. (`sig_sum`'s
  * headroom is ~2^32 rows before BIGINT overflow under ANSI mode —
  * far above any pinned tier.)
  */
object RelationDigest {

  def digest(df: DataFrame): DataFrame = {
    // nulls render as a sentinel concat_ws would otherwise silently
    // drop, which would make (a, null) and (a) collide
    val rendered = concat_ws("\u001f",
      df.schema.fieldNames.toSeq.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*)
    df.select(xxhash64(rendered).as("sig"))
      .agg(
        count(lit(1)).as("n"),
        expr("bit_xor(sig)").as("sig_xor"),
        sum(pmod(col("sig"), lit(2147483647L))).as("sig_sum"))
  }
}

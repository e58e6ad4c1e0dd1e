package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pinned-literal oracles: machine-captured outputs of queries whose
  * results are deterministic by construction (seeded `java.util.Random`
  * models, hash-seeded Lloyd codebooks, exact integer BPE merge ranks)
  * but which DuckDB cannot recompute from the parquet tables. The
  * captured rows become a `VALUES` relation keyed by corpus tier, so
  * the driver's exact-hash compare still runs end-to-end.
  *
  * What the pins are pinned AGAINST (any of these changing flips them):
  *   - the Spark minor version's xxhash64 / `hash` family (seed
  *     selection for Lloyd and for PQ codebooks),
  *   - `sum()`/`avg()` partial-aggregate fold order at the capture
  *     parallelism (values are rounded 4-8 dp, so only boundary-exact
  *     sums are at risk — capture verifies stability across local[4]
  *     and local[32]),
  *   - the `java.util.Random` stream (hmm_random_model's seed 42),
  *   - `round()`'s shortest-decimal (BigDecimal) behavior and
  *     `Double.toString`'s shortest round-trip rendering.
  *
  * [[PinnedOraclesSpec]] recomputes every pinned row from the
  * distributed path at sf0.001, so a Spark upgrade fails locally with
  * a row-level diff instead of at the driver. Capture procedure:
  * `graft.tools.PinGen` (run twice at different parallelism, diff).
  */
object PinnedOracles {

  /** Field separator inside a rendered row (never occurs in corpus text). */
  val Sep = '\u001f'

  /** Corpus-tier discriminator: documents/embeddings have equal row
    * counts at sf0.001 and sf0.01, so lineitem's row count keys the
    * tier (1 = sf0.001, 2 = sf0.01, 3 = sf0.1, 4 = the ScaleUp ×10
    * self-scaled corpus at ~6M rows — the round-12 scaled pin tier,
    * 5 = the ScaleUp ×100 corpus at ~60M rows — the round-15 tier
    * that content-checks the pinned surface at the scale that keeps
    * finding bugs). */
  val tierSql: String =
    "SELECT CASE WHEN count(*) < 20000 THEN 1 WHEN count(*) < 200000 THEN 2 WHEN count(*) < 2000000 THEN 3 WHEN count(*) < 20000000 THEN 4 ELSE 5 END AS tier FROM lineitem"

  /** One pinned result set: column name → DuckDB type, and per-tier
    * rendered rows ([[Sep]]-joined, in the query's own output order).
    * A single-tier map means the result is corpus-independent. */
  final case class Pinned(cols: Seq[(String, String)], rows: Map[Int, Seq[String]]) {

    def rowsFor(tier: Int): Seq[String] =
      if (rows.size == 1) rows.head._2 else rows(tier)

    /** Whether this pin can oracle a corpus in `tier` — always for a
      * corpus-independent (collapsed) capture, else only if that
      * tier's rows were captured (a tier-4 capture can be absent when
      * it blew PinGen's size guard). */
    def hasTier(tier: Int): Boolean = rows.size == 1 || rows.contains(tier)

    /** DuckDB SQL reproducing this result at whatever SF the driver
      * points its views at. */
    def sql: String = {
      // identifiers double-quoted: BPE token columns are named left/right,
      // both reserved words in DuckDB's VALUES alias list
      val colNames = cols.map { case (n, _) => "\"" + n + "\"" }
      val casts = cols.map { case (n, t) => s"""CAST("$n" AS $t) AS "$n"""" }.mkString(",\n  ")
      def lit(raw: String, tpe: String): String = tpe match {
        case "VARCHAR" => "'" + raw.replace("'", "''") + "'"
        // non-string NULLs render as the bare NULL token (r17: nullable
        // dup_of in media_audio_dedup) — unambiguous, since a numeric/
        // boolean rendering is never the letters NULL; the enclosing
        // CAST types the SQL NULL
        case _         => raw
      }
      def valuesRow(extra: Seq[String], r: String): String =
        (extra ++ r.split(Sep.toString, -1).toSeq.zip(cols).map { case (v, (_, t)) => lit(v, t) })
          .mkString("(", ", ", ")")
      if (rows.size == 1) {
        val vals = rows.head._2.map(r => valuesRow(Nil, r)).mkString(",\n  ")
        s"""SELECT $casts
           |FROM (VALUES
           |  $vals) AS vals(${colNames.mkString(", ")})""".stripMargin
      } else {
        val vals = rows.toSeq.sortBy(_._1).flatMap { case (tier, rs) =>
          rs.map(r => valuesRow(Seq(tier.toString), r))
        }.mkString(",\n  ")
        s"""WITH sf AS ($tierSql),
           |vals(tier, ${colNames.mkString(", ")}) AS (VALUES
           |  $vals)
           |SELECT $casts
           |FROM vals JOIN sf USING (tier)""".stripMargin
      }
    }
  }

  /** Render a result row exactly as the capture did — shared by PinGen
    * and the drift spec so "recompute and compare" is string-equal.
    * `Double.toString` is the shortest decimal that round-trips to the
    * same binary double, and DuckDB's string→DOUBLE parse is correctly
    * rounded, so the driver's exact (bitwise float64) compare holds. */
  def renderRow(row: Row, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) {
        // NULL is pinnable for non-string columns only: their value
        // renderings are digits/true/false, so the literal NULL token
        // is collision-free. A string column could legitimately
        // CONTAIN "NULL", so a null string stays unpinnable.
        require(f.dataType != StringType,
          s"null STRING in pinned output column ${f.name} — ambiguous, unpinnable")
        "NULL"
      } else f.dataType match {
        case DoubleType  =>
          val d = row.getDouble(i)
          // NaN/Infinity render as bare tokens a VALUES relation can't
          // parse — the oracle SQL would error at the gate, not here
          require(!d.isNaN && !d.isInfinite, s"non-finite double in pinned output column ${f.name}: $d")
          java.lang.Double.toString(d)
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType  =>
          val s = row.getString(i)
          require(!s.exists(c => c == Sep || c == '\n' || c == '\r'),
            s"unpinnable string in ${f.name}: ${s.take(40)}")
          s
        case dt => sys.error(s"unpinnable column type $dt for ${f.name}")
      }
    }.mkString(Sep.toString)

  /** DuckDB type for a pinned Spark column. */
  def duckType(dt: DataType): String = dt match {
    case DoubleType  => "DOUBLE"
    case LongType    => "BIGINT"
    case IntegerType => "INTEGER"
    case StringType  => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case other       => sys.error(s"unpinnable column type $other")
  }
}

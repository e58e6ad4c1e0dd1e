package graft.streaming

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark.spark

/** Cross-batch behavior of the streaming document near-dup: chunks
  * arrive in doc_id order (a crawl's ingest order), so state carried
  * between microbatches must flag an exact dup of a CHUNK-1 doc
  * arriving in chunk 2, and a near-dup whose neighbor text was first
  * seen in an earlier chunk. The single-batch corpus replay is
  * oracled by the driver gate; this spec is the per-file incremental
  * path plus the planted-duplicate positives the driver corpus lacks.
  */
class StreamDocDedupSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private def doc(id: Long, text: String) =
    Row(id, text, "en", "web", text.length.toLong)

  // base: 20 distinct tokens → 18 shingles; nearBase appends one token
  // → J = 18/19 ≈ 0.947 ≥ 0.8; far shares nothing
  private val base =
    "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
  private val nearBase = base + " w21"
  private val far =
    "x01 x02 x03 x04 x05 x06 x07 x08 x09 x10 x11 x12 x13 x14 x15 x16 x17 x18 x19 x20"

  test("chunked replay: exact and near verdicts ride state across microbatches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toFile.getAbsolutePath
    val chunk1 = Seq(doc(1, base), doc(2, far))
    val chunk2 = Seq(doc(3, base), doc(4, nearBase), doc(5, "y01 y02 y03 y04 y05"))
    // single-FILE chunks (a directory-per-chunk layout would hide the
    // leaf names from the pathGlobFilter — the RecoverySpec pattern)
    def write(rows: Seq[Row], name: String): Unit = {
      val stage = s"$dir/stage_$name"
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/$name"))
    }
    write(chunk1, "chunk1.parquet")
    write(chunk2, "chunk2.parquet")
    // the batch verification side reads the full ingested corpus
    write(chunk1 ++ chunk2, "documents.parquet")

    val got = StreamingJobs.streamDocDedup(spark, dir,
        srcGlob = "chunk*.parquet", maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getDouble(3))))
      .toMap

    assert(got(1L) == ((false, 0L, 0.0)), s"doc 1 is first: ${got(1L)}")
    assert(got(2L) == ((false, 0L, 0.0)), s"doc 2 unrelated: ${got(2L)}")
    // doc 3: exact dup of doc 1 (chunk-1 state), no near-dup TEXTS
    // other than its own (own text group never counts as near)
    assert(got(3L)._1, s"doc 3 must be an exact dup across chunks: ${got(3L)}")
    // doc 4: near-dup of the base text first seen in chunk 1
    assert(!got(4L)._1 && got(4L)._2 == 1L &&
      math.abs(got(4L)._3 - 18.0 / 19.0) < 1e-6,
      s"doc 4 must near-match the chunk-1 text at J=18/19: ${got(4L)}")
    assert(got(5L) == ((false, 0L, 0.0)), s"doc 5 unrelated: ${got(5L)}")
  }

  test("doc 3's near count excludes its own text group, and doc 1 gains nothing retroactively") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd2").toFile.getAbsolutePath
    // one batch: base (1), its clone (2), its near (3) — the clone's
    // near count must equal the rep's FUTURE-blind count at its own
    // arrival: neighbor texts first seen BEFORE doc 2 = none (near
    // text arrives as doc 3)
    val rows = Seq(doc(1, base), doc(2, base), doc(3, nearBase))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = StreamingJobs.streamDocDedup(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((false, 0L, 0.0)), s"rep sees nothing earlier: ${got(1L)}")
    assert(got(2L)._1 && got(2L)._2 == 0L,
      s"clone is exact-dup with no earlier near TEXTS: ${got(2L)}")
    assert(!got(3L)._1 && got(3L)._2 == 1L,
      s"near doc counts the one earlier text: ${got(3L)}")
  }
}

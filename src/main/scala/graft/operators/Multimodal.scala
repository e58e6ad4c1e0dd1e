package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY.md §2.7): media as opaque
  * `binary` payloads with typed metadata, processed through
  * batch-shaped `mapPartitions` — the Spark-side pattern a real
  * decode/feature-extract pipeline uses (vectorized codec calls over
  * row batches, partition-local, no shuffle).
  *
  * ── STUB BOUNDARY ──────────────────────────────────────────────
  * This container ships no image/audio codecs, so `FakeCodec` below
  * is a clearly-marked deterministic stand-in: it "parses" header
  * fields from the payload bytes. Swap `FakeCodec` for a real
  * decoder (libjpeg/ffmpeg via JNI, or a Pandas-UDF sidecar in
  * PySpark) and every schema, batch shape, and partition contract
  * here stays the same.
  * ───────────────────────────────────────────────────────────────
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, valid: Boolean)

  final case class Frame(
      doc_id: Long, frame_idx: Int, frame_bytes: Int, thumb_w: Int, thumb_h: Int)

  /** Codec batch size: real decoders amortize per-call overhead over
    * a batch; the iterator is consumed in groups of this size.
    */
  val CodecBatchSize = 64

  /** STUB: deterministic fake codec. Header fields are derived from
    * payload bytes so results are stable and testable; a real codec
    * would read actual container headers here.
    */
  private object FakeCodec {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaMeta] = rows.map { r =>
      val b = r.payload
      if (b.length < 4) MediaMeta(r.doc_id, r.media_type, b.length, 0, 0, 0L, valid = false)
      else {
        val w = 160 + (b(0) & 0x7F)
        val h = 90 + (b(1) & 0x7F)
        val dur = r.media_type match {
          case "image" => 0L
          case "audio" => 1000L + (b(2) & 0xFF) * 250L
          case _       => 5000L + (b(3) & 0xFF) * 1000L
        }
        MediaMeta(r.doc_id, r.media_type, b.length, w, h, dur, valid = true)
      }
    }

    def sampleFrames(r: MediaRow, stride: Int): Seq[Frame] = {
      val meta = decodeBatch(Seq(r)).head
      if (!meta.valid || meta.duration_ms == 0) {
        Seq(Frame(r.doc_id, 0, r.payload.length, meta.width / 4, meta.height / 4))
      } else {
        val nFrames = (meta.duration_ms / 1000L).toInt.max(1)
        (0 until nFrames by stride).map { i =>
          Frame(r.doc_id, i, (r.payload.length / nFrames).max(1), meta.width / 4, meta.height / 4)
        }
      }
    }
  }

  /** Media table derived from documents: payload = utf-8 bytes of the
    * text (the container has no real media), media_type cycled
    * deterministically. In production this is a parquet/iceberg table
    * with a real binary column; everything downstream is unchanged.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Header-derived metadata via batched partition-local decode. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.grouped(CodecBatchSize).flatMap(b => FakeCodec.decodeBatch(b)))
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling / thumbnail plumbing; video rows fan out to one
    * row per sampled frame.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(col("media_type") === "video")
      .mapPartitions(_.flatMap(r => FakeCodec.sampleFrames(r, stride)))
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }
}

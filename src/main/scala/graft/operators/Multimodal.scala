package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY.md §2.7): media as opaque
  * `binary` payloads with typed metadata, processed through
  * batch-shaped `mapPartitions` — the Spark-side pattern a real
  * decode/feature-extract pipeline uses (vectorized codec calls over
  * row batches, partition-local, no shuffle).
  *
  * Nothing here is a stub. This container ships no compressed-format
  * codecs (libjpeg/ffmpeg), but BMP and PCM-WAV are uncompressed
  * containers whose headers are plain little-endian arithmetic:
  * `RiffCodec` synthesizes spec-conformant files and parses them
  * back by MAGIC BYTES (not a kind column), driver-oracled end to
  * end. Every operator (`mediaMeta`, `mediaParse`, `frameSample`,
  * `mediaAudioStats`) runs on those real bytes; a compressed format
  * slots in as one more magic-byte branch in `RiffCodec.parse` with
  * every schema, batch shape, and partition contract unchanged.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, valid: Boolean)

  final case class FrameRow(
      doc_id: Long, frame_idx: Long, row_y: Long,
      row_offset: Long, row_bytes: Long, pixel_sum: Long)

  /** Codec batch size: real decoders amortize per-call overhead over
    * a batch; the iterator is consumed in groups of this size.
    */
  val CodecBatchSize = 64

  /** Header-derived metadata from the REAL BMP/WAV binaries, via the
    * batched partition-local decode a production pipeline uses. Each
    * payload is parsed by magic bytes ([[RiffCodec.parse]]) and
    * mapped to the user-facing media_type; to exercise the failure
    * path on actual corrupt bytes, every 13th payload is truncated
    * to under 7 bytes before decode and must come back
    * `valid = false` with zeroed fields — the oracle recomputes both
    * branches in closed form from doc_id.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaBinaryTable(spark, dir)
      .map(r =>
        if (r.doc_id % 13 == 0)
          MediaRow(r.doc_id, r.media_type, r.payload.take((r.doc_id % 7).toInt))
        else r)
      .mapPartitions(_.grouped(CodecBatchSize).flatMap(_.map { r =>
        val p = RiffCodec.parse(r.doc_id, r.payload)
        val mediaType = p.kind match {
          case "bmp" => "image"
          case "wav" => "audio"
          case other => other
        }
        MediaMeta(r.doc_id, mediaType, p.n_bytes, p.width, p.height,
          p.duration_ms, valid = p.kind != "unknown")
      }))
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle for media_meta: every field in closed form from doc_id —
    * the same BMP/WAV size arithmetic as [[mediaParseSql]], plus the
    * truncated-payload branch (doc_id % 13 = 0 ⇒ n_bytes = doc_id % 7,
    * everything else zeroed, valid = false).
    */
  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 13 = 0 THEN 'unknown'
      |       WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
      |  CAST(CASE WHEN doc_id % 13 = 0 THEN doc_id % 7
      |    WHEN doc_id % 2 = 0
      |    THEN 54 + (9 + doc_id % 16) * (((3 * (16 + doc_id % 32) + 3) // 4) * 4)
      |    ELSE 44 + (100 + (doc_id % 20) * 10) *
      |         ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2 // 1000)
      |  END AS INTEGER) AS n_bytes,
      |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 2 = 1 THEN 0
      |    ELSE 16 + doc_id % 32 END AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 2 = 1 THEN 0
      |    ELSE 9 + doc_id % 16 END AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 2 = 0 THEN 0
      |    ELSE 100 + (doc_id % 20) * 10 END AS BIGINT) AS duration_ms,
      |  doc_id % 13 <> 0 AS valid
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame/row sampling over the REAL BMP binaries (not the stub):
    * every stride-th pixel row of each bitmap becomes a "frame" row,
    * located by genuine BMP stride arithmetic (4-byte-aligned rows,
    * 54-byte header) and checksummed by summing the row's actual
    * pixel bytes — the partition-local fan-out shape a real
    * frame-sampler/thumbnailer has, with no codec dependency.
    * Oracle: all five derived fields are closed-form in doc_id (the
    * synthesized gradient makes the pixel sum w(w-1) + 2wy), so the
    * driver verifies the synthesize → real-bytes → sample round trip.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2): DataFrame =
    frameSampleFor(spark, mediaBinaryTable(spark, dir).filter(_.media_type == "bmp"), stride)

  /** Payload-injectable form (hostile-header fuzz, round 14): row
    * geometry comes from the VALIDATED [[RiffCodec.parse]] — a header
    * that lies about its dimensions parses as `unknown` and yields no
    * frames, instead of driving the pixel loop off the end of the
    * payload (ArrayIndexOutOfBounds) or into an Int-overflowed offset.
    */
  private[graft] def frameSampleFor(spark: SparkSession,
      media: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    import spark.implicits._
    media
      .mapPartitions(_.flatMap { r =>
        val p = RiffCodec.parse(r.doc_id, r.payload)
        if (p.kind != "bmp") Iterator.empty
        else {
          val w = p.width
          val h = p.height
          val rowSize = ((3 * w + 3) / 4) * 4 // Int-safe: parse capped w
          (0 until h by stride).zipWithIndex.iterator.map { case (y, i) =>
            val off = 54 + y * rowSize
            var s = 0L
            var x = 0
            while (x < 3 * w) { s += (r.payload(off + x) & 0xFF); x += 1 }
            FrameRow(r.doc_id, i.toLong, y.toLong, off.toLong, rowSize.toLong, s)
          }
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Closed-form oracle for [[frameSample]] at the default stride 2:
    * w = 16 + d%32, h = 9 + d%16, rowSize = ((3w+3)//4)*4; sampled
    * file rows y = 0,2,…&lt;h; pixel bytes at (x,y) are the synthetic
    * gradient ((x+y)&0xFF, x&0xFF, y&0xFF) with x+y ≤ 69 &lt; 256, so
    * the row sum collapses to w(w−1) + 2wy exactly.
    */
  val frameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, 16 + doc_id % 32 AS w, 9 + doc_id % 16 AS h,
      |    ((3 * (16 + doc_id % 32) + 3) // 4) * 4 AS row_size
      |  FROM documents WHERE doc_id % 2 = 0
      |)
      |SELECT doc_id,
      |  CAST(y // 2 AS BIGINT) AS frame_idx,
      |  CAST(y AS BIGINT) AS row_y,
      |  CAST(54 + y * row_size AS BIGINT) AS row_offset,
      |  CAST(row_size AS BIGINT) AS row_bytes,
      |  CAST(w * (w - 1) + 2 * w * y AS BIGINT) AS pixel_sum
      |FROM b, unnest(generate_series(0, CAST(h - 1 AS BIGINT), 2)) AS t(y)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------
  // REAL container parsing — not a stub. Uncompressed formats (BMP,
  // RIFF/WAV) need no codec library: their headers are plain
  // little-endian byte arithmetic. The rows below are genuine,
  // spec-conformant BMP/WAV files synthesized per doc_id; the parser
  // dispatches on the MAGIC BYTES (not a kind column) and reads the
  // actual container headers. The oracle recomputes every field in
  // closed form from doc_id, so the driver verifies the whole
  // synthesize → real-bytes → parse round trip.
  // -------------------------------------------------------------------

  final case class MediaParsed(
      doc_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, bits: Int,
      duration_ms: Long, n_bytes: Int)

  object RiffCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private def le(n: Int): ByteBuffer =
      ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

    /** Minimal spec-conformant 24bpp BMP (BITMAPINFOHEADER). */
    def synthBmp(width: Int, height: Int): Array[Byte] = {
      val rowSize = ((3 * width + 3) / 4) * 4
      val imageSize = rowSize * height
      val fileSize = 54 + imageSize
      val b = le(fileSize)
      b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
        .putShort(0).putShort(0).putInt(54)
      b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      // deterministic pixel data (gradient) + row padding
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          b.put(((x + y) & 0xFF).toByte).put((x & 0xFF).toByte).put((y & 0xFF).toByte)
          x += 1
        }
        var pad = rowSize - 3 * width
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y += 1
      }
      b.array()
    }

    /** Minimal spec-conformant PCM WAV (RIFF/fmt/data). */
    def synthWav(sampleRate: Int, channels: Int, durMs: Int): Array[Byte] = {
      val byteRate = sampleRate * channels * 2 // 16-bit PCM
      val dataLen = durMs * (byteRate / 1000)  // rates are multiples of 1000
      val b = le(44 + dataLen)
      b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
        .putShort((channels * 2).toShort).putShort(16)
      b.put("data".getBytes).putInt(dataLen)
      var i = 0
      while (i < dataLen) { b.put((i & 0x7F).toByte); i += 1 } // deterministic PCM
      b.array()
    }

    /** Geometry cap: a lying BMP header can declare dimensions whose
      * row arithmetic overflows Int (3·width) or whose row loop wedges
      * a core for minutes — a real decoder rejects absurd geometry
      * before allocating. 2^15 keeps every derived size comfortably in
      * Long while admitting any realistic bitmap. */
    private val MaxDim = 1 << 15

    /** Parse by magic bytes, reading the real container headers.
      *
      * Round-14 hardening (hostile-header fuzz): magic bytes prove
      * nothing about the FIELDS — a payload can carry a syntactically
      * valid header that lies (negative height, bpp≠24, dataLen past
      * the actual bytes, byteRate inconsistent with rate·ch·2, sizes
      * that overflow Int). Every declared geometry is now validated in
      * LONG arithmetic against the payload that actually arrived;
      * anything inconsistent parses as `unknown` (⇒ valid=false in
      * mediaMeta) instead of flowing into downstream row/sample loops
      * as trusted bounds. Well-formed containers — everything the
      * driver corpus synthesizes — parse exactly as before.
      */
    def parse(docId: Long, payload: Array[Byte]): MediaParsed = {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def unknown = MediaParsed(docId, "unknown", 0, 0, 0, 0, 0, 0L, payload.length)
      if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
        val width = b.getInt(18)
        val height = b.getInt(22)
        val bpp = b.getShort(28).toInt
        val geomOk = width > 0 && height > 0 && width <= MaxDim && height <= MaxDim &&
          bpp == 24 && {
            val rowSize = ((3L * width + 3L) / 4L) * 4L
            54L + rowSize * height <= payload.length
          }
        if (!geomOk) unknown
        else MediaParsed(docId, "bmp", width, height, 0, 0, bpp, 0L, payload.length)
      } else if (payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F') {
        val channels = b.getShort(22).toInt
        val rate = b.getInt(24)
        val byteRate = b.getInt(28)
        val bits = b.getShort(34).toInt
        val dataLen = b.getInt(40)
        val pcmOk = channels > 0 && rate > 0 && bits == 16 &&
          byteRate.toLong == rate.toLong * channels * 2L &&
          dataLen >= 0 && 44L + dataLen <= payload.length
        if (!pcmOk) unknown
        else {
          val durMs = dataLen.toLong * 1000L / byteRate
          MediaParsed(docId, "wav", 0, 0, rate, channels, bits, durMs, payload.length)
        }
      } else unknown
    }
  }

  /** Real binary media table: even doc_ids get BMPs, odd get WAVs,
    * with dimensions/rates in closed form from doc_id (so the oracle
    * can recompute them without parsing bytes).
    */
  def mediaBinaryTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // The pruned doc_id scan is ~8 bytes/row — at ×100 the whole
    // 500k-row column fits ONE input split, which would serialize the
    // per-row payload synthesis (the stand-in for real decode work)
    // onto a single core (observed: 1/32 threads busy at the sfx10
    // tier). Hash-repartition the keys BEFORE the synthesis map so
    // the codec work spreads across the cluster — exactly what a real
    // pipeline does between a thin manifest scan and a fat decode.
    Tables.documents(spark, dir).select(col("doc_id"))
      .repartition(col("doc_id")).as[Long].map { d =>
      if (d % 2 == 0)
        MediaRow(d, "bmp", RiffCodec.synthBmp(
          width = 16 + (d % 32).toInt, height = 9 + (d % 16).toInt))
      else
        MediaRow(d, "wav", RiffCodec.synthWav(
          sampleRate = 8000 + (d % 8).toInt * 1000,
          channels = 1 + (d % 2).toInt,
          durMs = 100 + (d % 20).toInt * 10))
    }
  }

  /** Header parse of the real binaries, batched partition-local. */
  def mediaParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaBinaryTable(spark, dir)
      .mapPartitions(_.grouped(CodecBatchSize).flatMap(_.map(r =>
        RiffCodec.parse(r.doc_id, r.payload))))
      .toDF()
      .orderBy("doc_id")
  }

  /** REAL audio feature extraction: decode the 16-bit LE PCM samples
    * out of every WAV payload and report the signal stats
    * (n_samples, peak, RMS, mean) — the "decode + featurize" step of
    * a multimodal pipeline, running on actual bytes through the same
    * batched partition-local path as the parsers.
    *
    * All stats derive from EXACT integer sample sums (sumsq < 2^53),
    * and sqrt is IEEE-correctly-rounded on both engines, so the
    * closed-form oracle (the synthesized PCM pattern is
    * byte_i = i & 0x7F) matches to the last bit before rounding.
    */
  def mediaAudioStats(spark: SparkSession, dir: String): DataFrame =
    mediaAudioStatsFor(spark, mediaBinaryTable(spark, dir).filter(_.media_type == "wav"))

  /** Payload-injectable form (hostile-header fuzz, round 14): the
    * sample loop bound comes from the VALIDATED [[RiffCodec.parse]] —
    * a dataLen declared past the actual payload (or a byteRate
    * inconsistent with rate·channels·2) parses as `unknown` and
    * produces no stats row, instead of reading samples off the end of
    * the buffer.
    */
  private[graft] def mediaAudioStatsFor(spark: SparkSession,
      media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media
      .mapPartitions(_.grouped(CodecBatchSize).flatMap(_.flatMap { r =>
        val p = RiffCodec.parse(r.doc_id, r.payload)
        val b = ByteBuffer.wrap(r.payload).order(ByteOrder.LITTLE_ENDIAN)
        // parse validated 44 + dataLen <= length; an empty (but valid)
        // data chunk has no samples to report — no row, not NaN stats
        val n = if (p.kind != "wav") 0 else b.getInt(40) / 2
        if (n == 0) None
        else {
          var i = 0
          var sum = 0L
          var sumSq = 0L
          var peak = Long.MinValue
          while (i < n) {
            val v = b.getShort(44 + 2 * i).toLong // signed 16-bit sample
            sum += v
            sumSq += v * v
            if (v > peak) peak = v
            i += 1
          }
          Some((r.doc_id, n.toLong, peak,
            math.sqrt(sumSq.toDouble / n), sum.toDouble / n))
        }
      }))
      .toDF("doc_id", "n_samples", "peak", "rms", "mean_sample")
      .select(col("doc_id"), col("n_samples"), col("peak"),
        round(col("rms"), 6).as("rms"),
        round(col("mean_sample"), 6).as("mean_sample"))
      .orderBy("doc_id")
  }

  val mediaAudioStatsSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    (100 + (doc_id % 20) * 10) *
      |      ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2 // 1000) AS data_len
      |  FROM documents WHERE doc_id % 2 = 1
      |), s AS (
      |  SELECT doc_id,
      |    ((2 * j) % 128) + (((2 * j + 1) % 128) * 256) AS v
      |  FROM w, unnest(generate_series(0, data_len // 2 - 1)) AS t(j)
      |)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(max(v) AS BIGINT) AS peak,
      |  round(sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / count(*)), 6) AS rms,
      |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_sample
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle: every parsed field in closed form from doc_id — BMP file
    * size = 54 + height·rowSize with 4-byte row padding; WAV size =
    * 44 + durMs·byteRate/1000. Matching proves the synthesized bytes
    * are spec-conformant AND the parser reads them back exactly.
    */
  val mediaParseSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
      |  CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 32 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN 9 + doc_id % 16 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 + (doc_id % 8) * 1000 END AS sample_rate,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 + doc_id % 2 END AS channels,
      |  CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS bits,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 100 + (doc_id % 20) * 10 END AS duration_ms,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN 54 + (9 + doc_id % 16) * (((3 * (16 + doc_id % 32) + 3) // 4) * 4)
      |    ELSE 44 + (100 + (doc_id % 20) * 10) *
      |         ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2 // 1000)
      |  END AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal binary-column plumbing: media payloads as opaque `binary`
  * with a typed metadata struct, and a batched decode/feature-extract
  * stage over mapPartitions.
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * `decodeStub` derives deterministic fake features from the payload
  * bytes. Everything around it — the binary column, the metadata schema,
  * the partition-batched typed pipeline, the output feature schema — is
  * the real Spark shape a production decoder drops into: at 100 TB,
  * payloads stay columnar until the mapPartitions boundary, partitions
  * bound the decoder's working set, and the stage is map-only (no
  * shuffle) so it scales with executors.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte],
                      format: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           checksum: Long, mean_pixel_q: Long, aspect_bp: Long)

  /** STUB decode: a real implementation would decode `payload` with an
    * image/audio codec here. This stands in with deterministic
    * byte-stream statistics so the pipeline is testable end-to-end. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    var sum = 0L
    var h = 1125899906842597L
    var i = 0
    while (i < r.payload.length) {
      sum += r.payload(i) & 0xff
      h = h * 31L + (r.payload(i) & 0xff)
      i += 1
    }
    val mean = if (r.payload.length == 0) 0L else sum / r.payload.length
    val aspect = if (r.height == 0) 0L else r.width.toLong * 10000L / r.height
    MediaFeatures(r.doc_id, r.format, r.payload.length.toLong, h, mean, aspect)
  }

  /** Build the media table from documents: text bytes stand in for an
    * encoded payload; metadata is a typed struct derived per row. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        concat(lit("img/"), substring(col("source"), 4, 10)).as("format"),
        (pmod(xxhash64(col("text")), lit(1024L)) + 64L).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1L)), lit(768L)) + 64L).cast("int").as("height"))
        .as("meta"))

  /** q70: batched decode/feature-extract over the binary column.
    * Typed Dataset + mapPartitions: the per-partition iterator is the
    * batch boundary a native decoder amortizes setup over. */
  def q70(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, d).select(
      col("doc_id"), col("payload"),
      col("meta.format").as("format"), col("meta.width").as("width"),
      col("meta.height").as("height")).as[MediaRow]
    media.mapPartitions(_.map(decodeStub)).toDF()
  }

  val WindowBytes = 256
  val HopBytes = 128

  /** q76: audio-style OVERLAPPING windows over a PCM-like payload —
    * window `WindowBytes` wide every `HopBytes` (50% overlap), the
    * frame/hop decomposition every audio feature pipeline starts with.
    * Per-window features (length, crc32, xxhash64) stand in for the
    * stubbed codec. Map-side explode of a computed sequence: no
    * shuffle, scales with executors. */
  def q76(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).select(col("doc_id"), col("payload"))
    val n = length(col("payload"))
    val nWin = when(n < WindowBytes, lit(1))
      .otherwise(floor((n - WindowBytes).cast("double") / HopBytes).cast("int") + 1)
    m.withColumn("n_windows", nWin)
      .select(col("doc_id"), col("n_windows"), col("payload"),
        explode(sequence(lit(0), col("n_windows") - 1)).as("win_idx"))
      .select(col("doc_id"), col("win_idx"), col("n_windows"),
        (col("win_idx") * HopBytes).as("start_byte"),
        length(expr(s"substring(payload, win_idx * $HopBytes + 1, $WindowBytes)")).as("win_bytes"),
        crc32(expr(s"substring(payload, win_idx * $HopBytes + 1, $WindowBytes)")).as("win_crc"),
        xxhash64(expr(s"substring(payload, win_idx * $HopBytes + 1, $WindowBytes)")).as("win_hash"))
  }

  val FrameBytes = 64
  val FrameStride = 2

  /** q71: frame sampling + resize metadata over a video-like payload.
    * The payload is treated as a sequence of fixed-size encoded frames;
    * every `FrameStride`-th frame is sampled, hashed (a real pipeline
    * would decode it here), and tagged with resize-to-fit-256 dimensions
    * computed in exact integer arithmetic. Frame expansion is a map-side
    * explode of a computed `sequence` — rows never leave their partition,
    * so the stage scales with executors and no shuffle occurs at all. */
  def q71(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).select(
      col("doc_id"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"))
    // greatest(_, 1): an empty payload would otherwise yield
    // sequence(0, -1, 2) and throw "Illegal sequence boundaries".
    val nFrames = greatest(
      ceil(length(col("payload")).cast("double") / FrameBytes).cast("int"), lit(1))
    // Resize-to-fit 256 on the long edge, aspect preserved, integer math.
    val longEdge = greatest(col("width"), col("height"))
    val scaleNum = least(longEdge, lit(256)) // numerator of scale = min(long,256)/long
    val outW = (col("width").cast("long") * scaleNum / longEdge).cast("int")
    val outH = (col("height").cast("long") * scaleNum / longEdge).cast("int")
    m.withColumn("n_frames", nFrames)
      .withColumn("out_w", outW).withColumn("out_h", outH)
      .select(col("doc_id"), col("n_frames"), col("out_w"), col("out_h"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(FrameStride))).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"), col("out_w"), col("out_h"),
        length(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")).as("frame_bytes"),
        xxhash64(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")).as("frame_hash"))
  }
}

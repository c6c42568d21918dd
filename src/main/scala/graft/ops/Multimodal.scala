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
}

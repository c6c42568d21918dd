package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal binary-column plumbing: media payloads as opaque `binary`
  * with a typed metadata struct, and a batched decode/feature-extract
  * stage over mapPartitions.
  *
  * The IMAGE path (q70) is real: payloads are genuine PNG files
  * (generated deterministically per document) and the decode stage runs
  * the JDK's ImageIO codec — actual width/height/mean-pixel from decoded
  * rasters. The AUDIO decode path (q105) is real too: genuine WAV/PCM
  * files through javax.sound.sampled, with sample-accurate features off
  * the decoded stream. Only VIDEO decode remains an honest stub (no
  * video codec ships with the JDK or this container); q71/q76 exercise
  * the format-agnostic windowing/frame plumbing around it: payloads
  * stay columnar until the mapPartitions boundary, partitions bound the
  * decoder's working set, and every decode stage is map-only (no
  * shuffle) so it scales with executors.
  */
object Multimodal {

  /** Declared metadata dims, derived deterministically from the text —
    * the ONE definition shared by the media metadata struct and the PNG
    * generator (pngTable scales these 1/8). MD5-derived (big-endian hex
    * prefix of the digest, bytes 1-4 for width, 5-8 for height) rather
    * than xxhash64 so the DuckDB oracle can recompute the dims:
    * ('0x' || md5(text)[1:8])::UBIGINT — the q53 reproducibility move. */
  private def md5Hex32(c: Column, hexOff: Int): Column =
    conv(substring(md5(encode(c, "UTF-8")), hexOff, 8), 16, 10).cast("long")
  def metaWidth: Column = (pmod(md5Hex32(col("text"), 1), lit(1024L)) + 64L).cast("int")
  def metaHeight: Column = (pmod(md5Hex32(col("text"), 9), lit(768L)) + 64L).cast("int")

  /** Build the media table from documents: text bytes stand in for an
    * encoded audio/video payload (the formats the container has no codec
    * for); metadata is a typed struct derived per row. The IMAGE path
    * uses real PNGs — see pngTable/decodeImages. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        concat(lit("img/"), substring(col("source"), 4, 10)).as("format"),
        metaWidth.as("width"),
        metaHeight.as("height"))
        .as("meta"))

  case class ImageRow(doc_id: Long, payload: Array[Byte])
  case class ImageFeatures(doc_id: Long, format: String, n_bytes: Long,
                           width: Int, height: Int, mean_pixel_q: Long)

  /** Deterministic pixel pattern for the synthetic PNGs — also the
    * test oracle for the decoded mean. */
  def pixelAt(docId: Long, x: Int, y: Int): Int =
    ((x * 31L + y * 17L + docId * 13L) % 256L).toInt

  /** Expected PNG dims: the mediaTable metadata dims scaled 1/8 (floor,
    * min 8) so payloads stay a few KB. */
  def pngDims(metaW: Int, metaH: Int): (Int, Int) =
    (math.max(metaW / 8, 8), math.max(metaH / 8, 8))

  /** Synthetic-but-REAL PNG payloads, one per document: dims derive from
    * the same metadata mediaTable declares, pixels from a fixed per-doc
    * pattern, encoded through the JDK PNG writer in mapPartitions (the
    * codec batch boundary — encoder setup amortizes over the partition,
    * rows never leave it). */
  def pngTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"),
        metaWidth.as("w0"), metaHeight.as("h0"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w0, h0) =>
          val (w, h) = pngDims(w0, h0)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, pixelAt(id, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImageRow(id, bos.toByteArray)
        }
      }.toDF()
  }

  /** Real decode/feature-extract over a binary PNG/JPEG column: ImageIO
    * decodes each payload inside mapPartitions and features come off the
    * decoded raster — width/height as decoded (not trusted metadata) and
    * the exact integer mean pixel ×100. Map-only; the per-partition
    * iterator is the batch boundary the codec amortizes setup over. */
  def decodeImages(images: DataFrame, id: String, payload: String): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col(id).as("doc_id"), col(payload).as("payload")).as[ImageRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable payload for doc ${r.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          // Mean over ALL raster bands: for RGB inputs this is the
          // unweighted grayscale mean, not just channel 0; single-band
          // (gray) images are unchanged.
          val bands = raster.getNumBands
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          ImageFeatures(r.doc_id, "png", r.payload.length.toLong,
            w, h, sum * 100L / (w.toLong * h * bands))
        }
      }.toDF()
  }

  /** Full decode output INCLUDING the PNG-encoder byte length
    * (n_bytes) — golden-pinned in GoldenSpec: n_bytes is whatever the
    * JDK PNG encoder emits and has no SQL twin. */
  def q70Full(s: SparkSession, d: String): DataFrame =
    decodeImages(pngTable(s, d), "doc_id", "payload")

  /** q70: REAL image decode — generate the PNG corpus, then extract
    * features with the JDK codec. The driver-facing projection drops
    * only the encoder-dependent n_bytes column, so every remaining
    * column (decoded width/height, exact mean pixel) hash-verifies
    * against a DuckDB oracle that REPLAYS the generator formulas —
    * md5-hex dims and the (31x+17y+13·id) mod 256 raster — proving the
    * decode path recovers exactly what was encoded. n_bytes coverage
    * lives in the q70Full golden pin + the OperatorsSpec decode spec. */
  def q70(s: SparkSession, d: String): DataFrame =
    q70Full(s, d).drop("n_bytes")

  val SampleRate = 8000f

  /** Deterministic 16-bit PCM pattern — also the test oracle for the
    * decoded features. */
  def sampleAt(docId: Long, i: Int): Short =
    (((i * 127L + docId * 31L) % 65536L) - 32768L).toShort
  /** Per-doc sample count: 800–2399 samples (0.1–0.3 s at 8 kHz). */
  def wavSamples(docId: Long): Int =
    800 + java.lang.Math.floorMod(docId * 2654435761L, 1600L).toInt

  case class WavRow(doc_id: Long, payload: Array[Byte])
  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           peak: Int, rms_q: Long)

  /** Synthetic-but-REAL WAV payloads (16-bit signed little-endian mono
    * PCM at 8 kHz), one per document, encoded through the JDK's
    * javax.sound WAV writer in mapPartitions — the same
    * codec-batch-boundary shape as pngTable. */
  def wavTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = wavSamples(id)
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = sampleAt(id, i)
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavRow(id, bos.toByteArray)
        }
      }.toDF()
  }

  /** Real decode/feature-extract over a binary WAV column: the JDK
    * sound API parses the container and format, and the features come
    * off the DECODED sample stream — frame count and sample rate as
    * decoded (not trusted metadata), peak |amplitude|, and the
    * quantized RMS (floor(rms·100); sum of squares in exact long
    * arithmetic, and IEEE sqrt is correctly rounded, so the value is
    * bit-deterministic). Map-only mapPartitions, same shape as
    * decodeImages. */
  def decodeAudio(wavs: DataFrame, id: String, payload: String): DataFrame = {
    import wavs.sparkSession.implicits._
    wavs.select(col(id).as("doc_id"), col(payload).as("payload")).as[WavRow]
      .mapPartitions { it =>
        it.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          // getAudioInputStream also parses AIFF/AU (big-endian) — the
          // hand-rolled little-endian reconstruction below would
          // byte-swap those silently, so reject anything but LE PCM.
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unsupported audio format for doc ${r.doc_id}: $fmt " +
              "(need 16-bit signed little-endian mono PCM)")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            val v = (hi << 8) | lo
            sumSq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, n.toLong, peak,
            math.floor(math.sqrt(sumSq.toDouble / n) * 100).toLong)
        }
      }.toDF()
  }

  /** q105: REAL audio decode — generate the WAV corpus, then extract
    * sample-accurate features with the JDK sound API. */
  def q105(s: SparkSession, d: String): DataFrame =
    decodeAudio(wavTable(s, d), "doc_id", "payload")

  // ---- energy-threshold VAD / silence segmentation (q396) ----

  /** VAD window: 160 samples = 20 ms at 8 kHz, the standard frame. */
  val VadWindow = 160

  /** The GATED twin of [[sampleAt]]: every window where
    * (window + doc_id) % 4 == 0 is silenced to low-amplitude dither
    * ((v % 257) − 128 — % truncates toward zero in Scala, Java and
    * DuckDB alike), the rest keep the full-scale pattern. The phase
    * depends on doc_id, so docs start silent or active both ways and
    * the segmenter's boundary handling is exercised corpus-wide. */
  def gatedSampleAt(docId: Long, i: Int): Short = {
    val v = sampleAt(docId, i).toInt
    if ((i / VadWindow + docId) % 4L == 0L) ((v % 257) - 128).toShort
    else v.toShort
  }

  /** The gated WAV corpus — the wavTable writer with gated samples. */
  def wavGatedTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = wavSamples(id)
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = gatedSampleAt(id, i)
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavRow(id, bos.toByteArray)
        }
      }.toDF()
  }

  case class VadRow(doc_id: Long, n_windows: Long, n_silent: Long,
                    n_segments: Long, active_bp: Long,
                    longest_silence: Long)

  /** ENERGY-THRESHOLD VAD / SILENCE SEGMENTATION (round 15) — the
    * audio-curation primitive between decode (q105) and any speech
    * dataset: trim leading/trailing silence, split long recordings at
    * pauses, and price how much of a feed is dead air before paying
    * to transcribe it. Per decoded 16-bit PCM stream: fixed 20 ms
    * windows, a window is SILENT when its mean-square amplitude
    * ⌊Σv²/n_w⌋ falls under the threshold (mean-square, not RMS — no
    * sqrt anywhere, so the verdict is exact integer arithmetic both
    * engines replay bit-for-bit), and the per-doc report carries
    * window/silence counts, the number of ACTIVE segments (runs), the
    * active share in bp, and the longest silence run — the columns a
    * segmentation job plans splits from.
    *
    * Decode discipline: the q105 boundary verbatim (JDK javax.sound,
    * LE-mono-PCM require, one pass, O(window) state). Map-only, no
    * shuffle; rows per doc = 1. */
  def vadSegments(wavs: DataFrame, id: String, payload: String,
                  windowSamples: Int = VadWindow,
                  msqThreshold: Long = 1000000L): DataFrame = {
    import wavs.sparkSession.implicits._
    wavs.select(col(id).as("doc_id"), col(payload).as("payload")).as[WavRow]
      .mapPartitions { it =>
        it.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unsupported audio format for doc ${r.doc_id}: $fmt " +
              "(need 16-bit signed little-endian mono PCM)")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var w = 0
          var nWin = 0L; var nSil = 0L; var nSeg = 0L
          var longest = 0L; var run = 0L
          var prevSilent = true
          while (w * windowSamples < n) {
            val from = w * windowSamples
            val until = math.min(from + windowSamples, n)
            var sumSq = 0L
            var i = from
            while (i < until) {
              val v = ((bytes(2 * i + 1).toInt << 8) |
                (bytes(2 * i) & 0xff))
              sumSq += v.toLong * v
              i += 1
            }
            val silent = sumSq / (until - from) < msqThreshold
            nWin += 1
            if (silent) {
              nSil += 1; run += 1
              if (run > longest) longest = run
            } else {
              if (prevSilent) nSeg += 1
              run = 0
            }
            prevSilent = silent
            w += 1
          }
          VadRow(r.doc_id, nWin, nSil, nSeg,
            if (nWin == 0) 0L else 10000L * (nWin - nSil) / nWin, longest)
        }
      }.toDF()
  }

  /** q396: VAD over the gated WAV corpus — per recording, how much is
    * speech-band energy, in how many segments, with the longest pause. */
  def q396(s: SparkSession, d: String): DataFrame =
    vadSegments(wavGatedTable(s, d), "doc_id", "payload")

  // ---- clipping audit (q408) ----

  /** Near-full-scale threshold: |v| ≥ 32700 of the int16 range counts
    * as clipped (true digital clipping pins at ±32767/−32768; a small
    * guard band catches the limiter-squashed samples next to it —
    * the convention loudness tools call "near-clipping"). */
  val ClipThreshold = 32700

  case class ClipRow(doc_id: Long, n_samples: Long, n_clipped: Long,
                     clipped_bp: Long, n_runs: Long, max_run: Long)

  /** AUDIO CLIPPING AUDIT (round 16) — the ingest-quality gate next to
    * q105's decode stats and q396's VAD: clipped recordings are
    * irrecoverably distorted (the waveform's top is gone), and a
    * speech-data pipeline drops or de-prioritizes them BEFORE paying
    * for transcription. REAL decode (the q105 javax.sound boundary
    * verbatim — format validated, features off the decoded stream),
    * then per recording: clipped-sample count at the ±[[ClipThreshold]]
    * guard band, clipped share in bp, and the RUN structure (count of
    * maximal consecutive-clipped runs + the longest) — a few isolated
    * peaks are cosmetic, a long pinned run is a dead recording.
    *
    * Map-only mapPartitions at the JDK codec boundary, integer
    * verdicts both engines replay bit-for-bit (oracle: the PCM
    * generator replayed in SQL, gaps-and-islands for the runs). */
  def clippingAudit(wavs: DataFrame, id: String, payload: String,
                    threshold: Int = ClipThreshold): DataFrame = {
    import wavs.sparkSession.implicits._
    wavs.select(col(id).as("doc_id"), col(payload).as("payload")).as[WavRow]
      .mapPartitions { it =>
        it.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unsupported audio format for doc ${r.doc_id}: $fmt " +
              "(need 16-bit signed little-endian mono PCM)")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var nClip = 0L; var nRuns = 0L; var maxRun = 0L; var run = 0L
          var i = 0
          while (i < n) {
            val v = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
            if (math.abs(v) >= threshold) {
              nClip += 1; run += 1
              if (run == 1) nRuns += 1
              if (run > maxRun) maxRun = run
            } else run = 0
            i += 1
          }
          ClipRow(r.doc_id, n.toLong, nClip,
            if (n == 0) 0L else 10000L * nClip / n, nRuns, maxRun)
        }
      }.toDF()
  }

  /** q408: clipping audit over the raw (ungated) WAV corpus — the
    * full-scale sawtooth grazes the rails on every wrap, so counts and
    * run structure are nonzero and fully generator-determined. */
  def q408(s: SparkSession, d: String): DataFrame =
    clippingAudit(wavTable(s, d), "doc_id", "payload")

  // ---- spectral band energy (q417) ----

  /** Candidate periods in SAMPLES per cycle (powers of two): with the
    * sample-index lattice k = i mod P the projection needs one
    * quantized table row per (P, k) — 60 rows total. */
  val AudioBandPeriods: Seq[Int] = Seq(4, 8, 16, 32)

  /** Quantized projection basis shared VERBATIM with the q417 oracle
    * (the q342 periodogram convention: cos/sin at micro scale, floored
    * once on the driver — both engines consume identical integers). */
  val audioBandTable: Seq[(Int, Int, Long, Long)] =
    AudioBandPeriods.flatMap { p =>
      (0 until p).map { k =>
        val a = 2d * math.Pi * k / p
        (p, k, math.floor(math.cos(a) * 1e6 + 0.5).toLong,
          math.floor(math.sin(a) * 1e6 + 0.5).toLong)
      }
    }

  case class BandRow(doc_id: Long, period: Int, band_power: Long,
                     share_bp: java.lang.Long, is_peak: Int)

  /** SPECTRAL BAND ENERGY (round 16) — the first FREQUENCY-domain read
    * of the audio family (q105 amplitude stats, q396 VAD, q408
    * clipping are all time-domain): power at fixed sample-lattice
    * periods via the integer periodogram projection, the cheap
    * spectral-balance feature a speech-vs-music-vs-tone triage reads
    * before any model runs. Power at period P is the squared projection
    * onto the quantized cos/sin basis — sc = Σ xᵢ·cq(P, i mod P), ss
    * likewise, power = (sc²+ss²)/10¹² — EXACT integers end to end
    * (samples are ±2¹⁵, the basis is pinned micro, the one division a
    * floor; the q342 convention moved from the calendar-day grain to
    * the sample grain). Per (doc, period): band power, share of the
    * measured bands (bp), and the per-doc dominant-period flag
    * (power DESC, period ASC — a total order).
    *
    * Scale (100 TB): REAL decode then per-doc accumulation INSIDE
    * mapPartitions — samples never become rows, nothing shuffles;
    * |periods| rows out per recording. */
  def audioBands(wavs: DataFrame, id: String, payload: String,
                 periods: Seq[Int] = AudioBandPeriods): DataFrame = {
    import wavs.sparkSession.implicits._
    val basis = audioBandTable.filter(t => periods.contains(t._1))
      .groupBy(_._1).map { case (p, rows) =>
        val o = rows.sortBy(_._2)
        (p, o.map(_._3).toArray, o.map(_._4).toArray)
      }.toSeq.sortBy(_._1)
    wavs.select(col(id).as("doc_id"), col(payload).as("payload")).as[WavRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val powers = basis.map { case (p, cq, sq) =>
            var sc = 0L; var ss = 0L; var i = 0
            while (i < n) {
              val v = ((bytes(2 * i + 1).toInt << 8) |
                (bytes(2 * i) & 0xff)).toLong
              val k = i % p
              sc += v * cq(k); ss += v * sq(k)
              i += 1
            }
            val pw = (BigInt(sc) * sc + BigInt(ss) * ss) /
              BigInt(1000000000000L)
            (p, pw.toLong)
          }
          val tot = powers.map(_._2).sum
          val peak = powers.maxBy { case (p, pw) => (pw, -p.toLong) }._1
          powers.map { case (p, pw) =>
            BandRow(r.doc_id, p, pw,
              if (tot == 0) null
              else java.lang.Long.valueOf(
                (BigInt(10000) * pw / tot).toLong), // 10⁴·pw outruns Long
              if (p == peak) 1 else 0)
          }
        }
      }.toDF()
  }

  /** q417: spectral balance of the raw WAV corpus at the four
    * power-of-two periods — the sawtooth's wrap period dominates. */
  def q417(s: SparkSession, d: String): DataFrame =
    audioBands(wavTable(s, d), "doc_id", "payload")

  // ---- PNG container integrity (q419) ----

  case class PngAudit(doc_id: Long, width: Long, height: Long,
                      bit_depth: Int, color_type: Int, n_chunks: Long,
                      sig_ok: Int, crc_ok: Int, structure_ok: Int,
                      idat_bytes: Long)

  /** Byte-level PNG container walk — NO codec: signature check, chunk
    * traversal ([len][type][data][crc]), per-chunk CRC32 verification
    * (java.util.zip.CRC32, the spec's polynomial), IHDR field
    * extraction, IHDR-first/IEND-last/exact-consumption structure
    * flags. Returns what it could read even from a damaged file —
    * the flags say how far to trust it. */
  def pngAuditBytes(id: Long, b: Array[Byte]): PngAudit = {
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val sigOk = b.length >= 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
    var o = 8; var n = 0L; var crcOk = true
    var first = ""; var last = ""
    var w = 0L; var h = 0L; var bd = 0; var ct = -1; var idat = 0L
    var wellFormed = sigOk
    while (wellFormed && o + 12 <= b.length) {
      val len = u32(o)
      if (o + 12 + len > b.length) wellFormed = false
      else {
        val typ = new String(b, o + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, o + 4, 4 + len.toInt)
        if ((crc.getValue & 0xffffffffL) != u32(o + 8 + len.toInt))
          crcOk = false
        if (n == 0) first = typ
        last = typ; n += 1
        if (typ == "IHDR" && len >= 13) {
          w = u32(o + 8); h = u32(o + 12)
          bd = b(o + 16) & 0xff; ct = b(o + 17) & 0xff
        }
        if (typ == "IDAT") idat += len
        o += 12 + len.toInt
      }
    }
    val structOk = sigOk && wellFormed && first == "IHDR" &&
      last == "IEND" && o == b.length
    PngAudit(id, w, h, bd, ct, n, if (sigOk) 1 else 0,
      if (crcOk && sigOk) 1 else 0, if (structOk) 1 else 0, idat)
  }

  /** PNG CONTAINER INTEGRITY AUDIT (round 16) — the ingest gate BEFORE
    * any decoder runs: a crawl's image column carries truncated
    * downloads, bit-rotted blobs, and mislabeled formats, and feeding
    * them to a fleet of decoders means paying decode cost (or a codec
    * CVE surface) to discover corruption. This is the codec-FREE
    * check: signature, chunk-structure walk, per-chunk CRC32, IHDR
    * sanity — the file's OWN checksums verified at byte level, no
    * ImageIO anywhere (q70 is the decode path; this is the cheap gate
    * in front of it). Encoder-dependent counts (n_chunks, idat_bytes)
    * live in the Full variant + specs; the oracle projection carries
    * the generator-determined columns (dims from the shared metadata
    * formulas, grayscale-8 IHDR constants, all-green flags — the
    * corpus is healthy BY CONSTRUCTION, and the spec proves the
    * detectors fire by corrupting bytes).
    *
    * Scale (100 TB): map-only mapPartitions over the binary column —
    * one pass, no decode, no shuffle. */
  def pngIntegrityFull(images: DataFrame, id: String,
                       payload: String): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col(id).as("doc_id"), col(payload).as("payload"))
      .as[ImageRow]
      .mapPartitions(it => it.map(r => pngAuditBytes(r.doc_id, r.payload)))
      .toDF()
  }

  /** q419: the integrity audit over the PNG corpus, projected to the
    * generator-determined columns (the q70 n_bytes discipline). */
  def q419(s: SparkSession, d: String): DataFrame =
    pngIntegrityFull(pngTable(s, d), "doc_id", "payload")
      .drop("n_chunks", "idat_bytes")

  // ---- perceptual image hashing + near-dup (q124) ----

  /** splitmix64 finalizer — the per-(doc, cell) pseudo-random base for
    * the structured test images. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val AHashGrid = 8     // aHash cell grid (8×8 = 64 bits)
  val SynthSize = 32    // structured test images are 32×32 gray

  /** Pixel of the structured test image: each 4×4 cell gets a
    * pseudo-random base in [0, 250] from (id, cell) — ids produce
    * STRUCTURALLY different images (cross-id aHash distance ~32 bits),
    * unlike the smooth q70 pattern where any two ids differ by a
    * uniform brightness shift. Headroom above 250 lets a +4 brightness
    * perturbation stay clip-free (an exact uniform shift, which aHash
    * is invariant to by construction). */
  def structuredPixelAt(docId: Long, x: Int, y: Int): Int = {
    val cell = (y / 4) * AHashGrid + (x / 4)
    (java.lang.Math.floorMod(mix64(docId * 64 + cell), 251L)).toInt
  }

  case class SyntheticImage(doc_id: Long, payload: Array[Byte])

  /** Structured PNG corpus for perceptual dedup: one image per doc,
    * plus (when `perturb`) a near-duplicate copy at id + CopyOffset —
    * +4 brightness everywhere and 3 id-derived pixels overwritten, so
    * the copy's PNG BYTES differ (exact dedup misses it) while its
    * aHash stays within a few bits. */
  val CopyOffset = 10000000L

  /** The structured raster both codec tables encode: the id-derived
    * 4×4-blocked grayscale grid, optionally brightened and
    * noise-pixel-perturbed (the near-duplicate construction). */
  private def structuredRaster(baseId: Long, bright: Int,
                               noisePx: Int): java.awt.image.BufferedImage = {
    val n = SynthSize
    val img = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        raster.setSample(x, y, 0, structuredPixelAt(baseId, x, y) + bright)
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < noisePx) {
      val h = mix64(baseId * 3 + i)
      val px = java.lang.Math.floorMod(h, (n * n).toLong).toInt
      raster.setSample(px % n, px / n, 0,
        java.lang.Math.floorMod(h >>> 32, 251L).toInt)
      i += 1
    }
    img
  }

  /** Lossy JPEG encode at an explicit quality through the JDK writer
    * (ImageIO.write's format="jpg" path with the default quality would
    * not pin the compression level). */
  private def jpegBytes(img: java.awt.image.BufferedImage,
                        quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    bos.toByteArray
  }

  def structuredPngTable(s: SparkSession, d: String,
                         perturb: Boolean): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        def encode(baseId: Long, bright: Int, noisePx: Int, outId: Long) = {
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(
            structuredRaster(baseId, bright, noisePx), "png", bos)
          SyntheticImage(outId, bos.toByteArray)
        }
        it.flatMap { id =>
          val orig = encode(id, 0, 0, id)
          if (perturb) Seq(orig, encode(id, 4, 3, id + CopyOffset))
          else Seq(orig)
        }
      }.toDF()
  }

  /** JPEG twin of [[structuredPngTable]] (round 14; VERDICT r13 item
    * 6): the SAME structured raster content pushed through the JDK's
    * LOSSY JPEG encoder at `quality` — the dominant real-crawl image
    * format. Block-DCT quantization perturbs every pixel a little, so
    * this corpus asks the actual production question: does perceptual
    * dedup survive the codec (exact byte dedup obviously cannot)?
    * With `crossCodec`, originals stay PNG while the planted copies
    * encode as JPEG — the "same image crawled twice in two formats"
    * case, the hardest realistic shape for hash-based image dedup.
    * Recall on both corpora is spec-pinned (q124/q239's PNG entries
    * stay the oracle contract, unchanged). */
  def structuredJpegTable(s: SparkSession, d: String, perturb: Boolean,
                          quality: Float = 0.8f,
                          crossCodec: Boolean = false): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        def encode(baseId: Long, bright: Int, noisePx: Int, outId: Long,
                   asPng: Boolean) = {
          val img = structuredRaster(baseId, bright, noisePx)
          val bytes = if (asPng) {
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          } else jpegBytes(img, quality)
          SyntheticImage(outId, bytes)
        }
        it.flatMap { id =>
          val orig = encode(id, 0, 0, id, asPng = crossCodec)
          if (perturb)
            Seq(orig, encode(id, 4, 3, id + CopyOffset, asPng = false))
          else Seq(orig)
        }
      }.toDF()
  }

  case class HashedImage(doc_id: Long, ahash: Long)

  /** True iff the division-free aHash compare (cellSum·px vs
    * total·cellPx) fits signed 64-bit arithmetic for EVERY cell — the
    * largest factors bound all 64 products. Pure so the gigapixel
    * refusal is spec-testable without allocating a gigapixel raster. */
  private[graft] def aHashCompareSafe(maxCellSum: Long, maxCellPx: Long,
                                      total: Long, px: Long): Boolean =
    (maxCellSum == 0L || px <= Long.MaxValue / maxCellSum) &&
      (total == 0L || maxCellPx <= Long.MaxValue / total)

  /** Perceptual average-hash (aHash) over a binary image column: decode
    * with ImageIO, split the raster into an 8×8 cell grid, set bit c
    * when cell c's mean ≥ the global mean. All-integer comparison
    * (cellSum·W·H ≥ totalSum·cellPx — no division), so the hash is
    * bit-deterministic. Map-only mapPartitions, the same codec batch
    * boundary as decodeImages; robust to brightness shifts and small
    * local edits — the image near-dup key exact byte hashing can't be. */
  def aHashImages(images: DataFrame, id: String, payload: String): DataFrame = {
    import images.sparkSession.implicits._
    val g = AHashGrid
    images.select(col(id).as("doc_id"), col(payload).as("payload")).as[ImageRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable payload for doc ${r.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= g && h >= g, s"image smaller than the $g×$g hash grid")
          val raster = img.getRaster
          val bands = raster.getNumBands
          val cellSum = new Array[Long](g * g)
          val cellPx = new Array[Long](g * g)
          var total = 0L
          var y = 0
          while (y < h) {
            val cy = y * g / h
            var x = 0
            while (x < w) {
              val cx = x * g / w
              var v = 0L
              var b = 0
              while (b < bands) { v += raster.getSample(x, y, b); b += 1 }
              cellSum(cy * g + cx) += v
              cellPx(cy * g + cx) += 1
              total += v
              x += 1
            }
            y += 1
          }
          val px = w.toLong * h
          // The division-free compare below multiplies cellSum·px and
          // total·cellPx in 64 bits; around the gigapixel mark those
          // products WRAP and flip hash bits silently. Guard with the
          // exact per-image bound (computed from the actual maxima, not
          // a worst-case estimate) and fail loudly — no real corpus
          // image approaches it; a payload that does is corrupt or
          // adversarial and should surface, not hash.
          require(aHashCompareSafe(cellSum.max, cellPx.max, total, px),
            s"image ${w}x$h (${px}px) overflows the aHash integer " +
              s"compare for doc ${r.doc_id}")
          var hash = 0L
          var c = 0
          while (c < g * g) {
            // cell mean >= global mean, cleared of divisions
            if (cellSum(c) * px >= total * cellPx(c)) hash |= (1L << c)
            c += 1
          }
          HashedImage(r.doc_id, hash)
        }
      }.toDF()
  }

  /** q124: perceptual image dedup — aHash the structured PNG corpus
    * (originals + perturbed copies) and emit Hamming-≤3 near-dup pairs
    * through the pigeonhole-blocked join. Exact byte dedup finds NONE
    * of these pairs (every payload differs); aHash finds every planted
    * copy. */
  def q124(s: SparkSession, d: String): DataFrame =
    Dedup.hammingPairs64(
      aHashImages(structuredPngTable(s, d, perturb = true), "doc_id", "payload"),
      "doc_id", "ahash", maxHamming = 3)

  case class DHashImage(doc_id: Long, dhash: Long)

  /** Perceptual DIFFERENCE-hash (dHash) — horizontal gradient signs
    * over the same 8×8 cell grid as aHash: bit (r, c) is set when cell
    * (r, c)'s mean exceeds its right neighbor's — 56 bits (8 rows × 7
    * adjacent-column compares). dHash is brightness-invariant by
    * CONSTRUCTION (a uniform shift adds equally to both sides of every
    * compare — aHash's global-mean threshold is merely robust to it)
    * and catches what aHash can't: two images whose cells straddle the
    * global mean identically but whose internal gradients differ. The
    * production pattern is both keys side by side — candidate pairs
    * from either, confirmation from both. Division-free cross-multiply
    * compare (cellSum·neighborPx vs neighborSum·cellPx) keeps the hash
    * bit-deterministic; map-only, same codec batch boundary. */
  def dHashImages(images: DataFrame, id: String, payload: String): DataFrame = {
    import images.sparkSession.implicits._
    val g = AHashGrid
    images.select(col(id).as("doc_id"), col(payload).as("payload")).as[ImageRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable payload for doc ${r.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= g && h >= g, s"image smaller than the $g×$g hash grid")
          val raster = img.getRaster
          val bands = raster.getNumBands
          val cellSum = new Array[Long](g * g)
          val cellPx = new Array[Long](g * g)
          var y = 0
          while (y < h) {
            val cy = y * g / h
            var x = 0
            while (x < w) {
              val cx = x * g / w
              var v = 0L
              var b = 0
              while (b < bands) { v += raster.getSample(x, y, b); b += 1 }
              cellSum(cy * g + cx) += v
              cellPx(cy * g + cx) += 1
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var row = 0
          while (row < g) {
            var c = 0
            while (c < g - 1) {
              val l = row * g + c
              // strict >: equal-mean neighbors clear the bit in any
              // engine (cross-multiplied, so no division and the
              // uneven-cell-size case stays exact)
              if (cellSum(l) * cellPx(l + 1) > cellSum(l + 1) * cellPx(l))
                hash |= (1L << (row * (g - 1) + c))
              c += 1
            }
            row += 1
          }
          DHashImage(r.doc_id, hash)
        }
      }.toDF()
  }

  /** q239: gradient-sign (dHash) near-dup pairs over the same
    * perturbed PNG corpus q124 audits with aHash. */
  def q239(s: SparkSession, d: String): DataFrame =
    Dedup.hammingPairs64(
      dHashImages(structuredPngTable(s, d, perturb = true), "doc_id", "payload"),
      "doc_id", "dhash", maxHamming = 3)

  // ---- REAL multi-frame (video-like) decode: animated GIF (q143) ----

  /** Frame count per doc: 4–11 frames. */
  def gifFrames(docId: Long): Int =
    4 + java.lang.Math.floorMod(mix64(docId * 7 + 3), 8L).toInt
  val GifSize = 16      // 16×16 gray frames keep payloads a few KB
  val FrameSampleStride = 2

  /** Pixel of frame `f` of doc `docId` — the per-frame variation makes
    * frame order observable in the decoded stats (also the test
    * oracle). */
  def gifPixelAt(docId: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(mix64(docId * 1024 + f * 256 + y * 16 + x), 256L).toInt

  case class GifRow(doc_id: Long, n_frames: Int, payload: Array[Byte])
  case class FrameFeatures(doc_id: Long, frame_idx: Int, n_frames: Int,
                           width: Int, height: Int, mean_pixel_q: Long)

  /** Synthetic-but-REAL animated GIFs, one per document: a genuine
    * multi-frame container written through the JDK's ImageIO sequence
    * API in mapPartitions (writer setup amortizes over the partition —
    * the codec batch boundary, same shape as pngTable/wavTable). */
  def gifTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        // ONE writer per partition (the amortization the mapPartitions
        // boundary exists for) — only the output stream rebinds per row.
        val writer = javax.imageio.ImageIO
          .getImageWritersBySuffix("gif").next()
        it.map { id =>
          val n = gifFrames(id)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < n) {
            val img = new java.awt.image.BufferedImage(
              GifSize, GifSize, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < GifSize) {
              var x = 0
              while (x < GifSize) {
                raster.setSample(x, y, 0, gifPixelAt(id, f, x, y)); x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          GifRow(id, n, bos.toByteArray)
        }
      }.toDF()
  }

  /** REAL frame sampling over a multi-frame binary column: ImageIO's
    * GIF reader parses the container, every `stride`-th frame decodes,
    * and features come off the decoded rasters — frame count as decoded
    * (not trusted metadata), per-frame exact integer mean ×100.
    * Map-only mapPartitions; one reader per row, frames never leave
    * the partition. The frame explode happens INSIDE the decode
    * boundary, so un-sampled frames are skipped by the reader rather
    * than decoded and discarded. */
  /** The ONE GIF decode boundary (reader lifecycle lives here only):
    * one reader per partition, only the input stream rebinds per row;
    * `perDoc` receives (docId, frameCount, readFrame) and emits the
    * operator's rows. decodeFrames and sceneChanges both build on it —
    * a codec fix (dispose, seekForwardOnly, …) lands once. */
  private def mapGifPartitions[T: org.apache.spark.sql.Encoder](
      gifs: DataFrame, id: String, payload: String)(
      perDoc: (Long, Int, Int => java.awt.image.BufferedImage) => Seq[T])
      : Dataset[T] = {
    import gifs.sparkSession.implicits._
    gifs.select(col(id).as("doc_id"), col(payload).as("payload")).as[ImageRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersBySuffix("gif").next()
        it.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val out = perDoc(r.doc_id, n, f => reader.read(f))
          iis.close()
          out
        }
      }
  }

  def decodeFrames(gifs: DataFrame, id: String, payload: String,
                   stride: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[FrameFeatures] =
      Encoders.product[FrameFeatures]
    mapGifPartitions[FrameFeatures](gifs, id, payload) { (docId, n, read) =>
      (0 until n by stride).map { f =>
        val img = read(f)
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        FrameFeatures(docId, f, n, w, h, sum * 100L / (w.toLong * h))
      }
    }.toDF()
  }

  /** q143: REAL video-style frame decode — generate the animated-GIF
    * corpus, then sample every 2nd frame through the JDK GIF reader. */
  def q143(s: SparkSession, d: String): DataFrame =
    decodeFrames(gifTable(s, d), "doc_id", "payload", FrameSampleStride)

  case class SceneFeatures(doc_id: Long, frame_idx: Int, n_frames: Int,
                           diff_q: Long, scene_change: Long)

  /** SCENE-CHANGE detection over a multi-frame binary column: decode
    * consecutive frames, score each transition by the EXACT integer
    * mean absolute pixel difference (×100), flag transitions above the
    * threshold — the shot-boundary primitive a video-curation pipeline
    * runs before sampling keyframes (sample once per scene, not once
    * per frame, or the dataset is 95% duplicates of static shots).
    *
    * Decode discipline (the q143 boundary): one reader per partition,
    * frames decode ONCE in order with only the previous raster
    * retained — O(2 frames) memory however long the clip; map-only, no
    * shuffle, transitions never leave their partition. */
  def sceneChanges(gifs: DataFrame, id: String, payload: String,
                   thresholdQ: Long): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[SceneFeatures] =
      Encoders.product[SceneFeatures]
    mapGifPartitions[SceneFeatures](gifs, id, payload) { (docId, n, read) =>
      var prev: java.awt.image.Raster = null
      (0 until n).flatMap { f =>
        val img = read(f)
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        // diff only same-size full frames: an optimized real-world GIF
        // stores delta frames as smaller changed rects (diffing those
        // raw would read out of bounds or misalign) — a production
        // video path composites deltas before scoring; here a size
        // change just starts a new comparison chain
        val row = if (f == 0 || prev == null ||
            prev.getWidth != w || prev.getHeight != h) None
          else {
            var sad = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                sad += math.abs(raster.getSample(x, y, 0) -
                  prev.getSample(x, y, 0))
                x += 1
              }
              y += 1
            }
            val diffQ = sad * 100L / (w.toLong * h)
            Some(SceneFeatures(docId, f, n, diffQ,
              if (diffQ > thresholdQ) 1L else 0L))
          }
        prev = raster
        row
      }
    }.toDF()
  }

  /** q167: scene-change scan of the animated-GIF corpus at a mean-abs
    * diff threshold of 80 gray levels. */
  def q167(s: SparkSession, d: String): DataFrame =
    sceneChanges(gifTable(s, d), "doc_id", "payload", 8000L)

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
        // md5 (not crc32/xxhash64): the window fingerprint DuckDB can
        // recompute — md5(substring(text, ...)) matches byte-for-byte
        // on the ASCII corpus.
        md5(expr(s"substring(payload, win_idx * $HopBytes + 1, $WindowBytes)")).as("win_md5"))
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
        // md5 for DuckDB reproducibility (see q76's win_md5)
        md5(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")).as("frame_hash"))
  }
}

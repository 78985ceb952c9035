package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata. The image path uses a REAL pure-JVM PNG codec
  * ([[Multimodal.decodePng]], javax.imageio) over deterministic
  * synthetic images; the Spark-side plumbing — binary columns, schema,
  * batched partition-level processing — is oracle-checked end to end.
  */
object MultimodalQueries {

  /** Binary ingestion + metadata extraction: text→utf8 bytes standing in
    * for a media blob; byte length, content digest, magic-header hex,
    * and a fake "feature" decoded from the header — all computable by
    * the oracle, proving the binary plumbing (encode/substr/hex/digest)
    * is byte-exact.
    */
  val binaryMeta = Q(
    "mm_binary_meta",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS digest,
      |  lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
      |  ('0x' || lower(hex(encode(substr(text, 1, 4)))))::BIGINT AS fake_feature
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val bin = expr("encode(text, 'utf-8')")
    // Oracle slices the VARCHAR then encodes (DuckDB can't substr a
    // BLOB) — byte-identical because the corpus is ASCII.
    t(s, dir, "documents")
      .select(col("doc_id"),
        length(bin).cast(LongType).as("n_bytes"),
        sha2(bin, 256).as("digest"),
        lower(hex(substring(bin, 1, 4))).as("header_hex"),
        conv(hex(substring(bin, 1, 4)), 16, 10).cast(LongType)
          .as("fake_feature"))
      .orderBy("doc_id")
  }

  /** Batched partition-level decode with a REAL codec — the Scala
    * analog of a pandas-UDF `mapInPandas` stage: an image column (PNG
    * bytes, synthesized per doc since the corpus ships no media) flows
    * through `mapPartitions`, and [[Multimodal.decodePng]] — an actual
    * `javax.imageio` PNG parse, not a stub — extracts width, height and
    * the pixel checksum per row inside the partition iterator. The
    * synthetic images have closed-form pixels (gray(i) = (doc_id·31+i)
    * mod 256 over a doc_id-derived w×h), so the oracle re-derives the
    * DECODED features relationally and the whole encode→decode round
    * trip gets a full hash gate: a codec that mis-parses dimensions,
    * strides or sample values fails the gate.
    */
  val decodeBatch = Q(
    "mm_decode_batch",
    """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
      |    8 + (doc_id * 7) % 9 AS h FROM documents),
      |p AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM d)
      |SELECT doc_id, CAST(max(w) AS INT) AS width,
      |  CAST(max(h) AS INT) AS height,
      |  CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS pix_sum
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    // Ingestion stand-in: one PNG blob per doc (in production this
    // column arrives from the media store; only this line changes).
    val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, Multimodal.syntheticPng(id)))
      .toDF("doc_id", "img")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("pix_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    blobs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, sum) = Multimodal.decodePng(r.getAs[Array[Byte]](1))
        Row(id, w, h, sum)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Frame sampling — the video-pipeline shape: the blob splits into
    * fixed 16-byte "frames", every 4th frame is sampled (stride
    * sampling, the cheap first pass before any real decode), and each
    * sampled frame emits its digest + a stub feature. One explode per
    * doc, frame math is pure projection; a real codec replaces the
    *16-byte fake framing, nothing else. Spark's INCLUSIVE
    * sequence(0, nf−1, 4) and DuckDB's EXCLUSIVE range(0, nf, 4)
    * generate the same index set for nf ≥ 1.
    */
  val frameSample = Q(
    "mm_frame_sample",
    """WITH f AS (SELECT doc_id, text,
      |    CAST(floor(length(text)/16) AS BIGINT) AS nf FROM documents),
      |g AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS idx
      |  FROM f WHERE nf >= 1),
      |fr AS (SELECT doc_id, idx,
      |    substr(text, CAST(idx*16+1 AS INT), 16) AS frame FROM g)
      |SELECT doc_id, idx, md5(frame) AS frame_md5,
      |  CAST(list_sum(list_transform(string_split(frame, ''),
      |    c -> ascii(c))) AS BIGINT) AS frame_sum
      |FROM fr ORDER BY doc_id, idx""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / 16).cast(LongType).as("nf"))
      .where(col("nf") >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, nf - 1, 4L)")).as("idx"))
      .select(col("doc_id"), col("idx"),
        expr("substring(text, cast(idx*16+1 as int), 16)").as("frame"))
      .select(col("doc_id"), col("idx"), md5(col("frame")).as("frame_md5"),
        expr("aggregate(transform(split(frame, ''), c -> ascii(c)), 0L, (a, c) -> a + c)")
          .as("frame_sum"))
      .orderBy("doc_id", "idx")
  }

  /** Resize — the remaining step of the brief's decode / feature-extract /
    * resize / frame-sample quartet: decode the PNG, nearest-neighbor
    * downsample to a fixed 8×8 thumbnail inside the same batched
    * partition seam, and emit the thumbnail's checksum + digest. The
    * resize is a REAL resample of REAL decoded rasters; because both
    * the source pixels and the NN source-index map (sx = ⌊tx·w/8⌋,
    * sy = ⌊ty·h/8⌋) are closed-form, the oracle re-derives every
    * thumbnail pixel relationally — a codec or stride bug anywhere in
    * decode→resize fails the hash.
    */
  val resize = Q(
    "mm_resize",
    """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
      |    8 + (doc_id * 7) % 9 AS h FROM documents),
      |g AS (SELECT doc_id, w, h, unnest(range(0, 64)) AS ti FROM d),
      |px AS (SELECT doc_id, w, h, ti,
      |    (doc_id * 31 + ((ti // 8) * h // 8) * w + ((ti % 8) * w // 8)) % 256
      |      AS gray
      |  FROM g)
      |SELECT doc_id, CAST(max(w) AS INT) AS width,
      |  CAST(max(h) AS INT) AS height,
      |  CAST(sum(gray) AS BIGINT) AS thumb_sum,
      |  md5(string_agg(CAST(gray AS VARCHAR), '_' ORDER BY ti)) AS thumb_md5
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, Multimodal.syntheticPng(id)))
      .toDF("doc_id", "img")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("thumb_sum", LongType, nullable = false),
      StructField("thumb_md5", StringType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    blobs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, thumb) =
          Multimodal.resizeNN(r.getAs[Array[Byte]](1), 8, 8)
        val sum = thumb.map(_.toLong).sum
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(thumb.mkString("_").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        Row(id, w, h, sum, md)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Audio-blob stats via a REAL codec — the third modality gets the
    * same treatment as the PNG path: one WAV blob per doc (RIFF/PCM,
    * synthesized since the corpus ships no media), decoded inside the
    * batched partition seam by [[Multimodal.decodeWav]] — an actual
    * `javax.sound.sampled` parse that reads the sample rate and the
    * 16-bit frames from the container, not from the generator's
    * parameters. The synthetic waveform has closed-form samples
    * (sample(i) = (doc_id·31 + i·7) mod 65536 − 32768 over a
    * doc_id-derived count and rate), so the oracle re-derives the
    * DECODED stats relationally and the encode→decode round trip gets
    * a full hash gate: a codec that mis-parses the header, endianness
    * or sample width fails the gate.
    */
  val audioStats = Q(
    "mm_audio_stats",
    """WITH d AS (SELECT doc_id, 16 + doc_id % 241 AS ns,
      |    8000 + (doc_id % 5) * 4000 AS sr FROM documents),
      |p AS (SELECT doc_id, ns, sr, unnest(range(0, ns)) AS i FROM d),
      |s AS (SELECT doc_id, ns, sr,
      |    (doc_id * 31 + i * 7) % 65536 - 32768 AS smp FROM p)
      |SELECT doc_id, CAST(max(ns) AS BIGINT) AS n_samples,
      |  CAST(max(sr) AS BIGINT) AS sample_rate,
      |  CAST(max(abs(smp)) AS BIGINT) AS peak,
      |  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, Multimodal.syntheticWav(id)))
      .toDF("doc_id", "wav")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    blobs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val st = Multimodal.decodeWav(r.getAs[Array[Byte]](1))
        Row(id, st.nSamples, st.sampleRate, st.peak, st.sumAbs)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Format-agnostic decode through the SAME seam — a 100-TB multimodal
    * corpus is heterogeneous, so the batched partition decode must not
    * be PNG-shaped: even docs carry PNG, odd docs carry JPEG, and ONE
    * [[Multimodal.decodeImage]] call sniffs the container from the
    * bytes (ImageIO reader discovery — the code never sees the parity)
    * and decodes either. Gated per format at its strongest checkable
    * level: container format name, exact dimensions (lossless in both
    * containers), the exact pixel checksum for the lossless PNG, and a
    * decode-fidelity bool for the lossy JPEG (constant-gray rasters
    * must round-trip within a DC-quantization tolerance — a stride,
    * channel or level-shift bug blows far past it).
    */
  val decodeMultiformat = Q(
    "mm_decode_multiformat",
    """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
      |    8 + (doc_id * 7) % 9 AS h FROM documents),
      |p AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i
      |  FROM d WHERE doc_id % 2 = 0),
      |ps AS (SELECT doc_id,
      |    CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS pix_sum
      |  FROM p GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
      |  CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
      |  TRUE AS decode_ok,
      |  coalesce(ps.pix_sum, -1) AS pix_sum
      |FROM d LEFT JOIN ps ON d.doc_id = ps.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val blobs = t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map(id => (id, if (id % 2 == 0) Multimodal.syntheticPng(id)
        else Multimodal.syntheticJpeg(id)))
      .toDF("doc_id", "img")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("pix_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    blobs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (fmt, w, h, px) = Multimodal.decodeImage(r.getAs[Array[Byte]](1))
        val (ok, sum) =
          if (fmt == "png") (true, px.map(_.toLong).sum)
          else {
            // constant-gray JPEG must decode within DC-quantization
            // error of the generator's value; dims stay exact
            val g = ((id * 31) % 256).toInt
            (px.forall(p => math.abs(p - g) <= 8), -1L)
          }
        Row(id, fmt, w, h, ok, sum)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  val all: Seq[Q] = Seq(binaryMeta, decodeBatch, frameSample, resize,
    audioStats, decodeMultiformat)
}

/** The decode seam for multimodal blobs — a REAL pure-JVM image codec
  * (`javax.imageio` PNG). Executor-local, no native libs, no driver
  * round trip; a JNI-backed codec (libjpeg/ffmpeg) drops into the same
  * two functions without touching the dataflow.
  */
object Multimodal {

  // Once per executor JVM (object init): ImageIO's default read path
  // spools every stream through a temp FILE cache — a per-blob disk
  // round trip that costs 4x on decode and is exactly wrong on
  // executors. In-memory cache only.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic grayscale test image for doc `id`: dimensions
    * w = 8 + id mod 9, h = 8 + 7·id mod 9; pixel i (row-major) has
    * gray value (id·31 + i) mod 256 — a closed form the oracle can
    * recompute without any codec. Encoded as real PNG bytes.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 7) % 9).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, ((id * 31 + i) % 256).toInt)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG blob: (width, height, Σ gray samples). PNG is
    * lossless, so the checksum of the DECODED raster must equal the
    * closed form of the generator — the round-trip property the gate
    * checks end-to-end.
    */
  def decodePng(blob: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  /** Deterministic CONSTANT-gray test image for doc `id` — same
    * doc_id-derived dimensions as [[syntheticPng]], every pixel
    * gray = (id·31) mod 256 — encoded as real baseline JPEG bytes.
    * Constant rasters survive the lossy round trip to within DC
    * quantization error (each 8×8 block is DC-only), which is what the
    * multiformat gate's fidelity bool checks.
    */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 7) % 9).toInt
    val g = ((id * 31) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, g)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Decode ANY supported image container: the reader is discovered
    * from the BYTES (ImageIO stream sniffing), never from a caller
    * hint — the same seam handles PNG, JPEG, or any other registered
    * container, which is what makes the batched decode stage
    * format-agnostic. Returns (container format name, width, height,
    * row-major gray samples).
    */
  def decodeImage(blob: Array[Byte]): (String, Int, Int, Array[Int]) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no ImageIO reader recognizes this container")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val fmt = reader.getFormatName.toLowerCase
      val img = reader.read(0)
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Int](w * h)
      // Palette-indexed containers (GIF, indexed PNG/BMP) store the
      // PALETTE INDEX in the raster, not the sample value — ONLY they
      // resolve through the color model via getRGB (identity for an
      // achromatic palette, integer BT.601 luma otherwise). Every
      // non-indexed image reads raw raster samples: gray and
      // gray+alpha take band 0, color takes BT.601 over bands 0..2
      // (logical band order is R,G,B regardless of buffer layout).
      // getRGB on these would clamp to 8-bit sRGB and apply the
      // gray→sRGB transfer curve — corrupting 16-bit and linear-gray
      // inputs, which is exactly what the raster path preserves.
      val indexed =
        img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      val colorBands = if (raster.getNumBands >= 3) 3 else 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) =
            if (indexed) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              if (r == g && g == b) r else (r * 299 + g * 587 + b * 114 + 500) / 1000
            } else if (colorBands == 1) raster.getSample(x, y, 0)
            else {
              val r = raster.getSample(x, y, 0)
              val g = raster.getSample(x, y, 1)
              val b = raster.getSample(x, y, 2)
              if (r == g && g == b) r else (r * 299 + g * 587 + b * 114 + 500) / 1000
            }
          x += 1
        }
        y += 1
      }
      (fmt, w, h, px)
    } finally reader.dispose()
  }

  final case class WavStats(nSamples: Long, sampleRate: Long, peak: Long,
      sumAbs: Long)

  /** The `AudioSystem` entry points funnel EVERY call through
    * `JDK13Services.getProviders` — a JVM-global synchronized lookup
    * whose cache expires every 60 s, after which the holder re-scans
    * the full classpath (hundreds of jars here) under the lock. Per-row
    * calls therefore serialize all executor threads on one monitor
    * once row counts are large (observed live at the 1000× sweep: 31
    * of 32 task threads BLOCKED in `AudioSystem.getProviders`, one
    * thread walking jars — the job collapsed to single-file). A
    * 1000-executor cluster pays the same toll per 32-core executor.
    * Fix: resolve the SPI providers ONCE per JVM (ServiceLoader over
    * the platform's declared `javax.sound.sampled.spi` services — the
    * same set AudioSystem consults) and call them directly; the
    * container is still parsed/written by the real JDK codec.
    */
  private lazy val wavReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
    // Attempt order matters: the JDK's SoftMidiAudioFileReader sniffs
    // by calling MidiSystem.getSequence, which re-enters the SAME
    // synchronized per-call provider lookup this cache exists to
    // avoid. The plain container readers (WAVE/AIFF/AU) reject foreign
    // bytes from the header alone, so they go first and the
    // MIDI-soft-synth fallback only runs for blobs nothing else takes.
    val (midi, plain) =
      all.partition(_.getClass.getName.toLowerCase.contains("midi"))
    plain ++ midi
  }

  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException(
        "no WAVE AudioFileWriter provider on this JVM"))
  }

  /** Deterministic 16-bit PCM mono test waveform for doc `id`:
    * ns = 16 + id mod 241 samples at 8000 + 4000·(id mod 5) Hz, with
    * sample(i) = (id·31 + i·7) mod 65536 − 32768 — a closed form the
    * oracle can recompute without any codec. Encoded as a real WAV
    * (RIFF container) via `javax.sound.sampled.AudioSystem`.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val ns = (16 + id % 241).toInt
    val sr = (8000 + (id % 5) * 4000).toFloat
    val data = new Array[Byte](ns * 2)
    var i = 0
    while (i < ns) {
      val v = (((id * 31 + i.toLong * 7) % 65536) - 32768).toInt
      data(2 * i) = (v & 0xff).toByte // WAV PCM is little-endian
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1,
      true /* signed */, false /* little-endian */)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, ns.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV blob: parse the RIFF header via AudioSystem (sample
    * rate, channels, sample width, endianness all come from the
    * CONTAINER), stream the frames, and reduce the 16-bit samples to
    * (count, rate, peak amplitude, Σ|sample|). Handles either
    * endianness and any channel count (channel-interleaved samples all
    * count — mono fixtures are unaffected).
    */
  def decodeWav(blob: Array[Byte]): WavStats = {
    // same reader-attempt contract as AudioSystem.getAudioInputStream,
    // minus the per-call synchronized provider lookup (see wavReaders)
    val ais = wavReaders.iterator.flatMap { rd =>
      try Iterator.single(rd.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          Iterator.empty
      }
    }.nextOption().getOrElse(
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no installed AudioFileReader accepts this container"))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16,
      s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
    // the sign interpretation below assumes signed PCM; an unsigned (or
    // float/compressed) container must fail loudly like a wrong width,
    // not silently decode with an offset
    require(fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"expected PCM_SIGNED, got ${fmt.getEncoding}")
    val bytes = ais.readAllBytes()
    ais.close()
    val big = fmt.isBigEndian
    val n = bytes.length / 2
    var peak = 0L
    var sum = 0L
    var i = 0
    while (i < n) {
      val b0 = bytes(2 * i)
      val b1 = bytes(2 * i + 1)
      val v = if (big) (b0.toInt << 8) | (b1 & 0xff)
        else (b1.toInt << 8) | (b0 & 0xff)
      val a = math.abs(v.toLong)
      if (a > peak) peak = a
      sum += a
      i += 1
    }
    WavStats(n.toLong, fmt.getSampleRate.toLong, peak, sum)
  }

  /** Decode + nearest-neighbor resize to tw×th: target pixel (tx, ty)
    * samples source (⌊tx·w/tw⌋, ⌊ty·h/th⌋) — the explicit integer map,
    * not Graphics2D interpolation, so the resample is bit-deterministic
    * on every JVM. Returns (src width, src height, row-major gray
    * values of the thumbnail).
    */
  def resizeNN(blob: Array[Byte], tw: Int, th: Int): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(blob))
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        out(ty * tw + tx) = raster.getSample(tx * w / tw, ty * h / th, 0)
        tx += 1
      }
      ty += 1
    }
    (w, h, out)
  }
}

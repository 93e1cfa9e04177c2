package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-wise
  * batch transforms.
  *
  * Decode kernels come in three tiers:
  *   - REAL pure-JVM parsers hand-written against the file-format spec:
  *     WAV/PCM (RIFF chunks, 8/16-bit samples → sample-rate/duration/
  *     energy), BMP (24-bit BI_RGB, bottom-up rows + 4-byte row padding
  *     → dimensions/pixel sum) and PPM P6 (ASCII header + raw RGB).
  *     [[decodeMeta]] sniffs the magic bytes and runs these; m03
  *     oracle-checks an encode→decode round trip bit-for-bit against
  *     DuckDB-recomputed ground truth.
  *   - REAL JDK ImageIO codecs (java.desktop — zero external deps) for
  *     JPEG/PNG/GIF: full pixel decode, real bilinear resize
  *     ([[resizeImages]]), m04 oracle-checks dimensions for all three
  *     and the exact pixel sum for lossless PNG.
  *   - STUBS only for payloads whose codecs the JVM genuinely lacks
  *     (MP4/MP3 video+audio): deterministic byte-level fakes, clearly
  *     marked.
  * Either way the distributed shape is identical and real: one
  * iterator-to-iterator pass per partition, no driver involvement, no
  * shuffle — exactly what runs at 100 TB with JNI/FFM codecs plugged in.
  *
  * INVARIANT — keep every operator here NARROW (no repartition, join, or
  * aggregation inside [[synthesizeCodec]]/[[decodeMeta]]/[[resizeImages]]
  * and friends): the m03–m07 oracle queries sort BEFORE decoding (the
  * sort-first pattern, PERF.md r10) and rely on Spark preserving that
  * row order through these partition-wise transforms. Narrow-map order
  * preservation is implementation-stable but not contractual — a wide op
  * inserted mid-chain would silently break oracle row order with no
  * trailing orderBy to restore it (r10 ADVICE). */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, format: String, duration_ms: Long)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float], frame_count: Int)

  /** Real ingestion path for media directories: Spark's binaryFile
    * source yields (path, modificationTime, length, content) with
    * content as the opaque payload — the at-scale entry point for
    * image/audio/video directories (supports pathGlobFilter, recursive
    * lookup, and partition pruning on path). */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        col("content").as("bytes"),
        col("length").cast(LongType).as("n_bytes"))

  /** Synthesize a media table from the documents corpus: payload = UTF-8
    * bytes of the text (deterministic), metadata derived from doc fields.
    * Stands in for `spark.read.format("binaryFile")` at scale. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      (col("n_chars") % 640 + 32).cast(IntegerType).as("width"),
      (col("n_chars") % 480 + 32).cast(IntegerType).as("height"),
      lit("raw").as("format"),
      (col("n_chars") * 10L).as("duration_ms"))

  // ---- real pure-JVM codecs (WAV/PCM, BMP 24-bit, PPM P6) ---------------

  /** Metadata decoded by the REAL parsers. Audio rows carry sample_rate/
    * n_samples/duration_ms/energy (energy = Σ(sᵢ/32768)², the PCM
    * normalized sum of squares); image rows carry width/height,
    * n_samples = pixel count and pix_sum = Σ of all channel bytes.
    * Unrecognized payloads decode as format "raw" with n_samples =
    * byte length (so nothing is silently dropped). */
  case class DecodedMeta(
      media_id: Long, format: String, width: Int, height: Int,
      sample_rate: Int, n_samples: Long, duration_ms: Long,
      energy: Double, pix_sum: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** RIFF/WAVE container walk shared by [[decodeWav]] and
    * [[decodePcm16Mono]]: (rate, channels, bits, dataOff, dataLen) for
    * an uncompressed-PCM `fmt ` + `data` layout, None for anything
    * malformed. Declared chunk lengths are bounds-checked in LONG
    * arithmetic — a crafted length near Int.MaxValue must fail the
    * check, not wrap negative and walk the cursor out of the buffer
    * (the never-drop contract means corrupt payloads degrade, never
    * throw). */
  private def parseRiffPcm(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length) {
      val id = tag(b, pos); val len = i32(b, pos + 4)
      if (len < 0 || pos + 8 + len.toLong > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtOk = u16(b, pos + 8) == 1 // PCM only
          channels = u16(b, pos + 10)
          rate = i32(b, pos + 12)
          bits = u16(b, pos + 22)
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => () // skip LIST/INFO/etc.
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (!fmtOk || rate <= 0 || channels <= 0 || dataOff < 0) None
    else Some((rate, channels, bits, dataOff, dataLen))
  }

  /** WAV/PCM: RIFF/WAVE container, chunk walk for `fmt ` + `data`,
    * 16-bit signed or 8-bit unsigned PCM (format code 1). Returns None
    * for anything else — compressed WAV needs a codec and stays stubbed. */
  private[graft] def decodeWav(b: Array[Byte]): Option[DecodedMeta] =
    parseRiffPcm(b).flatMap { case (rate, channels, bits, dataOff, dataLen) =>
      if (bits != 16 && bits != 8) None
      else {
        val bytesPerFrame = channels * (bits / 8)
        val frames = dataLen / bytesPerFrame
        var energy = 0.0
        var i = dataOff
        val end = dataOff + frames * bytesPerFrame
        if (bits == 16) {
          while (i < end) {
            val s = (u16(b, i) << 16) >> 16 // sign-extend little-endian s16
            val v = s / 32768.0
            energy += v * v
            i += 2
          }
        } else {
          while (i < end) { // 8-bit WAV is unsigned, midpoint 128
            val v = ((b(i) & 0xff) - 128) / 128.0
            energy += v * v
            i += 1
          }
        }
        Some(DecodedMeta(0L, "wav", 0, 0, rate, frames.toLong * channels,
          frames.toLong * 1000L / rate, energy, 0L))
      }
    }

  /** BMP: BITMAPFILEHEADER + BITMAPINFOHEADER(≥40), 24-bit BI_RGB only
    * (deeper headers tolerated, compression is not). Handles bottom-up
    * AND top-down (negative height) row order and the 4-byte row
    * padding; pix_sum = Σ of the w×h×3 channel bytes, padding excluded. */
  private[graft] def decodeBmp(b: Array[Byte]): Option[DecodedMeta] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = i32(b, 10)
    val dibSize = i32(b, 14)
    if (dibSize < 40) return None
    val w = i32(b, 18)
    val hRaw = i32(b, 22)
    // abs(Int.MinValue) == Int.MinValue, so h can still be negative here;
    // the <= 0 guard rejects that crafted header instead of letting the
    // negative rowSizeL*h product trivially pass the bounds check below
    val h = math.abs(hRaw)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // row size in LONG arithmetic: a declared width near 2^30 overflows
    // w*3 to a negative Int, which would slip past the bounds check and
    // return fabricated dimensions for a corrupt header
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + rowSizeL * h > b.length) return None
    val rowSize = rowSizeL.toInt // bounded by b.length after the check
    var pixSum = 0L
    var y = 0
    while (y < h) {
      var i = dataOff + y * rowSize
      val end = i + w * 3
      while (i < end) { pixSum += (b(i) & 0xff); i += 1 }
      y += 1
    }
    Some(DecodedMeta(0L, "bmp", w, h, 0, w.toLong * h, 0L, 0.0, pixSum))
  }

  /** PPM P6 (binary): "P6" magic, whitespace-separated width/height/
    * maxval with `#` comments, single whitespace, then w×h×3 raw RGB
    * bytes. maxval must fit one byte (≤255). */
  private[graft] def decodePpm(b: Array[Byte]): Option[DecodedMeta] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var more = true
      while (more && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1; progressed = true }
        else if (c.isWhitespace) { i += 1; progressed = true }
        else more = false
      }
      progressed
    }
    def int(): Int = {
      // accumulate in Long: an Int accumulator wraps on a long digit run
      // ("4294967297" → 1) and can land on a small positive value that
      // passes the bounds check with fabricated dimensions
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = (if (v < 0L) 0L else v) * 10 + (b(i) - '0'); i += 1
      }
      if (v > Int.MaxValue) -1 else v.toInt
    }
    if (!skipWs()) return None
    val w = int(); if (w <= 0) return None
    if (!skipWs()) return None
    val h = int(); if (h <= 0) return None
    if (!skipWs()) return None
    val maxval = int(); if (maxval <= 0 || maxval > 255) return None
    i += 1 // exactly one whitespace after maxval, then raster
    if (i + w.toLong * h * 3 > b.length) return None
    var pixSum = 0L
    val end = i + w * h * 3
    while (i < end) { pixSum += (b(i) & 0xff); i += 1 }
    Some(DecodedMeta(0L, "ppm", w, h, 0, w.toLong * h, 0L, 0.0, pixSum))
  }

  // ---- JDK ImageIO codecs (JPEG/PNG/GIF — java.desktop, zero deps) -----

  /** First-touch JVM setup for executor-side ImageIO: headless AWT
    * (executors have no display) and no disk cache (ImageIO otherwise
    * routes every decode through a temp file — keep it pure-memory).
    * Referenced before any ImageIO call; the JVM runs the body once. */
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Magic-byte sniff for the formats the JDK can decode natively. */
  private[graft] def sniffImageIO(b: Array[Byte]): Option[String] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff) Some("jpeg")
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8') Some("gif")
    else None

  /** REAL JPEG/PNG/GIF decode via the JDK's own ImageIO readers
    * (java.desktop module — no external codec library involved).
    * pix_sum = Σ(R+G+B) over the decoded raster, alpha ignored. PNG is
    * lossless (pix_sum closed-form oracle-able); JPEG is lossy and the
    * JDK GIF writer quantizes small palettes, so only their dimensions/
    * format/pixel-count are oracle-checkable. */
  private[graft] def decodeImageIO(b: Array[Byte]): Option[DecodedMeta] =
    sniffImageIO(b).flatMap { fmt =>
      imageIoReady
      // a payload can carry a valid magic but a corrupt body — ImageIO
      // throws (IIOException et al.) where the hand-written decoders
      // return None; a poison row must degrade to "raw", not kill the
      // task (decodeMeta's never-drop contract)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var s = 0L
        var i = 0
        while (i < px.length) {
          val v = px(i)
          s += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
          i += 1
        }
        Some(DecodedMeta(0L, fmt, w, h, 0, w.toLong * h, 0L, 0.0, s))
      }
    }

  /** Encode a closed-form pixel function through an ImageIO writer
    * ("png" exact; "jpeg"/"gif" lossy/quantized — see [[decodeImageIO]]). */
  private[graft] def encodeImageIO(fmt: String, w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos),
      s"no ImageIO writer for format '$fmt'")
    bos.toByteArray
  }

  /** Raw 16-bit mono PCM extraction from a RIFF/WAVE payload — the
    * sample-level twin of [[decodeWav]] (which only aggregates); both
    * share [[parseRiffPcm]]'s container walk. Returns (sampleRate,
    * samples) or None for anything that isn't uncompressed 16-bit mono
    * (those rows keep the stub path). */
  private[graft] def decodePcm16Mono(b: Array[Byte]): Option[(Int, Array[Short])] =
    parseRiffPcm(b).flatMap { case (rate, channels, bits, dataOff, dataLen) =>
      if (channels != 1 || bits != 16) None
      else {
        val n = dataLen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((u16(b, dataOff + 2 * i) << 16) >> 16).toShort
          i += 1
        }
        Some((rate, out))
      }
    }

  /** Sniff + decode with the real parsers; None only for payloads that
    * need a codec library the JVM lacks (MP4/MP3 — the stubs' domain). */
  private[graft] def decodeAny(b: Array[Byte]): Option[DecodedMeta] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      decodeWav(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (sniffImageIO(b).isDefined) decodeImageIO(b)
    else None

  /** Partition-wise metadata decode over (media_id, bytes) using the
    * real parsers — same narrow iterator shape as [[extractFeatures]]. */
  def decodeMeta(media: DataFrame): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast(LongType), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAny(bytes)
            .map(_.copy(media_id = id))
            .getOrElse(DecodedMeta(id, "raw", 0, 0, 0, bytes.length.toLong, 0L, 0.0, 0L))
        }
      }
  }

  // ---- deterministic encoders (m03's round-trip ground truth) -----------

  /** Minimal RIFF/WAVE writer: 16-bit mono PCM. */
  private[graft] def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Minimal 24-bit BI_RGB BMP writer: bottom-up rows, 4-byte padding.
    * `px(x, y)` returns (r, g, b) for the TOP-DOWN coordinate system. */
  private[graft] def encodeBmp24(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val imageSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + imageSize)
    bb.putInt(0); bb.putInt(54) // reserved, pixel offset
    bb.putInt(40); bb.putInt(w); bb.putInt(h) // BITMAPINFOHEADER, bottom-up
    bb.putShort(1); bb.putShort(24); bb.putInt(0) // planes, bpp, BI_RGB
    bb.putInt(imageSize); bb.putInt(2835); bb.putInt(2835) // 72 DPI
    bb.putInt(0); bb.putInt(0) // palette
    var yOut = 0
    while (yOut < h) {
      val y = h - 1 - yOut // file stores bottom row first
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        bb.put(bl.toByte); bb.put(g.toByte); bb.put(r.toByte) // BGR order
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      yOut += 1
    }
    bb.array()
  }

  /** Minimal PPM P6 writer (maxval 255, top-down RGB). */
  private[graft] def encodePpmP6(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Synthesize REAL media payloads from the documents frame — actual
    * WAV/BMP/PPM files built from closed-form functions of (doc_id,
    * n_chars), so the decoded metadata is recomputable by the DuckDB
    * oracle without parsing a byte (m03's ground truth):
    *   doc_id % 3 == 0 → BMP  (doc_id%5+1) × (doc_id%4+1), channel byte
    *                     c ∈ {0,1,2} of pixel p = (doc_id + 3p + c) % 256
    *   doc_id % 3 == 1 → WAV  8 kHz mono s16, n = n_chars%400+16
    *                     samples, sample(i) = (doc_id·31 + i·7) % 2001 − 1000
    *   doc_id % 3 == 2 → PPM  (doc_id%3+1) × (doc_id%6+1), same pixel rule
    * Runs in the same narrow mapPartitions shape as the decode. */
  def synthesizeCodec(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast(LongType), col("n_chars").cast(LongType))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          def pix(base: Int)(x: Int, y: Int): (Int, Int, Int) = {
            val p = 3L * (y.toLong * base + x)
            (((id + p + 2) % 256).toInt, ((id + p + 1) % 256).toInt,
              ((id + p) % 256).toInt)
          }
          val bytes = (id % 3) match {
            case 0 =>
              val w = (id % 5 + 1).toInt; val h = (id % 4 + 1).toInt
              encodeBmp24(w, h, pix(w))
            case 1 =>
              val n = (nChars % 400 + 16).toInt
              encodeWavPcm16(8000, Array.tabulate(n)(i =>
                ((id * 31 + i.toLong * 7) % 2001 - 1000).toShort))
            case _ =>
              val w = (id % 3 + 1).toInt; val h = (id % 6 + 1).toInt
              encodePpmP6(w, h, pix(w))
          }
          (id, bytes)
        }
      }.toDF("media_id", "bytes")
  }

  /** Synthesize REAL JPEG/PNG/GIF payloads from the documents frame —
    * actual files written by the JDK's ImageIO encoders, pixel rule
    * identical to [[synthesizeCodec]] (channel c of pixel p =
    * (doc_id + 3p + c) % 256), so PNG rows (lossless) have a DuckDB
    * closed-form pix_sum and all rows have closed-form dimensions:
    *   doc_id % 3 == 0 → PNG  (doc_id%7+1) × (doc_id%5+1)
    *   doc_id % 3 == 1 → JPEG (doc_id%6+8) × (doc_id%4+8)
    *   doc_id % 3 == 2 → GIF  (doc_id%4+1) × (doc_id%3+1)
    * Same narrow mapPartitions shape as the decode — what runs at scale. */
  def synthesizeImageIO(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast(LongType)).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          def pix(base: Int)(x: Int, y: Int): (Int, Int, Int) = {
            val p = 3L * (y.toLong * base + x)
            (((id + p + 2) % 256).toInt, ((id + p + 1) % 256).toInt,
              ((id + p) % 256).toInt)
          }
          val bytes = (id % 3) match {
            case 0 =>
              val w = (id % 7 + 1).toInt; val h = (id % 5 + 1).toInt
              encodeImageIO("png", w, h, pix(w))
            case 1 =>
              val w = (id % 6 + 8).toInt; val h = (id % 4 + 8).toInt
              encodeImageIO("jpeg", w, h, pix(w))
            case _ =>
              val w = (id % 4 + 1).toInt; val h = (id % 3 + 1).toInt
              encodeImageIO("gif", w, h, pix(w))
          }
          (id, bytes)
        }
      }.toDF("media_id", "bytes")
  }

  /** REAL pixel resize for ImageIO-decodable image rows (JPEG/PNG/GIF):
    * aspect-preserving fit into (maxW, maxH), never upscaling, bilinear
    * resample through Graphics2D, re-encoded as PNG (lossless on the
    * output side so downstream decodes see exactly the resampled
    * raster). Rows whose payloads the JVM cannot decode fall back to
    * [[resizeStub]]'s byte-subsample kernel so the operator stays total;
    * non-image rows pass through. Same narrow iterator shape. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, s"bad bounds: ${maxW}x$maxH")
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else sniffImageIO(m.bytes) match {
          case Some(_) =>
            imageIoReady
            // corrupt body behind a valid magic: keep the row untouched
            // rather than failing the task (same contract as decode)
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(m.bytes))
              catch { case _: Exception => null }
            if (img == null) m
            else {
              val w0 = img.getWidth; val h0 = img.getHeight
              if (w0 <= maxW && h0 <= maxH) m.copy(width = w0, height = h0)
              else {
                val scale = math.min(maxW.toDouble / w0, maxH.toDouble / h0)
                val w = math.max(1, math.round(w0 * scale).toInt)
                val h = math.max(1, math.round(h0 * scale).toInt)
                val out = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = out.createGraphics()
                g2.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g2.drawImage(img, 0, 0, w, h, null)
                g2.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                m.copy(bytes = bos.toByteArray, width = w, height = h,
                  format = "png")
              }
            }
          case None => resizeRowStub(m, maxW, maxH)
        }
      }
    }
  }

  /** STUB decode kernel: deterministic features from payload bytes.
    * Real impl would decode pixels/samples here (out of scope: codec libs
    * are not in this container). */
  private[operators] def featuresStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature kernel: payloads the REAL parsers recognize get decoded
    * features (f0 = PCM energy / normalized pixel sum, then duration,
    * rate/width, height, sample-or-pixel count); everything else falls
    * back to the byte-histogram STUB. Keeps the m01 conservation gate
    * meaningful for raw payloads while real WAV/BMP/PPM rows carry real
    * signal. Callers must route ONLY declared-media rows here
    * (extractFeatures gates on format != "raw"): content sniffing alone
    * would let a text payload that happens to start like a PPM header
    * silently switch feature semantics — a corpus-content-dependent
    * oracle break. */
  private[operators] def features(bytes: Array[Byte], dim: Int = 8): Array[Float] =
    decodeAny(bytes) match {
      case Some(d) =>
        val out = new Array[Float](dim)
        out(0) = if (d.format == "wav") d.energy.toFloat else d.pix_sum / 255.0f
        out(1) = d.duration_ms / 1000.0f
        out(2) = if (d.format == "wav") d.sample_rate.toFloat else d.width.toFloat
        out(3) = d.height.toFloat
        out(4) = d.n_samples.toFloat
        out
      case None => featuresStub(bytes, dim)
    }

  /** Partition-wise feature extraction: Dataset[MediaRecord] →
    * Dataset[MediaFeatures]. Iterator-to-iterator (constant memory per
    * partition), narrow (no shuffle), executor-side only. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // the real-decode route only for rows DECLARED as a concrete
        // media format; "raw" (the stub corpus: text bytes as payload)
        // always takes the conservation-checked stub, so a text that
        // coincidentally parses as PPM/WAV can't flip feature semantics
        val feats =
          if (m.format != "raw") features(m.bytes) else featuresStub(m.bytes)
        val frames =
          if (m.kind == "video") math.max(1, (m.duration_ms / 1000L).toInt) else 1
        MediaFeatures(m.media_id, m.kind, m.bytes.length, feats, frames)
      }
    }
  }

  /** Resize step for image rows. The Spark-side semantics are REAL —
    * aspect-preserving fit to (maxW, maxH), never upscaling, metadata
    * updated per row, iterator-to-iterator narrow pass — only the pixel
    * resample kernel is the STUB (deterministic byte subsample scaled by
    * the area ratio; a real impl decodes and scales pixels here — codec
    * libs are not in this container). Non-image rows pass through. */
  def resizeStub(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, s"bad bounds: ${maxW}x$maxH")
    media.mapPartitions(it => it.map(resizeRowStub(_, maxW, maxH)))
  }

  private def resizeRowStub(m: MediaRecord, maxW: Int, maxH: Int): MediaRecord =
    if (m.kind != "image" || (m.width <= maxW && m.height <= maxH)) m
    else {
      val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
      val w = math.max(1, math.round(m.width * scale).toInt)
      val h = math.max(1, math.round(m.height * scale).toInt)
      // shrink-only contract: never grow the payload (incl. 0-byte case)
      val targetLen =
        math.min(m.bytes.length, math.max(1, (m.bytes.length * scale * scale).toInt))
      m.copy(bytes = java.util.Arrays.copyOf(m.bytes, targetLen),
        width = w, height = h)
    }

  /** Audio resample step — the audio twin of [[resizeStub]]. Spark-side
    * semantics are REAL: only audio rows touched, downsample-only (a
    * higher target rate is a no-op, like resize never upscales),
    * duration preserved, payload shrunk by the rate ratio, narrow
    * iterator pass; the sample-rate-conversion kernel is the STUB
    * (deterministic byte decimation — a real impl low-pass-filters and
    * interpolates PCM here; codec libs are not in this container).
    * `fromHz` is carried per-row in `width` (synthesize leaves it as a
    * free metadata slot for non-images); the new rate lands there. */
  def resamplePcmStub(media: Dataset[MediaRecord], toHz: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(toHz > 0, s"bad target rate: $toHz")
    media.mapPartitions(it => it.map(resampleRowStub(_, toHz)))
  }

  private def resampleRowStub(m: MediaRecord, toHz: Int): MediaRecord = {
    val fromHz = m.width
    if (m.kind != "audio" || fromHz <= toHz) m
    else {
      val ratio = toHz.toDouble / fromHz
      val targetLen =
        math.min(m.bytes.length, math.max(1, (m.bytes.length * ratio).toInt))
      m.copy(bytes = java.util.Arrays.copyOf(m.bytes, targetLen), width = toHz)
    }
  }

  /** REAL PCM resample for 16-bit mono WAV rows — the audio twin of
    * [[resizeImages]]: decode the samples ([[decodePcm16Mono]]), linear
    * interpolation down to the target rate (downsample-only; a
    * lower-rate payload passes through, mirroring never-upscale),
    * re-encode RIFF/WAVE. Output length is exactly
    * n·toHz/fromHz (integer division) so the oracle can recompute it;
    * a constant signal resamples to exactly that constant (pinned in
    * the suite and oracled end-to-end by m06). WAV payloads that are
    * not 16-bit mono PCM fall back to [[resamplePcmStub]]'s byte
    * decimation so the operator stays total; non-audio rows pass
    * through. Narrow iterator pass, no shuffle. */
  def resamplePcm(media: Dataset[MediaRecord], toHz: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(toHz > 0, s"bad target rate: $toHz")
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "audio") m
        else decodePcm16Mono(m.bytes) match {
          case Some((rate, samples)) =>
            // a structurally valid zero-sample WAV must pass through, not
            // throw: the interpolation loop below indexes samples(0)
            if (rate <= toHz || samples.isEmpty) m.copy(width = rate)
            else {
              // no max(1,…) floor: outN derives only from real samples so
              // the n·toHz/rate output-length contract holds uniformly
              val outN = (samples.length.toLong * toHz / rate).toInt
              val step = rate.toDouble / toHz
              val out = new Array[Short](outN)
              var j = 0
              while (j < outN) {
                val pos = j * step
                val i0 = pos.toInt
                val i1 = math.min(i0 + 1, samples.length - 1)
                val frac = pos - i0
                out(j) = math.round(
                  samples(i0) * (1.0 - frac) + samples(i1) * frac).toShort
                j += 1
              }
              m.copy(bytes = encodeWavPcm16(toHz, out), width = toHz)
            }
          case None => resampleRowStub(m, toHz)
        }
      }
    }
  }

  /** Kernel validation: [[featuresStub]] routes every payload byte into
    * exactly one feature slot, so Σ feature == Σ bytes/255 per record up
    * to float32 accumulation error. Returns (media_id, ok) — a correct
    * kernel has zero `ok = false` rows; the m01 gate counts them. The
    * check is the template for validating a REAL decode kernel too
    * (energy/checksum conservation per record, computed in the same
    * partition pass as the decode — no second data movement). */
  def featureConservation(media: Dataset[MediaRecord],
      tol: Double = 1e-2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = featuresStub(m.bytes)
        var bs = 0.0
        var i = 0
        while (i < m.bytes.length) { bs += (m.bytes(i) & 0xff) / 255.0; i += 1 }
        var fs = 0.0
        var j = 0
        while (j < f.length) { fs += f(j); j += 1 }
        (m.media_id, math.abs(fs - bs) <= tol * math.max(1.0, bs))
      }
    }.toDF("media_id", "ok")
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (sequence + explode — pure expressions, no UDF). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_off_ms"))

  // ---- animated GIF: real multi-frame decode (the JDK GIF reader) -------

  /** Write a multi-frame (animated) GIF through the JDK's ImageIO
    * sequence writer; frame f's pixels come from `px(f, x, y)`. */
  private[graft] def encodeGifFrames(w: Int, h: Int, frames: Int,
      px: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    imageIoReady
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = px(f, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL frame count of a GIF payload: the JDK reader walks the image
    * sequence (getNumImages(true) forces a full scan — exact, not the
    * header hint). None for non-GIF payloads. */
  private[graft] def gifFrameCount(b: Array[Byte]): Option[Int] =
    sniffImageIO(b).filter(_ == "gif").flatMap { _ =>
      imageIoReady
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      // a GIF header with a corrupt frame stream must count as
      // not-decodable (zero sampled rows), not a task failure
      try { reader.setInput(iis); Some(reader.getNumImages(true)) }
      catch { case _: Exception => None }
      finally { reader.dispose(); iis.close() }
    }

  /** REAL frame sampling over animated-GIF payloads — the decoded twin
    * of [[sampleFrames]] (which samples metadata only): count frames by
    * actually walking each payload's image sequence, then emit one row
    * per `every`-th frame index. Decode happens once per payload in a
    * narrow mapPartitions pass; the explode stays a pure expression so
    * Catalyst owns the fan-out. Non-GIF payloads yield zero rows (they
    * have no decodable frame sequence). */
  def sampleGifFrames(media: DataFrame, every: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(every > 0, s"bad stride: $every")
    media.select(col("media_id").cast(LongType), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          gifFrameCount(bytes).map(n => (id, n))
        }
      }.toDF("media_id", "frame_count")
      // a frameless-but-valid GIF header counts as 0 — it has nothing to
      // sample AND sequence(0, -1) would throw; filter before exploding
      .filter(col("frame_count") >= 1)
      .select(col("media_id"), col("frame_count"),
        explode(sequence(lit(0), col("frame_count") - 1, lit(every)))
          .as("frame_idx"))
  }

  /** End-to-end stub pipeline over a documents frame. */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = synthesize(docs).as[MediaRecord]
    extractFeatures(media).toDF()
  }
}

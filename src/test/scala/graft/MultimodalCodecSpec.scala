package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real pure-JVM codec kernels (WAV/PCM, BMP 24-bit, PPM P6): fixture
  * values are computed BY HAND from the file-format math, not by running
  * the code under test. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  test("WAV: hand-computed 16-bit fixture round-trips through the real decoder") {
    // 8 mono samples at 8000 Hz. Energy = Σ (s/32768)²:
    //   0² + 0.5² + (−0.5)² + (32767/32768)² + (−1)² + (1000/32768)²·2 + 0²
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 1000, -1000, 0)
    val bytes = Multimodal.encodeWavPcm16(8000, samples)
    // RIFF layout checks: 44-byte header + 16 data bytes, chunk sizes
    assert(bytes.length == 60)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val d = Multimodal.decodeWav(bytes).get
    assert(d.format == "wav" && d.sample_rate == 8000 && d.n_samples == 8)
    assert(d.duration_ms == 1L) // 8 frames / 8000 Hz = 1 ms exactly
    val expected = 0.25 + 0.25 + math.pow(32767.0 / 32768.0, 2) + 1.0 +
      2 * math.pow(1000.0 / 32768.0, 2)
    assert(math.abs(d.energy - expected) < 1e-12, s"energy ${d.energy} vs $expected")
  }

  test("WAV: 8-bit unsigned PCM decodes against the midpoint-128 rule") {
    // hand-built 44+4 byte file: 4 samples [128, 255, 0, 192] at 4000 Hz
    // energy = 0² + (127/128)² + (−1)² + (64/128)²
    val bb = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(40)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(4000); bb.putInt(4000)
    bb.putShort(1); bb.putShort(8)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(4)
    Seq(128, 255, 0, 192).foreach(v => bb.put(v.toByte))
    val d = Multimodal.decodeWav(bb.array()).get
    assert(d.sample_rate == 4000 && d.n_samples == 4 && d.duration_ms == 1L)
    val expected = math.pow(127.0 / 128, 2) + 1.0 + math.pow(64.0 / 128, 2)
    assert(math.abs(d.energy - expected) < 1e-12)
  }

  test("BMP: 3x2 fixture exercises row padding; top-down variant decodes equal") {
    // w=3 → 9 pixel bytes/row, padded to 12; channel bytes must exclude
    // the padding from pix_sum. px(x,y) = (x+y, 10(x+y), 100+x)
    def px(x: Int, y: Int) = (x + y, 10 * (x + y), 100 + x)
    val bytes = Multimodal.encodeBmp24(3, 2, px _)
    assert(bytes.length == 54 + 2 * 12) // padded rows
    val d = Multimodal.decodeBmp(bytes).get
    assert(d.format == "bmp" && d.width == 3 && d.height == 2 && d.n_samples == 6)
    // hand sum over x∈{0,1,2}, y∈{0,1}: Σ(x+y)=9, Σ10(x+y)=90, Σ(100+x)=606
    assert(d.pix_sum == 9 + 90 + 606)
    // flipping the height sign (top-down BMP) must not change the sum
    val flipped = bytes.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(negH, 0, flipped, 22, 4)
    assert(Multimodal.decodeBmp(flipped).get.pix_sum == 705)
  }

  test("PPM: P6 with header comment parses; short raster rejected") {
    // hand-built 2x1 P6: pixels (1,2,3) (4,5,6) → pix_sum = 21
    val header = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII")
    val body = Array[Byte](1, 2, 3, 4, 5, 6)
    val d = Multimodal.decodePpm(header ++ body).get
    assert(d.width == 2 && d.height == 1 && d.pix_sum == 21 && d.n_samples == 2)
    assert(Multimodal.decodePpm(header ++ body.take(5)).isEmpty)
  }

  test("decodeMeta: unrecognized payloads surface as raw, never dropped") {
    val df = Seq((1L, "not a media file".getBytes("UTF-8")),
        (2L, Array[Byte]('B', 'M', 3))) // BM magic but invalid header
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeMeta(df).collect().sortBy(_.media_id)
    assert(out.forall(_.format == "raw"))
    assert(out(0).n_samples == 16L) // byte length carried through
  }

  test("synthesizeCodec → decodeMeta: closed-form ground truth recovered") {
    val docs = Seq((0L, 50L), (1L, 50L), (2L, 50L), (31L, 7L))
      .toDF("doc_id", "n_chars")
    val out = Multimodal.decodeMeta(Multimodal.synthesizeCodec(docs))
      .collect().map(d => d.media_id -> d).toMap
    // doc 0: BMP 1x1 — channel bytes (0+0..2)%256 → pix_sum 3
    assert(out(0L).format == "bmp" && out(0L).width == 1 && out(0L).pix_sum == 3)
    // doc 1: WAV with 50%400+16 = 66 samples at 8 kHz → 8 ms
    assert(out(1L).format == "wav" && out(1L).n_samples == 66 &&
      out(1L).duration_ms == 8)
    // doc 2: PPM (2%3+1)x(2%6+1) = 3x3, Σ(2+i)%256 for i<27 = 27·2+Σi<27
    assert(out(2L).format == "ppm" && out(2L).width == 3 && out(2L).height == 3)
    assert(out(2L).pix_sum == 27 * 2 + (26 * 27) / 2)
    // doc 31: WAV energy matches the sample formula summed by hand
    val n = (7 % 400 + 16)
    val expected = (0 until n).map { i =>
      val s = (31L * 31 + i * 7) % 2001 - 1000
      math.pow(s / 32768.0, 2)
    }.sum
    assert(math.abs(out(31L).energy - expected) < 1e-12)
  }

  test("ImageIO tier: PNG round-trips exact pixels; JPEG/GIF carry exact dims") {
    // pixel rule (id + 3p + c) % 256 with id = 7 on a 5x4 raster:
    // channel bytes enumerate (7 + i) % 256 for i < 60 → Σ = 60·7 + Σi<60
    def px(x: Int, y: Int) = {
      val p = 3 * (y * 5 + x)
      ((7 + p + 2) % 256, (7 + p + 1) % 256, (7 + p) % 256)
    }
    val png = Multimodal.encodeImageIO("png", 5, 4, px _)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P') // real PNG magic
    val d = Multimodal.decodeImageIO(png).get
    assert(d.format == "png" && d.width == 5 && d.height == 4 && d.n_samples == 20)
    assert(d.pix_sum == 60 * 7 + (59 * 60) / 2)
    // JPEG is lossy: dims/format survive, pixels need not
    val jpg = Multimodal.encodeImageIO("jpeg", 5, 4, px _)
    val dj = Multimodal.decodeImageIO(jpg).get
    assert(dj.format == "jpeg" && dj.width == 5 && dj.height == 4)
    // GIF: dims/format survive (the JDK writer quantizes small palettes)
    val gif = Multimodal.encodeImageIO("gif", 5, 4, px _)
    val dg = Multimodal.decodeImageIO(gif).get
    assert(dg.format == "gif" && dg.width == 5 && dg.height == 4)
    // decodeAny routes the magics to the ImageIO tier
    assert(Multimodal.decodeAny(png).get.format == "png")
    assert(Multimodal.decodeAny(jpg).get.format == "jpeg")
  }

  test("resizeImages: real bilinear resample — constant color exactly preserved") {
    // 45x27 solid (37,74,111) → 16x16 box: scale = 16/45, dims 16x10,
    // every output pixel must still be (37,74,111) (bilinear of a
    // constant is the constant) so pix_sum = 16·10·222
    val src = Multimodal.encodeImageIO("png", 45, 27, (_, _) => (37, 74, 111))
    val rec = Multimodal.MediaRecord(1L, "image", src, 45, 27, "png", 0L)
    val out = Multimodal.resizeImages(Seq(rec).toDS(), 16, 16).collect().head
    assert(out.width == 16 && out.height == 10)
    val d = Multimodal.decodeImageIO(out.bytes).get
    assert(d.width == 16 && d.height == 10)
    assert(d.pix_sum == 16L * 10 * (37 + 74 + 111))
    // within-bounds image: payload untouched, metadata refreshed
    val small = Multimodal.encodeImageIO("png", 8, 8, (_, _) => (1, 2, 3))
    val rec2 = Multimodal.MediaRecord(2L, "image", small, 0, 0, "png", 0L)
    val out2 = Multimodal.resizeImages(Seq(rec2).toDS(), 16, 16).collect().head
    assert(out2.width == 8 && out2.height == 8 && (out2.bytes sameElements small))
    // non-decodable image rows fall back to the stub's shrink contract
    val rec3 = Multimodal.MediaRecord(3L, "image", Array.fill(100)(9.toByte),
      40, 40, "raw", 0L)
    val out3 = Multimodal.resizeImages(Seq(rec3).toDS(), 16, 16).collect().head
    assert(out3.width == 16 && out3.height == 16 && out3.bytes.length < 100)
  }

  test("overflow payloads: huge declared lengths reject cleanly, never wrap Int") {
    // RIFF chunk declaring len ≈ Int.MaxValue: pos+8+len wraps negative
    // in Int arithmetic — the Long-checked walk must return None, not
    // walk the cursor out of the buffer and throw
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(56)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(0x7ffffff0)
    val evil = bb.array()
    assert(Multimodal.decodeWav(evil).isEmpty)
    assert(Multimodal.decodePcm16Mono(evil).isEmpty)
    // BMP declaring width 2^30: w*3 wraps negative, rowSize*h would
    // pass an Int bounds check — must reject, not fabricate dimensions
    val bmp = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte); bmp.put('M'.toByte); bmp.putInt(64)
    bmp.putInt(0); bmp.putInt(54)
    bmp.putInt(40); bmp.putInt(0x40000000); bmp.putInt(1) // w=2^30, h=1
    bmp.putShort(1); bmp.putShort(24); bmp.putInt(0)
    assert(Multimodal.decodeBmp(bmp.array()).isEmpty)
    // both still surface through decodeMeta as raw rows, not failures
    val out = Multimodal.decodeMeta(
      Seq((1L, evil), (2L, bmp.array())).toDF("media_id", "bytes"))
      .collect()
    assert(out.length == 2 && out.forall(_.format == "raw"))
  }

  test("crafted headers: MinValue BMP height, PPM digit wrap, zero-sample WAV") {
    // BMP height 0x80000000: math.abs(Int.MinValue) is still negative, so
    // the old h==0 guard passed and rowSize*h went negative past the
    // bounds check — must reject, not return fabricated negative dims
    val bmp = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte); bmp.put('M'.toByte); bmp.putInt(64)
    bmp.putInt(0); bmp.putInt(54)
    bmp.putInt(40); bmp.putInt(1); bmp.putInt(Int.MinValue) // w=1, h=0x80000000
    bmp.putShort(1); bmp.putShort(24); bmp.putInt(0)
    assert(Multimodal.decodeBmp(bmp.array()).isEmpty)
    // PPM width "4294967297" (2^32+1): an Int accumulator wraps to 1 and
    // the header parses with fabricated in-bounds dimensions — must reject
    val ppm = "P6\n4294967297 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(16)(7.toByte)
    assert(Multimodal.decodePpm(ppm).isEmpty)
    // zero-sample WAV (empty data chunk) through resamplePcm at a lower
    // target rate: pass through with refreshed rate, never index samples(0)
    val empty = Multimodal.encodeWavPcm16(8000, Array.empty[Short])
    val rec = Multimodal.MediaRecord(1L, "audio", empty, 8000, 0, "wav", 0L)
    val out = Multimodal.resamplePcm(Seq(rec).toDS(), 3000).collect().head
    assert(out.width == 8000 && (out.bytes sameElements empty))
  }

  test("poison payloads: valid magic + corrupt body degrades, never fails the task") {
    // PNG magic with a garbage body: decode → raw (never-drop contract)
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ Array.fill(32)(0x5a.toByte)
    assert(Multimodal.decodeImageIO(fakePng).isEmpty)
    val viaMeta = Multimodal.decodeMeta(
      Seq((1L, fakePng)).toDF("media_id", "bytes")).collect().head
    assert(viaMeta.format == "raw" && viaMeta.n_samples == fakePng.length)
    // truncated REAL png (headers parse, body cut): also degrade
    val realPng = Multimodal.encodeImageIO("png", 6, 6, (_, _) => (1, 2, 3))
    val truncated = realPng.take(realPng.length / 2)
    assert(Multimodal.decodeImageIO(truncated).isEmpty ||
      Multimodal.decodeImageIO(truncated).get.format == "png") // decoder may salvage
    // corrupt GIF through the frame walker: the JDK reader reports 0
    // frames (or None if it throws) — either way zero sampled rows
    val fakeGif = "GIF89a".getBytes("US-ASCII") ++ Array.fill(16)(0x7f.toByte)
    assert(Multimodal.gifFrameCount(fakeGif).forall(_ == 0))
    assert(Multimodal.sampleGifFrames(
      Seq((1L, fakeGif)).toDF("media_id", "bytes"), 2).count() == 0)
    // corrupt image row through resize: row passes through untouched
    val rec = Multimodal.MediaRecord(9L, "image", fakePng, 40, 40, "png", 0L)
    val out = Multimodal.resizeImages(Seq(rec).toDS(), 16, 16).collect().head
    assert(out.bytes sameElements fakePng)
  }

  test("resamplePcm: real linear-interp downsample, hand-checked lengths and values") {
    // 8 samples at 8000 Hz → 3000 Hz: outN = 8·3000/8000 = 3,
    // positions j·(8/3): s'(0)=s[0], s'(1)=lerp(s[2],s[3],2/3), s'(2)=lerp(s[5],s[6],1/3)
    val samples = Array[Short](100, 200, 300, 600, 500, 900, 1200, 700)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    val rec = Multimodal.MediaRecord(1L, "audio", wav, 8000, 0, "wav", 0L)
    val out = Multimodal.resamplePcm(Seq(rec).toDS(), 3000).collect().head
    assert(out.width == 3000)
    val (rate, rs) = Multimodal.decodePcm16Mono(out.bytes).get
    assert(rate == 3000 && rs.length == 3)
    assert(rs(0) == 100)
    assert(rs(1) == math.round(300 * (1.0 - 2.0 / 3) + 600 * (2.0 / 3)).toShort)
    assert(rs(2) == math.round(900 * (1.0 - 1.0 / 3) + 1200 * (1.0 / 3)).toShort)
    // constant signal → exactly constant at the new rate
    val const = Multimodal.encodeWavPcm16(8000, Array.fill(40)(-321: Short))
    val rec2 = Multimodal.MediaRecord(2L, "audio", const, 8000, 0, "wav", 0L)
    val out2 = Multimodal.resamplePcm(Seq(rec2).toDS(), 3000).collect().head
    val (_, rs2) = Multimodal.decodePcm16Mono(out2.bytes).get
    assert(rs2.length == 15 && rs2.forall(_ == -321))
    // at-or-below target rate: payload untouched
    val low = Multimodal.encodeWavPcm16(2000, Array.fill(10)(5: Short))
    val rec3 = Multimodal.MediaRecord(3L, "audio", low, 2000, 0, "wav", 0L)
    val out3 = Multimodal.resamplePcm(Seq(rec3).toDS(), 3000).collect().head
    assert(out3.bytes sameElements low)
    // non-WAV audio payloads fall back to the stub's byte decimation
    val rec4 = Multimodal.MediaRecord(4L, "audio", Array.fill(80)(1.toByte),
      8000, 0, "raw", 0L)
    val out4 = Multimodal.resamplePcm(Seq(rec4).toDS(), 2000).collect().head
    assert(out4.width == 2000 && out4.bytes.length == 20)
  }

  test("animated GIF: sequence write → exact frame count → strided sampling") {
    val gif = Multimodal.encodeGifFrames(4, 3, 5,
      (f, x, y) => (f * 40, x * 30, y * 50))
    assert(Multimodal.gifFrameCount(gif).contains(5))
    // single-frame GIF and non-GIF payloads
    val one = Multimodal.encodeGifFrames(2, 2, 1, (_, _, _) => (9, 9, 9))
    assert(Multimodal.gifFrameCount(one).contains(1))
    assert(Multimodal.gifFrameCount("nope".getBytes).isEmpty)
    // strided sampling: 5 frames every 2 → indices 0,2,4; 1 frame → 0;
    // non-GIF rows contribute nothing
    val df = Seq((1L, gif), (2L, one), (3L, "junk".getBytes))
      .toDF("media_id", "bytes")
    val rows = Multimodal.sampleGifFrames(df, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(rows.toSeq == Seq((1L, 5, 0), (1L, 5, 2), (1L, 5, 4), (2L, 1, 0)))
  }

  test("extractFeatures routes real formats to the decoded-feature kernel") {
    val wav = Multimodal.encodeWavPcm16(8000, Array[Short](16384, -16384))
    val rec = Multimodal.MediaRecord(7L, "audio", wav, 0, 0, "wav", 0L)
    val f = Multimodal.extractFeatures(Seq(rec).toDS()).collect().head
    assert(math.abs(f.feature(0) - 0.5f) < 1e-6) // energy = 2·0.25
    assert(f.feature(2) == 8000.0f && f.feature(4) == 2.0f)
    // raw payloads keep the conservation-checked stub
    val raw = Multimodal.MediaRecord(8L, "image", "abc".getBytes, 0, 0, "raw", 0L)
    val g = Multimodal.extractFeatures(Seq(raw).toDS()).collect().head
    val sum = "abc".getBytes.map(b => (b & 0xff) / 255.0f).sum
    assert(math.abs(g.feature.sum - sum) < 1e-5)
  }
}

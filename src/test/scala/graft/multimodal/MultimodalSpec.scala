package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def px(n: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate[Byte](n)(k => f(k).toByte)

  // ---- MediaCodec unit behavior (no Spark) --------------------------

  test("PPM encode/decode round-trips pixels and geometry") {
    val pixels = px(4 * 3 * 3)(k => k * 11)
    val dec = MediaCodec.decode(MediaCodec.encodePpm(4, 3, pixels))
    assert(dec.format == "ppm" && dec.width == 4 && dec.height == 3 && dec.nFrames == 1)
    assert(dec.pixels.toSeq == pixels.toSeq)
  }

  test("PPM header parser handles comments and multi-digit dims") {
    val pixels = px(12 * 10 * 3)(k => k)
    val withComment =
      ("P6\n# a comment line\n12 10\n# another\n255\n").getBytes("US-ASCII") ++ pixels
    val dec = MediaCodec.decode(withComment)
    assert(dec.width == 12 && dec.height == 10)
    assert(dec.pixels.toSeq == pixels.toSeq)
  }

  test("BMP decode normalizes bottom-up BGR rows to top-down RGB") {
    // 2x2: distinct channel values per pixel so row/channel swaps are visible
    val pixels = px(2 * 2 * 3)(k => k * 10 + 1)
    val dec = MediaCodec.decode(MediaCodec.encodeBmp(2, 2, pixels))
    assert(dec.format == "bmp" && dec.width == 2 && dec.height == 2)
    assert(dec.pixels.toSeq == pixels.toSeq) // full normalization round-trip
  }

  test("BMP rows are padded to 4-byte boundaries on disk") {
    // width 3 → row 9 bytes → stride 12; file = 54 + 2*12
    val bytes = MediaCodec.encodeBmp(3, 2, px(3 * 2 * 3)(identity))
    assert(bytes.length == 54 + 2 * 12)
    assert(MediaCodec.decode(bytes).pixels.length == 3 * 2 * 3)
  }

  test("concatenated PPM frames decode as one sequence") {
    val frame = px(2 * 2 * 3)(k => k * 7)
    val seq = MediaCodec.encodePpmSeq(2, 2, 3, frame ++ frame ++ frame)
    val dec = MediaCodec.decode(seq)
    assert(dec.format == "ppm-seq" && dec.nFrames == 3)
    assert(dec.pixels.length == 3 * 2 * 2 * 3)
  }

  test("frameDiffs: per-pixel mean abs diff; keyframes threshold exactly") {
    // three 1x2 frames: [10,10,10, 20,20,20] → [10,10,10, 20,20,20]
    // (identical, diff 0) → [74,74,74, 84,84,84] (uniform +64)
    val f1 = px(6)(k => if (k < 3) 10 else 20)
    val f3 = px(6)(k => if (k < 3) 74 else 84)
    val rec = Multimodal.MediaRecord(42L, "video/x-ppm-seq",
      MediaCodec.encodePpmSeq(1, 2, 3, f1 ++ f1 ++ f3),
      (MediaCodec.encodePpmSeq(1, 2, 3, f1 ++ f1 ++ f3)).length.toLong)
    val diffs = Multimodal.frameDiffs(Seq(rec).toDS()).collect().sortBy(_.frame_idx)
    assert(diffs.map(_.mean_abs_diff) ===
      Seq(None, Some(0.0), Some(64.0)), s"got ${diffs.toSeq}")
    val kf = Multimodal.keyframes(Seq(rec).toDS()
        .transform(Multimodal.frameDiffs).toDF(), threshold = 64.0)
      .orderBy(col("frame_idx"))
      .select("keyframe").collect().map(_.getBoolean(0)).toSeq
    // first frame always; identical frame never; the exact-threshold
    // frame keeps (>= is the contract)
    assert(kf === Seq(true, false, true))
  }

  test("corrupt payloads fail loudly per record") {
    intercept[IllegalArgumentException](MediaCodec.decode("GIF89a".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      MediaCodec.decode("P6\n4 4\n255\n12".getBytes("US-ASCII"))) // truncated raster
  }

  test("resizeNearest samples the integer-math grid") {
    // 4x4 → 2x2: output (x,y) samples source (x*4/2, y*4/2) = (2x, 2y)
    val src = px(4 * 4 * 3)(k => k)
    val out = MediaCodec.resizeNearest(src, 4, 4, 2, 2)
    for (y <- 0 until 2; x <- 0 until 2; c <- 0 until 3)
      assert(out((y * 2 + x) * 3 + c) == src(((2 * y) * 4 + 2 * x) * 3 + c))
  }

  test("WAV encode/decode round-trips rate, channels, and samples") {
    val samples = Array.tabulate[Short](2 * 5)(k => (k * 1000 - 3000).toShort)
    val dec = MediaCodec.decodeWav(MediaCodec.encodeWav(16000, 2, samples))
    assert(dec.sampleRate == 16000 && dec.nChannels == 2 && dec.nSamples == 5)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("WAV decoder skips foreign chunks before data") {
    // splice a LIST chunk between fmt and data, as real encoders do
    val base = MediaCodec.encodeWav(8000, 1, Array[Short](1, -2, 3))
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // RIFF size field must cover the insert
    val buf = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, spliced.length - 8)
    val dec = MediaCodec.decodeWav(spliced)
    assert(dec.samples.toSeq == Seq[Short](1, -2, 3))
  }

  test("WAV decoder rejects non-PCM and truncated payloads") {
    val good = MediaCodec.encodeWav(8000, 1, Array[Short](1, 2))
    intercept[IllegalArgumentException](MediaCodec.decodeWav(good.take(40)))
    val nonPcm = good.clone()
    nonPcm(20) = 3 // IEEE float format tag
    intercept[IllegalArgumentException](MediaCodec.decodeWav(nonPcm))
  }

  test("synthesizeAudio → decodeAudio recovers the formula features") {
    val d = Multimodal.decodeAudio(
      Multimodal.synthesizeAudio(Seq(0L, 1L, 7L).toDF("doc_id"), "doc_id"))
      .collect().map(r => r.media_id -> r).toMap
    for ((id, r) <- d) {
      assert(r.sample_rate == 8000 * (id % 3 + 1).toInt)
      assert(r.n_channels == (id % 2 + 1).toInt)
      assert(r.n_samples == (id % 50 + 10).toInt)
      val n = r.n_channels * r.n_samples
      var sum = 0L; var wsum = 0L
      for (k <- 0 until n) {
        val v = (id * 31 + k * 17) % 65536 - 32768
        sum += v; wsum += k.toLong * v
      }
      assert(r.checksum == sum && r.wchecksum == wsum, s"audio checksums for id $id")
    }
  }

  test("property: random geometries round-trip through every codec") {
    val rnd = new scala.util.Random(42) // deterministic
    for (_ <- 1 to 40) {
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(40) + 1
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val viaPpm = MediaCodec.decode(MediaCodec.encodePpm(w, h, px))
      assert((viaPpm.width, viaPpm.height) == (w, h) && viaPpm.pixels.toSeq == px.toSeq)
      val viaBmp = MediaCodec.decode(MediaCodec.encodeBmp(w, h, px))
      assert((viaBmp.width, viaBmp.height) == (w, h) && viaBmp.pixels.toSeq == px.toSeq,
        s"BMP round trip at ${w}x$h (stride padding)")
      val frames = rnd.nextInt(4) + 1
      val seqPx = Array.fill[Byte](frames * w * h * 3)(rnd.nextInt(256).toByte)
      val viaSeq = MediaCodec.decode(MediaCodec.encodePpmSeq(w, h, frames, seqPx))
      assert(viaSeq.nFrames == frames && viaSeq.pixels.toSeq == seqPx.toSeq)
      val nCh = rnd.nextInt(2) + 1
      val samples = Array.fill[Short](nCh * (rnd.nextInt(100) + 1))(rnd.nextInt(65536).toShort)
      val viaWav = MediaCodec.decodeWav(MediaCodec.encodeWav(8000, nCh, samples))
      assert(viaWav.nChannels == nCh && viaWav.samples.toSeq == samples.toSeq)
    }
  }

  // ---- Spark-side plumbing ------------------------------------------

  private val ids = Seq(0L, 1L, 2L, 5L, 7L, 11L).toDF("doc_id")
  private def synth = Multimodal.synthesize(ids, "doc_id")

  test("synthesize emits real encodings selected by id mod 3") {
    val m = synth.collect().map(r => r.media_id -> r).toMap
    assert(m(0L).payload.take(2).toSeq == "P6".getBytes.toSeq)
    assert(m(1L).payload.take(2).toSeq == "BM".getBytes.toSeq)
    assert(m(2L).media_type == "video/x-ppm-seq")
  }

  test("decode kernel parses actual bytes and detects format from magic") {
    val d = Multimodal.decode(synth).collect().map(r => r.media_id -> r).toMap
    // geometry is the synthesis formula, recovered by parsing
    for ((id, r) <- d) {
      assert(r.width == (id % 13 + 2).toInt && r.height == (id % 7 + 2).toInt)
      val expFrames = if (id % 3 == 2) (id % 4 + 1).toInt else 1
      assert(r.n_frames == expFrames)
      // pixel k = (id*7 + k*13) mod 256 over the normalized raster
      val n = expFrames * r.width * r.height * 3
      var sum = 0L; var wsum = 0L
      for (k <- 0 until n) {
        val v = (id * 7 + k * 13) % 256
        sum += v; wsum += k.toLong * v
      }
      assert(r.checksum == sum, s"checksum for id $id")
      assert(r.wchecksum == wsum, s"wchecksum for id $id (normalization)")
    }
    assert(d(1L).media_type == "bmp") // detected, not trusted from ingest
  }

  test("frameSample emits stride-spaced indices") {
    val d = Multimodal.decode(synth)
    // id 11: 11%3==2 → seq with 11%4+1 = 4 frames → stride 2 → [0, 2]
    val s = Multimodal.frameSample(d.toDF(), stride = 2)
      .filter(col("media_id") === 11L)
      .select("sampled_frames").as[Seq[Int]].collect().head
    assert(s == Seq(0, 2))
  }

  test("resize geometry matches resizePayload's actual output dims") {
    val resized = Multimodal.resizePayload(synth, maxDim = 8)
    val redecoded = Multimodal.decode(resized).collect().map(r => r.media_id -> r).toMap
    val planned = Multimodal.resize(Multimodal.decode(synth).toDF(), maxDim = 8)
      .select(col("media_id"), col("out_width"), col("out_height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    for ((id, r) <- redecoded)
      assert((r.width, r.height) == planned(id), s"dims for id $id")
  }

  test("resizePayload preserves frame count and nearest-neighbor pixels") {
    val big = Multimodal.synthesize(Seq(12L).toDF("doc_id"), "doc_id") // 14x7, PPM
    val before = MediaCodec.decode(big.collect().head.payload)
    val after = MediaCodec.decode(
      Multimodal.resizePayload(big, maxDim = 7).collect().head.payload)
    assert(after.nFrames == before.nFrames)
    assert(after.width == 7 && after.height == 3) // scale 0.5 → floor(14*.5), floor(7*.5)
    assert(after.pixels.toSeq ==
      MediaCodec.resizeNearest(before.pixels, 14, 7, 7, 3).toSeq)
  }

  test("ingest produces binary payloads with byte counts") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val m = Multimodal.ingest(docs, "doc_id", "text", "text/plain").collect().head
    assert(m.payload.toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(m.n_bytes == 3L && m.media_type == "text/plain")
  }

  // ---- RLE8 BMP (compressed) ----------------------------------------

  private val grayPalette: Array[Int] =
    Array.tabulate(256)(i => (i << 16) | (i << 8) | i)

  test("RLE8 round-trips runs, literals, and 255+ run splits") {
    // rows exercise every encoder mode: a long run (> 255, split), a
    // short literal stretch, and alternating values (absolute mode)
    val w = 300
    val h = 3
    val idx = new Array[Byte](w * h)
    java.util.Arrays.fill(idx, 0, w, 7.toByte)              // row 0: run of 300
    (0 until w).foreach(x => idx(w + x) = (x % 2).toByte)   // row 1: no runs
    java.util.Arrays.fill(idx, 2 * w, 2 * w + w, 9.toByte)  // row 2: run
    idx(2 * w) = 3; idx(2 * w + 1) = 4                      // …after 2 literals
    val dec = MediaCodec.decode(MediaCodec.encodeBmpRle8(w, h, idx, grayPalette))
    assert(dec.format == "bmp-rle8" && dec.width == w && dec.height == h)
    for (j <- 0 until w * h; c <- 0 until 3)
      assert(dec.pixels(j * 3 + c) == idx(j),
        s"pixel $j channel $c: ${dec.pixels(j * 3 + c)} != ${idx(j)}")
  }

  test("PNG encode/decode round-trips; n_bytes matches the closed form") {
    val w = 7; val h = 5
    val pixels = px(w * h * 3)(k => k * 13 + 7)
    val bytes = MediaCodec.encodePng(w, h, pixels)
    // 57 fixed + zlib(2 + 5*nblk + raw + 4), raw = h*(1+3w)
    val raw = h * (1 + 3 * w)
    assert(bytes.length == 57 + 2 + 5 * ((raw + 65534) / 65535) + raw + 4,
      s"got ${bytes.length}")
    val dec = MediaCodec.decode(bytes)
    assert(dec.format == "png" && dec.width == w && dec.height == h && dec.nFrames == 1)
    assert(dec.pixels.toSeq == pixels.toSeq)
  }

  test("PNG decoder handles the JDK's own encoder: real deflate, filters, RGB and RGBA") {
    val w = 23; val h = 17
    val pixels = px(w * h * 3)(k => k * 31 + 5)
    def viaImageIO(imageType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imageType)
      var i = 0
      while (i < w * h) {
        val r = pixels(i * 3) & 0xFF; val g = pixels(i * 3 + 1) & 0xFF
        val b = pixels(i * 3 + 2) & 0xFF
        img.setRGB(i % w, i / w, (0xFF << 24) | (r << 16) | (g << 8) | b)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // TYPE_INT_RGB → color type 2 (RGB); TYPE_INT_ARGB → color type 6
    // (RGBA, alpha dropped); both use zlib's REAL compressor and
    // whatever scanline filters the JDK encoder picks
    Seq(java.awt.image.BufferedImage.TYPE_INT_RGB,
      java.awt.image.BufferedImage.TYPE_INT_ARGB).foreach { t =>
      val dec = MediaCodec.decode(viaImageIO(t))
      assert(dec.format == "png" && dec.width == w && dec.height == h)
      assert(dec.pixels.toSeq == pixels.toSeq, s"imageType $t")
    }
  }

  test("PNG corruption fails loudly: bad CRC, truncation, unsupported shape") {
    val good = MediaCodec.encodePng(4, 3, px(36)(identity))
    val badCrc = good.clone(); badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0x7F).toByte
    intercept[IllegalArgumentException] { MediaCodec.decode(badCrc) }
    intercept[IllegalArgumentException] {
      MediaCodec.decode(java.util.Arrays.copyOf(good, good.length - 13))
    }
    // 16-bit depth is declared unsupported, not mis-decoded
    val deep = good.clone(); deep(24) = 16.toByte // IHDR bit-depth byte
    intercept[IllegalArgumentException] { MediaCodec.decode(deep) }
  }

  test("RLE8 compresses runs: encoded size ≪ raster for uniform images") {
    val w = 64; val h = 64
    val uniform = Array.fill[Byte](w * h)(42)
    val bytes = MediaCodec.encodeBmpRle8(w, h, uniform, grayPalette)
    // 1078 header/palette + per row one run pair + EOL = 4 bytes
    assert(bytes.length == 1078 + h * 4, s"got ${bytes.length}")
    assert(bytes.length < w * h, "run-length coding must beat the raster")
  }

  test("RLE8 decoder handles the delta escape (skipped pixels = index 0)") {
    // hand-crafted stream: run of 2 × idx 5, delta right 3 / up 1, run of
    // 1 × idx 8, EOB — bottom-up 6x3 canvas
    val w = 6; val h = 3
    val stream = Array[Byte](2, 5, 0, 2, 3, 1, 1, 8, 0, 1)
    val ref = MediaCodec.encodeBmpRle8(w, h, new Array[Byte](w * h), grayPalette)
    val crafted = java.util.Arrays.copyOf(ref, 1078 + stream.length)
    System.arraycopy(stream, 0, crafted, 1078, stream.length)
    // patch biSizeImage and file size to the crafted stream
    val bb = java.nio.ByteBuffer.wrap(crafted).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(2, crafted.length); bb.putInt(34, stream.length)
    val dec = MediaCodec.decode(crafted)
    // bottom-up: stream row 0 = image row h-1
    def px(x: Int, yBottomUp: Int) = dec.pixels(((h - 1 - yBottomUp) * w + x) * 3)
    assert(px(0, 0) == 5 && px(1, 0) == 5)  // the run
    assert(px(5, 1) == 8)                    // after delta (+3 x, +1 row)
    assert(px(2, 0) == 0 && px(3, 0) == 0,  "delta-skipped pixels default to 0")
  }

  test("RLE8 fails loudly on truncated or overflowing streams") {
    val ok = MediaCodec.encodeBmpRle8(4, 2, new Array[Byte](8), grayPalette)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(java.util.Arrays.copyOf(ok, ok.length - 3))
    }
    // a run past the row end must not write out of bounds
    val overflow = java.util.Arrays.copyOf(ok, 1078 + 4)
    val bb = java.nio.ByteBuffer.wrap(overflow).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(2, overflow.length); bb.putInt(34, 4)
    overflow(1078) = 50.toByte; overflow(1079) = 1 // 50 pixels into a 4-wide row
    overflow(1080) = 0; overflow(1081) = 1
    intercept[IllegalArgumentException] { MediaCodec.decode(overflow) }
  }

  test("synthesized RLE8 BMPs decode to the canonical raster formula") {
    // d=4: d%3==1 (BMP), d%2==0 → RLE8; w=6, h=6
    val rec = Multimodal.synthesize(Seq(4L).toDF("doc_id"), "doc_id").collect().head
    assert(rec.media_type == "image/bmp-rle8")
    val dec = MediaCodec.decode(rec.payload)
    assert(dec.format == "bmp-rle8")
    for (k <- 0 until dec.pixels.length)
      assert((dec.pixels(k) & 0xff) == ((4 * 7 + k * 13) % 256),
        s"decoded pixel $k diverges from the formula")
    // compressed length ≠ raster length (and ≠ the uncompressed BMP size)
    assert(rec.n_bytes != dec.pixels.length && rec.n_bytes != 54 + 6 * ((6 * 3 + 3) / 4 * 4))
  }

  test("decodeFrames: frame-intensity signal drives scene detection, batch AND stream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 6 constant-intensity frames: dark dark BRIGHT BRIGHT dark BRIGHT
    val levels = Seq(10, 20, 200, 210, 15, 225)
    val (w, h) = (4, 2)
    val frameLen = w * h * 3
    val pixels = levels.flatMap(v => Array.fill(frameLen)(v.toByte)).toArray
    val payload = MediaCodec.encodePpmSeq(w, h, levels.size, pixels)
    val media = Seq(Multimodal.MediaRecord(7L, "ppm-seq", payload, payload.length.toLong)).toDS()
    val frames = Multimodal.decodeFrames(media)
    val means = frames.orderBy("frame_idx").collect().map(_.mean_intensity)
    assert(means.toSeq == levels.map(_.toDouble), means.toSeq.toString)
    // BATCH: luminance > 128 is "activity" — boundaries at the crossings
    val b = graft.operators.Scenes.boundaries(
      frames.toDF(), Seq("media_id"), "frame_idx", Seq.empty,
      when(col("mean_intensity") > 128, 1).otherwise(0))
      .collect().map(r => (r.getAs[Int]("frame_idx"), r.getAs[String]("scene_state")))
    assert(b.toSeq == Seq((2, "start"), (4, "end"), (5, "start")))
    // STREAM: the same decode kernel inside a micro-batch, boundaries out
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Multimodal.MediaRecord]
    val events = Multimodal.decodeFrames(mem.toDS()).map(f =>
      graft.streaming.Streaming.EventRow(f.media_id, f.frame_idx.toLong, "frame", f.mean_intensity))
    val q = graft.streaming.Streaming.sceneDetect(events,
      activityOf = e => if (e.value > 128) 1L else 0L)
      .writeStream.format("memory").queryName("mm_scenes").outputMode("append").start()
    try {
      mem.addData(Multimodal.MediaRecord(7L, "ppm-seq", payload, payload.length.toLong))
      q.processAllAvailable()
      val s = spark.table("mm_scenes").collect()
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[String]("scene_state"))).sorted
      assert(s.toSeq == Seq((2L, "start"), (4L, "end"), (5L, "start")), s.toSeq.toString)
    } finally q.stop()
  }
}

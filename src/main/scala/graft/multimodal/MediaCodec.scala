package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM byte-level image codecs: binary PPM (P6), 24-bit uncompressed
  * BMP, and a multi-frame "video" as concatenated P6 frames. No native
  * deps, fully deterministic — the real decode kernels behind the
  * multimodal operators (the reference treats camera topics as opaque
  * payloads; these give the engine an honest decode path to batch over).
  *
  * Formats are the published ones: PPM per the Netpbm P6 spec (ASCII
  * header `P6 <w> <h> <maxval>` with `#` comments, one whitespace byte,
  * then w*h RGB triplets); BMP per the Windows BITMAPINFOHEADER layout
  * (14-byte file header, 40-byte DIB header, little-endian fields,
  * bottom-up BGR rows padded to 4 bytes). The decoder normalizes both to
  * top-down RGB so downstream features are format-independent.
  */
object MediaCodec {

  /** A decoded media item: `pixels` is frames*width*height RGB triplets in
    * top-down row-major order, frames concatenated — format-normalized.
    */
  final case class Decoded(format: String, width: Int, height: Int,
                           nFrames: Int, pixels: Array[Byte])

  // ---- encoders -----------------------------------------------------

  /** Binary PPM (P6). `pixels` = w*h RGB triplets, top-down row-major. */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"PPM pixel buffer ${pixels.length} != ${width}x${height}x3")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Multi-frame sequence: concatenated P6 frames sharing one geometry.
    * `pixels` = nFrames*w*h*3 bytes, frame-major.
    */
  def encodePpmSeq(width: Int, height: Int, nFrames: Int,
                   pixels: Array[Byte]): Array[Byte] = {
    val frameLen = width * height * 3
    require(pixels.length == nFrames * frameLen,
      s"sequence buffer ${pixels.length} != $nFrames frames of $frameLen")
    val bos = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      bos.write(encodePpm(width, height,
        java.util.Arrays.copyOfRange(pixels, f * frameLen, (f + 1) * frameLen)))
      f += 1
    }
    bos.toByteArray
  }

  /** 24-bit uncompressed BMP. Input pixels are top-down RGB; the encoder
    * writes the on-disk convention: bottom-up rows, BGR channel order,
    * each row zero-padded to a 4-byte boundary.
    */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"BMP pixel buffer ${pixels.length} != ${width}x${height}x3")
    val stride = (width * 3 + 3) / 4 * 4
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putInt(0)        // reserved
    buf.putInt(54)       // pixel data offset
    // BITMAPINFOHEADER
    buf.putInt(40)
    buf.putInt(width)
    buf.putInt(height)   // positive = bottom-up
    buf.putShort(1)      // planes
    buf.putShort(24)     // bpp
    buf.putInt(0)        // BI_RGB (no compression)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)       // palette
    var y = height - 1   // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        buf.put(pixels(p + 2)).put(pixels(p + 1)).put(pixels(p)) // BGR
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** PNG (RFC 2083 / ISO 15948), 8-bit RGB, non-interlaced. The encoder
    * writes STORED deflate blocks (zlib framing with uncompressed block
    * headers) and filter 0 on every scanline — a fully conformant PNG
    * any reader opens, whose byte size is a CLOSED FORM of the geometry
    * (8 signature + 25 IHDR + 12+zlib IDAT + 12 IEND, zlib = 2 + 5·nblk
    * + raw + 4 with raw = h·(1+3w)) so the decode oracle can predict
    * n_bytes. The DECODER is general: any deflate stream (Inflater),
    * all five scanline filters, RGB and RGBA (alpha dropped to the
    * top-down RGB raster convention), multi-IDAT, CRC-verified — it
    * round-trips the JDK's own ImageIO encoder, not just this one.
    */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"PNG pixel buffer ${pixels.length} != ${width}x${height}x3")
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val body = typ.getBytes(StandardCharsets.US_ASCII) ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    chunk("IHDR", ihdr)
    // raw scanline stream: filter byte 0 + RGB row, zlib-wrapped as
    // stored blocks (deterministic framing, Inflater-compatible)
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      System.arraycopy(pixels, y * width * 3, raw, y * (1 + width * 3) + 1, width * 3)
      y += 1
    }
    val zlib = new ByteArrayOutputStream()
    zlib.write(0x78); zlib.write(0x01) // zlib header, no preset dict
    var off = 0
    while (off < raw.length || raw.isEmpty && off == 0) {
      val n = math.min(65535, raw.length - off)
      val last = off + n >= raw.length
      zlib.write(if (last) 1 else 0)
      zlib.write(n & 0xFF); zlib.write((n >> 8) & 0xFF)
      zlib.write(~n & 0xFF); zlib.write((~n >> 8) & 0xFF)
      zlib.write(raw, off, n)
      off += n
      if (last) off = raw.length + 1 // exit (handles the empty-raster edge)
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    zlib.write(ByteBuffer.allocate(4).putInt(adler.getValue.toInt).array())
    chunk("IDAT", zlib.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def decodePng(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 &&
      (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G',
      "not a PNG signature")
    var pos = 8
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, s"truncated PNG chunk header at $pos")
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated PNG chunk at $pos")
      val typ = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      val stored = ByteBuffer.wrap(bytes, pos + 8 + len, 4).getInt
      require(crc.getValue.toInt == stored, s"PNG $typ chunk CRC mismatch")
      typ match {
        case "IHDR" =>
          val b = ByteBuffer.wrap(bytes, pos + 8, len)
          width = b.getInt; height = b.getInt
          bitDepth = b.get() & 0xFF; colorType = b.get() & 0xFF
          val interlace = { b.get(); b.get(); b.get() & 0xFF }
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth")
          require(colorType == 2 || colorType == 6,
            s"unsupported PNG color type $colorType (RGB/RGBA only)")
          require(interlace == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0, "PNG IHDR missing or degenerate")
    val bpp = if (colorType == 6) 4 else 3
    val stride = width * bpp
    val rawLen = height * (1 + stride)
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        require(n > 0 || inf.finished(), "PNG deflate stream stalled")
        got += n
      }
    } finally inf.end()
    require(got == rawLen, s"PNG pixel stream short: $got of $rawLen")
    // undo per-scanline filters in place (spec §6: Sub/Up/Average/Paeth
    // operate on the FILTERED bytes of prior pixels already reconstructed)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val img = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xFF
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= bpp) img(rowOut + x - bpp) & 0xFF else 0
        val up = if (y > 0) img(rowOut - stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) img(rowOut - stride + x - bpp) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        img(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // normalize to the top-down RGB raster (drop alpha)
    val rgb =
      if (bpp == 3) img
      else {
        val o = new Array[Byte](width * height * 3)
        var i = 0
        while (i < width * height) {
          o(i * 3) = img(i * 4); o(i * 3 + 1) = img(i * 4 + 1); o(i * 3 + 2) = img(i * 4 + 2)
          i += 1
        }
        o
      }
    Decoded("png", width, height, 1, rgb)
  }

  /** 8-bit palettized BMP with BI_RLE8 compression (the published
    * Windows RLE8 scheme: run pairs `(count, index)`, escape 0x00 with
    * 0x00=end-of-line, 0x01=end-of-bitmap, 0x02=delta, 0x03..0xFF=
    * absolute literal segments padded to a word boundary; rows bottom-up).
    *
    * `indices` are top-down row-major palette indices; `palette` is up to
    * 256 packed 0xRRGGBB ints. Encoder policy (deterministic, so an
    * oracle can predict the byte size): maximal runs of ≥ 3 equal bytes
    * become run pairs (split at 255); shorter stretches accumulate as
    * literals and flush as one absolute segment when ≥ 3 long, else as
    * 1-length run pairs. Every row ends with EOL except the last, which
    * ends with EOB.
    */
  def encodeBmpRle8(width: Int, height: Int, indices: Array[Byte],
                    palette: Array[Int]): Array[Byte] = {
    require(indices.length == width * height,
      s"RLE8 index buffer ${indices.length} != ${width}x$height")
    require(palette.length <= 256, s"palette too large: ${palette.length}")
    val data = new ByteArrayOutputStream()
    var y = height - 1 // bottom-up: last image row first in the stream
    while (y >= 0) {
      val row = y * width
      var x = 0
      val lit = new ByteArrayOutputStream()
      def flushLiterals(): Unit = {
        val bytes = lit.toByteArray
        if (bytes.length >= 3) {
          data.write(0); data.write(bytes.length)
          data.write(bytes, 0, bytes.length)
          if ((bytes.length & 1) == 1) data.write(0) // word-align
        } else {
          bytes.foreach { b => data.write(1); data.write(b & 0xff) }
        }
        lit.reset()
      }
      while (x < width) {
        var run = 1
        while (x + run < width && indices(row + x + run) == indices(row + x)) run += 1
        if (run >= 3) {
          flushLiterals()
          var left = run
          while (left > 0) {
            val n = math.min(left, 255)
            data.write(n); data.write(indices(row + x) & 0xff)
            left -= n
          }
        } else {
          var i = 0
          while (i < run) {
            lit.write(indices(row + x + i) & 0xff)
            if (lit.size() == 255) flushLiterals()
            i += 1
          }
        }
        x += run
      }
      flushLiterals()
      data.write(0); data.write(if (y == 0) 1 else 0) // EOB on last row, else EOL
      y -= 1
    }
    val rle = data.toByteArray
    val dataOff = 14 + 40 + 256 * 4
    val buf = ByteBuffer.allocate(dataOff + rle.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(dataOff + rle.length)
    buf.putInt(0)
    buf.putInt(dataOff)
    buf.putInt(40)
    buf.putInt(width)
    buf.putInt(height)     // bottom-up is MANDATORY for RLE bitmaps
    buf.putShort(1)
    buf.putShort(8)        // bpp
    buf.putInt(1)          // BI_RLE8
    buf.putInt(rle.length) // biSizeImage (required when compressed)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)       // biClrUsed = 0 (2^bpp), biClrImportant
    var i = 0
    while (i < 256) {       // BGRA palette entries
      val rgb = if (i < palette.length) palette(i) else 0
      buf.put((rgb & 0xff).toByte)
        .put(((rgb >> 8) & 0xff).toByte)
        .put(((rgb >> 16) & 0xff).toByte)
        .put(0.toByte)
      i += 1
    }
    buf.put(rle)
    buf.array()
  }

  // ---- decoder ------------------------------------------------------

  /** Sniff the magic bytes and decode. "P6" → PPM (one frame or a
    * concatenated sequence), "BM" → BMP. Throws IllegalArgumentException
    * on anything else or on malformed/truncated payloads — a corrupt blob
    * in a 100 TB corpus must fail loudly per record, not poison a batch.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 2, "payload too short to sniff")
    if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') decodePng(bytes)
    else (bytes(0).toChar, bytes(1).toChar) match {
      case ('P', '6') => decodePpmSeq(bytes)
      case ('B', 'M') => decodeBmp(bytes)
      case (a, b) => throw new IllegalArgumentException(
        s"unknown media magic '$a$b' (${bytes(0)},${bytes(1)})")
    }
  }

  /** One or more concatenated P6 frames; all frames must share geometry. */
  private def decodePpmSeq(bytes: Array[Byte]): Decoded = {
    var pos = 0
    var width = -1
    var height = -1
    var frames = 0
    val bos = new ByteArrayOutputStream()
    while (pos < bytes.length) {
      val (w, h, dataStart) = parsePpmHeader(bytes, pos)
      if (width < 0) { width = w; height = h }
      else require(w == width && h == height,
        s"frame $frames geometry ${w}x$h differs from ${width}x$height")
      val frameLen = w * h * 3
      require(dataStart + frameLen <= bytes.length,
        s"truncated PPM frame $frames: need ${dataStart + frameLen}, have ${bytes.length}")
      bos.write(bytes, dataStart, frameLen)
      frames += 1
      pos = dataStart + frameLen
    }
    require(frames > 0, "empty PPM payload")
    Decoded(if (frames == 1) "ppm" else "ppm-seq", width, height, frames, bos.toByteArray)
  }

  /** Parse a P6 header starting at `off`: magic, then three ASCII ints
    * (width, height, maxval) separated by whitespace, `#` comments run to
    * end-of-line, and exactly ONE whitespace byte after maxval before the
    * raster (per the Netpbm spec — a raster byte may itself look like
    * whitespace).
    */
  private def parsePpmHeader(bytes: Array[Byte], off: Int): (Int, Int, Int) = {
    require(off + 2 <= bytes.length && bytes(off) == 'P' && bytes(off + 1) == '6',
      s"not a P6 header at offset $off")
    var pos = off + 2
    def skipSpaceAndComments(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      require(pos > start, s"expected ASCII integer at offset $start")
      new String(bytes, start, pos - start, StandardCharsets.US_ASCII).toInt
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval > 0 && maxval < 256, s"unsupported PPM maxval $maxval (8-bit only)")
    require(pos < bytes.length && bytes(pos).toChar.isWhitespace,
      "P6 header must end with a single whitespace byte")
    pos += 1 // the single separator byte; raster starts here
    require(w > 0 && h > 0, s"bad PPM geometry ${w}x$h")
    (w, h, pos)
  }

  /** BMP → top-down RGB. 24-bit uncompressed (BI_RGB, bottom-up or
    * top-down, padded rows) and 8-bit palettized RLE-compressed
    * (BI_RLE8) files both normalize to the same top-down RGB raster.
    */
  private def decodeBmp(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (bpp == 8 && compression == 1) return decodeBmpRle8(bytes)
    require(bpp == 24, s"unsupported BMP bpp $bpp (24-bit or RLE8 only)")
    require(compression == 0, s"unsupported BMP compression $compression (BI_RGB only)")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad BMP geometry ${width}x$rawHeight")
    val stride = (width * 3 + 3) / 4 * 4
    require(dataOff + stride * height <= bytes.length,
      s"truncated BMP: need ${dataOff + stride * height}, have ${bytes.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var x = 0
      while (x < width) {
        val s = dataOff + srcRow * stride + x * 3
        val d = (y * width + x) * 3
        out(d) = bytes(s + 2)     // R
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Decoded("bmp", width, height, 1, out)
  }

  /** BI_RLE8 BMP → top-down RGB via the palette. Implements the full
    * published escape set — run pairs, absolute segments (word-aligned),
    * end-of-line, end-of-bitmap, and delta (skipped pixels keep index 0)
    * — and fails loudly on truncation or row overflow: genuine
    * DECOMPRESSION, the variable-length path the fixed-stride formats
    * don't exercise.
    */
  private def decodeBmpRle8(bytes: Array[Byte]): Decoded = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val headerSize = buf.getInt(14)
    val width = buf.getInt(18)
    val height = buf.getInt(22) // positive (bottom-up) is mandatory for RLE
    require(width > 0 && height > 0, s"bad RLE8 BMP geometry ${width}x$height")
    val clrUsed = buf.getInt(46)
    val nColors = if (clrUsed == 0) 256 else clrUsed
    val palOff = 14 + headerSize
    require(palOff + nColors * 4 <= bytes.length, "truncated RLE8 palette")
    // palette entries are (B, G, R, reserved)
    val palR = new Array[Byte](nColors)
    val palG = new Array[Byte](nColors)
    val palB = new Array[Byte](nColors)
    var c = 0
    while (c < nColors) {
      palB(c) = bytes(palOff + c * 4)
      palG(c) = bytes(palOff + c * 4 + 1)
      palR(c) = bytes(palOff + c * 4 + 2)
      c += 1
    }
    // decode the escape stream into a bottom-up index raster
    val idx = new Array[Byte](width * height) // zero-filled: delta-skipped pixels
    var x = 0
    var row = 0 // bottom-up row counter
    var pos = dataOff
    var done = false
    def put(v: Byte): Unit = {
      require(x < width && row < height, s"RLE8 overflow at row $row x $x")
      idx(row * width + x) = v
      x += 1
    }
    while (!done) {
      require(pos + 2 <= bytes.length, s"truncated RLE8 stream at $pos")
      val b0 = bytes(pos) & 0xff
      val b1 = bytes(pos + 1) & 0xff
      pos += 2
      if (b0 > 0) {                       // run: b0 copies of index b1
        var i = 0
        while (i < b0) { put(b1.toByte); i += 1 }
      } else b1 match {
        case 0 => x = 0; row += 1         // end of line
        case 1 => done = true             // end of bitmap
        case 2 =>                         // delta: skip right/up
          require(pos + 2 <= bytes.length, "truncated RLE8 delta")
          x += bytes(pos) & 0xff
          row += bytes(pos + 1) & 0xff
          pos += 2
        case n =>                         // absolute: n literal indices
          require(pos + n <= bytes.length, "truncated RLE8 absolute segment")
          var i = 0
          while (i < n) { put(bytes(pos + i)); i += 1 }
          pos += n + (n & 1)              // word-aligned
      }
    }
    // map indices through the palette to a TOP-DOWN RGB raster
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y
      var xx = 0
      while (xx < width) {
        val i = idx(srcRow * width + xx) & 0xff
        require(i < nColors, s"RLE8 index $i outside $nColors-color palette")
        val d = (y * width + xx) * 3
        out(d) = palR(i); out(d + 1) = palG(i); out(d + 2) = palB(i)
        xx += 1
      }
      y += 1
    }
    Decoded("bmp-rle8", width, height, 1, out)
  }

  // ---- audio: WAV / 16-bit PCM --------------------------------------

  /** Decoded audio: interleaved 16-bit samples ([L R L R …] for stereo);
    * `nSamples` is per-channel frame count.
    */
  final case class DecodedAudio(sampleRate: Int, nChannels: Int,
                                nSamples: Int, samples: Array[Short])

  /** Canonical 44-byte RIFF/WAVE header + 16-bit little-endian PCM data.
    * `samples` are interleaved; length must be a multiple of nChannels.
    */
  def encodeWav(sampleRate: Int, nChannels: Int, samples: Array[Short]): Array[Byte] = {
    require(nChannels > 0 && samples.length % nChannels == 0,
      s"interleaved sample count ${samples.length} not a multiple of $nChannels channels")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)                       // PCM fmt chunk size
    buf.putShort(1)                      // audio format: PCM
    buf.putShort(nChannels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * nChannels * 2) // byte rate
    buf.putShort((nChannels * 2).toShort)  // block align
    buf.putShort(16)                     // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF/WAVE → interleaved 16-bit PCM. Walks the chunk list (a real
    * producer may insert LIST/INFO chunks before data), accepts only
    * PCM 16-bit, and fails loudly on anything else.
    */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int) = new String(bytes, off, 4, StandardCharsets.US_ASCII)
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      s"not a RIFF/WAVE payload: '${fourcc(0)}'/'${fourcc(8)}'")
    var pos = 12
    var sampleRate = -1
    var nChannels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourcc(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"truncated WAV chunk '$id' at $pos: size $size")
      id match {
        case "fmt " =>
          val fmt = buf.getShort(pos + 8)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          nChannels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          require(bits == 16, s"unsupported WAV bit depth $bits (16-bit only)")
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => () // skip foreign chunks (LIST, INFO, …)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && nChannels > 0, "WAV missing fmt chunk")
    require(dataOff >= 0, "WAV missing data chunk")
    require(dataLen % (nChannels * 2) == 0,
      s"WAV data size $dataLen not aligned to $nChannels-channel 16-bit frames")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(dataOff + i * 2); i += 1 }
    DecodedAudio(sampleRate, nChannels, n / nChannels, out)
  }

  // ---- pixel ops ----------------------------------------------------

  /** Nearest-neighbor resize of one top-down RGB frame: output pixel
    * (x, y) samples source (x*w/ow, y*h/oh) — integer arithmetic, no fp.
    */
  def resizeNearest(pixels: Array[Byte], w: Int, h: Int,
                    ow: Int, oh: Int): Array[Byte] = {
    require(pixels.length == w * h * 3, "resize input buffer mismatch")
    require(ow > 0 && oh > 0, s"bad resize target ${ow}x$oh")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val s = (sy * w + sx) * 3
        val d = (y * ow + x) * 3
        out(d) = pixels(s); out(d + 1) = pixels(s + 1); out(d + 2) = pixels(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}

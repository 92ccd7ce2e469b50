package graft.plans

/** Pure-JVM codecs for two PUBLIC uncompressed image containers — PPM
  * (P5/P6, the netpbm formats) and 24-bit uncompressed BMP — so the
  * multimodal pipeline's decode step is REAL for these formats and the
  * deterministic byte-fold stand-in survives only for containers this
  * sandbox genuinely cannot decode (no JPEG/PNG/FFmpeg libs here).
  *
  * Everything is exact integer arithmetic:
  *  - RGB → luma uses the BT.601 integer form ⌊(299r+587g+114b+500)/1000⌋,
  *    which is EXACTLY the identity on gray pixels (r=g=b=t ⇒ t) — the
  *    property [[graft.operators.Multimodal.attachBinary]] leans on to
  *    keep the DuckDB oracles byte-exact through an encode→decode
  *    round-trip;
  *  - BMP rows are bottom-up and padded to 4 bytes; the decoder emits
  *    top-down row-major gray, handling negative (top-down) heights.
  *
  * Decoders REJECT (return None) rather than guess: wrong magic, 16-bit
  * PPM maxval, compressed/paletted BMP, truncated data, or absurd
  * dimensions (> 10⁸ pixels) all fall through to the caller's stand-in
  * path. One documented fidelity bound: PNM samples with maxval < 255
  * are used UNSCALED (a display-accurate decoder multiplies by
  * 255/maxval) — hash/feature consumers here only need determinism,
  * and the in-repo encoder always writes maxval 255. Reference basis:
  * netpbm's published P6 grammar and the BITMAPINFOHEADER layout —
  * public formats, no library involved.
  */
object ImageCodec {

  /** Decoded grayscale image: top-down row-major, one byte per pixel. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  private val MaxPixels = 100000000L // 10^8: phash60-safe, OOM-safe

  /** Decode a recognized container to grayscale; None if unrecognized
    * or malformed (the caller keeps its byte-strip stand-in). */
  def decode(bytes: Array[Byte]): Option[GrayImage] = {
    if (bytes == null || bytes.length < 2) return None
    (bytes(0), bytes(1)) match {
      case ('P', '6') => decodePnm(bytes, channels = 3)
      case ('P', '5') => decodePnm(bytes, channels = 1)
      case ('B', 'M') => decodeBmp(bytes)
      case (a, b) if (a & 0xff) == 0xff && (b & 0xff) == 0xd8 =>
        JpegCodec.decode(bytes) // baseline sequential JPEG (r14)
      case _ => None
    }
  }

  /** Decoded gray pixels when the payload is a recognized image
    * container, the INPUT BYTES UNCHANGED otherwise — the total form
    * the columnar pipelines use: decodable media hash real pixels,
    * anything else keeps the documented byte-strip stand-in. */
  def decodeGrayOrSelf(bytes: Array[Byte]): Array[Byte] =
    decode(bytes).map(_.pixels).getOrElse(bytes)

  /** Encode a gray buffer as a REAL binary P6 (r=g=b per pixel). The
    * shape is the largest d ∈ {4,3,2,1} dividing the length (h=d,
    * w=len/d) so the row-major pixel stream IS the input byte stream —
    * no padding, exact round-trip through [[decode]]. Empty input
    * encodes as a 0×1 image (header only). */
  def encodePpmGray(gray: Array[Byte]): Array[Byte] = {
    val len = gray.length
    val h = if (len == 0) 1
      else if (len % 4 == 0) 4 else if (len % 3 == 0) 3
      else if (len % 2 == 0) 2 else 1
    val w = len / h
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * len)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < len) {
      val b = gray(i)
      val o = header.length + 3 * i
      out(o) = b; out(o + 1) = b; out(o + 2) = b
      i += 1
    }
    out
  }

  /** Encode a gray buffer as a REAL 24-bit uncompressed BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows padded to
    * 4 bytes, BGR with b=g=r per pixel — the published layout
    * [[decodeBmp]] parses). Same shape rule as [[encodePpmGray]]
    * (h = largest d ∈ {4,3,2,1} dividing the length), so
    * decode ∘ encode == the input bytes EXACTLY (BT.601 integer luma
    * is the identity on gray). Empty input yields a header-only w=0
    * container that [[decode]] rejects by design — callers needing
    * empty-payload round-trips use PPM, which encodes 0×1. */
  def encodeBmpGray(gray: Array[Byte]): Array[Byte] = {
    val len = gray.length
    val h = if (len == 0) 1
      else if (len % 4 == 0) 4 else if (len % 3 == 0) 3
      else if (len % 2 == 0) 2 else 1
    val w = len / h
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    def p32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >>> 24) & 0xff).toByte
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, size)       // file size
    p32(10, 54)        // pixel data offset
    p32(14, 40)        // BITMAPINFOHEADER size
    p32(18, w); p32(22, h)
    p16(26, 1)         // planes
    p16(28, 24)        // bits per pixel
    p32(30, 0)         // BI_RGB, uncompressed
    p32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      val dst = 54 + rowBytes * (h - 1 - y) // rows stored bottom-up
      var x = 0
      while (x < w) {
        val b = gray(y * w + x)
        val o = dst + 3 * x
        out(o) = b; out(o + 1) = b; out(o + 2) = b
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- netpbm (P5 gray / P6 RGB, binary, maxval <= 255) ---------------

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Read the next decimal token after the cursor, skipping whitespace
    * and `#`-to-EOL comments (the published netpbm grammar). Returns
    * (value, position AFTER the token) or None. */
  private def token(bytes: Array[Byte], from: Int): Option[(Long, Int)] = {
    var i = from
    var guard = true
    while (guard && i < bytes.length) {
      if (isSpace(bytes(i))) i += 1
      else if (bytes(i) == '#') {
        while (i < bytes.length && bytes(i) != '\n') i += 1
      } else guard = false
    }
    if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9') return None
    var v = 0L
    while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
      v = v * 10 + (bytes(i) - '0')
      if (v > Int.MaxValue) return None
      i += 1
    }
    Some((v, i))
  }

  private def decodePnm(bytes: Array[Byte], channels: Int): Option[GrayImage] =
    for {
      (w, p1) <- token(bytes, 2)
      (h, p2) <- token(bytes, p1)
      (maxval, p3) <- token(bytes, p2)
      if maxval >= 1 && maxval <= 255 // 2-byte samples rejected
      if w >= 0 && h >= 1 && w * h <= MaxPixels
      // exactly ONE whitespace byte between maxval and the raster
      if p3 < bytes.length || w * h == 0
      if w * h == 0 || isSpace(bytes(p3))
      data = p3 + 1
      if bytes.length - data >= w * h * channels
    } yield {
      val n = (w * h).toInt
      val px = new Array[Byte](n)
      var i = 0
      if (channels == 1) System.arraycopy(bytes, data, px, 0, n)
      else while (i < n) {
        val o = data + 3 * i
        val r = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val b = bytes(o + 2) & 0xff
        px(i) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
        i += 1
      }
      GrayImage(w.toInt, h.toInt, px)
    }

  // ---- BMP (BITMAPINFOHEADER, 24-bit, uncompressed) --------------------

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def decodeBmp(bytes: Array[Byte]): Option[GrayImage] = {
    if (bytes.length < 54) return None
    val dataOffset = le32(bytes, 10)
    val dibSize = le32(bytes, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER etc. not supported
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw.toLong)
    val bits = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (bits != 24 || compression != 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOffset < 54 ||
        bytes.length.toLong - dataOffset < rowBytes.toLong * h) return None
    val px = new Array[Byte]((w * h).toInt)
    var row = 0
    while (row < h) {
      // stored bottom-up unless the height was negative
      val src = dataOffset +
        rowBytes * (if (topDown) row else (h - 1 - row).toInt)
      var x = 0
      while (x < w) {
        val o = src + 3 * x // BMP stores BGR
        val b = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        px(row * w + x) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
        x += 1
      }
      row += 1
    }
    Some(GrayImage(w, h.toInt, px))
  }
}

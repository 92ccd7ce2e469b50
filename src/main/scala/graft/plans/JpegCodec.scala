package graft.plans

/** Pure-JVM BASELINE SEQUENTIAL JPEG codec (ITU-T T.81) — the last
  * real-world container whose decode step was a byte-fold stand-in.
  * Public-spec basis only: the T.81 marker grammar and entropy coding
  * (Annex F), the canonical Huffman construction (Annex C), the Annex
  * K example luminance tables, and the JFIF APP0 layout. No library
  * involved; the JDK's ImageIO appears ONLY in the test suite as an
  * independent reference decoder/encoder.
  *
  * Decoder scope (reject-don't-guess, the [[ImageCodec]] discipline —
  * anything outside returns None and the caller keeps its documented
  * stand-in): baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
  * components, sampling factors 1..2 (nearest-neighbor upsample),
  * 8-bit quantization tables, restart intervals honored; progressive
  * (SOF2), arithmetic coding, 12-bit, 16-bit DQT, hierarchical, and
  * truncated streams all reject. Output is top-down gray: Y directly
  * for 1-component scans; JFIF YCbCr→RGB then the repo's exact
  * integer BT.601 luma for 3-component (matching what the PPM/BMP
  * paths produce for gray pixels).
  *
  * Encoder: grayscale baseline (1 component), ALL-ONES quantization —
  * the distortion floor of the format: the only loss left is DCT
  * coefficient rounding, so decode(encode(g)) is within ±2 of g per
  * pixel (spec-pinned, and cross-pinned against ImageIO). The shape
  * rule matches [[ImageCodec.encodePpmGray]] (largest d ∈ {4,3,2,1}
  * dividing the length), so the mm gate oracles can recompute the
  * dims from the text byte length alone. Entropy-coded LENGTH is
  * content-dependent (Huffman) — which is exactly why the JPEG gate
  * pins dims, not byte_len.
  *
  * Determinism: DCT/IDCT run in IEEE-754 doubles from a fixed cosine
  * table — bit-identical on every JVM; a production decoder would
  * swap the O(64²) textbook transform for AAN, which changes speed,
  * not the contract. */
object JpegCodec {
  import ImageCodec.GrayImage

  private val MaxPixels = 100000000L // 10^8 — same bound as ImageCodec

  /** Zigzag position k → natural (row-major) coefficient index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private final class Reject(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new Reject(msg)

  // ---- Huffman (T.81 Annex C construction, F.16 decode) -------------

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    require(bits.length == 16 && bits.sum == vals.length,
      "huffman spec: counts must equal value count")
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    // encoder side: code + length per symbol value
    val code: Array[Int] = new Array[Int](256)
    val size: Array[Int] = new Array[Int](256)
    // canonical code assignment (T.81 C.2); a plain method call keeps
    // the parser from gluing a bare block onto the preceding `new`
    buildCodes()
    private def buildCodes(): Unit = {
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = c
        var i = 0
        while (i < bits(l - 1)) {
          val sym = vals(k) & 0xff
          code(sym) = c; size(sym) = l
          c += 1; k += 1; i += 1
        }
        maxCode(l) = if (bits(l - 1) > 0) c - 1 else -1
        c <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var c = br.nextBit()
      var l = 1
      while (c > maxCode(l)) {
        l += 1
        if (l > 16) fail("invalid huffman code")
        c = (c << 1) | br.nextBit()
      }
      vals(valPtr(l) + c - minCode(l)) & 0xff
    }
  }

  // ---- entropy-coded segment reader (FF-stuffing, RST markers) ------

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) fail("truncated entropy stream")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) fail("truncated after ff")
          val m = data(pos) & 0xff; pos += 1
          if (m != 0x00) fail(f"marker ff$m%02x inside entropy data")
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      if (pos + 1 >= data.length) fail("truncated at restart")
      if ((data(pos) & 0xff) != 0xff ||
          (data(pos + 1) & 0xff) != (0xd0 + (n % 8)))
        fail("missing restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---- decoder -------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = null
    var acTab: HuffTable = null
    var pred: Int = 0
    var plane: Array[Byte] = null // bw*8 x bh*8 samples
    var planeW: Int = 0
  }

  /** Decode a baseline JPEG to grayscale; None when the payload is
    * not a JPEG this decoder's scope covers (or malformed/truncated).
    * TOTAL on arbitrary bytes — every internal rejection is caught. */
  def decode(bytes: Array[Byte]): Option[GrayImage] =
    try decode0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decode0(bytes: Array[Byte]): Option[GrayImage] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4) // zigzag-order tables
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    def u16(p: Int): Int = {
      if (p + 1 >= bytes.length) fail("truncated segment length")
      ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    }
    while (i < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) fail("expected marker")
      while (i < bytes.length && (bytes(i) & 0xff) == 0xff) i += 1
      if (i >= bytes.length) fail("truncated at marker")
      val marker = bytes(i) & 0xff; i += 1
      def seglen(p: Int): Int = {
        val l = u16(p)
        if (l < 2) fail("degenerate segment length")
        l
      }
      marker match {
        case 0xd9 => return None // EOI before any scan decoded
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => () // standalone
        case 0xdb => // DQT
          val len = u16(i); val end = i + len
          var p = i + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0) fail("16-bit quant table out of scope")
            if (tq > 3 || p + 65 > end) fail("bad DQT")
            quant(tq) = Array.tabulate(64)(k => bytes(p + 1 + k) & 0xff)
            p += 65
          }
          i = end
        case 0xc4 => // DHT
          val len = u16(i); val end = i + len
          var p = i + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) fail("bad DHT class/id")
            if (p + 17 > end) fail("truncated DHT")
            val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
            val n = bits.sum
            if (n == 0 || n > 256 || p + 17 + n > end) fail("bad DHT counts")
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          i = end
        case 0xc0 => // SOF0 — baseline sequential
          val len = u16(i)
          if ((bytes(i + 2) & 0xff) != 8) fail("only 8-bit precision")
          h = u16(i + 3); w = u16(i + 5)
          val nc = bytes(i + 7) & 0xff
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels)
            fail("absurd dimensions")
          if (nc != 1 && nc != 3) fail("1 or 3 components only")
          comps = Array.tabulate(nc) { c =>
            val p = i + 8 + 3 * c
            val comp = Component(bytes(p) & 0xff,
              (bytes(p + 1) & 0xff) >> 4, bytes(p + 1) & 0x0f,
              bytes(p + 2) & 0xff)
            if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2)
              fail("sampling factors 1..2 only")
            if (comp.tq > 3) fail("bad quant id")
            comp
          }
          i += len
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          fail("non-baseline SOF out of scope") // progressive etc.
        case 0xdd => // DRI
          restartInterval = u16(i + 2); i += seglen(i)
        case 0xda => // SOS — decode the (single, baseline) scan
          if (comps == null) fail("SOS before SOF0")
          val len = u16(i)
          val ns = bytes(i + 2) & 0xff
          if (ns != comps.length) fail("partial scans out of scope")
          var p = i + 3
          var k = 0
          while (k < ns) {
            val cs = bytes(p) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(fail("unknown comp"))
            val td = (bytes(p + 1) & 0xff) >> 4
            val ta = bytes(p + 1) & 0x0f
            comp.dcTab = dcTabs(td); comp.acTab = acTabs(ta)
            if (comp.dcTab == null || comp.acTab == null ||
              quant(comp.tq) == null) fail("missing table")
            p += 2; k += 1
          }
          i += len
          val img = decodeScan(bytes, i, comps, quant, w, h,
            restartInterval)
          return Some(img)
        case 0xc8 => fail("JPG extension out of scope")
        case _ => // APPn / COM / anything skippable with a length
          i += seglen(i)
      }
    }
    fail("no scan")
  }

  private def decodeScan(bytes: Array[Byte], start: Int,
      comps: Array[Component], quant: Array[Array[Int]], w: Int, h: Int,
      restartInterval: Int): GrayImage = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Byte](c.planeW * mcusY * c.v * 8)
      c.pred = 0
    }
    val br = new BitReader(bytes, start)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstN = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstN); rstN += 1
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      comps.foreach { c =>
        val q = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = c.dcTab.decode(br)
            if (t > 11) fail("bad DC category")
            c.pred += extend(br.receive(t), t)
            coef(0) = c.pred * q(0)
            // AC
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = c.acTab.decode(br)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 else done = true // ZRL | EOB
              } else {
                k += r
                if (k > 63) fail("AC index overflow")
                coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                k += 1
              }
            }
            // IDCT (textbook separable double transform — deterministic)
            var y0 = 0
            while (y0 < 8) {
              var x0 = 0
              while (x0 < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) {
                  var v = 0
                  while (v < 8) {
                    val f = coef(v * 8 + u)
                    if (f != 0)
                      acc += Cu(u) * Cu(v) * f * Cos(u)(x0) * Cos(v)(y0)
                    v += 1
                  }
                  u += 1
                }
                val px = math.round(acc / 4.0).toInt + 128
                val clamped = if (px < 0) 0 else if (px > 255) 255 else px
                val gx = (mx * c.h + bx) * 8 + x0
                val gy = (my * c.v + by) * 8 + y0
                c.plane(gy * c.planeW + gx) = clamped.toByte
                x0 += 1
              }
              y0 += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
    // assemble gray output: 1-comp Y is gray; 3-comp YCbCr → RGB
    // (JFIF) → the repo's exact integer BT.601 luma
    val pixels = new Array[Byte](w * h)
    if (comps.length == 1) {
      val c = comps(0)
      var y0 = 0
      while (y0 < h) {
        System.arraycopy(c.plane, y0 * c.planeW, pixels, y0 * w, w)
        y0 += 1
      }
    } else {
      val (cy, cb, cr) = (comps(0), comps(1), comps(2))
      var y0 = 0
      while (y0 < h) {
        var x0 = 0
        while (x0 < w) {
          def sample(c: Component): Int = {
            val sx = x0 * c.h / hmax
            val sy = y0 * c.v / vmax
            c.plane(sy * c.planeW + sx) & 0xff
          }
          val yy = sample(cy).toDouble
          val pb = sample(cb) - 128.0
          val pr = sample(cr) - 128.0
          def clamp(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = clamp(yy + 1.402 * pr)
          val g = clamp(yy - 0.344136 * pb - 0.714136 * pr)
          val b = clamp(yy + 1.772 * pb)
          pixels(y0 * w + x0) =
            ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
          x0 += 1
        }
        y0 += 1
      }
    }
    GrayImage(w, h, pixels)
  }

  // ---- encoder (grayscale baseline, all-ones quantization) ----------

  // T.81 Annex K example luminance tables (public spec constants).
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  private lazy val encDc = new HuffTable(DcBits, DcVals)
  private lazy val encAc = new HuffTable(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, size: Int): Unit = {
      var s = size - 1
      while (s >= 0) {
        buf = (buf << 1) | ((code >> s) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        s -= 1
      }
    }
    def flush(): Unit = // pad to byte boundary with 1-bits (T.81 F.1.2.3)
      if (cnt > 0) { val r = 8 - cnt; put((1 << r) - 1, r) }
  }

  private def category(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a gray buffer as a REAL baseline grayscale JPEG (same
    * shape rule as [[ImageCodec.encodePpmGray]]: h = largest d ∈
    * {4,3,2,1} dividing the length, w = len/h — so dims are a pure
    * function of the byte length, the property the gate oracles
    * recompute). All-ones quantization: the only loss is coefficient
    * rounding (±2/pixel, spec-pinned). Empty input yields a 0×1
    * header [[decode]] rejects by design (the BMP convention). */
  def encodeJpegGray(gray: Array[Byte]): Array[Byte] = {
    val len = gray.length
    val h = if (len == 0) 1
      else if (len % 4 == 0) 4 else if (len % 3 == 0) 3
      else if (len % 2 == 0) 2 else 1
    val w = len / h
    // SOF0 stores dims as u16 — a longer buffer would silently
    // truncate the written width to w mod 65536 while the entropy
    // data is built from the true w: a structurally valid but corrupt
    // stream, violating the codec's reject-don't-guess discipline
    // (r14 advice). Fail loudly instead.
    require(w <= 65535 && h <= 65535,
      s"encodeJpegGray: ${len}B buffer shapes to ${w}x$h, which " +
        "overflows JPEG's u16 SOF dimensions — split the payload")
    val out = new java.io.ByteArrayOutputStream(len + 1024)
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    // SOI, JFIF APP0
    b(0xff); b(0xd8)
    b(0xff); b(0xe0); u16(16)
    "JFIF".getBytes("US-ASCII").foreach(x => b(x))
    b(0); b(1); b(1); b(0); u16(1); u16(1); b(0); b(0)
    // DQT: table 0, all ones
    b(0xff); b(0xdb); u16(2 + 65); b(0x00)
    (0 until 64).foreach(_ => b(1))
    // SOF0: 8-bit, h x w, 1 component (id 1, 1x1 sampling, table 0)
    b(0xff); b(0xc0); u16(11); b(8); u16(h); u16(w); b(1)
    b(1); b(0x11); b(0)
    // DHT: DC class 0 id 0, AC class 1 id 0 (Annex K luminance)
    b(0xff); b(0xc4); u16(2 + 17 + DcVals.length + 17 + AcVals.length)
    b(0x00); DcBits.foreach(b); DcVals.foreach(x => b(x))
    b(0x10); AcBits.foreach(b); AcVals.foreach(x => b(x))
    // SOS
    b(0xff); b(0xda); u16(8); b(1); b(1); b(0x00); b(0); b(63); b(0)
    // entropy-coded data
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val zz = new Array[Int](64)
    var pred = 0
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    var byi = 0
    while (byi < blocksY) {
      var bxi = 0
      while (bxi < blocksX) {
        // load block with edge replication, level-shifted
        var y0 = 0
        while (y0 < 8) {
          val sy = math.min(byi * 8 + y0, h - 1)
          var x0 = 0
          while (x0 < 8) {
            val sx = math.min(bxi * 8 + x0, w - 1)
            block(y0 * 8 + x0) =
              (if (len == 0) 0 else gray(sy * w + sx) & 0xff) - 128.0
            x0 += 1
          }
          y0 += 1
        }
        // FDCT + quantize(1) into zigzag order
        var k = 0
        while (k < 64) {
          val nat = Zigzag(k)
          val u = nat % 8
          val v = nat / 8
          var acc = 0.0
          var y1 = 0
          while (y1 < 8) {
            var x1 = 0
            while (x1 < 8) {
              acc += block(y1 * 8 + x1) * Cos(u)(x1) * Cos(v)(y1)
              x1 += 1
            }
            y1 += 1
          }
          zz(k) = math.round(Cu(u) * Cu(v) * acc / 4.0).toInt
          k += 1
        }
        // DC
        val diff = zz(0) - pred
        pred = zz(0)
        val s = category(diff)
        bw.put(encDc.code(s), encDc.size(s))
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC with ZRL/EOB
        var run = 0
        k = 1
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) {
              bw.put(encAc.code(0xf0), encAc.size(0xf0)); run -= 16
            }
            val sa = category(zz(k))
            val rs = (run << 4) | sa
            bw.put(encAc.code(rs), encAc.size(rs))
            bw.put(if (zz(k) < 0) zz(k) + (1 << sa) - 1 else zz(k), sa)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(encAc.code(0x00), encAc.size(0x00)) // EOB
        bxi += 1
      }
      byi += 1
    }
    bw.flush()
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }
}

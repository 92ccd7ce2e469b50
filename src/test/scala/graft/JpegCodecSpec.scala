package graft

import graft.plans.{ImageCodec, JpegCodec}

/** The JPEG codec is validated against the JDK's ImageIO (the
  * com.sun.imageio baseline JPEG plugin — an INDEPENDENT T.81
  * implementation that ships with Java SE, used here as a test-only
  * reference; production code never touches it): our encoder's output
  * must decode identically-dimensioned and near-identical-pixel in
  * BOTH decoders, and streams ImageIO encodes (grayscale and 4:2:0
  * color, real quant tables) must decode in ours within the small
  * cross-implementation IDCT tolerance. Plus totality fuzz and
  * scope-rejection (progressive). */
class JpegCodecSpec extends SparkSpec {

  private def imageioDecodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      val oneBand = img.getRaster.getNumBands == 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // 1-band: raw Y samples — getRGB would push gray through a
          // linear-gray→sRGB color transform and distort mid-tones
          out(y * w + x) =
            if (oneBand) img.getRaster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              val (r, g, b) =
                ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
              (299 * r + 587 * g + 114 * b + 500) / 1000
            }
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
  }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  private def px(img: ImageCodec.GrayImage): Array[Int] =
    img.pixels.map(_ & 0xff)

  test("round-trip: decode(encode(gray)) exact dims, pixels within the all-ones-quant floor") {
    val rnd = new scala.util.Random(42)
    for (len <- Seq(1, 7, 64, 96, 1000, 4096, 5003)) {
      val gray = Array.fill(len)(rnd.nextInt(256).toByte)
      val jpg = JpegCodec.encodeJpegGray(gray)
      val dec = JpegCodec.decode(jpg).getOrElse(fail(s"rejected own output len=$len"))
      val h = if (len % 4 == 0) 4 else if (len % 3 == 0) 3
        else if (len % 2 == 0) 2 else 1
      assert(dec.width == len / h && dec.height == h,
        s"dims ${dec.width}x${dec.height} for len=$len")
      val d = maxDiff(px(dec), gray.map(_ & 0xff))
      assert(d <= 2, s"round-trip error $d > 2 at len=$len")
    }
  }

  test("ImageIO decodes our encoder's stream and agrees with our decoder") {
    val rnd = new scala.util.Random(7)
    val gray = Array.fill(4096)(rnd.nextInt(256).toByte)
    val jpg = JpegCodec.encodeJpegGray(gray)
    val (w, h, ref) = imageioDecodeGray(jpg).getOrElse(
      fail("ImageIO rejected our stream — not a valid baseline JPEG"))
    val ours = JpegCodec.decode(jpg).get
    assert((w, h) == (ours.width, ours.height))
    assert(maxDiff(ref, px(ours)) <= 1,
      "cross-decoder disagreement beyond IDCT rounding")
    // the dispatch integration point: ImageCodec routes FFD8 to us
    assert(ImageCodec.decode(jpg).map(_.width).contains(w))
  }

  test("our decoder handles ImageIO-encoded grayscale (real quant tables)") {
    val w = 120; val h = 45
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(11)
    var base = 0
    for (y <- 0 until h; x <- 0 until w) {
      if (x % 16 == 0) base = rnd.nextInt(200) // blocky + noisy mix
      val v = math.min(255, base + (x % 16) * 3 + y % 7)
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    val ours = JpegCodec.decode(bytes).getOrElse(fail("rejected ImageIO gray"))
    assert((ours.width, ours.height) == (w, h))
    val (_, _, ref) = imageioDecodeGray(bytes).get
    assert(maxDiff(ref, px(ours)) <= 2,
      "gray decode diverges from the reference decoder")
  }

  test("our decoder handles ImageIO-encoded 4:2:0 color within upsample tolerance") {
    val w = 64; val h = 48
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) { // smooth gradient: bounds the
      // nearest-vs-fancy chroma upsample difference between decoders
      val r = x * 255 / (w - 1); val g = y * 255 / (h - 1); val b = 128
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    val ours = JpegCodec.decode(bytes).getOrElse(fail("rejected ImageIO color"))
    assert((ours.width, ours.height) == (w, h))
    val (_, _, ref) = imageioDecodeGray(bytes).get
    assert(maxDiff(ref, px(ours)) <= 4,
      "color decode diverges beyond chroma-upsample tolerance")
  }

  test("progressive JPEG rejects to None (scope honesty, not a crash)") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 32).foreach(i => img.getRaster.setSample(i, i, 0, 200))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    val bytes = bos.toByteArray
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)) != null, "fixture invalid")
    assert(JpegCodec.decode(bytes).isEmpty,
      "progressive stream must reject, not guess")
  }

  test("decode is total on arbitrary bytes (seeded fuzz, FFD8-prefixed included)") {
    val rnd = new scala.util.Random(1234)
    var decoded = 0
    for (i <- 0 until 500) {
      val len = 2 + rnd.nextInt(300)
      val buf = Array.fill(len)(rnd.nextInt(256).toByte)
      if (i % 2 == 0) { buf(0) = 0xff.toByte; buf(1) = 0xd8.toByte }
      if (JpegCodec.decode(buf).isDefined) decoded += 1 // must not throw
    }
    assert(decoded == 0, "random bytes decoded as a valid JPEG")
    // truncations of a REAL stream must also reject, never throw
    val jpg = JpegCodec.encodeJpegGray(Array.fill(256)(99.toByte))
    for (cut <- 2 until jpg.length by 7)
      JpegCodec.decode(java.util.Arrays.copyOf(jpg, cut))
  }

  test("empty payload encodes a rejected 0-width frame (the BMP convention)") {
    val jpg = JpegCodec.encodeJpegGray(Array.empty[Byte])
    assert(JpegCodec.decode(jpg).isEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Multimodal

/** The codec seam: encode→decode round trip against the generator's
  * closed form, plus decode of an image the generator did NOT produce
  * (so the codec is proven general, not co-designed with the fixture).
  */
class MultimodalSpec extends AnyFunSuite {

  test("PNG round trip matches the closed form for 200 ids") {
    (0L until 200L).foreach { id =>
      val (w, h, sum) = Multimodal.decodePng(Multimodal.syntheticPng(id))
      assert(w == (8 + id % 9).toInt, s"width id=$id")
      assert(h == (8 + (id * 7) % 9).toInt, s"height id=$id")
      val expected = (0 until w * h).map(i => (id * 31 + i) % 256).sum
      assert(sum == expected, s"pix_sum id=$id")
    }
  }

  test("decodePng handles a foreign (RGB, non-synthetic) image") {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 15).foreach(i => img.setRGB(i % 5, i / 5, i * 0x010101))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, sum) = Multimodal.decodePng(bos.toByteArray)
    assert(w == 5 && h == 3)
    // band-0 (red) samples are 0..14 for the 0x010101-scaled pixels
    assert(sum == (0 until 15).sum)
  }

  test("resizeNN matches the closed-form NN index map for 100 ids") {
    (0L until 100L).foreach { id =>
      val (w, h, thumb) = Multimodal.resizeNN(Multimodal.syntheticPng(id), 8, 8)
      assert(thumb.length == 64)
      (0 until 64).foreach { ti =>
        val (tx, ty) = (ti % 8, ti / 8)
        val exp = (id * 31 + (ty * h / 8) * w + (tx * w / 8)) % 256
        assert(thumb(ti) == exp.toInt, s"id=$id ti=$ti")
      }
    }
  }

  test("WAV round trip matches the closed form for 200 ids") {
    (0L until 200L).foreach { id =>
      val st = Multimodal.decodeWav(Multimodal.syntheticWav(id))
      val ns = 16 + id % 241
      assert(st.nSamples == ns, s"n_samples id=$id")
      assert(st.sampleRate == 8000 + (id % 5) * 4000, s"rate id=$id")
      val samples = (0L until ns).map(i => (id * 31 + i * 7) % 65536 - 32768)
      assert(st.peak == samples.map(math.abs).max, s"peak id=$id")
      assert(st.sumAbs == samples.map(math.abs).sum, s"sum_abs id=$id")
    }
  }

  test("decodeWav handles a foreign (big-endian, stereo) WAV-family blob") {
    // AIFF-style big-endian stereo frames through the same AudioSystem
    // seam: 2 channels x 3 frames, samples +/-1000, 2000, 3000
    val samples = Array[Short](1000, -1000, 2000, -2000, 3000, -3000)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = ((v >> 8) & 0xff).toByte
      data(2 * i + 1) = (v & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 2, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 3L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val st = Multimodal.decodeWav(bos.toByteArray)
    assert(st.nSamples == 6) // channel-interleaved samples all count
    assert(st.sampleRate == 44100L)
    assert(st.peak == 3000L)
    assert(st.sumAbs == 12000L)
  }

  test("decodeImage sniffs the container and decodes both formats") {
    // the SAME seam, no format hint: synthetic PNG decodes exactly,
    // synthetic JPEG within DC-quantization tolerance
    (1L to 50L).foreach { id =>
      val (pfmt, pw, ph, ppx) = Multimodal.decodeImage(
        Multimodal.syntheticPng(id))
      assert(pfmt == "png")
      val w = (8 + id % 9).toInt; val h = (8 + (id * 7) % 9).toInt
      assert((pw, ph) == ((w, h)))
      assert(ppx.map(_.toLong).sum ==
        (0 until w * h).map(i => (id * 31 + i) % 256).sum)
      val (jfmt, jw, jh, jpx) = Multimodal.decodeImage(
        Multimodal.syntheticJpeg(id))
      assert(jfmt == "jpeg")
      assert((jw, jh) == ((w, h)))
      val g = ((id * 31) % 256).toInt
      assert(jpx.forall(p => math.abs(p - g) <= 8),
        s"id=$id g=$g worst=${jpx.map(p => math.abs(p - g)).max}")
    }
  }

  test("decodeImage handles a foreign JPEG (explicit low quality, non-synthetic encoder path)") {
    // encode a constant 16x16 raster at quality 0.5 through the raw
    // ImageWriter API — different code path and quant tables than
    // syntheticJpeg's ImageIO.write default
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 256).foreach(i => img.getRaster.setSample(i % 16, i / 16, 0, 99))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.5f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val (fmt, w, h, px) = Multimodal.decodeImage(bos.toByteArray)
    assert(fmt == "jpeg" && w == 16 && h == 16)
    assert(px.forall(p => math.abs(p - 99) <= 8),
      s"worst=${px.map(p => math.abs(p - 99)).max}")
  }

  test("decodeImage sniffs foreign containers it was never tuned for (BMP, TIFF, GIF)") {
    // more containers through the SAME seam: the reader is discovered
    // from the bytes, so containers the pipeline has never shipped
    // must decode with zero code changes. All are lossless — the
    // raster must round-trip EXACTLY, unlike the JPEG tolerance. GIF
    // exercises the palette-indexed path: its raster holds palette
    // INDICES, so the seam must resolve through the color model.
    Seq("bmp", "tiff", "gif").foreach { container =>
      val w = 13; val h = 7
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until w * h).foreach(i =>
        img.getRaster.setSample(i % w, i / w, 0, (i * 37 + 5) % 256))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, container, bos),
        s"JDK has no $container writer")
      val (fmt, dw, dh, px) = Multimodal.decodeImage(bos.toByteArray)
      assert(fmt.contains(container.stripSuffix("f")) || fmt == container,
        s"sniffed '$fmt' for $container")
      assert((dw, dh) == ((w, h)))
      assert(px.toSeq == (0 until w * h).map(i => (i * 37 + 5) % 256),
        s"$container raster did not round-trip exactly")
    }
  }

  test("decodeImage preserves non-indexed multi-band and deep rasters (gray+alpha, 16-bit, color)") {
    // Only palette-indexed rasters may resolve through getRGB; every
    // other image must read raw raster samples. getRGB would (a) apply
    // the CS_GRAY linear->sRGB transfer curve to gray+alpha pixels and
    // (b) clamp 16-bit samples to 8 — both silent corruptions on
    // public-seam inputs none of the synthetic fixtures exercise.
    val w = 11; val h = 5

    // gray+alpha PNG: 2 bands, band 0 = gray, band 1 = alpha
    val cs = java.awt.color.ColorSpace.getInstance(
      java.awt.color.ColorSpace.CS_GRAY)
    val gaCm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val gaRaster = gaCm.createCompatibleWritableRaster(w, h)
    val gaImg = new java.awt.image.BufferedImage(gaCm, gaRaster, false, null)
    (0 until w * h).foreach { i =>
      gaRaster.setSample(i % w, i / w, 0, (i * 37 + 5) % 256)
      gaRaster.setSample(i % w, i / w, 1, 128 + i % 100) // alpha, ignored
    }
    val gaBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gaImg, "png", gaBos))
    val (gaFmt, gaW, gaH, gaPx) = Multimodal.decodeImage(gaBos.toByteArray)
    assert(gaFmt == "png" && (gaW, gaH) == ((w, h)))
    assert(gaPx.toSeq == (0 until w * h).map(i => (i * 37 + 5) % 256),
      "gray+alpha gray band must round-trip exactly (no sRGB curve)")

    // 16-bit gray PNG: samples far above 255 must survive undamaged
    val deep = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    (0 until w * h).foreach(i =>
      deep.getRaster.setSample(i % w, i / w, 0, (i * 4001 + 300) % 65536))
    val dBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(deep, "png", dBos))
    val (_, _, _, dPx) = Multimodal.decodeImage(dBos.toByteArray)
    assert(dPx.toSeq == (0 until w * h).map(i => (i * 4001 + 300) % 65536),
      "16-bit samples must not clamp to 8-bit")

    // 3-band color: BT.601 over LOGICAL bands 0..2 (R,G,B) even though
    // the buffer layout is BGR
    val rgb = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until w * h).foreach { i =>
      val r = (i * 53) % 256; val g = (i * 31 + 7) % 256; val b = (i * 11 + 99) % 256
      rgb.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
    }
    val cBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgb, "png", cBos))
    val (_, _, _, cPx) = Multimodal.decodeImage(cBos.toByteArray)
    val expected = (0 until w * h).map { i =>
      val r = (i * 53) % 256; val g = (i * 31 + 7) % 256; val b = (i * 11 + 99) % 256
      if (r == g && g == b) r else (r * 299 + g * 587 + b * 114 + 500) / 1000
    }
    assert(cPx.toSeq == expected, "BT.601 luma over logical RGB bands")
  }

  test("resizeNN upsamples a foreign image (2x2 -> 4x4 block replication)") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array(10, 20, 30, 40)
    (0 until 4).foreach(i => img.getRaster.setSample(i % 2, i / 2, 0, vals(i)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, thumb) = Multimodal.resizeNN(bos.toByteArray, 4, 4)
    val expected = Array(
      10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40)
    assert(thumb.sameElements(expected), thumb.mkString(","))
  }
}

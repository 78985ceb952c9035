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
}

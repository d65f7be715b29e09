package graft.multimodal

import graft.SparkSpec

/** The encode→decode→exact-aggregate loop behind q_multimodal_decode:
  * SynthMedia renders closed-form pixels/samples into real containers,
  * the Codec integer-stat decoders must recover the closed-form sums
  * EXACTLY (the property the DuckDB oracle asserts analytically), and
  * the PNG encoder is independently witnessed by ImageIO. */
class SynthMediaSpec extends SparkSpec {
  import spark.implicits._

  private def closedFormImage(id: Long): (Long, Long, Long, Long) = {
    val w = SynthMedia.widthOf(id); val h = SynthMedia.heightOf(id)
    var sb = 0L; var sg = 0L; var sr = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sb += SynthMedia.blue(id, x, y)
      sg += SynthMedia.green(id, x, y)
      sr += SynthMedia.red(id, x, y)
    }
    (w.toLong * h, sb, sg, sr)
  }

  private def closedFormWav(id: Long): (Long, Long, Long, Long) = {
    val n = SynthMedia.nSamplesOf(id)
    var sq = 0L; var cross = 0L; var peak = 0L
    for (i <- 0 until n) {
      val s = SynthMedia.sample(id, i)
      sq += s.toLong * s
      peak = math.max(peak, math.abs(s.toLong))
      if (i >= 1 && (s < 0) != (SynthMedia.sample(id, i - 1) < 0)) cross += 1
    }
    (n.toLong, sq, cross, peak)
  }

  test("decoded integer aggregates equal the closed-form formulas, every modality") {
    for (id <- 0L until 28L) {
      val (mod, payload) = SynthMedia.forId(id)
      mod match {
        case "wav" =>
          val st = Codec.statsPcm16(payload)
          assert(st != null, s"id=$id wav must parse")
          val (n, sq, cross, peak) = closedFormWav(id)
          assert((st.nSamples, st.sumSq, st.crossings, st.peakRaw.toLong) ===
            ((n, sq, cross, peak)), s"id=$id wav stats")
        case "gif" =>
          // gray ramp: every channel sum equals the b-formula sum
          val st = Codec.statsGif(payload)
          assert(st != null, s"id=$id gif must parse")
          val (n, sb, _, _) = closedFormImage(id)
          assert((st.nPixels, st.sumB, st.sumG, st.sumR) === ((n, sb, sb, sb)),
            s"id=$id gif channel sums")
          assert(st.sumA === 255L * n, "no transparency -> fully opaque")
        case _ =>
          val st = if (mod == "bmp") Codec.statsBmp24(payload) else Codec.statsPng(payload)
          assert(st != null, s"id=$id $mod must parse")
          val (n, sb, sg, sr) = closedFormImage(id)
          assert((st.nPixels, st.sumB, st.sumG, st.sumR) === ((n, sb, sg, sr)),
            s"id=$id $mod channel sums")
          assert(st.maxVal === 255)
      }
    }
  }

  test("GIF encoder is witnessed by ImageIO pixel-for-pixel; interlace + transparency decode") {
    val id = 3L // id%4==3 -> gif
    val (_, payload) = SynthMedia.forId(id)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO must accept the synthesized GIF")
    assert(img.getWidth === SynthMedia.widthOf(id))
    assert(img.getHeight === SynthMedia.heightOf(id))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = SynthMedia.blue(id, x, y)
      assert((img.getRGB(x, y) & 0xff) === v, s"gray@$x,$y")
    }
    // interlaced emission decodes to the SAME pixels (4-pass inverse)
    val w = SynthMedia.widthOf(id); val h = SynthMedia.heightOf(id)
    val inter = SynthMedia.encodeGifGray(w, h,
      (x, y) => SynthMedia.blue(id, x, y), interlace = true)
    val stP = Codec.statsGif(payload); val stI = Codec.statsGif(inter)
    assert(stI === stP, "interlace must not change the decoded sums")
    val gridP = ImageHash.lumaGridGif(payload)
    val gridI = ImageHash.lumaGridGif(inter)
    assert(gridP != null && gridP.toSeq === gridI.toSeq,
      "interlace must not move pixels (grid is position-sensitive)")
    // GCE transparency: the marked gray level zeroes its pixels' alpha
    val trans = SynthMedia.encodeGifGray(w, h,
      (x, y) => SynthMedia.blue(id, x, y), transparentIdx = SynthMedia.blue(id, 0, 0))
    val stT = Codec.statsGif(trans)
    assert(stT != null && stT.sumA < 255L * stT.nPixels,
      "transparent index must reduce the alpha sum")
    assert((stT.sumB, stT.sumG, stT.sumR) === ((stP.sumB, stP.sumG, stP.sumR)),
      "transparency must not change the color sums")
  }

  test("PNG encoder is witnessed by ImageIO pixel-for-pixel") {
    val id = 5L // id%4==1 -> png
    val (mod, payload) = SynthMedia.forId(id)
    assert(mod === "png")
    assert(payload.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "payload must carry the PNG signature (not another format)")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "ImageIO must accept the synthesized PNG")
    assert(img.getWidth === SynthMedia.widthOf(id))
    assert(img.getHeight === SynthMedia.heightOf(id))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === SynthMedia.red(id, x, y), s"r@$x,$y")
      assert(((rgb >> 8) & 0xff) === SynthMedia.green(id, x, y), s"g@$x,$y")
      assert((rgb & 0xff) === SynthMedia.blue(id, x, y), s"b@$x,$y")
    }
  }

  test("decodeStats dataset plumbing: unrecognized payloads filter to null aggregates") {
    val media = Seq(
      DecodeStub.MediaRow(1L, "bmp", SynthMedia.forId(0L)._2),
      DecodeStub.MediaRow(2L, "junk", Array[Byte](1, 2, 3)),
      DecodeStub.MediaRow(3L, "wav", SynthMedia.forId(2L)._2)).toDS()
    val rows = DecodeStub.decodeStats(media).collect().sortBy(_.media_id)
    assert(rows(0).n_units.isDefined && rows(2).n_units.isDefined)
    assert(rows(1).n_units.isEmpty && rows(1).s0.isEmpty)
    assert(rows(1).n_bytes === 3)
  }
}

package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal 24-bit BMP: 54-byte header + padded BGR rows, bottom-up. */
  private def bmp(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val total = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {
      val row = new Array[Byte](rowBytes)
      for (x <- 0 until w) {
        val (r, g, bl) = pixels(y)(x)
        row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
      }
      b.put(row)
    }
    b.array()
  }

  private def gray(v: Int): (Int, Int, Int) = (v, v, v)

  /** 18x16 horizontal gradient (2 source pixels per grid cell), with an
    * optional one-cell brightness bump to perturb a few hash bits. */
  private def gradient(bumpAt: Option[(Int, Int)] = None): Array[Byte] = {
    val px = Array.tabulate(16, 18) { (y, x) =>
      val bump = bumpAt.exists { case (bx, by) =>
        x / 2 == bx && y / 2 == by }
      gray(math.min(255, x * 14 + (if (bump) 200 else 0)))
    }
    bmp(px.map(_.toArray))
  }

  test("dHash: deterministic, gradient-structured, invariant to global brightness") {
    val g = gradient()
    val h1 = ImageHash.dHash64(g)
    val h2 = ImageHash.dHash64(gradient())
    assert(h1 != null && h1 == h2, "same image must hash identically")
    // a pure left-to-right brightening gradient: every cell is darker
    // than its right neighbor -> all 64 gradient bits are 0
    assert(h1.longValue() === 0L)
    // global brightness shift preserves every gradient bit
    val brighter = bmp(Array.tabulate(16, 18)((y, x) =>
      gray(math.min(255, x * 14 + 30))).map(_.toArray))
    assert(ImageHash.dHash64(brighter).longValue() === h1.longValue())
    // reversed gradient flips every bit
    val reversed = bmp(Array.tabulate(16, 18)((y, x) =>
      gray(math.min(255, (17 - x) * 14))).map(_.toArray))
    assert(ImageHash.dHash64(reversed).longValue() === -1L) // 64 ones
    // non-image bytes -> null, never a throw
    assert(ImageHash.dHash64(Array[Byte](1, 2, 3)) == null)
  }

  test("near-dup pairs: perturbed twin found at small Hamming, reversed image not") {
    val rows = Seq(
      (1L, gradient()),
      (2L, gradient(bumpAt = Some((4, 3)))), // near-dup of 1
      (3L, bmp(Array.tabulate(16, 18)((y, x) =>
        gray(math.min(255, (17 - x) * 14))).map(_.toArray))), // far (all bits flip)
      (4L, Array[Byte](9, 9, 9))) // undecodable: must be ignored, not paired
      .toDF("img_id", "payload")
    val pairs = ImageHash.nearDupPairs(rows, "img_id", "payload", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)),
      s"expected exactly the perturbed twin pair, got $pairs")
    val d = pairs.head._3
    assert(d >= 1 && d <= 3, s"perturbation should move 1-3 bits, moved $d")
  }

  test("baseline/progressive JPEG re-encodes of one image pair up as near-dups") {
    // the R10 gap: a web corpus holds the SAME image as both a baseline
    // and a progressive JPEG; near-dup must see through the coding mode
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // blocky content (not a monotone ramp): distinct gradient signs
      // per cell so the decoy below can actually differ in hash
      val v = if (((x / 6) + (y / 4)) % 2 == 0) 40 + x * 2 else 220 - x * 3
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def jpeg(progressive: Boolean): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.85f)
      if (progressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val base = jpeg(progressive = false)
    val prog = jpeg(progressive = true)
    assert(prog.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "fixture must be SOF2")
    val hb = ImageHash.dHash64(base); val hp = ImageHash.dHash64(prog)
    assert(hb != null && hp != null, "both coding modes must hash")
    assert(ImageHash.hamming(hb, hp) <= 3,
      s"re-encode pair drifted ${ImageHash.hamming(hb, hp)} bits")
    // decoy: the same checkerboard mirrored left-right — every cell's
    // horizontal gradient flips sign, so the hash is far away
    val mirror = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) mirror.setRGB(x, y, img.getRGB(w - 1 - x, y))
    val decoy = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(mirror, "jpeg", bos)
      bos.toByteArray
    }
    val pairs = ImageHash.nearDupPairs(
        Seq((10L, base), (20L, prog), (30L, decoy)).toDF("img_id", "payload"),
        "img_id", "payload", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((10L, 20L)),
      s"expected exactly the re-encode pair, got ${pairs.toSeq}")
  }

  test("block pigeonhole == brute force on randomized image sets (hamming <= 3)") {
    val rnd = new scala.util.Random(42)
    val imgs = (1L to 12L).map { id =>
      id -> bmp(Array.tabulate(16, 18)((y, x) =>
        gray(rnd.nextInt(256))).map(_.toArray))
    }
    val hashes = imgs.map { case (id, b) =>
      id -> ImageHash.dHash64(b).longValue() }.toMap
    val expect = (for {
      a <- imgs.map(_._1); b <- imgs.map(_._1) if a < b
      if ImageHash.hamming(hashes(a), hashes(b)) <= 3
    } yield (a, b)).toSet
    val got = ImageHash.nearDupPairs(imgs.toDF("img_id", "payload"),
        "img_id", "payload", maxHamming = 3)
      .select("img_a", "img_b").as[(Long, Long)].collect().toSet
    assert(got === expect, "block-join candidates diverged from brute force")
  }

  test("dHash column expression survives codegen on a range-backed plan") {
    val payload = gradient()
    val df = spark.range(0, 50)
      .select(col("id"), lit(payload).as("payload"))
      .select(col("id"), ImageHash.dHash(col("payload")).as("h"))
    assert(df.where(col("h") === 0L).count() === 50L)
  }
}

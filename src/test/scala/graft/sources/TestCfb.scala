package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal MS-CFB writer for fixtures: streams < 4096 bytes land in the
  * mini stream (exercising the reader's mini-FAT path), larger ones in
  * regular FAT sectors. Flat directory (the graft reader scans entries
  * rather than walking the red-black sibling tree). */
object TestCfb {
  private val Free = 0xFFFFFFFF
  private val End = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val minis = streams.filter(_._2.length < 4096)
    val bigs = streams.filter(_._2.length >= 4096)

    // mini stream container: each mini stream padded to 64-byte sectors
    val miniStarts = minis.scanLeft(0) { case (acc, (_, d)) => acc + (d.length + 63) / 64 }
    val nMini = miniStarts.last
    val miniData = new Array[Byte](nMini * 64)
    minis.zip(miniStarts).foreach { case ((_, d), s) =>
      System.arraycopy(d, 0, miniData, s * 64, d.length) }
    val miniFat = Array.fill(math.max(1, (nMini + 127) / 128) * 128)(Free)
    minis.zip(miniStarts).foreach { case ((_, d), s) =>
      val n = (d.length + 63) / 64
      for (i <- 0 until n) miniFat(s + i) = if (i == n - 1) End else s + i + 1
    }
    val nMiniFatSectors = miniFat.length / 128

    // regular sector layout: [dir][miniFAT...][miniStream...][bigs...][FAT...]
    val nDirEntries = 1 + streams.length
    val nDir = (nDirEntries + 3) / 4
    val nMs = (miniData.length + 511) / 512
    val bigSizes = bigs.map { case (_, d) => (d.length + 511) / 512 }
    val msStart = nDir + nMiniFatSectors
    val bigStarts = bigSizes.scanLeft(msStart + nMs)(_ + _)
    val fatStart = bigStarts.last
    // the FAT covers every sector INCLUDING itself and the DIFAT chain:
    // iterate the mutually dependent counts to a fixpoint
    var nFat = 1
    var nDifat = 0
    var changed = true
    while (changed) {
      val nf = (fatStart + nFat + nDifat + 127) / 128
      val nd = if (nf <= 109) 0 else (nf - 109 + 126) / 127
      changed = nf != nFat || nd != nDifat
      nFat = nf; nDifat = nd
    }
    val difatStart = fatStart + nFat
    val total = difatStart + nDifat

    val fat = Array.fill(nFat * 128)(Free)
    for (i <- 0 until nDir) fat(i) = if (i == nDir - 1) End else i + 1
    for (i <- 0 until nMiniFatSectors)
      fat(nDir + i) = if (i == nMiniFatSectors - 1) End else nDir + i + 1
    for (i <- 0 until nMs) fat(msStart + i) = if (i == nMs - 1) End else msStart + i + 1
    bigs.indices.foreach { bi =>
      val (s, n) = (bigStarts(bi), bigSizes(bi))
      for (i <- 0 until n) fat(s + i) = if (i == n - 1) End else s + i + 1
    }
    for (i <- 0 until nFat) fat(fatStart + i) = FatSect
    for (i <- 0 until nDifat) fat(difatStart + i) = 0xFFFFFFFC // DIFSECT

    def dirEntry(name: String, objType: Int, start: Int, size: Long): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes(StandardCharsets.UTF_16LE)
      e.put(n)
      e.putShort(64, ((n.length + 2).min(64)).toShort)
      e.put(66, objType.toByte)
      e.put(67, 1: Byte)
      e.putInt(68, Free); e.putInt(72, Free)
      e.putInt(76, if (objType == 5) 1 else Free)
      e.putInt(116, start)
      e.putLong(120, size)
      e.array()
    }
    val dir = new ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, msStart, miniData.length.toLong))
    var miniIdx = 0
    var bigIdx = 0
    streams.foreach { case (name, d) =>
      if (d.length < 4096) {
        dir.write(dirEntry(name, 2, miniStarts(miniIdx), d.length.toLong)); miniIdx += 1
      } else {
        dir.write(dirEntry(name, 2, bigStarts(bigIdx), d.length.toLong)); bigIdx += 1
      }
    }
    while (dir.size() < nDir * 512) dir.write(new Array[Byte](128))

    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.putLong(0xE11AB1A1E011CFD0L)
    header.putShort(26, 3)
    header.putShort(28, 0xFFFE.toShort)
    header.putShort(30, 9)
    header.putShort(32, 6)
    header.putInt(44, nFat)
    header.putInt(48, 0)
    header.putInt(56, 4096)
    header.putInt(60, nDir)            // first miniFAT sector
    header.putInt(64, nMiniFatSectors)
    header.putInt(68, if (nDifat > 0) difatStart else End)
    header.putInt(72, nDifat)
    for (i <- 0 until 109)
      header.putInt(76 + 4 * i, if (i < nFat) fatStart + i else Free)

    val body = ByteBuffer.allocate(512 * total)
    def putSector(n: Int, data: Array[Byte], off: Int): Unit =
      body.put(512 * n, data, off, math.min(512, data.length - off))
    for (i <- 0 until nDir) putSector(i, dir.toByteArray, i * 512)
    val mfBytes = ByteBuffer.allocate(nMiniFatSectors * 512).order(ByteOrder.LITTLE_ENDIAN)
    miniFat.foreach(mfBytes.putInt)
    for (i <- 0 until nMiniFatSectors) putSector(nDir + i, mfBytes.array(), i * 512)
    for (i <- 0 until nMs) putSector(msStart + i, miniData, i * 512)
    bigs.indices.foreach { bi =>
      for (i <- 0 until bigSizes(bi)) putSector(bigStarts(bi) + i, bigs(bi)._2, i * 512)
    }
    val fatBytes = ByteBuffer.allocate(512 * nFat).order(ByteOrder.LITTLE_ENDIAN)
    fat.foreach(fatBytes.putInt)
    for (i <- 0 until nFat) putSector(fatStart + i, fatBytes.array(), i * 512)
    // DIFAT overflow chain: 127 FAT-sector ids + next-DIFAT pointer each
    for (d <- 0 until nDifat) {
      val s = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      for (j <- 0 until 127) {
        val idx = 109 + d * 127 + j
        s.putInt(if (idx < nFat) fatStart + idx else Free)
      }
      s.putInt(if (d == nDifat - 1) End else difatStart + d + 1)
      putSector(difatStart + d, s.array(), 0)
    }

    val out = new ByteArrayOutputStream()
    out.write(header.array()); out.write(body.array())
    out.toByteArray
  }
}

package graft.multimodal

import Codec._

/** Progressive JPEG pixel decode, library-free — ITU T.81 Annex G
  * (spectral selection + successive approximation), the decode mode
  * the baseline path ([[Codec.decodeJpeg]]) previously filtered to the
  * stub. Closes the documented non-baseline gap: web corpora are full
  * of progressive re-encodes, and near-dup detection must see the
  * same pixels for a baseline/progressive pair of the same image.
  *
  * Structure: unlike the one-pass sequential decoder, ALL scans
  * accumulate into per-component DCT coefficient buffers (zigzag
  * order, one 64-wide slot per block); dequant + IDCT run once at EOI.
  * Scan kinds per T.81 G.1.2: DC-initial (interleaved or not, diffs
  * shifted left by the approximation low bit Al), DC-refinement (one
  * raw bit per block at Al), AC-initial (single component, EOB-run
  * coding over the spectral band [Ss,Se]), AC-refinement (correction
  * bits on nonzero-history coefficients, new ±1<<Al placements on
  * zero-history ones). Quant/Huffman tables and the restart interval
  * may be redefined between scans, so the marker walk decodes scans
  * in stream order with the tables then in effect. Bad entropy data,
  * unsupported frames, truncation → null (filter-don't-fail), same
  * contract as every other decoder.
  *
  * Output stage ([[Codec.dequantIdctToPlane]], [[Codec.jpegFeatures]])
  * is shared with the baseline decoder, so the two paths agree
  * bit-for-bit on the pixel math; CodecSpec cross-validates both
  * against ImageIO's independent codec. */
private[multimodal] object ProgressiveJpeg {

  /** Pixel bound for the multi-scan path, tighter than
    * [[Codec.MaxPixels]]: progressive decode must hold every
    * component's full coefficient bank in memory before the first
    * entropy byte is validated (~3 Shorts per pixel at 4:4:4, plus the
    * output planes), so the header-driven worst case is bounded here to
    * stay at parity with the baseline path's allocation budget.
    * 33.5 Mpx (e.g. 8192x4096) covers any real training-corpus image;
    * larger progressive frames null out (filter-don't-fail) while
    * ImageMeta still reports their dimensions. */
  val MaxProgressivePixels: Long = Codec.MaxPixels / 2

  def decode(b: Array[Byte]): Array[Float] = {
    val px = decodePixels(b)
    if (px == null) null else jpegFeatures(px)
  }

  /** Full pixel planes (the [[Codec.JpegPixels]] product) — see class
    * doc for the scan algebra. */
  def decodePixels(b: Array[Byte]): JpegPixels = {
    if (!isJpeg(b)) return null
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0; var nComp = 0
    var cId: Array[Int] = null // SOF component ids (SOS references them)
    var cH: Array[Int] = null; var cV: Array[Int] = null; var cQ: Array[Int] = null
    var cDcLast: Array[Int] = null; var cAcLast: Array[Int] = null
    var restartInterval = 0
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null // MCU-padded block dims (coef storage)
    var compBW: Array[Int] = null; var compBH: Array[Int] = null // T.81 A.2.2 dims
    var coefs: Array[Array[Short]] = null
    var i = 2
    var seenEoi = false
    var anyScan = false
    while (!seenEoi) {
      if (i + 1 >= b.length) return null
      if (u8(b, i) != 0xff) return null
      var m = u8(b, i + 1)
      while (m == 0xff) { i += 1; if (i + 1 >= b.length) return null; m = u8(b, i + 1) }
      if (m == 0xd9) { seenEoi = true }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        if (i + 3 >= b.length) return null
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4; val segEnd = i + 2 + len
        var nextI = i + 2 + len
        m match {
          case 0xdb => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
              if (tq > 3 || pq > 1 || p + 1 + 64 * (pq + 1) > segEnd) return null
              var k = 0
              while (k < 64) {
                qt(tq)(k) = if (pq == 1) be16(b, p + 1 + 2 * k) else u8(b, p + 1 + k)
                k += 1
              }
              qtSeen(tq) = true
              p += 1 + 64 * (pq + 1)
            }
          case 0xc4 => // DHT
            var p = seg
            while (p < segEnd) {
              val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
              if (tc > 1 || th > 3 || p + 17 > segEnd) return null
              val bits = Array.tabulate(16)(l => u8(b, p + 1 + l))
              val nv = bits.sum
              if (nv > 256 || p + 17 + nv > segEnd) return null
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + nv)
              val t = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + nv
            }
          case 0xc2 => // SOF2: progressive DCT, Huffman
            if (nComp != 0) return null // one frame only
            if (u8(b, seg) != 8) return null
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            nComp = u8(b, seg + 5)
            if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3) ||
                seg + 6 + 3 * nComp > segEnd) return null
            // progressive frames materialize the FULL coefficient bank
            // before any entropy data is validated (multi-scan decode
            // requires it), so the header-driven allocation is ~3x the
            // pixel count in Shorts; the tighter bound keeps a crafted
            // 200-byte SOF2's worst-case demand at baseline-path parity
            // (~300 MB) instead of ~1 GB. 33.5 Mpx covers any real
            // training-corpus image.
            if (w.toLong * h > MaxProgressivePixels) return null
            cId = new Array[Int](nComp)
            cH = new Array[Int](nComp); cV = new Array[Int](nComp); cQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              cId(c) = u8(b, seg + 6 + 3 * c)
              cH(c) = u8(b, seg + 7 + 3 * c) >> 4
              cV(c) = u8(b, seg + 7 + 3 * c) & 15
              cQ(c) = u8(b, seg + 8 + 3 * c)
              if (cH(c) < 1 || cH(c) > 4 || cV(c) < 1 || cV(c) > 4 || cQ(c) > 3) return null
              c += 1
            }
            // single-component frames are always non-interleaved (A.2.3)
            if (nComp == 1) { cH(0) = 1; cV(0) = 1 }
            hMax = cH.max; vMax = cV.max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blocksW = Array.tabulate(nComp)(c => mcusX * cH(c))
            compBW = Array.tabulate(nComp)(c =>
              ((w * cH(c) + hMax - 1) / hMax + 7) / 8)
            compBH = Array.tabulate(nComp)(c =>
              ((h * cV(c) + vMax - 1) / vMax + 7) / 8)
            // Short banks: conforming 8-bit streams keep every stored
            // value at |coef| <= 2047 (the scan encodes coef >> Al, the
            // store shifts it back, and T.81 bounds the full-precision
            // quantized coefficient to 11 bits + sign) — a crafted
            // stream can wrap, which only garbles output that was
            // already garbage; no crash, half the footprint of Int.
            coefs = Array.tabulate(nComp)(c =>
              new Array[Short](blocksW(c) * (mcusY * cV(c)) * 64))
            cDcLast = new Array[Int](nComp); cAcLast = new Array[Int](nComp)
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return null // not a progressive-Huffman frame
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = be16(b, seg)
          case 0xda => // SOS: decode this scan's entropy data in place
            if (nComp == 0) return null
            val ns = u8(b, seg)
            if (ns < 1 || ns > nComp || seg + 1 + 2 * ns + 3 > segEnd) return null
            val scanComp = new Array[Int](ns)
            var sc = 0
            while (sc < ns) {
              val id = u8(b, seg + 1 + 2 * sc)
              val fc = cId.indexOf(id)
              if (fc < 0) return null
              scanComp(sc) = fc
              cDcLast(fc) = u8(b, seg + 2 + 2 * sc) >> 4
              cAcLast(fc) = u8(b, seg + 2 + 2 * sc) & 15
              if (cDcLast(fc) > 3 || cAcLast(fc) > 3) return null
              sc += 1
            }
            val ss = u8(b, seg + 1 + 2 * ns)
            val se = u8(b, seg + 2 + 2 * ns)
            val ah = u8(b, seg + 3 + 2 * ns) >> 4
            val al = u8(b, seg + 3 + 2 * ns) & 15
            if (ss == 0) { if (se != 0) return null } // DC scan
            else if (ns != 1 || se < ss || se > 63) return null // AC: one comp
            if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) return null
            val reader = new BitReader(b, segEnd)
            val ok =
              if (ss == 0) decodeDcScan(reader, scanComp, ah, al,
                cH, cV, cDcLast, dcTabs, coefs, blocksW,
                if (ns == 1) compBW(scanComp(0)) else mcusX,
                if (ns == 1) compBH(scanComp(0)) else mcusY,
                ns == 1, restartInterval)
              else decodeAcScan(reader, scanComp(0), ss, se, ah, al,
                cAcLast, acTabs, coefs, blocksW,
                compBW(scanComp(0)), compBH(scanComp(0)), restartInterval)
            if (!ok) return null
            anyScan = true
            nextI = reader.pos
          case _ => () // APPn / COM / DNL etc: skip
        }
        i = nextI
      }
    }
    if (!anyScan) return null
    var c = 0
    while (c < nComp) {
      if (!qtSeen(cQ(c))) return null
      c += 1
    }
    // --- all scans in: dequant + IDCT every block, then shared output
    val planeW = Array.tabulate(nComp)(c => blocksW(c) * 8)
    val planes = Array.tabulate(nComp)(c =>
      new Array[Byte](planeW(c) * (mcusY * cV(c) * 8)))
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    val tmp = new Array[Double](64)
    c = 0
    while (c < nComp) {
      val q = qt(cQ(c))
      val bw = blocksW(c); val bh = mcusY * cV(c)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val cbase = (by * bw + bx) * 64
          var ci = 0
          while (ci < 64) { coef(ci) = coefs(c)(cbase + ci); ci += 1 }
          dequantIdctToPlane(coef, q, blk, tmp, planes(c), planeW(c),
            bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    JpegPixels(planes, planeW, cH, cV, hMax, vMax, nComp, w, h)
  }

  /** DC scan (Ss=0): initial pass Huffman-decodes diffs shifted by Al;
    * refinement appends one raw bit per block at position Al. MCU
    * iteration is the frame's interleaved grid, or the component's own
    * block raster when the scan holds one component (T.81 A.2.3). */
  private def decodeDcScan(r: BitReader, scanComp: Array[Int], ah: Int, al: Int,
      cH: Array[Int], cV: Array[Int], cDc: Array[Int], dcTabs: Array[Huff],
      coefs: Array[Array[Short]], blocksW: Array[Int],
      unitsX: Int, unitsY: Int, nonInterleaved: Boolean,
      restartInterval: Int): Boolean = {
    val pred = new Array[Int](scanComp.length)
    var rstCount = 0
    var rstMarker = 0xd0
    var uy = 0
    while (uy < unitsY) {
      var ux = 0
      while (ux < unitsX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!r.syncRestart(rstMarker)) return false
          rstMarker = 0xd0 + ((rstMarker - 0xd0 + 1) & 7)
          java.util.Arrays.fill(pred, 0)
          rstCount = 0
        }
        var sc = 0
        while (sc < scanComp.length) {
          val c = scanComp(sc)
          val bxN = if (nonInterleaved) 1 else cH(c)
          val byN = if (nonInterleaved) 1 else cV(c)
          var by = 0
          while (by < byN) {
            var bx = 0
            while (bx < bxN) {
              val row = if (nonInterleaved) uy else uy * cV(c) + by
              val col = if (nonInterleaved) ux else ux * cH(c) + bx
              val idx = (row * blocksW(c) + col) * 64
              if (ah == 0) {
                val dcT = dcTabs(cDc(c))
                if (dcT == null) return false
                val t = huffDecode(r, dcT)
                if (t < 0 || t > 11) return false
                val diffBits = r.receive(t)
                if (diffBits < 0) return false
                pred(sc) += extend(diffBits, t)
                coefs(c)(idx) = (pred(sc) << al).toShort
              } else {
                val bit = r.nextBit()
                if (bit < 0) return false
                if (bit == 1) coefs(c)(idx) = (coefs(c)(idx) | (1 << al)).toShort
              }
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        rstCount += 1
        ux += 1
      }
      uy += 1
    }
    true
  }

  /** AC scan (Ss>0, single component, blocks in the component's own
    * raster): initial pass is EOB-run coding (G.1.2.2); refinement
    * (G.1.2.3) spends correction bits on nonzero-history coefficients
    * and places new ±(1<<Al) values on zero-history ones. Coefficients
    * stay in zigzag order (position k indexes the band directly). */
  private def decodeAcScan(r: BitReader, c: Int, ss: Int, se: Int,
      ah: Int, al: Int, cAc: Array[Int], acTabs: Array[Huff],
      coefs: Array[Array[Short]], blocksW: Array[Int],
      bw: Int, bh: Int, restartInterval: Int): Boolean = {
    val acT = acTabs(cAc(c))
    if (acT == null) return false
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = 0
    var rstCount = 0
    var rstMarker = 0xd0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!r.syncRestart(rstMarker)) return false
          rstMarker = 0xd0 + ((rstMarker - 0xd0 + 1) & 7)
          eobrun = 0
          rstCount = 0
        }
        val base = (by * blocksW(c) + bx) * 64
        if (ah == 0) {
          // ----- initial AC pass
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (!done && k <= se) {
              val rs = huffDecode(r, acT)
              if (rs < 0) return false
              val run = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1
                  if (run > 0) {
                    val extra = r.receive(run)
                    if (extra < 0) return false
                    eobrun += extra
                  }
                  done = true
                }
              } else {
                k += run
                if (k > se) return false
                val vb = r.receive(s)
                if (vb < 0) return false
                coefs(c)(base + k) = (extend(vb, s) << al).toShort
                k += 1
              }
            }
          }
        } else {
          // ----- refinement AC pass
          def correctionBit(idx: Int): Boolean = {
            val bit = r.nextBit()
            if (bit < 0) return false
            if (bit == 1 && (coefs(c)(idx) & p1) == 0)
              coefs(c)(idx) =
                (coefs(c)(idx) + (if (coefs(c)(idx) >= 0) p1 else m1)).toShort
            true
          }
          var k = ss
          if (eobrun == 0) {
            var atEob = false
            while (!atEob && k <= se) {
              val rs = huffDecode(r, acT)
              if (rs < 0) return false
              var run = rs >> 4; val s = rs & 15
              var newVal = 0
              if (s == 0) {
                if (run < 15) {
                  eobrun = 1 << run
                  if (run > 0) {
                    val extra = r.receive(run)
                    if (extra < 0) return false
                    eobrun += extra
                  }
                  atEob = true
                }
                // run == 15: sixteen zero-history positions skipped below
              } else {
                if (s != 1) return false // refinement amplitudes are ±1
                val bit = r.nextBit()
                if (bit < 0) return false
                newVal = if (bit == 1) p1 else m1
              }
              if (!atEob) {
                var placed = false
                while (!placed && k <= se) {
                  val idx = base + k
                  if (coefs(c)(idx) != 0) {
                    if (!correctionBit(idx)) return false
                  } else {
                    if (run == 0) {
                      if (newVal != 0) coefs(c)(idx) = newVal.toShort
                      placed = true
                    } else run -= 1
                  }
                  k += 1
                }
                if (!placed && newVal != 0) return false // band ended mid-run
              }
            }
          }
          if (eobrun > 0) {
            // EOB region: only correction bits for nonzero history
            while (k <= se) {
              if (coefs(c)(base + k) != 0 && !correctionBit(base + k)) return false
              k += 1
            }
            eobrun -= 1
          }
        }
        rstCount += 1
        bx += 1
      }
      by += 1
    }
    true
  }
}

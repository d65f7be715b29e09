package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Test-side BIFF8 .xls writer (inline LABEL cells only) with optional
  * RC4 "standard" encryption — builds the GeoPlace-shaped legacy
  * workbook fixtures for [[graft.pipelines]] specs the same way
  * BiffReaderSpec builds its own. */
object TestXls {

  private def rec(t: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(t.toShort).putShort(payload.length.toShort).put(payload)
    b.array()
  }

  private def bof(dt: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x0600.toShort).putShort(dt.toShort).putShort(0x3515.toShort)
      .putInt(0x07CC).putShort(0.toShort)
    rec(0x0809, b.array().take(12))
  }

  private def label(rw: Int, c: Int, s: String): Array[Byte] = {
    val chars = s.getBytes(StandardCharsets.ISO_8859_1)
    val b = ByteBuffer.allocate(9 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(rw.toShort).putShort(c.toShort).putShort(0.toShort)
      .putShort(chars.length.toShort).put(0.toByte).put(chars)
    rec(0x0204, b.array())
  }

  /** Raw Workbook stream: globals (BOF [+extra] BOUNDSHEET EOF) + one
    * sheet of inline-string cells. */
  private def workbook(rows: Seq[Seq[String]],
                       extraGlobal: Option[Array[Byte]]): Array[Byte] = {
    val sheet = new ByteArrayOutputStream()
    sheet.write(bof(0x0010))
    rows.zipWithIndex.foreach { case (cells, r) =>
      cells.zipWithIndex.foreach { case (v, c) =>
        if (v != null) sheet.write(label(r, c, v))
      }
    }
    sheet.write(rec(0x000A, Array.empty[Byte]))

    val globals = new ByteArrayOutputStream()
    globals.write(bof(0x0005))
    extraGlobal.foreach(globals.write)
    val bsOffset = globals.size() + 4
    val name = "Sheet1".getBytes(StandardCharsets.ISO_8859_1)
    val bs = ByteBuffer.allocate(8 + name.length).order(ByteOrder.LITTLE_ENDIAN)
    bs.putInt(0).putShort(0.toShort).put(name.length.toByte).put(0.toByte).put(name)
    globals.write(rec(0x0085, bs.array()))
    globals.write(rec(0x000A, Array.empty[Byte]))
    val g = globals.toByteArray
    ByteBuffer.wrap(g).order(ByteOrder.LITTLE_ENDIAN).putInt(bsOffset, g.length)

    val wb = new ByteArrayOutputStream()
    wb.write(g); wb.write(sheet.toByteArray)
    wb.toByteArray
  }

  /** Write `rows` as a plain or RC4-standard-encrypted .xls file. */
  def write(path: String, rows: Seq[Seq[String]],
            password: Option[String] = None): Unit = {
    val stream = password match {
      case None => workbook(rows, None)
      case Some(pw) =>
        import OfficeCrypto.Rc4CryptoApi
        val salt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
        val h5 = Rc4CryptoApi.passwordHashStd(salt, pw)
        val verifier = Array.tabulate[Byte](16)(i => (i * 13 + 5).toByte)
        val verifierHash =
          java.security.MessageDigest.getInstance("MD5").digest(verifier)
        val c = javax.crypto.Cipher.getInstance("ARCFOUR")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(
            Rc4CryptoApi.blockKeyStd(h5, 0), "ARCFOUR"))
        val enc = c.doFinal(verifier ++ verifierHash)
        val fp = ByteBuffer.allocate(6 + 48).order(ByteOrder.LITTLE_ENDIAN)
        fp.putShort(1.toShort).putShort(1.toShort).putShort(1.toShort)
          .put(salt).put(enc, 0, 16).put(enc, 16, 16)
        val fpRec = rec(0x002F, fp.array())
        Rc4CryptoApi.applyStreamStd(workbook(rows, Some(fpRec)), h5)
    }
    val fos = new java.io.FileOutputStream(path)
    try fos.write(TestCfb.write(Seq("Workbook" -> stream)))
    finally fos.close()
  }
}

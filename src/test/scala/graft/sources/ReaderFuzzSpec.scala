package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.FuzzUtil
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes passes over the hand-rolled FILE readers. Unlike
  * the Catalyst decode expressions (MediaFuzzSpec's null contract),
  * these run driver/land-side where a LOUD failure is the right
  * answer for a corrupt source file — so the fuzz contract is:
  * return normally or throw a controlled Exception; NEVER a JVM Error
  * (OOM from an attacker-sized length field, StackOverflow from a
  * self-referencing page tree) and never a hang. Every case is
  * seed-reproducible via FuzzUtil. */
class ReaderFuzzSpec extends AnyFunSuite {
  private val Cases = 1000
  private val Seed = 0xF12215L

  private def tmpDir = Files.createTempDirectory("readerfuzz").toString

  private def withTempFile[T](bytes: Array[Byte])(f: String => T): T = {
    val p = Files.createTempFile("fuzz", ".bin")
    try { Files.write(p, bytes); f(p.toString) }
    finally Files.deleteIfExists(p)
  }

  // ------------------------------------------------------------- sqlite

  test("SqliteFile: full scan of 1000 mutated gpkg files — loud or clean, never an Error") {
    val valid = Files.readAllBytes(Paths.get(
      getClass.getResource("/graft/small.gpkg").getPath))
    FuzzUtil.fuzz("SqliteFile", Seq(valid), Cases, Seed) { bytes =>
      withTempFile(bytes) { path =>
        val db = SqliteFile.open(path)
        try {
          // the deepest surface: directory parse + every table's full
          // B-tree walk, record decode included
          db.tables().foreach { t =>
            db.rows(t.rootPage).foreach(_ => ())
            db.subtreeRoots(t.rootPage, 8)
          }
        } finally db.close()
      }
      ()
    }(accept = _ => true)
  }

  // --------------------------------------------------------------- biff

  test("BiffReader: 1000 mutated xls workbooks (plain + RC4-protected) — loud or clean") {
    val dir = tmpDir
    val rows = Seq(Seq("swa_code", "authority"), Seq("10", "Kent"),
      Seq("20", "A longer cell value for continued records"))
    TestXls.write(s"$dir/plain.xls", rows)
    TestXls.write(s"$dir/enc.xls", rows, password = Some("pw"))
    val plain = Files.readAllBytes(Paths.get(s"$dir/plain.xls"))
    val enc = Files.readAllBytes(Paths.get(s"$dir/enc.xls"))
    FuzzUtil.fuzz("BiffReader", Seq(plain, enc), Cases, Seed + 1) { bytes =>
      // force the whole iterator: lazy decode bugs hide behind take(1)
      BiffReader.cells(bytes).size
      ()
    }(accept = _ => true)
    FuzzUtil.fuzz("BiffReader/pw", Seq(enc), Cases / 2, Seed + 2) { bytes =>
      BiffReader.cells(bytes, password = Some("pw")).size
      ()
    }(accept = _ => true)
  }

  // ------------------------------------------------- agile OfficeCrypto

  private val password = "s3cret pa55word"
  private val spin = 100 // low spin keeps 1000 fuzz decrypt attempts fast
  private val keySalt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
  private val pwSalt = Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte)
  private val intermediateKey = Array.tabulate[Byte](32)(i => (200 - i).toByte)
  private val verifierInput = Array.tabulate[Byte](16)(i => (i * i + 5).toByte)

  private def sha512(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-512").digest(b)

  /** Minimal valid agile container (same public ECMA-376 math as
    * OfficeCryptoSpec's end-to-end fixture, low spin count). */
  private def agileCfb(): Array[Byte] = {
    val zip = {
      val bos = new ByteArrayOutputStream()
      val zos = new ZipOutputStream(bos)
      val pad = Iterator.iterate(sha512("seed".getBytes))(sha512)
        .take(400).flatMap(_.map(b => f"${b & 0xff}%02x")).mkString
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(s"<worksheet><!-- $pad --></worksheet>".getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    val encPkg = {
      val padded = java.util.Arrays.copyOf(zip, (zip.length + 15) / 16 * 16)
      val out = new ByteArrayOutputStream()
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(zip.length.toLong).array())
      var off = 0; var seg = 0
      while (off < padded.length) {
        val n = math.min(4096, padded.length - off)
        val iv = OfficeCrypto.segmentIv(keySalt, seg, 16, "SHA512")
        out.write(OfficeCrypto.aes(encrypt = true, intermediateKey, iv,
          java.util.Arrays.copyOfRange(padded, off, off + n)))
        off += n; seg += 1
      }
      out.toByteArray
    }
    val encInfo = {
      val pwHash = OfficeCrypto.hashPassword(pwSalt, password, spin, "SHA512")
      def enc(blockKey: Array[Byte], data: Array[Byte]): Array[Byte] =
        OfficeCrypto.aes(encrypt = true,
          OfficeCrypto.deriveKey(pwHash, blockKey, 32, "SHA512"),
          OfficeCrypto.adjust(pwSalt, 16), data)
      def b64(b: Array[Byte]): String =
        java.util.Base64.getEncoder.encodeToString(b)
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption"
           | xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
           |<keyData saltSize="16" blockSize="16" keyBits="256" hashSize="64"
           | cipherAlgorithm="AES" cipherChaining="ChainingModeCBC"
           | hashAlgorithm="SHA512" saltValue="${b64(keySalt)}"/>
           |<keyEncryptors><keyEncryptor
           | uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
           |<p:encryptedKey spinCount="$spin" saltSize="16" blockSize="16"
           | keyBits="256" hashSize="64" cipherAlgorithm="AES"
           | cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512"
           | saltValue="${b64(pwSalt)}"
           | encryptedVerifierHashInput="${b64(enc(OfficeCrypto.BkVerifierInput, verifierInput))}"
           | encryptedVerifierHashValue="${b64(enc(OfficeCrypto.BkVerifierHashValue, sha512(verifierInput)))}"
           | encryptedKeyValue="${b64(enc(OfficeCrypto.BkKeyValue, intermediateKey))}"/>
           |</keyEncryptor></keyEncryptors></encryption>""".stripMargin
      val xmlBytes = xml.getBytes(StandardCharsets.UTF_8)
      val out = ByteBuffer.allocate(8 + xmlBytes.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.putShort(4).putShort(4).putInt(0x40).put(xmlBytes)
      out.array()
    }
    TestCfb.write(Seq("EncryptionInfo" -> encInfo,
      "EncryptedPackage" -> encPkg))
  }

  test("OfficeCrypto.decryptToFile: 1000 mutated agile containers — loud or clean") {
    val valid = agileCfb()
    val dir = tmpDir
    // sanity: the unmutated fixture actually decrypts (otherwise the
    // fuzz would only exercise the outermost header checks)
    withTempFile(valid) { p =>
      OfficeCrypto.decryptToFile(p, password, s"$dir/ok.zip")
    }
    var n = 0
    FuzzUtil.fuzz("OfficeCrypto", Seq(valid), Cases, Seed + 3) { bytes =>
      n += 1
      withTempFile(bytes) { p =>
        OfficeCrypto.decryptToFile(p, password, s"$dir/out_$n.zip")
      }
      ()
    }(accept = _ => true)
  }
}

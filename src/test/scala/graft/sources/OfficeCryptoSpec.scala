package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

/** End-to-end fixture: the spec ENCRYPTS a real xlsx package with the same
  * public ECMA-376 agile math (reusing OfficeCrypto's primitives for key
  * derivation, independent code for the flow) and a hand-built MS-CFB
  * container — then asserts OfficeCrypto.decryptToFile +
  * SpreadsheetSource.readEncryptedXlsx recover the data. The
  * EncryptionInfo stream is < 4096 bytes, so the CFB mini-FAT path is
  * exercised; EncryptedPackage goes through the regular FAT path. */
class OfficeCryptoSpec extends SparkSpec {
  import spark.implicits._

  // ---- agile encryptor (test-side twin of the decryptor) --------------

  private val password = "s3cret pa55word"
  private val spin = 1000
  private val keySalt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
  private val pwSalt = Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte)
  private val intermediateKey = Array.tabulate[Byte](32)(i => (200 - i).toByte)
  private val verifierInput = Array.tabulate[Byte](16)(i => (i * i + 5).toByte)

  private def sha512(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-512").digest(b)

  private def encryptPackage(zip: Array[Byte]): Array[Byte] = {
    val padded = java.util.Arrays.copyOf(zip, (zip.length + 15) / 16 * 16)
    val out = new ByteArrayOutputStream()
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(zip.length.toLong).array())
    var off = 0
    var seg = 0
    while (off < padded.length) {
      val n = math.min(4096, padded.length - off)
      val iv = OfficeCrypto.segmentIv(keySalt, seg, 16, "SHA512")
      out.write(OfficeCrypto.aes(encrypt = true, intermediateKey, iv,
        java.util.Arrays.copyOfRange(padded, off, off + n)))
      off += n; seg += 1
    }
    out.toByteArray
  }

  private def encryptionInfo(): Array[Byte] = {
    val pwHash = OfficeCrypto.hashPassword(pwSalt, password, spin, "SHA512")
    def enc(blockKey: Array[Byte], data: Array[Byte]): Array[Byte] =
      OfficeCrypto.aes(encrypt = true,
        OfficeCrypto.deriveKey(pwHash, blockKey, 32, "SHA512"),
        OfficeCrypto.adjust(pwSalt, 16), data)
    def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
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
    val out = ByteBuffer.allocate(8 + xmlBytes.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(4).putShort(4).putInt(0x40).put(xmlBytes)
    out.array()
  }

  // CFB container built by the shared TestCfb fixture writer:
  // EncryptionInfo < 4096 exercises the mini-FAT read path,
  // EncryptedPackage >= 4096 the regular FAT path
  private def writeCfb(encInfo: Array[Byte], encPkg: Array[Byte]): Array[Byte] = {
    require(encInfo.length < 4096 && encPkg.length >= 4096)
    TestCfb.write(Seq("EncryptionInfo" -> encInfo, "EncryptedPackage" -> encPkg))
  }

  // ---- fixture + tests -------------------------------------------------

  private def plainXlsx(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    // force the DEFLATED package > 4096 bytes: incompressible hash-chain pad
    val padBody = Iterator.iterate(sha512("seed".getBytes))(sha512)
      .take(400).flatMap(_.map(b => f"${b & 0xff}%02x")).mkString
    val pad = s"<!-- $padBody -->"
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(
      (s"""<worksheet><sheetData>
          |<row r="1"><c r="A1"><v>swa_code</v></c><c r="B1"><v>authority</v></c></row>
          |<row r="2"><c r="A2"><v>10</v></c><c r="B2"><v>Kent</v></c></row>
          |<row r="3"><c r="A3"><v>20</v></c><c r="B3"><v>Essex</v></c></row>
          |</sheetData></worksheet>$pad""").stripMargin.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    bos.toByteArray
  }

  test("agile-encrypted xlsx decrypts end-to-end into readXlsx") {
    val dir = Files.createTempDirectory("offcrypto").toString
    val zip = plainXlsx()
    val cfb = writeCfb(encryptionInfo(), encryptPackage(zip))
    val encPath = s"$dir/protected.xlsx"
    val fos = new FileOutputStream(encPath); fos.write(cfb); fos.close()

    // byte-exact decryption of the package
    val decPath = OfficeCrypto.decryptToFile(encPath, password, s"$dir/plain.zip")
    assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(decPath)), zip))

    // and the full spreadsheet read path
    val df = SpreadsheetSource.readEncryptedXlsx(spark, encPath, password,
      s"$dir/staging")
    assert(df.columns.toSeq === Seq("swa_code", "authority"))
    assert(df.as[(String, String)].collect().toSeq
      === Seq(("10", "Kent"), ("20", "Essex")))
  }

  test("wrong password is rejected by the verifier, not garbage output") {
    val dir = Files.createTempDirectory("offcrypto-bad").toString
    val cfb = writeCfb(encryptionInfo(), encryptPackage(plainXlsx()))
    val encPath = s"$dir/protected.xlsx"
    val fos = new FileOutputStream(encPath); fos.write(cfb); fos.close()
    val e = intercept[IllegalArgumentException] {
      OfficeCrypto.decryptToFile(encPath, "not the password", s"$dir/out.zip")
    }
    assert(e.getMessage.contains("wrong password"))
  }

  test("CFB DIFAT overflow chain: files beyond the 109-FAT header limit read back") {
    // ~8.5 MB stream -> ~130 FAT sectors -> the DIFAT sector chain is
    // exercised on both the writer and the reader
    val big = Array.tabulate[Byte](8500000)(i => (i * 31 + 7).toByte)
    val small = Array.tabulate[Byte](100)(_.toByte)
    val cfb = TestCfb.write(Seq("Big" -> big, "Tiny" -> small))
    val streams = OfficeCrypto.Cfb.streams(cfb)
    assert(java.util.Arrays.equals(streams("Big"), big))
    assert(java.util.Arrays.equals(streams("Tiny"), small))
  }

  test("XOR obfuscation tables: generator recurrence + published spot values") {
    import OfficeCrypto.XorObfuscation
    val m = XorObfuscation.Matrix
    assert(m.length === 105)
    // spot values as printed in MS-OFFCRYPTO 2.3.7.2's table
    assert(m(0) === 0xAEFC); assert(m(1) === 0x4DD9); assert(m(2) === 0x9BB2)
    assert(m(3) === 0x2745); assert(m(6) === 0x2A09)   // row 0 tail
    assert(m(7) === 0x7B61); assert(m(13) === 0x2BBF)  // row 1
    assert(m(14) === 0x4563); assert(m(98) === 0x1021) // row 2 / last-row seed
    assert(m(104) === 0x48C4)                          // final entry
    // every adjacent in-row pair satisfies the CRC-CCITT doubling step,
    // so a single mistyped constant would break 6 assertions around it
    for (row <- 0 until 15; i <- 0 until 6)
      assert(m(row * 7 + i + 1) === XorObfuscation.lfsrStep(m(row * 7 + i)),
        s"matrix row $row broke the generator at entry $i")
  }

  test("XOR obfuscation: verifier/key algebra and data-transform roundtrip") {
    import OfficeCrypto.XorObfuscation
    // hand-run of CreatePasswordVerifier_Method1 on "A":
    // fold [0x01,0x41] reversed -> 0x83, xor 0xCE4B = 0xCEC8
    assert(XorObfuscation.createVerifier("A") === 0xCEC8)
    // key + verifier are deterministic and password-sensitive
    assert(XorObfuscation.createXorKey("queso") === XorObfuscation.createXorKey("queso"))
    assert(XorObfuscation.createXorKey("queso") !== XorObfuscation.createXorKey("quesp"))
    // PIN the spec's bit -> matrix-row pairing (2.3.7.2: test 0x40 then
    // shift LEFT — bit 6 pairs with row 0x68, bit b with row 0x68-(6-b)),
    // independent of InitialCode by differencing keys. 'a'=0x61 and
    // 'c'=0x63 differ only in bit 1 -> rows differ by Matrix(0x63);
    // a reversed (low-bit-first) pairing would give Matrix(0x67), which
    // self-round-trip tests can never catch.
    assert((XorObfuscation.createXorKey("a") ^ XorObfuscation.createXorKey("c"))
      === OfficeCrypto.XorObfuscation.Matrix(0x63))
    // 2-char password: the FIRST char's rows start at 0x68-7=0x61, so
    // 'b'(0x62) vs 'a'(0x61) in position 0 (differ in bits 0,1) flips
    // rows 0x61-6=0x5B and 0x5C
    assert((XorObfuscation.createXorKey("ba") ^ XorObfuscation.createXorKey("aa"))
      === (OfficeCrypto.XorObfuscation.Matrix(0x5B) ^
           OfficeCrypto.XorObfuscation.Matrix(0x5C)))
    assert(XorObfuscation.verifyPassword("pw123",
      XorObfuscation.createXorKey("pw123"), XorObfuscation.createVerifier("pw123")))
    assert(!XorObfuscation.verifyPassword("pw124",
      XorObfuscation.createXorKey("pw123"), XorObfuscation.createVerifier("pw123")))
    // 16-byte pad: encrypt/decrypt inverse at every phase offset
    val pad = XorObfuscation.xorArray("crumpet7")
    assert(pad.length === 16)
    val data = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    for (phase <- 0 until 16) {
      val enc = XorObfuscation.encryptData(pad, data, phase)
      assert(!java.util.Arrays.equals(enc, data))
      assert(XorObfuscation.decryptData(pad, enc, phase).toSeq === data.toSeq)
    }
    // 15-char max is enforced, not silently truncated
    intercept[IllegalArgumentException] {
      XorObfuscation.createXorKey("sixteen-chars-pw")
    }
  }

  test("non-agile EncryptionInfo is refused with a clear error") {
    val dir = Files.createTempDirectory("offcrypto-std").toString
    // version 3.2 = legacy "standard" encryption
    val legacy = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(3).putShort(2).putInt(0x24).array()
    val cfb = writeCfb(legacy, encryptPackage(plainXlsx()))
    val encPath = s"$dir/legacy.xls"
    val fos = new FileOutputStream(encPath); fos.write(cfb); fos.close()
    val e = intercept[IllegalArgumentException] {
      OfficeCrypto.decryptToFile(encPath, password, s"$dir/out.zip")
    }
    assert(e.getMessage.contains("agile"))
  }
}

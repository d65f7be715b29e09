package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Password-protected Office file decryption — the reference decrypts the
  * GeoPlace SWA workbook before reading it (reference:
  * src/data_processors/geoplace_swa.py:64-69, `msoffcrypto` OfficeFile
  * with a password then `pd.read_excel`). Re-implemented here from the
  * PUBLIC specs only:
  *
  *  - MS-CFB: the container is an OLE2 Compound File holding two streams,
  *    `EncryptionInfo` (crypto descriptor) and `EncryptedPackage` (the
  *    ciphertext of the ordinary ZIP package). [[Cfb.streams]] is a
  *    minimal reader: header DIFAT -> FAT chains, directory tree, and the
  *    mini-FAT/mini-stream for streams under the 4096-byte cutoff.
  *  - MS-OFFCRYPTO / ECMA-376 "agile encryption" (EncryptionInfo version
  *    4.4): XML descriptor; SHA-2 spin-count password hash; per-purpose
  *    block keys; AES-CBC for the verifier, the intermediate key, and the
  *    4096-byte package segments (segment IV = H(keyDataSalt || LE32(i))).
  *
  * Driver-side by design, like [[Fetch]]: one protected workbook is one
  * small artifact; the decrypted package then flows into the ordinary
  * distributed [[SpreadsheetSource.readXlsx]] scan.
  */
object OfficeCrypto {

  // per-purpose block keys (MS-OFFCRYPTO 2.3.4.13)
  val BkVerifierInput: Array[Byte] =
    Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
  val BkVerifierHashValue: Array[Byte] =
    Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
  val BkKeyValue: Array[Byte] =
    Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)

  private def digest(algo: String): MessageDigest =
    MessageDigest.getInstance(algo.toUpperCase match {
      case "SHA512" => "SHA-512"
      case "SHA384" => "SHA-384"
      case "SHA256" => "SHA-256"
      case "SHA1" | "SHA-1" => "SHA-1"
      case a => a
    })

  /** Truncate to `n` bytes, or right-pad with 0x36 (spec padding byte). */
  def adjust(b: Array[Byte], n: Int): Array[Byte] = {
    val out = Array.fill[Byte](n)(0x36)
    System.arraycopy(b, 0, out, 0, math.min(b.length, n))
    out
  }

  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  /** Spin-count password hash: H0 = H(salt || UTF-16LE(pw));
    * Hn = H(LE32(n-1) || Hn-1), n = 1..spinCount. */
  def hashPassword(salt: Array[Byte], password: String, spinCount: Int,
                   hashAlgo: String): Array[Byte] = {
    val md = digest(hashAlgo)
    md.update(salt)
    md.update(password.getBytes(StandardCharsets.UTF_16LE))
    var h = md.digest()
    var i = 0
    while (i < spinCount) {
      md.reset(); md.update(le32(i)); md.update(h)
      h = md.digest()
      i += 1
    }
    h
  }

  /** Purpose key: first keyBytes of H(pwHash || blockKey), 0x36-padded. */
  def deriveKey(pwHash: Array[Byte], blockKey: Array[Byte], keyBytes: Int,
                hashAlgo: String): Array[Byte] = {
    val md = digest(hashAlgo)
    md.update(pwHash); md.update(blockKey)
    adjust(md.digest(), keyBytes)
  }

  def aes(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
          data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Segment IV for the package stream: H(keyDataSalt || LE32(segment)),
    * adjusted to the cipher block size (MS-OFFCRYPTO 2.3.4.15). */
  def segmentIv(keyDataSalt: Array[Byte], segment: Int, blockSize: Int,
                hashAlgo: String): Array[Byte] = {
    val md = digest(hashAlgo)
    md.update(keyDataSalt); md.update(le32(segment))
    adjust(md.digest(), blockSize)
  }

  /** keyData.* drives the PACKAGE cipher (segment IVs, package key
    * size); encryptedKey (pw*) drives the password-derived blobs. The
    * two elements' keyBits/blockSize are independent per MS-OFFCRYPTO
    * 2.3.4.10/2.3.4.13 — mainstream writers use the same values for
    * both, which is why mixing them up stays latent. */
  private case class AgileInfo(
    keySalt: Array[Byte], keyHashAlgo: String, keyBlockSize: Int,
    keyKeyBits: Int,
    pwSalt: Array[Byte], pwHashAlgo: String, pwKeyBits: Int,
    pwBlockSize: Int,
    spinCount: Int, encVerifierInput: Array[Byte],
    encVerifierHashValue: Array[Byte], encKeyValue: Array[Byte],
    hashSize: Int)

  private def parseInfo(stream: Array[Byte]): AgileInfo = {
    val buf = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    val major = buf.getShort(); val minor = buf.getShort()
    require(major == 4 && minor == 4,
      s"not agile encryption (EncryptionInfo version $major.$minor; " +
        "legacy 'standard'/RC4 encryption is out of scope)")
    buf.getInt() // reserved flags
    val xml = new String(stream, 8, stream.length - 8, StandardCharsets.UTF_8)
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // no external entities: the descriptor is attacker-supplied bytes
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    def attr(el: org.w3c.dom.Element, name: String): String = el.getAttribute(name)
    def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
    val keyData = doc.getElementsByTagNameNS("*", "keyData").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    val encKey = doc.getElementsByTagNameNS("*", "encryptedKey").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    require(attr(keyData, "cipherAlgorithm") == "AES" &&
      attr(encKey, "cipherAlgorithm") == "AES",
      "only AES agile encryption is supported")
    AgileInfo(
      keySalt = b64(attr(keyData, "saltValue")),
      keyHashAlgo = attr(keyData, "hashAlgorithm"),
      keyBlockSize = attr(keyData, "blockSize").toInt,
      keyKeyBits = attr(keyData, "keyBits").toInt,
      pwSalt = b64(attr(encKey, "saltValue")),
      pwHashAlgo = attr(encKey, "hashAlgorithm"),
      pwKeyBits = attr(encKey, "keyBits").toInt,
      pwBlockSize = attr(encKey, "blockSize").toInt,
      spinCount = attr(encKey, "spinCount").toInt,
      encVerifierInput = b64(attr(encKey, "encryptedVerifierHashInput")),
      encVerifierHashValue = b64(attr(encKey, "encryptedVerifierHashValue")),
      encKeyValue = b64(attr(encKey, "encryptedKeyValue")),
      hashSize = attr(encKey, "hashSize").toInt)
  }

  /** Decrypt agile-encrypted `encPath` with `password`, writing the plain
    * ZIP package to `outPath` (then readable by SpreadsheetSource).
    * Throws IllegalArgumentException on a wrong password (verifier check,
    * MS-OFFCRYPTO 2.3.4.9). */
  def decryptToFile(encPath: String, password: String, outPath: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(encPath))
    val streams = Cfb.streams(bytes)
    val info = parseInfo(streams.getOrElse("EncryptionInfo",
      sys.error(s"$encPath has no EncryptionInfo stream")))
    val pkg = streams.getOrElse("EncryptedPackage",
      sys.error(s"$encPath has no EncryptedPackage stream"))

    val keyBytes = info.pwKeyBits / 8
    val pwHash = hashPassword(info.pwSalt, password, info.spinCount, info.pwHashAlgo)
    // password-blob IV comes from the encryptedKey element's OWN
    // blockSize, not keyData's (independent attributes per spec)
    val pwIv = adjust(info.pwSalt, info.pwBlockSize)
    // password verifier
    val verifierInput = aes(encrypt = false,
      deriveKey(pwHash, BkVerifierInput, keyBytes, info.pwHashAlgo), pwIv,
      info.encVerifierInput)
    val expectedHash = aes(encrypt = false,
      deriveKey(pwHash, BkVerifierHashValue, keyBytes, info.pwHashAlgo), pwIv,
      info.encVerifierHashValue).take(info.hashSize)
    val actualHash = digest(info.pwHashAlgo).digest(verifierInput)
      .take(info.hashSize)
    if (!java.util.Arrays.equals(expectedHash, actualHash))
      throw new IllegalArgumentException(s"wrong password for $encPath")
    // intermediate (package) key: sized by keyData.keyBits — the
    // PACKAGE cipher's key size, not the password cipher's
    val key = aes(encrypt = false,
      deriveKey(pwHash, BkKeyValue, keyBytes, info.pwHashAlgo), pwIv,
      info.encKeyValue).take(info.keyKeyBits / 8)

    // package: u64 LE plain size, then 4096-byte AES-CBC segments
    val plainLen = ByteBuffer.wrap(pkg, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong()
    require(plainLen >= 0 && plainLen <= Int.MaxValue,
      s"declared package size $plainLen out of range (corrupt header?)")
    val out = new java.io.ByteArrayOutputStream(pkg.length)
    var off = 8
    var seg = 0
    while (off < pkg.length) {
      val navail = math.min(4096, pkg.length - off)
      // CBC decrypts whole 16-byte blocks; a sub-block tail is CFB
      // stream-size slack from unpadded writers, not ciphertext —
      // passing it to NoPadding AES would throw on files other readers
      // handle. plainLen is the truth for how much output is real.
      val n = navail - (navail % 16)
      if (n > 0) {
        val iv = segmentIv(info.keySalt, seg, info.keyBlockSize, info.keyHashAlgo)
        out.write(aes(encrypt = false, key, iv,
          java.util.Arrays.copyOfRange(pkg, off, off + n)))
      }
      off += navail
      seg += 1
    }
    val outB = out.toByteArray
    // a SHORT decrypt means truncated ciphertext: error, never
    // silently zero-pad the tail of the output package
    require(outB.length >= plainLen,
      s"EncryptedPackage truncated: ${outB.length} decrypted bytes < " +
        s"declared $plainLen")
    val plain = java.util.Arrays.copyOf(outB, plainLen.toInt)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), plain)
    outPath
  }

  /** RC4 CryptoAPI decryption for BIFF Workbook streams (MS-OFFCRYPTO
    * 2.3.5) — the scheme legacy password-protected .xls files use (the
    * reference's geoplace workbook class). SHA-1 key derivation, RC4
    * re-keyed per 1024-byte stream block; record headers, the exempt
    * record set, and BoundSheet8.lbPlyPos stay plaintext but still
    * consume keystream positions (MS-XLS 2.2.10.3). RC4 is its own
    * inverse, so the fixture encryptor is the same transform. */
  object Rc4CryptoApi {

    private def sha1(parts: Array[Byte]*): Array[Byte] = {
      val md = MessageDigest.getInstance("SHA-1")
      parts.foreach(md.update)
      md.digest()
    }

    /** H = SHA1(salt || UTF-16LE(password)) — the base secret. */
    def passwordHash(salt: Array[Byte], password: String): Array[Byte] =
      sha1(salt, password.getBytes(StandardCharsets.UTF_16LE))

    /** "Standard" (vMajor=1) base secret, MD5-derived (MS-OFFCRYPTO
      * 2.3.6.2): MD5(pw)[0..4] || salt, repeated 16 times, MD5'd again,
      * truncated to the 40-bit key material. */
    def passwordHashStd(salt: Array[Byte], password: String): Array[Byte] = {
      val md5 = MessageDigest.getInstance("MD5")
      val trunc = md5.digest(password.getBytes(StandardCharsets.UTF_16LE)).take(5)
      md5.reset()
      (0 until 16).foreach { _ => md5.update(trunc); md5.update(salt) }
      md5.digest().take(5)
    }

    /** Standard-variant block key: MD5(keyMaterial5 || LE32(block)), all
      * 16 digest bytes as the RC4 key (the derived entropy is 40 bits,
      * the generated key is 128). */
    def blockKeyStd(h5: Array[Byte], block: Int): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(
        h5 ++ ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(block).array())

    /** Block key = SHA1(H || LE32(block)), truncated to keyBits/8; 40-bit
      * keys are zero-padded to 16 bytes (the CryptoAPI export rule). */
    def blockKey(h: Array[Byte], block: Int, keyBits: Int): Array[Byte] = {
      val full = sha1(h, ByteBuffer.allocate(4)
        .order(ByteOrder.LITTLE_ENDIAN).putInt(block).array())
      if (keyBits == 40) {
        val a = new Array[Byte](16) // 5 key bytes zero-padded to 128 bits
        System.arraycopy(full, 0, a, 0, 5)
        a
      } else java.util.Arrays.copyOf(full, keyBits / 8)
    }

    private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("ARCFOUR")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "ARCFOUR"))
      c.doFinal(data)
    }

    /** True iff hash(decrypted verifier) matches the decrypted hash —
      * both decrypted in ONE block-0 RC4 run (spec order). */
    def verify(h: Array[Byte], keyBits: Int, encVerifier: Array[Byte],
               encVerifierHash: Array[Byte]): Boolean =
      verifyWith(blockKey(h, 0, keyBits), sha1(_), 20, encVerifier, encVerifierHash)

    private def verifyWith(key0: Array[Byte], hashFn: Array[Byte] => Array[Byte],
                           hashLen: Int, encVerifier: Array[Byte],
                           encVerifierHash: Array[Byte]): Boolean = {
      val plain = rc4(key0, encVerifier ++ encVerifierHash)
      val (v, vh) = plain.splitAt(16)
      java.util.Arrays.equals(hashFn(v), vh.take(hashLen))
    }

    /** Record types whose payloads are never encrypted (MS-XLS 2.2.10.3). */
    private val ExemptRecords =
      Set(0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138)

    /** XOR the encrypted byte ranges of a BIFF stream with the positional
      * RC4 keystream (1024-byte blocks). Symmetric: applying it to a
      * plaintext stream encrypts it (used by the spec's fixture). */
    def applyStream(wb: Array[Byte], h: Array[Byte], keyBits: Int): Array[Byte] =
      applyStreamWith(wb, b => blockKey(h, b, keyBits))

    /** [[applyStream]] for the standard (MD5/vMajor=1) key schedule. */
    def applyStreamStd(wb: Array[Byte], h5: Array[Byte]): Array[Byte] =
      applyStreamWith(wb, blockKeyStd(h5, _))

    private def applyStreamWith(wb: Array[Byte],
                                keyFor: Int => Array[Byte]): Array[Byte] = {
      // keystream byte at absolute position p = block p/1024, index p%1024
      val nBlocks = wb.length / 1024 + 1
      val keystream = (0 until nBlocks).map { b =>
        rc4(keyFor(b), new Array[Byte](1024))
      }
      def ks(p: Int): Byte = keystream(p / 1024)(p % 1024)
      val out = wb.clone()
      var off = 0
      while (off + 4 <= wb.length) {
        val t = ((wb(off) & 0xFF) | ((wb(off + 1) & 0xFF) << 8))
        val n = ((wb(off + 2) & 0xFF) | ((wb(off + 3) & 0xFF) << 8))
        // header: plaintext, keystream positions consumed
        val body = off + 4
        if (!ExemptRecords.contains(t)) {
          // BoundSheet8: the 4-byte lbPlyPos stays plaintext
          val start = if (t == 0x0085) body + 4 else body
          var p = start
          while (p < body + n && p < wb.length) {
            out(p) = (out(p) ^ ks(p)).toByte
            p += 1
          }
        }
        off = body + n
      }
      out
    }

    private case class FilePass(std: Boolean, keyBits: Int, salt: Array[Byte],
                                encVerifier: Array[Byte], encVerifierHash: Array[Byte])

    private def parseFilePass(data: Array[Byte]): FilePass = {
      val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      require(b.getShort() == 1, "not an RC4 FILEPASS (XOR goes to XorObfuscation)")
      val vMajor = b.getShort()
      if (vMajor == 1) {
        // "standard" RC4 (MS-OFFCRYPTO 2.3.6): MD5 schedule, fixed layout
        b.getShort() // vMinor
        val salt = new Array[Byte](16); b.get(salt)
        val encVerifier = new Array[Byte](16); b.get(encVerifier)
        val encVerifierHash = new Array[Byte](16); b.get(encVerifierHash)
        FilePass(std = true, 40, salt, encVerifier, encVerifierHash)
      } else {
        require(vMajor >= 2 && vMajor <= 4,
          s"unknown .xls encryption version $vMajor")
        b.getShort() // vMinor
        b.getInt()   // flags
        val headerSize = b.getInt()
        val headerStart = b.position()
        b.getInt(); b.getInt() // header flags, sizeExtra
        require(b.getInt() == 0x6801, "not RC4")      // algId
        require(b.getInt() == 0x8004, "not SHA-1")    // algIdHash
        val keyBits = b.getInt()
        b.position(headerStart + headerSize)          // skip CSP name etc.
        val saltSize = b.getInt()
        val salt = new Array[Byte](saltSize); b.get(salt)
        val encVerifier = new Array[Byte](16); b.get(encVerifier)
        val vhSize = b.getInt()
        val encVerifierHash = new Array[Byte](vhSize); b.get(encVerifierHash)
        FilePass(std = false, if (keyBits == 0) 40 else keyBits,
          salt, encVerifier, encVerifierHash)
      }
    }

    /** Decrypt a Workbook stream containing a FILEPASS record (either the
      * CryptoAPI/SHA-1 or the "standard"/MD5 RC4 variant); throws
      * IllegalArgumentException on a wrong password. */
    def decryptWorkbook(wb: Array[Byte], password: String): Array[Byte] = {
      // find the FILEPASS record (after BOF)
      var off = 0
      var fp: Option[(Int, Int)] = None
      while (fp.isEmpty && off + 4 <= wb.length) {
        val t = (wb(off) & 0xFF) | ((wb(off + 1) & 0xFF) << 8)
        val n = (wb(off + 2) & 0xFF) | ((wb(off + 3) & 0xFF) << 8)
        if (t == 0x002F) fp = Some((off + 4, n))
        off += 4 + n
      }
      val (fpOff, fpLen) = fp.getOrElse(sys.error("no FILEPASS record"))
      val info = parseFilePass(
        java.util.Arrays.copyOfRange(wb, fpOff, fpOff + fpLen))
      if (info.std) {
        val h5 = passwordHashStd(info.salt, password)
        val md5 = (b: Array[Byte]) => MessageDigest.getInstance("MD5").digest(b)
        if (!verifyWith(blockKeyStd(h5, 0), md5, 16,
            info.encVerifier, info.encVerifierHash))
          throw new IllegalArgumentException("wrong password for RC4 .xls")
        applyStreamStd(wb, h5)
      } else {
        val h = passwordHash(info.salt, password)
        if (!verify(h, info.keyBits, info.encVerifier, info.encVerifierHash))
          throw new IllegalArgumentException("wrong password for RC4 .xls")
        applyStream(wb, h, info.keyBits)
      }
    }
  }

  /** Legacy XOR obfuscation (MS-OFFCRYPTO 2.3.7, MS-XLS 2.2.10.2) — the
    * oldest .xls password scheme ("wEncryptionType = 0"). Everything here
    * is from the public spec: the password folds to a 16-bit XorKey via
    * the 105-entry obfuscation matrix (2.3.7.2), expands to a 16-byte
    * rotating pad (2.3.7.3), and each record's data bytes are
    * `rol(b ^ pad[idx], 3)`-decrypted with the pad index seeded from the
    * record's (data offset + length) — MS-XLS's quirk that the index
    * phase depends on the record END.
    *
    * The spec's matrix is not free-form: every row is seven consecutive
    * steps of the CRC-CCITT Galois LFSR `x' = ((x << 1) & 0xFFFF) ^
    * (carry ? 0x1021 : 0)` from a per-row seed (observable directly in
    * the published table: 0xAEFC→0x4DD9→0x9BB2→… each double-mod-0x1021).
    * We therefore store only the 15 published row seeds and generate the
    * rest, and the spec test re-checks published spot values. */
  object XorObfuscation {

    /** InitialCode[passwordLength - 1] (MS-OFFCRYPTO 2.3.7.2). */
    private val InitialCode = Array(
      0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE, 0x313E,
      0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A, 0x4EC3)

    /** PadArray (MS-OFFCRYPTO 2.3.7.3). */
    private val PadArray = Array(
      0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80, 0x00, 0xBE, 0x0F,
      0x00, 0xBF, 0x0F, 0x00)

    /** One step of the table's generator: double mod the CRC-CCITT
      * polynomial over GF(2). */
    private[sources] def lfsrStep(x: Int): Int = {
      val d = (x << 1) & 0xFFFF
      if ((x & 0x8000) != 0) d ^ 0x1021 else d
    }

    /** Published row seeds of the 15×7 obfuscation matrix, one per
      * password character position (2.3.7.2). */
    private val MatrixSeeds = Array(
      0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23, 0x47D3,
      0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x3331, 0x1021)

    /** The flat 105-entry ObfuscationArray, generated row-by-row. */
    private[sources] val Matrix: Array[Int] =
      MatrixSeeds.flatMap { seed =>
        Iterator.iterate(seed)(lfsrStep).take(7).toArray
      }

    /** CreateXorKey_Method1 (2.3.7.2): fold the ANSI password (≤15
      * chars) into the 16-bit XorKey. */
    def createXorKey(password: String): Int = {
      val pw = ansiBytes(password)
      require(pw.nonEmpty && pw.length <= 15, "XOR password must be 1-15 chars")
      var key = InitialCode(pw.length - 1)
      var el = 0x68
      var i = pw.length - 1
      while (i >= 0) {
        val c = pw(i) & 0xFF
        // spec order: test 0x40 then shift LEFT — bit 6 pairs with the
        // current matrix row, bit 0 with row el-6 (a low-bit-first loop
        // round-trips against itself but derives the wrong key for any
        // real Excel file whose password bytes aren't bit-palindromes)
        var bit = 6
        while (bit >= 0) {
          if ((c & (1 << bit)) != 0) key ^= Matrix(el)
          el -= 1
          bit -= 1
        }
        i -= 1
      }
      key
    }

    /** CreatePasswordVerifier_Method1 (2.3.7.1): 15-bit rotate-left /
      * XOR fold over [len] ++ password, reversed, final XOR 0xCE4B. */
    def createVerifier(password: String): Int = {
      val pw = ansiBytes(password)
      val arr = pw.length.toByte +: pw
      var v = 0
      var i = arr.length - 1
      while (i >= 0) {
        val carry = (v >> 14) & 1
        v = (((v << 1) & 0x7FFF) | carry) ^ (arr(i) & 0xFF)
        i -= 1
      }
      v ^ 0xCE4B
    }

    private def ansiBytes(password: String): Array[Byte] =
      password.getBytes(StandardCharsets.ISO_8859_1)

    private def ror8(b: Int, n: Int): Int = ((b >>> n) | (b << (8 - n))) & 0xFF
    private def rol8(b: Int, n: Int): Int = ror8(b, 8 - n)

    /** CreateXorArray_Method1 (2.3.7.3): the 16-byte rotating pad.
      * Slot i holds `ror1(src[i] ^ keyByte(i))` where src is the
      * password padded by PadArray and keyByte alternates the XorKey's
      * low (even slots) / high (odd slots) byte. */
    def xorArray(password: String): Array[Byte] = {
      val pw = ansiBytes(password)
      val key = createXorKey(password)
      val lo = key & 0xFF; val hi = (key >> 8) & 0xFF
      Array.tabulate[Byte](16) { i =>
        val src = if (i < pw.length) pw(i) & 0xFF else PadArray(i - pw.length)
        ror8(src ^ (if ((i & 1) == 1) hi else lo), 1).toByte
      }
    }

    /** DecryptData_Method1 (2.3.7.4): `b = rol(cipher ^ pad[idx], 3)`,
      * pad index advancing mod 16 from `startIndex`. In place over a
      * copy; returns the plaintext. */
    def decryptData(pad: Array[Byte], data: Array[Byte], startIndex: Int): Array[Byte] = {
      val out = new Array[Byte](data.length)
      var i = 0
      while (i < data.length) {
        out(i) = rol8((data(i) & 0xFF) ^ (pad((startIndex + i) & 0x0F) & 0xFF), 3).toByte
        i += 1
      }
      out
    }

    /** EncryptData_Method1 — the inverse (`cipher = rol(b, 5) ^ pad`),
      * used by the fixture builder and the writer-side tests. */
    def encryptData(pad: Array[Byte], data: Array[Byte], startIndex: Int): Array[Byte] = {
      val out = new Array[Byte](data.length)
      var i = 0
      while (i < data.length) {
        out(i) = (rol8(data(i) & 0xFF, 5) ^ (pad((startIndex + i) & 0x0F) & 0xFF)).toByte
        i += 1
      }
      out
    }

    /** True iff `password` matches the FILEPASS XorObfuscation structure's
      * stored key + verifier pair. */
    def verifyPassword(password: String, storedKey: Int, storedVerifier: Int): Boolean =
      createXorKey(password) == storedKey && createVerifier(password) == storedVerifier

    /** Record types never obfuscated (MS-XLS 2.2.10 — same exemption set
      * as RC4). */
    private val ExemptRecords =
      Set(0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138)

    /** De- (or, symmetrically structured, en-)obfuscate every
      * non-exempt record body of a BIFF stream. The pad index for byte j
      * of a record's data is `(dataOffset + recordLen + j) & 0x0F`
      * (MS-XLS 2.2.10.2: the phase is seeded from the record END, not
      * its start). Headers and BoundSheet8's lbPlyPos stay plaintext. */
    def applyWorkbook(wb: Array[Byte], password: String,
                      encrypt: Boolean = false): Array[Byte] = {
      val pad = xorArray(password)
      val out = wb.clone()
      var off = 0
      while (off + 4 <= wb.length) {
        val t = (wb(off) & 0xFF) | ((wb(off + 1) & 0xFF) << 8)
        val n = (wb(off + 2) & 0xFF) | ((wb(off + 3) & 0xFF) << 8)
        val body = off + 4
        if (!ExemptRecords.contains(t) && body + n <= wb.length) {
          val skip = if (t == 0x0085) 4 else 0 // BoundSheet8 lbPlyPos
          val idx0 = body + n // (dataOffset + len) seeds the pad phase
          val slice = java.util.Arrays.copyOfRange(wb, body + skip, body + n)
          val turned =
            if (encrypt) encryptData(pad, slice, (idx0 + skip) & 0x0F)
            else decryptData(pad, slice, (idx0 + skip) & 0x0F)
          System.arraycopy(turned, 0, out, body + skip, turned.length)
        }
        off = body + n
      }
      out
    }
  }

  /** Decrypt a BIFF Workbook stream with a FILEPASS record, dispatching
    * on wEncryptionType: 0 = legacy XOR obfuscation
    * ([[XorObfuscation]]), 1 = RC4 (standard or CryptoAPI,
    * [[Rc4CryptoApi]]). Throws IllegalArgumentException on a wrong
    * password for every variant. */
  def decryptBiffWorkbook(wb: Array[Byte], password: String): Array[Byte] = {
    var off = 0
    var fp: Option[(Int, Int)] = None
    while (fp.isEmpty && off + 4 <= wb.length) {
      val t = (wb(off) & 0xFF) | ((wb(off + 1) & 0xFF) << 8)
      val n = (wb(off + 2) & 0xFF) | ((wb(off + 3) & 0xFF) << 8)
      if (t == 0x002F) fp = Some((off + 4, n))
      off += 4 + n
    }
    val (fpOff, fpLen) = fp.getOrElse(sys.error("no FILEPASS record"))
    require(fpLen >= 2, "truncated FILEPASS")
    val wType = (wb(fpOff) & 0xFF) | ((wb(fpOff + 1) & 0xFF) << 8)
    if (wType == 0) {
      require(fpLen >= 6, "truncated XorObfuscation FILEPASS")
      val key = (wb(fpOff + 2) & 0xFF) | ((wb(fpOff + 3) & 0xFF) << 8)
      val verifier = (wb(fpOff + 4) & 0xFF) | ((wb(fpOff + 5) & 0xFF) << 8)
      if (!XorObfuscation.verifyPassword(password, key, verifier))
        throw new IllegalArgumentException("wrong password for XOR-obfuscated .xls")
      XorObfuscation.applyWorkbook(wb, password)
    } else Rc4CryptoApi.decryptWorkbook(wb, password)
  }

  /** Minimal MS-CFB (OLE2 compound file) stream reader. */
  object Cfb {
    private val EndOfChain = 0xFFFFFFFEL

    /** All stream objects in the file, by directory-entry name. */
    def streams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
      require(bytes.length >= 512, "graft-cfb: truncated header")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not a compound file")
      // every allocation below is sized by these two shifts, so a crafted
      // header must fail LOUDLY here: 1 << getShort(30) would otherwise
      // mint gigabyte "sectors" (fuzz-found OOM). Spec values are 9
      // (512 B, v3) and 12 (4 KiB, v4); accept that window only.
      val sectorShift = buf.getShort(30)
      require(sectorShift >= 7 && sectorShift <= 16,
        s"graft-cfb: implausible sector shift $sectorShift")
      val sectorSize = 1 << sectorShift
      val miniShift = buf.getShort(32)
      require(miniShift >= 4 && miniShift <= sectorShift,
        s"graft-cfb: implausible mini-sector shift $miniShift")
      val miniSize = 1 << miniShift
      val nFat = buf.getInt(44)
      val firstDir = buf.getInt(48)
      val miniCutoff = buf.getInt(56)
      val firstMiniFat = buf.getInt(60)

      def sector(n: Long): Array[Byte] = {
        // Long math + an explicit bound: Int overflow would turn a huge
        // sector number into a negative offset, and copyOfRange PADS
        // past the array end instead of failing — silent zeros where
        // the file is corrupt
        val off = sectorSize.toLong * (n + 1)
        require(off >= 0 && off + sectorSize <= bytes.length,
          s"graft-cfb: sector $n out of bounds")
        java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sectorSize)
      }
      // FAT sector list: 109 header DIFAT entries, then the DIFAT sector
      // chain (127 entries + next pointer per sector) for larger files
      val headerDifat = (0 until math.min(nFat, 109)).map(i => buf.getInt(76 + 4 * i))
      val chainedDifat = {
        val b = Seq.newBuilder[Int]
        var cur = buf.getInt(68)
        var guard = 0
        while (cur != -1 && (cur & 0xFFFFFFFFL) <= 0xFFFFFFFAL && guard < 4096) {
          val s = ByteBuffer.wrap(sector(cur)).order(ByteOrder.LITTLE_ENDIAN)
          (0 until sectorSize / 4 - 1).foreach(_ => b += s.getInt())
          cur = s.getInt() // last entry = next DIFAT sector
          guard += 1
        }
        b.result()
      }
      val fatSectors = (headerDifat ++ chainedDifat).take(nFat)
      val fat = fatSectors.flatMap { fs =>
        val s = ByteBuffer.wrap(sector(fs)).order(ByteOrder.LITTLE_ENDIAN)
        (0 until sectorSize / 4).map(_ => s.getInt() & 0xFFFFFFFFL)
      }.toArray
      def chain(start: Long, table: Array[Long]): Seq[Long] = {
        val b = Seq.newBuilder[Long]
        var cur = start
        var guard = 0
        while (cur != EndOfChain && cur <= 0xFFFFFFFAL && guard <= table.length) {
          b += cur; cur = table(cur.toInt); guard += 1
        }
        require(guard <= table.length, "cyclic FAT chain")
        b.result()
      }
      def readChain(start: Long): Array[Byte] =
        chain(start, fat).flatMap(sector).toArray

      // directory entries (128 bytes each) across the directory chain
      val dir = readChain(firstDir)
      case class Entry(name: String, objType: Int, start: Long, size: Long)
      val entries = (0 until dir.length / 128).map { i =>
        val e = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameBytes = new Array[Byte](64); e.get(nameBytes)
        val nameLen = e.getShort(i * 128 + 64) & 0xFFFF
        val name = if (nameLen >= 2)
          new String(nameBytes, 0, nameLen - 2, StandardCharsets.UTF_16LE) else ""
        Entry(name, dir(i * 128 + 66) & 0xFF,
          e.getInt(i * 128 + 116) & 0xFFFFFFFFL, e.getLong(i * 128 + 120))
      }
      val root = entries.find(_.objType == 5).getOrElse(sys.error("no CFB root"))

      // mini stream + mini FAT (for streams under the cutoff)
      lazy val miniStream: Array[Byte] = readChain(root.start)
      lazy val miniFat: Array[Long] =
        if (firstMiniFat == -1) Array.empty
        else {
          val mf = readChain(firstMiniFat)
          val b = ByteBuffer.wrap(mf).order(ByteOrder.LITTLE_ENDIAN)
          Array.fill(mf.length / 4)(b.getInt() & 0xFFFFFFFFL)
        }
      def readMini(start: Long): Array[Byte] =
        chain(start, miniFat).flatMap { n =>
          val off = miniSize.toLong * n
          require(off >= 0 && off + miniSize <= miniStream.length,
            s"graft-cfb: mini sector $n out of bounds")
          java.util.Arrays.copyOfRange(miniStream,
            off.toInt, off.toInt + miniSize)
        }.toArray

      entries.filter(_.objType == 2).map { e =>
        val data = if (e.size < miniCutoff) readMini(e.start) else readChain(e.start)
        // the declared size only TRIMS sector padding — a size past the
        // chain's actual bytes is corruption, and copyOf would silently
        // zero-fill it (or allocate a crafted 2 GB)
        require(e.size >= 0 && e.size <= data.length,
          s"graft-cfb: stream '${e.name}' declares ${e.size} bytes " +
            s"but its chain holds ${data.length}")
        e.name -> java.util.Arrays.copyOf(data, e.size.toInt)
      }.toMap
    }
  }
}

package graft.sinks

import java.net.URI
import java.nio.charset.StandardCharsets
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** [[SigV4Signer]] against AWS's PUBLISHED test vectors — the
  * OfficeCrypto discipline (the spec carries the official fixtures, the
  * implementation must hit them byte-for-byte):
  *
  *  - the signing-key derivation example from the AWS General
  *    Reference ("Examples of how to derive a signing key");
  *  - `get-vanilla` from the aws-sig-v4-test-suite (credential
  *    AKIDEXAMPLE, region us-east-1, service `service`, timestamp
  *    20150830T123600Z);
  *  - the `ListUsers` worked example from the AWS "Signature Version 4
  *    signing process" documentation (service iam).
  *
  * The wire-level half (does the signed request actually VERIFY against
  * an endpoint recomputing the signature from the raw exchange?) lives
  * in S3CommitStoreSpec's signed-mode tests. */
class SigV4Spec extends AnyFunSuite {

  private val testSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("signing-key derivation matches the AWS documentation example") {
    // AWS General Reference, "Examples of how to derive a signing key
    // for Signature Version 4": kSigning for (20120215, us-east-1, iam)
    val k = SigV4.signingKey(testSecret, "20120215", "us-east-1", "iam")
    assert(SigV4.hex(k) ==
      "f4780e2d9f65fa895f9c67b32ce1baf0b0d8a43505a000a1a9e090d414db404d")
  }

  test("empty-payload hash is the well-known SHA-256 of the empty string") {
    assert(SigV4.sha256Hex(Array.emptyByteArray) ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  private def vanillaSigner(service: String) = new SigV4Signer(
    accessKey = "AKIDEXAMPLE",
    secretKey = testSecret,
    region = "us-east-1",
    service = service,
    clock = () => Instant.parse("2015-08-30T12:36:00Z"))

  test("get-vanilla from the aws-sig-v4-test-suite") {
    // GET / against example.amazonaws.com with only host + x-amz-date
    // signed. Expected canonical request, string-to-sign and signature
    // are the suite's published get-vanilla.creq/.sts/.authz.
    val url = URI.create("http://example.amazonaws.com/")
    val (creq, signed) = SigV4.canonicalRequest("GET", url,
      Seq("x-amz-date" -> "20150830T123600Z",
        "host" -> "example.amazonaws.com"),
      // the generic suite signs UNSIGNED payloads via the empty-string
      // hash (no x-amz-content-sha256 header — that is S3-only)
      SigV4.sha256Hex(Array.emptyByteArray))
    assert(signed == "host;x-amz-date")
    assert(creq ==
      """GET
        |/
        |
        |host:example.amazonaws.com
        |x-amz-date:20150830T123600Z
        |
        |host;x-amz-date
        |e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"""
        .stripMargin)
    val sts = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/service/aws4_request", creq)
    assert(sts ==
      """AWS4-HMAC-SHA256
        |20150830T123600Z
        |20150830/us-east-1/service/aws4_request
        |bb579772317eb040ac9ed261061d46c1f17a8133879d6129b6e1c25292927e63"""
        .stripMargin)
    val sig = SigV4.hex(SigV4.hmac(
      SigV4.signingKey(testSecret, "20150830", "us-east-1", "service"), sts))
    assert(sig ==
      "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
    // and the full signer produces the same Authorization end-to-end
    // (service != s3 → no x-amz-content-sha256 in the signed set)
    val headers = vanillaSigner("service")
      .sign("GET", url, Nil, Array.emptyByteArray).toMap
    assert(headers("x-amz-date") == "20150830T123600Z")
    assert(headers("Authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/" +
        "service/aws4_request, SignedHeaders=host;x-amz-date, " +
        "Signature=5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d" +
        "9b8aae1d763fbf31")
  }

  test("the AWS documentation ListUsers worked example (iam)") {
    val url = URI.create(
      "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08")
    val (creq, signed) = SigV4.canonicalRequest("GET", url,
      Seq("content-type" ->
          "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      SigV4.sha256Hex(Array.emptyByteArray))
    assert(signed == "content-type;host;x-amz-date")
    assert(SigV4.sha256Hex(creq.getBytes(StandardCharsets.UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    val sts = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", creq)
    val sig = SigV4.hex(SigV4.hmac(
      SigV4.signingKey(testSecret, "20150830", "us-east-1", "iam"), sts))
    assert(sig ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("canonical query: sorted by name then value, strict-encoded") {
    assert(SigV4.canonicalQuery("Param2=value2&Param1=value1") ==
      "Param1=value1&Param2=value2")
    assert(SigV4.canonicalQuery("list-type=2&prefix=tbl%2F_manifests%2F") ==
      "list-type=2&prefix=tbl%2F_manifests%2F")
    // a valueless param keeps an empty value; spaces/reserved re-encode
    assert(SigV4.canonicalQuery("marker&k=a%20b") == "k=a%20b&marker=")
    assert(SigV4.canonicalQuery(null) == "")
  }

  test("uriEncode: unreserved kept, everything else uppercase-hex, slash optional") {
    assert(SigV4.uriEncode("AZaz09-._~") == "AZaz09-._~")
    assert(SigV4.uriEncode("a b+c/d") == "a%20b%2Bc%2Fd")
    assert(SigV4.uriEncode("a/b", keepSlash = true) == "a/b")
    assert(SigV4.uriEncode("é") == "%C3%A9") // UTF-8 bytes, per spec
  }

  test("host header: default ports elided, explicit ports kept") {
    assert(SigV4.hostHeader(URI.create("http://example.com/")) ==
      "example.com")
    assert(SigV4.hostHeader(URI.create("http://example.com:80/")) ==
      "example.com")
    assert(SigV4.hostHeader(URI.create("https://example.com:443/x")) ==
      "example.com")
    assert(SigV4.hostHeader(URI.create("http://127.0.0.1:9000/b/k")) ==
      "127.0.0.1:9000")
  }

  test("s3 service: x-amz-content-sha256 attached and signed; session token rides along") {
    val signer = new SigV4Signer("AKIDEXAMPLE", testSecret, "us-east-1",
      sessionToken = Some("TOKEN"),
      clock = () => Instant.parse("2015-08-30T12:36:00Z"))
    val payload = "body".getBytes(StandardCharsets.UTF_8)
    val hs = signer.sign("PUT", URI.create("http://127.0.0.1:9000/b/k"),
      Seq("If-None-Match" -> "*"), payload).toMap
    assert(hs("x-amz-content-sha256") == SigV4.sha256Hex(payload))
    assert(hs("x-amz-security-token") == "TOKEN")
    val a = SigV4.parseAuthorization(hs("Authorization")).get
    assert(a.accessKey == "AKIDEXAMPLE" && a.service == "s3" &&
      a.region == "us-east-1" && a.dateStamp == "20150830")
    assert(a.signedHeaders == Seq("host", "if-none-match", "x-amz-date",
      "x-amz-content-sha256", "x-amz-security-token").sorted)
  }

  test("Authorization parser round-trips and rejects malformed forms") {
    assert(SigV4.parseAuthorization("Bearer xyz").isEmpty)
    assert(SigV4.parseAuthorization(
      "AWS4-HMAC-SHA256 Credential=AK/2015/us/svc, SignedHeaders=host, " +
        "Signature=ab").isEmpty) // scope missing aws4_request terminator
    val ok = SigV4.parseAuthorization(
      "AWS4-HMAC-SHA256 Credential=AK/20150830/us-east-1/s3/aws4_request, " +
        "SignedHeaders=host;x-amz-date, Signature=abcd")
    assert(ok.contains(SigV4.Authorization("AK", "20150830", "us-east-1",
      "s3", Seq("host", "x-amz-date"), "abcd")))
  }
}

package graft.materialize

import java.net.URI
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, from the PUBLIC
  * specification (<https://docs.aws.amazon.com/IAM/latest/UserGuide/
  * create-signed-request.html>): canonical request → string-to-sign →
  * HMAC-SHA256 key-derivation chain → `Authorization` header. This is
  * the only transport ingredient AWS Glue needs beyond plain JSON
  * POSTs, and it is pure math — [[SigV4Spec]] proves it against the
  * documentation's published known-answer example (the
  * `iam.amazonaws.com` GET with the `AKIDEXAMPLE` key pair), so the
  * implementation is spec-conformant, not merely self-consistent.
  *
  * Scope: exactly what [[GlueCatalog]] sends — single-chunk payloads
  * (`x-amz-content-sha256`-style streaming/chunked signing is out of
  * scope), header signing only (no presigned query auth). */
object SigV4 {

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  def sha256Hex(data: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(data))

  /** RFC 3986 encoding with the SigV4 unreserved set (A-Za-z0-9-._~);
    * `encodeSlash=false` leaves path separators intact for URI paths. */
  private def uriEncode(s: String, encodeSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) sb.append(c)
      else if (c == '/' && !encodeSlash) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** The canonical query string: each `k=v` pair RFC-3986-encoded,
    * sorted by encoded key then encoded value (the spec's tiebreak for
    * repeated params); a key with no `=` canonicalizes to `k=`. */
  private def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").filter(_.nonEmpty).map { kv =>
      val (k, v) = kv.split("=", 2) match {
        case Array(a, b) => (a, b)
        case Array(a) => (a, "")
      }
      // decode first so callers may pass either raw or pre-encoded
      // query text; re-encode to the exact SigV4 alphabet
      def dec(s: String) =
        java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
      (uriEncode(dec(k), encodeSlash = true),
        uriEncode(dec(v), encodeSlash = true))
    }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical headers: lowercase names, values trimmed with internal
    * runs of spaces collapsed, sorted by name. Every passed header is
    * signed (the client controls the list, so sign them all — fewer
    * moving parts than a signed-subset negotiation). */
  private def canonicalHeaders(headers: Seq[(String, String)])
      : (String, String) = {
    val canon = headers.map { case (k, v) =>
      (k.toLowerCase(java.util.Locale.ROOT).trim,
        v.trim.replaceAll(" +", " "))
    }.sortBy(_._1)
    (canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      canon.map(_._1).mkString(";"))
  }

  /** The derived signing key: HMAC chain
    * `"AWS4"+secret → date → region → service → "aws4_request"`. */
  private def signingKey(secretKey: String, date: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8),
      date)
    hmac(hmac(hmac(kDate, region), service), "aws4_request")
  }

  /** Sign one request; returns the `Authorization` header value.
    *
    * @param amzDate ISO-8601 basic timestamp (`yyyyMMdd'T'HHmmss'Z'`),
    *   the same value the caller sends as the `x-amz-date` header
    *   (which must be in `headers`). */
  def authorization(method: String, uri: URI,
      headers: Seq[(String, String)], payload: Array[Byte],
      accessKey: String, secretKey: String,
      region: String, service: String, amzDate: String): String = {
    val date = amzDate.take(8)
    val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val (canonHdrs, signedHdrs) = canonicalHeaders(headers)
    val payloadHash = sha256Hex(payload)
    val canonicalRequest = Seq(method.toUpperCase(java.util.Locale.ROOT),
      uriEncode(java.net.URLDecoder.decode(path, StandardCharsets.UTF_8),
        encodeSlash = false),
      canonicalQuery(uri.getRawQuery), canonHdrs, signedHdrs,
      payloadHash).mkString("\n")
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8)))
      .mkString("\n")
    val sig = hex(hmac(signingKey(secretKey, date, region, service),
      stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHdrs, Signature=$sig"
  }
}

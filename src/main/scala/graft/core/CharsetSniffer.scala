package graft.core

import java.nio.charset.{Charset, StandardCharsets}

/** Charset detection + decode (SURVEY.md §2.7 F6) — the engine-side
  * equivalent of node-crawler's `forceUTF8` (charset sniff via header/
  * meta + iconv-lite decode [PK:high]).
  *
  * Heuristic order (same as the reference's documented behavior):
  * 1. BOM (UTF-8 / UTF-16LE / UTF-16BE)
  * 2. charset= in a Content-Type header value, if provided
  * 3. `<meta ... charset=...>` scan in the first 1024 bytes
  * 4. UTF-8 validity probe; fall back to ISO-8859-1 (never fails)
  */
object CharsetSniffer {

  def sniff(bytes: Array[Byte], contentType: Option[String] = None): Charset = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte
      && bytes(2) == 0xBF.toByte) return StandardCharsets.UTF_8
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return StandardCharsets.UTF_16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return StandardCharsets.UTF_16BE
    contentType.flatMap(fromParam).foreach(c => return c)
    fromMeta(bytes).foreach(c => return c)
    if (isValidUtf8(bytes)) StandardCharsets.UTF_8 else StandardCharsets.ISO_8859_1
  }

  /** Decode to a String, replacing malformed input (never throws). */
  def decode(bytes: Array[Byte], contentType: Option[String] = None): String = {
    val cs = sniff(bytes, contentType)
    val body =
      if (cs == StandardCharsets.UTF_8 && bytes.length >= 3 &&
        bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
        new String(bytes, 3, bytes.length - 3, cs)
      else new String(bytes, cs)
    body
  }

  /** node-crawler charset options [PK:high]: `incomingEncoding` forces
    * one specific charset, overriding every sniff heuristic (the
    * reference hands it straight to iconv); `forceUTF8 = false`
    * disables conversion entirely — the body is delivered
    * byte-transparent as ISO-8859-1 (each byte = one char), the
    * reference's no-conversion behavior. Defaults reproduce
    * [[decode]] exactly. */
  def decodeWith(bytes: Array[Byte], contentType: Option[String] = None,
      incomingEncoding: Option[String] = None,
      forceUTF8: Boolean = true): String =
    incomingEncoding.flatMap(lookup) match {
      case Some(cs)              => new String(bytes, cs)
      case None if !forceUTF8    => new String(bytes, StandardCharsets.ISO_8859_1)
      case None                  => decode(bytes, contentType)
    }

  private def fromParam(ct: String): Option[Charset] = {
    val i = ct.toLowerCase.indexOf("charset=")
    if (i < 0) None
    else {
      val v = ct.substring(i + 8).takeWhile(c => !";, \t".contains(c))
        .stripPrefix("\"").stripSuffix("\"").trim
      lookup(v)
    }
  }

  private def fromMeta(bytes: Array[Byte]): Option[Charset] = {
    val head = new String(bytes, 0, math.min(bytes.length, 1024),
      StandardCharsets.ISO_8859_1).toLowerCase
    val i = head.indexOf("charset=")
    if (i < 0) None
    else {
      val v = head.substring(i + 8)
        .dropWhile(c => c == '"' || c == '\'' || c == ' ')
        .takeWhile(c => c.isLetterOrDigit || c == '-' || c == '_')
      lookup(v)
    }
  }

  private def lookup(name: String): Option[Charset] =
    try { if (name.isEmpty) None else Some(Charset.forName(name)) }
    catch { case _: Exception => None }

  /** Strict UTF-8 validity scan (no allocation), including the
    * RFC 3629 second-byte range checks: rejects overlong 3/4-byte
    * sequences (E0 80-9F, F0 80-8F), UTF-16 surrogates (ED A0-BF),
    * code points above U+10FFFF (F4 90-BF), and F5-FF lead bytes —
    * so e.g. ISO-8859-1 payloads aren't misclassified as UTF-8. */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val x = b(i) & 0xFF
      if (x < 0x80) i += 1
      else if ((x >> 5) == 0x6) { // 110xxxxx
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80 || x < 0xC2) return false
        i += 2
      } else if ((x >> 4) == 0xE) { // 1110xxxx
        if (i + 2 >= n || (b(i + 2) & 0xC0) != 0x80) return false
        val c1 = b(i + 1) & 0xFF
        val (lo, hi) =
          if (x == 0xE0) (0xA0, 0xBF) // reject overlong
          else if (x == 0xED) (0x80, 0x9F) // reject surrogates
          else (0x80, 0xBF)
        if (c1 < lo || c1 > hi) return false
        i += 3
      } else if (x >= 0xF0 && x <= 0xF4) { // 11110xxx up to U+10FFFF
        if (i + 3 >= n || (b(i + 2) & 0xC0) != 0x80 ||
          (b(i + 3) & 0xC0) != 0x80) return false
        val c1 = b(i + 1) & 0xFF
        val (lo, hi) =
          if (x == 0xF0) (0x90, 0xBF) // reject overlong
          else if (x == 0xF4) (0x80, 0x8F) // reject > U+10FFFF
          else (0x80, 0xBF)
        if (c1 < lo || c1 > hi) return false
        i += 4
      } else return false // F5-FF and stray continuation bytes
    }
    true
  }
}

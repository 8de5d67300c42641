package graft.core

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

/** HTTP content-coding layer for the fetch byte path (SURVEY.md §2.7
  * F6 adjunct): node-crawler rides `request`, which negotiates
  * `Accept-Encoding: gzip, deflate` and transparently decompresses the
  * body BEFORE charset handling [PK:high]. The sandbox has no network,
  * but the byte path is real — the synthetic web serves gzip-encoded
  * bodies for a deterministic subset of hosts, and [[decode]] is the
  * decompress step that runs ahead of [[CharsetSniffer]].
  *
  * Per RFC 9110 §8.4: `gzip`/`x-gzip` and `deflate` are decoded;
  * `identity`, absent, or unrecognized codings pass bytes through
  * untouched (a real client would fail on an unknown coding it did not
  * offer; the permissive fallback keeps the synthetic fetch total).
  */
object ContentCodec {

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 16)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(bytes); d.finish()
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 16)
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val bos = new ByteArrayOutputStream(bytes.length * 2 + 16)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated deflate stream")
      bos.write(buf, 0, n)
    }
    inf.end()
    bos.toByteArray
  }

  /** Decode a response body per its Content-Encoding; runs BEFORE
    * charset sniffing on the fetch byte path. */
  def decode(bytes: Array[Byte], contentEncoding: Option[String]): Array[Byte] =
    contentEncoding.map(_.trim.toLowerCase) match {
      case Some("gzip") | Some("x-gzip") => gunzip(bytes)
      case Some("deflate")               => inflate(bytes)
      case _                             => bytes // identity / absent / unknown
    }

  /** Does an opaque request-headers string accept gzip bodies? The
    * model's convention mirrors node-crawler/`request`: NO explicit
    * `Accept-Encoding` header means the client transparently accepts
    * gzip [PK:high]; an explicit value negotiates — gzip is served only
    * if the value mentions it. The headers string is the opaque
    * JSON-ish map `queue({headers})` carries, parsed by the shared
    * [[HeaderMap]] tokenizer (round-5 ADVICE: a real parse, not a
    * regex scan — escaped quotes and the key's text appearing inside
    * OTHER header values cannot confuse the negotiation). */
  def acceptsGzip(headers: String): Boolean = {
    if (headers == null) return true
    HeaderMap.get(headers, "accept-encoding") match {
      case null => true
      case v    => v.toLowerCase.contains("gzip")
    }
  }
}

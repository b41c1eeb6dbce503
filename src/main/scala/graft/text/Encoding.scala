package graft.text

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import scala.util.matching.Regex

/**
 * Charset detection + decode, reproducing the reference's `Response.text`
 * byte-for-byte (the BASELINE.json `input_hint` invariant).
 *
 * Reference: `/root/reference/sspider/libs/response.py`
 *  - `get_encoding` (:209-232): charset from Content-Type header param, else
 *    three regexes over the first 1000 chars of content (meta charset, meta
 *    http-equiv pragma, xml declaration), in that priority order.
 *  - `encoding` property (:59-83): gb2312 -> gb18030 promotion, utf-8 fallback.
 *    The chardet branch (:77-78) is excluded by fixture contract (every input
 *    declares its charset or is valid UTF-8) — see SURVEY.md §7.0 item 3.
 *  - `text` property (:96-124): decode with errors='replace' (U+FFFD), and a
 *    LookupError on an unknown charset name falls back to utf-8+replace.
 */
object Encoding {

  /** `charset` parameter of a Content-Type header, quotes stripped
    * (cgi.parse_header + strip("'\"") — response.py:215-218). */
  def headerCharset(contentType: String): Option[String] = {
    if (contentType == null) return None
    contentType.split(";").iterator.drop(1).map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("charset=") =>
        p.substring("charset=".length).trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'")
    }.filter(_.nonEmpty)
  }

  // Same patterns as response.py:221-226 (python re, DOTALL off, IGNORECASE
  // on the first two). `(.+?)` then terminator class `["'>]`.
  private val charsetRe: Regex = new Regex("""(?i)<meta.*?charset=["']*(.+?)["'>]""")
  private val pragmaRe: Regex = new Regex("""(?i)<meta.*?content=["']*;?charset=(.+?)["'>]""")
  private val xmlRe: Regex = new Regex("""^<\?xml.*?encoding=["']*(.+?)["'>]""")

  /** Decode a byte prefix for sniffing like `pretty_unicode(content[:1000])`
    * (utils.py:237-246): utf-8, falling back to latin-1 (the reference's
    * unicode-escape variant only alters non-ASCII bytes, which never appear
    * in the ASCII charset declarations these regexes target). */
  private def sniffWindow(content: Array[Byte]): String = {
    val n = math.min(1000, content.length)
    val slice = java.util.Arrays.copyOfRange(content, 0, n)
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(ByteBuffer.wrap(slice)).toString
    } catch {
      case _: Exception => new String(slice, StandardCharsets.ISO_8859_1)
    }
  }

  /** Charset sniffed from the document head (the three regexes, priority:
    * meta charset, meta pragma, xml declaration). */
  def sniffCharset(content: Array[Byte]): Option[String] = {
    val w = sniffWindow(content)
    charsetRe.findFirstMatchIn(w).map(_.group(1))
      .orElse(pragmaRe.findFirstMatchIn(w).map(_.group(1)))
      .orElse(xmlRe.findFirstMatchIn(w).map(_.group(1)))
  }

  /** Full detection pipeline: header charset else sniffed declaration else
    * the deterministic byte heuristic (chardet-lite), gb2312->gb18030. */
  def detect(contentType: String, content: Array[Byte]): String = {
    val enc = headerCharset(contentType).orElse(sniffCharset(content))
      .getOrElse(detectBytes(content))
    if (enc.toLowerCase == "gb2312") "gb18030" else enc
  }

  /** chardet-lite (response.py:77-78's chardet branch, replaced by a
    * REPRODUCIBLE deterministic subset — real chardet's ML scoring is not
    * oracle-able): for content with NO header/meta/xml declaration,
    *  1. bytes that validate as UTF-8 are UTF-8 (ASCII included);
    *  2. else, if every high byte participates in a well-formed GBK-style
    *     two-byte pair (lead 0x81-0xFE, trail 0x40-0xFE excluding 0x7F) and
    *     at least one such pair exists -> gb18030;
    *  3. else -> iso-8859-1 (the single-byte decode that never fails).
    * Documented boundary: gb18030's rare 4-byte sequences (trail 0x30-0x39)
    * and latin-1 text whose EVERY accented letter happens to precede a
    * pair-compatible byte fall to the other side of the 2/3 split — the
    * contract is the closed-form rule above, not chardet emulation. */
  def detectBytes(content: Array[Byte]): String =
    if (isValidUtf8(content)) "utf-8"
    else if (looksGb18030(content)) "gb18030"
    else "iso-8859-1"

  def isValidUtf8(content: Array[Byte]): Boolean =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(content))
      true
    } catch { case _: Exception => false }

  private def looksGb18030(content: Array[Byte]): Boolean = {
    var i = 0; var pairs = 0
    while (i < content.length) {
      val x = content(i) & 0xFF
      if (x < 0x80) i += 1
      else if (x >= 0x81 && x <= 0xFE && i + 1 < content.length) {
        val y = content(i + 1) & 0xFF
        if (y >= 0x40 && y <= 0xFE && y != 0x7F) { pairs += 1; i += 2 }
        else return false // lone high byte -> not GBK-shaped
      } else return false // 0x80, or a high byte at end of input
    }
    pairs > 0
  }

  /** Decode with errors='replace'; unknown charset name -> utf-8 + replace
    * (response.py:109-119). */
  def decode(content: Array[Byte], charsetName: String): String = {
    val cs =
      try Charset.forName(charsetName)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(content)).toString
  }

  /** `Response.text` equivalent: empty content -> "", else detect + decode. */
  def extractText(content: Array[Byte], contentType: String): String = {
    if (content == null || content.isEmpty) ""
    else decode(content, detect(contentType, content))
  }
}

package graft.extract

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset sniffing for byte payloads (SURVEY.md §2a S2; reference
  * `readability/encoding.py:4-23` and `readability/htmls.py:11-17`).
  *
  * Reference behavior reimplemented:
  *  1. markup is stripped from the raw bytes (`</?[^>]*>\s*` → ' ') before
  *     sniffing, so attribute soup doesn't bias the detector;
  *  2. stripped text blank or shorter than 10 bytes → "ascii";
  *  3. UTF-8 fast path: lenient decode (ignore malformed) then re-encode;
  *     accepted when the byte loss is < 1% of the larger length;
  *  4. otherwise the reference calls chardet (a statistical model, not
  *     available offline) with one fixup (MacCyrillic → cp1251). We
  *     substitute a deterministic detector for the cases the corpus
  *     actually contains: BOMs, then a windows-1251-vs-1252 high-byte
  *     frequency vote, defaulting to windows-1252 (the web's legacy
  *     default). Divergence from chardet is possible on exotic pages and
  *     documented here; fixtures never reach step 4.
  */
object Encodings {

  private val TagRe = """</?[^>]*>\s*""".r

  /** Detected charset name for a raw page, per the reference's rules. */
  def getEncoding(page: Array[Byte]): String = {
    // byte-preserving tag strip (latin-1 round-trips all 256 byte values)
    val raw = new String(page, StandardCharsets.ISO_8859_1)
    val text = TagRe.replaceAllIn(raw, " ")
    if (text.trim.isEmpty || text.length < 10) return "ascii"

    // BOMs decide outright (reference's chardet honors them too)
    if (page.length >= 3 && (page(0) & 0xff) == 0xef &&
      (page(1) & 0xff) == 0xbb && (page(2) & 0xff) == 0xbf) return "utf-8"
    if (page.length >= 2 && (page(0) & 0xff) == 0xff && (page(1) & 0xff) == 0xfe)
      return "utf-16le"
    if (page.length >= 2 && (page(0) & 0xff) == 0xfe && (page(1) & 0xff) == 0xff)
      return "utf-16be"

    val bytes = text.getBytes(StandardCharsets.ISO_8859_1)
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    val decoded = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    val reencoded = decoded.getBytes(StandardCharsets.UTF_8)
    val max = math.max(reencoded.length, bytes.length)
    if (math.abs(bytes.length - reencoded.length) < max * 0.01) return "utf-8"

    // deterministic chardet stand-in: vote Cyrillic (cp1251) vs Latin
    // (cp1252) over high bytes. cp1251 letters occupy 0xC0-0xFF and
    // 0xA8/0xB8 (Ё/ё); cp1252 accented letters cluster in 0xC0-0xFF too,
    // but Latin text uses them sparsely (<15% of letters) while Cyrillic
    // text is ~100% high-byte.
    var high = 0
    var total = 0
    bytes.foreach { b =>
      val u = b & 0xff
      if (!Character.isWhitespace(u) && u != 0) {
        total += 1
        if (u >= 0xc0 || u == 0xa8 || u == 0xb8) high += 1
      }
    }
    if (total > 0 && high.toDouble / total > 0.4) "windows-1251"
    else "windows-1252"
  }

  /** bytes → unicode text per the reference's `build_doc` head: detect,
    * decode with replacement (U+FFFD, like Python `errors='replace'`). */
  def decodePage(page: Array[Byte]): String = {
    val name = getEncoding(page)
    val cs =
      try Charset.forName(name)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(page)).toString
  }
}

package graft.extract

import graft.dom.Node

/** Drop-in facade mirroring the reference's public API surface
  * (`Document(input, **options)` — /root/reference/readability/readability.py:689-749):
  * `summary()`, `content()`, `title()`, `shortTitle()`. Stateless per call
  * like the reference (`_html(force=True)` re-parses on every public
  * call, readability.py:710-725).
  */
final class Document(
    input: String,
    url: String = null,
    minTextLength: Int = 25,
    retryLength: Int = 250,
    urlfetch: String => Option[String] = _ => None,
    multiPage: Boolean = false) {

  private def opts = ExtractOptions(minTextLength, retryLength, url)

  private def parsed: Node = Extractor.parse(input, url)

  /** `Document.summary()`. With `multiPage=false` (default) this is the
    * current reference's flagship single-page path (early return of
    * page_0, readability.py:731-733); with `multiPage=true` it follows
    * next-page links through `urlfetch` like the fixture-era code. */
  def summary(): Summary =
    if (multiPage) Extractor.extractMultiPage(input, opts, urlfetch)
    else Extractor.extract(input, opts)

  /** `Document.content()` — cleaned body HTML (htmls.py:106-115). */
  def content(): String = Titles.getBody(parsed)

  /** `Document.title()` (htmls.py:43-52). */
  def title(): String = Titles.getTitle(parsed)

  /** `Document.short_title()` (htmls.py:54-104). */
  def shortTitle(): String = Titles.shortenTitle(parsed)
}

object Document {
  def apply(input: String, url: String = null): Document =
    new Document(input, url)

  /** Byte-payload entry point: charset-sniff + decode like the
    * reference's `build_doc` (htmls.py:11-17, encoding.py:4-23). */
  def apply(input: Array[Byte], url: String): Document =
    new Document(Encodings.decodePage(input), url)
}

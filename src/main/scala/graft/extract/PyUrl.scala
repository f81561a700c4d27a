package graft.extract

/** Minimal Python-2-`urlparse`-compatible URL handling — `urlsplit`,
  * `urlunsplit`, `urljoin` — as used by the reference's multi-page logic
  * (/root/reference/readability/multi_page.py:121-132,146-152). Implemented
  * per RFC 3986 reference resolution (query-only refs keep the base path,
  * which Python 2 also does and which the nytimes next-page fixture
  * requires); java.net.URI is RFC 2396 and gets that case wrong.
  */
object PyUrl {

  final case class SplitUrl(scheme: String, netloc: String, path: String,
      query: String, fragment: String)

  def urlsplit(url: String): SplitUrl = {
    var rest = url
    var scheme = ""
    var netloc = ""
    var query = ""
    var fragment = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    val colon = rest.indexOf(':')
    if (colon > 0 && rest.substring(0, colon).forall(c =>
      Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.') &&
      Character.isLetter(rest.charAt(0))) {
      scheme = rest.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
      rest = rest.substring(colon + 1)
    }
    if (rest.startsWith("//")) {
      var end = rest.length
      var i = 2
      var found = false
      while (i < rest.length && !found) {
        val c = rest.charAt(i)
        if (c == '/' || c == '?' || c == '#') { end = i; found = true }
        i += 1
      }
      netloc = rest.substring(2, end)
      rest = rest.substring(end)
    }
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    SplitUrl(scheme, netloc, rest, query, fragment)
  }

  def urlunsplit(u: SplitUrl): String = {
    val sb = new StringBuilder
    if (u.scheme.nonEmpty) sb.append(u.scheme).append(':')
    if (u.netloc.nonEmpty || u.scheme.nonEmpty) {
      // Python adds '//' when netloc present, or scheme uses netloc
      if (u.netloc.nonEmpty) sb.append("//").append(u.netloc)
      else if (usesNetloc(u.scheme)) sb.append("//")
    }
    var path = u.path
    if ((u.netloc.nonEmpty || usesNetloc(u.scheme)) && path.nonEmpty &&
      !path.startsWith("/")) path = "/" + path
    sb.append(path)
    if (u.query.nonEmpty) sb.append('?').append(u.query)
    if (u.fragment.nonEmpty) sb.append('#').append(u.fragment)
    sb.toString
  }

  private def usesNetloc(scheme: String): Boolean =
    scheme == "http" || scheme == "https" || scheme == "ftp" || scheme == "file"

  /** RFC 3986 §5.3 reference resolution. */
  def urljoin(base: String, ref: String): String = {
    if (base == null || base.isEmpty) return ref
    if (ref == null || ref.isEmpty) return base
    val b = urlsplit(base)
    val r = urlsplit(ref)
    if (r.scheme.nonEmpty && r.scheme != b.scheme)
      return ref
    val scheme = if (r.scheme.nonEmpty) r.scheme else b.scheme
    if (r.netloc.nonEmpty)
      return urlunsplit(SplitUrl(scheme, r.netloc, removeDotSegments(r.path), r.query, r.fragment))
    if (r.path.isEmpty) {
      val query = if (r.query.nonEmpty) r.query else b.query
      return urlunsplit(SplitUrl(scheme, b.netloc, b.path, query, r.fragment))
    }
    val path =
      if (r.path.startsWith("/")) removeDotSegments(r.path)
      else {
        val merged =
          if (b.netloc.nonEmpty && b.path.isEmpty) "/" + r.path
          else {
            val slash = b.path.lastIndexOf('/')
            if (slash >= 0) b.path.substring(0, slash + 1) + r.path else r.path
          }
        removeDotSegments(merged)
      }
    urlunsplit(SplitUrl(scheme, b.netloc, path, r.query, r.fragment))
  }

  /** RFC 3986 §5.2.4. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }
}

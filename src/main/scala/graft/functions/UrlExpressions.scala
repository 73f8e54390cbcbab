package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernels — the web-corpus ingestion primitives
  * every CommonCrawl-style training-data pipeline leads with (CCNet,
  * RefinedWeb and Dolma all deduplicate on a NORMALIZED url and cap /
  * mix on the registrable domain; the reference engine has no web
  * notion at all — this is part of the LLM-pipeline surface the port
  * adds, like `Dedup`/`TrainingData`).
  *
  * Normalization semantics (documented here because the oracle gates
  * recompute the EXPECTED canonical form in closed form from the
  * columns that generated the messy input — the SQL side never runs a
  * parser, so the contract below is what the hash-compare pins):
  *
  *  1. ASCII-trim; `scheme://` required (letter-first, then
  *     letters/digits/`+-.` — RFC 3986 §3.1)
  *     — anything else → NULL (a filterable reject, mirroring
  *     [[graft.operators.Multimodal]]'s fail-visible rule but at the
  *     row level: web corpora carry junk urls in bulk and a throwing
  *     canonicalizer would poison whole partitions).
  *  2. scheme and host lowercase; userinfo (`user:pw@`) dropped; one
  *     trailing host dot stripped; ONE leading `www.` label stripped.
  *  3. default ports dropped (`http:80`, `https:443`); other ports
  *     kept.
  *  4. fragment dropped; empty path → `/`; path bytes otherwise kept
  *     verbatim (dot-segment resolution and percent-decoding are
  *     deliberately NOT applied — they change retrieval semantics on
  *     real servers and dedup pipelines leave them alone).
  *  5. query split on `&`; empty segments and tracking params dropped
  *     (key prefix `utm_` case-insensitive, or key in gclid / fbclid /
  *     msclkid / mc_eid / igshid); survivors sorted by code unit
  *     (byte order for the ASCII url charset) and re-joined; an empty
  *     survivor set drops the `?`.
  *
  * Scale shape: pure per-row string kernels, codegen'd like the other
  * fused expressions here — no HOF lambdas, no UDF boundary, so url
  * work stays inside whole-stage codegen next to the filters that
  * consume it.
  */
object UrlKernel {

  private val trackingKeys =
    Set("gclid", "fbclid", "msclkid", "mc_eid", "igshid")

  /** Second-level public suffixes recognized by [[registrableDomain]] —
    * a small built-in approximation of the PSL's most common entries
    * (the full list is a data file; pipelines that need it exact pass
    * their own suffix table at the operator level).
    */
  private val secondLevelSuffixes = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.in", "co.za",
    "co.kr", "co.nz", "com.au", "com.br", "com.cn", "com.mx", "com.ar",
    "com.tr", "com.sg")

  /** (scheme, host, port, path, query) of a parseable url, else null.
    * host is lowercased, userinfo-stripped, trailing-dot-stripped; port
    * is -1 when absent or non-numeric-empty; fragment already cut.
    */
  private def parse(raw: String): (String, String, Int, String, String) = {
    val u = raw.trim
    val sep = u.indexOf("://")
    if (sep <= 0) return null
    val scheme = u.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    // RFC 3986 §3.1: scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )
    // — the FIRST char must be a letter, so '1http://x' rejects to NULL
    // instead of normalizing as a digit-led scheme
    if (scheme.charAt(0) < 'a' || scheme.charAt(0) > 'z') return null
    var i = 1
    while (i < scheme.length) {
      val c = scheme.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '-' || c == '.'
      if (!ok) return null
      i += 1
    }
    var rest = u.substring(sep + 3)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val q = rest.indexOf('?')
    val query = if (q >= 0) rest.substring(q + 1) else ""
    if (q >= 0) rest = rest.substring(0, q)
    val slash = rest.indexOf('/')
    var auth = if (slash >= 0) rest.substring(0, slash) else rest
    val path = if (slash >= 0) rest.substring(slash) else "/"
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // ipv6 literals ([::1]:8080) keep the brackets as part of the host
    val colon =
      if (auth.startsWith("[")) auth.indexOf(':', math.max(auth.indexOf(']'), 0))
      else auth.lastIndexOf(':')
    var host = if (colon >= 0) auth.substring(0, colon) else auth
    var port = -1
    if (colon >= 0) {
      val p = auth.substring(colon + 1)
      if (p.nonEmpty) {
        var j = 0
        while (j < p.length) {
          if (p.charAt(j) < '0' || p.charAt(j) > '9') return null
          j += 1
        }
        if (p.length > 5) return null
        port = p.toInt
        if (port > 65535) return null // out-of-range = malformed, like non-numeric
      }
    }
    host = host.toLowerCase(java.util.Locale.ROOT)
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.isEmpty) return null
    (scheme, host, port, path, query)
  }

  private def isTracking(seg: String): Boolean = {
    val eq = seg.indexOf('=')
    val key = (if (eq >= 0) seg.substring(0, eq) else seg)
      .toLowerCase(java.util.Locale.ROOT)
    key.startsWith("utm_") || trackingKeys.contains(key)
  }

  def normalize(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) return null
    val (scheme, host0, port, path, query) = p
    val host = if (host0.startsWith("www.") && host0.length > 4)
      host0.substring(4) else host0
    val keepPort = port >= 0 &&
      !((scheme == "http" && port == 80) || (scheme == "https" && port == 443))
    val segs = query.split("&", -1).filter(s => s.nonEmpty && !isTracking(s))
    java.util.Arrays.sort(segs.asInstanceOf[Array[AnyRef]])
    val sb = new java.lang.StringBuilder(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (segs.nonEmpty) sb.append('?').append(String.join("&", segs: _*))
    UTF8String.fromString(sb.toString)
  }

  /** Lowercased host (userinfo/port stripped, trailing dot stripped,
    * `www.` KEPT — the registrable-domain step decides what to drop).
    */
  def host(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) null else UTF8String.fromString(p._2)
  }

  private def regionMatchesIgnoreCase(s: String, at: Int, what: String): Boolean =
    s.regionMatches(true, at, what, 0, what.length)

  private def indexOfIgnoreCase(s: String, what: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - what.length
    while (i <= last) {
      if (regionMatchesIgnoreCase(s, i, what)) return i
      i += 1
    }
    -1
  }

  // html5 tokenizer rule: '<' opens markup only when followed by a
  // letter (tag), '/'+letter (end tag), or '!'/'?' (declaration /
  // bogus comment); otherwise it is literal text — scraped corpora
  // carry unescaped '<' routinely and a greedy skip-to-'>' would eat
  // visible text. Shared by [[htmlText]] and [[htmlLinks]].
  private def isAsciiLetter(ch: Char): Boolean =
    (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')

  private def opensMarkup(s: String, at: Int): Boolean = at + 1 < s.length && {
    val ch = s.charAt(at + 1)
    isAsciiLetter(ch) || ch == '!' || ch == '?' ||
      (ch == '/' && at + 2 < s.length && isAsciiLetter(s.charAt(at + 2)))
  }

  // '<script' must END the tag name there (whitespace, '/', or '>') so
  // custom elements like <scripture> / <style-guide> keep their
  // visible contents
  private def rawTextOpen(s: String, at: Int, name: String): Boolean =
    regionMatchesIgnoreCase(s, at, name) && {
      val next = at + name.length
      next >= s.length || {
        val ch = s.charAt(next)
        Character.isWhitespace(ch) || ch == '/' || ch == '>'
      }
    }

  private def rawTextClose(s: String, from: Int, name: String): Int = {
    var at = indexOfIgnoreCase(s, name, from)
    while (at >= 0 && !rawTextOpen(s, at, name)) // name must end there too
      at = indexOfIgnoreCase(s, name, at + 1)
    at
  }

  /** If s(i) starts a comment / script / style block, the scan
    * position AFTER the whole block (unterminated → s.length); -1 when
    * it is ordinary markup — THE one block-skip shared by [[htmlText]]
    * and [[htmlLinks]], so an edge-case fix lands in both scanners.
    */
  private def skipNonContent(s: String, i: Int): Int = {
    val n = s.length
    if (regionMatchesIgnoreCase(s, i, "<!--")) {
      val e = s.indexOf("-->", i + 4)
      if (e < 0) n else e + 3
    } else if (rawTextOpen(s, i, "<script")) {
      val e = rawTextClose(s, i + 7, "</script")
      if (e < 0) n else { val gt = s.indexOf('>', e); if (gt < 0) n else gt + 1 }
    } else if (rawTextOpen(s, i, "<style")) {
      val e = rawTextClose(s, i + 6, "</style")
      if (e < 0) n else { val gt = s.indexOf('>', e); if (gt < 0) n else gt + 1 }
    } else -1
  }

  /** (decodedChar, consumedLength) of the entity at `s(i) == '&'`, or
    * null when unknown — THE single entity table behind `html_text`
    * and `html_links`; extending it extends both in lockstep.
    */
  private def entityAt(s: String, i: Int): (Char, Int) =
    if (regionMatchesIgnoreCase(s, i, "&amp;")) ('&', 5)
    else if (regionMatchesIgnoreCase(s, i, "&lt;")) ('<', 4)
    else if (regionMatchesIgnoreCase(s, i, "&gt;")) ('>', 4)
    else if (regionMatchesIgnoreCase(s, i, "&quot;")) ('"', 6)
    else if (regionMatchesIgnoreCase(s, i, "&apos;")) ('\'', 6)
    else if (s.regionMatches(i, "&#39;", 0, 5)) ('\'', 5)
    else if (regionMatchesIgnoreCase(s, i, "&nbsp;")) (' ', 6)
    else null

  /** Visible text of an html fragment — the extraction pass that feeds
    * every downstream text operator when the corpus arrives as raw
    * pages. One linear scan, no DOM:
    *
    *  - `<script>`/`<style>` elements are dropped WITH their contents
    *    (case-insensitive; unterminated → dropped to end of input);
    *    `<!-- -->` comments likewise;
    *  - every other tag is replaced by a word boundary (tags cut at the
    *    first `>`, so attribute values containing a raw `>` are outside
    *    the contract — real-world html escapes them);
    *  - the named entities amp/lt/gt/quot/apos/nbsp and the numeric
    *    `&#39;` decode AFTER tag stripping, so `&lt;script&gt;` becomes
    *    literal text and can never resurrect an element; unknown
    *    entities pass through verbatim;
    *  - whitespace runs (incl. tag boundaries and nbsp) collapse to one
    *    space; output is trimmed. Head/title text is kept (it is
    *    retrieval-relevant); dropping it is the caller's one-liner.
    */
  def htmlText(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def append(c: Char): Unit = {
      if (pendingSpace && out.length > 0) out.append(' ')
      pendingSpace = false
      out.append(c)
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && opensMarkup(s, i)) {
        pendingSpace = true
        val skipped = skipNonContent(s, i)
        if (skipped >= 0) i = skipped
        else {
          val e = s.indexOf('>', i)
          i = if (e < 0) n else e + 1
        }
      } else if (c == '&') {
        val ent = entityAt(s, i)
        if (ent == null) { append('&'); i += 1 }
        else {
          // a decoded space (nbsp) joins the collapse like real space
          if (ent._1 == ' ') pendingSpace = true else append(ent._1)
          i += ent._2
        }
      } else if (Character.isWhitespace(c)) {
        pendingSpace = true
        i += 1
      } else {
        append(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Decode the entity set [[htmlText]] understands inside an
    * attribute value — hrefs routinely carry `&amp;` between query
    * params, and an undecoded one corrupts every downstream url key.
    */
  private def decodeEntities(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    val n = v.length
    while (i < n) {
      val c = v.charAt(i)
      if (c == '&') {
        val ent = entityAt(v, i)
        if (ent == null) { out.append('&'); i += 1 }
        else { out.append(ent._1); i += ent._2 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Index of the '>' closing the markup at s(from)=='<', QUOTE-AWARE
    * (a '>' inside a quoted attribute value does not close the tag —
    * browsers agree); s.length when unterminated.
    */
  private def quoteAwareTagGt(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        val e = s.indexOf(c, i + 1)
        i = if (e < 0) n else e + 1
      } else if (c == '>') return i
      else i += 1
    }
    n
  }

  /** href value from the tag body `s[from, until)` via a real
    * attribute TOKENIZER (name [= value] pairs, '/' separators,
    * quoted or unquoted values): `href` inside ANOTHER attribute's
    * quoted value can't match, and no whitespace is required before
    * the name, so minified `class="x"href="/y"` parses like a browser
    * does. null when the tag has no href attribute.
    */
  private def findHref(s: String, from: Int, until: Int): String = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == '/') i += 1
      else {
        val nameStart = i
        while (i < until && {
          val ch = s.charAt(i)
          !Character.isWhitespace(ch) && ch != '=' && ch != '/'
        }) i += 1
        if (i == nameStart) i += 1 // stray '=' — skip, don't loop forever
        else {
          val name = s.substring(nameStart, i)
          while (i < until && Character.isWhitespace(s.charAt(i))) i += 1
          var value: String = null
          if (i < until && s.charAt(i) == '=') {
            i += 1
            while (i < until && Character.isWhitespace(s.charAt(i))) i += 1
            if (i < until) {
              val q = s.charAt(i)
              if (q == '"' || q == '\'') {
                val e = s.indexOf(q, i + 1)
                if (e < 0 || e > until) { value = s.substring(i + 1, until); i = until }
                else { value = s.substring(i + 1, e); i = e + 1 }
              } else {
                val vs = i
                while (i < until && !Character.isWhitespace(s.charAt(i))) i += 1
                value = s.substring(vs, i)
              }
            } else value = ""
          }
          if (name.equalsIgnoreCase("href")) return value
        }
      }
    }
    null
  }

  /** href targets of a page's `<a>` elements in document order — the
    * edge extractor of the raw-crawl web graph ([[Warc.warcRecords]]
    * splits pages, this emits their outlinks, `url_normalize`
    * canonicalizes them, and the Graph operators take the edges from
    * there). Anchors inside script/style/comment blocks don't count;
    * href is case-insensitive, quoted or unquoted; values
    * entity-decode (`&amp;` → `&`); anchors without an href — or with
    * an empty one — emit nothing. A linkless page yields an EMPTY
    * array, never null (null is reserved for null input).
    */
  def htmlLinks(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && opensMarkup(s, i)) {
        val skipped = skipNonContent(s, i)
        if (skipped >= 0) i = skipped
        else {
          // quote-aware tag end, so an href value carrying a raw '>'
          // survives intact (htmlText's word-boundary contract keeps
          // the simpler first-'>' cut; a wrong BOUNDARY costs a space,
          // a wrong HREF emits a corrupt graph edge)
          val gt = quoteAwareTagGt(s, i)
          if (rawTextOpen(s, i, "<a")) {
            val href = findHref(s, i + 2, gt)
            if (href != null && href.nonEmpty)
              out += UTF8String.fromString(decodeEntities(href))
          }
          i = if (gt >= n) n else gt + 1
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  // ---- crawl payload charset handling ------------------------------ //
  // Real CommonCrawl bodies are NOT all UTF-8: legacy pages declare
  // windows-1252 / iso-8859-* (in the HTTP Content-Type or a <meta>
  // tag) and their bytes are invalid UTF-8 — a blind utf-8 decode
  // turns every accented char into U+FFFD and poisons dedup
  // fingerprints downstream. Three composable kernels mirror the
  // WHATWG encoding-sniffing order, with the PRECEDENCE spelled as a
  // coalesce so the pipeline states it explicitly:
  //
  //   decode_text(payload, coalesce(charset_param(content_type),
  //                                 sniff_charset(payload), 'utf-8'))
  //
  // Each step rejects to NULL (unknown/unsupported charset, no
  // declaration) so the chain falls through — the row-local reject
  // contract of every kernel in this file.

  /** True when the JVM supports `name` as a charset (illegal names
    * included in "no").
    */
  private def supportedCharset(name: String): Boolean =
    name.nonEmpty && (try java.nio.charset.Charset.isSupported(name)
    catch { case _: java.nio.charset.IllegalCharsetNameException => false })

  /** The `tok` after "charset" at/after `from` in `s`: optional
    * whitespace, '=', optional whitespace/quote, token up to
    * quote/';'/'/'/'>' or whitespace. null when absent or empty.
    * "charset" must START a token — the preceding char is ';',
    * whitespace, a quote, or string start — so a parameter name that
    * merely ENDS in "charset" (`notcharset=utf-16`) is not misread as
    * a declaration; a boundary-valid occurrence that fails to parse
    * falls through to the next occurrence (the WHATWG scan keeps
    * going, it does not give up).
    */
  private def charsetTokenAfter(s: String, from: Int): String = {
    var at = indexOfIgnoreCase(s, "charset", from)
    while (at >= 0) {
      val boundary = at == 0 || {
        val c = s.charAt(at - 1)
        c == ';' || c == '"' || c == '\'' || Character.isWhitespace(c)
      }
      if (boundary) {
        var i = at + 7
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '=') {
          i += 1
          while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) i += 1
          val start = i
          while (i < s.length && {
            val c = s.charAt(i)
            !Character.isWhitespace(c) && c != '"' && c != '\'' && c != ';' &&
              c != '/' && c != '>'
          }) i += 1
          if (i > start) return s.substring(start, i)
        }
      }
      at = indexOfIgnoreCase(s, "charset", at + 1)
    }
    null
  }

  /** charset parameter of a Content-Type header value
    * (`text/html; charset=ISO-8859-1`, quoted or bare, any case) →
    * lowercase charset name; NULL when absent or not a charset this
    * JVM supports (an unknown declaration falls through to sniffing,
    * like a browser's).
    */
  def charsetParam(ct: UTF8String): UTF8String = {
    val tok = charsetTokenAfter(ct.toString, 0)
    if (tok == null || !supportedCharset(tok)) null
    else UTF8String.fromString(tok.toLowerCase(java.util.Locale.ROOT))
  }

  /** Meta-declared charset within the first 1024 bytes of an html
    * payload — the WHATWG prescan bound. Both forms are read the same
    * way (`<meta charset="x">` and
    * `<meta http-equiv="content-type" content="text/html; charset=x">`
    * both carry a `charset=` inside the meta tag body); the first
    * supported declaration wins, unsupported ones are skipped. The
    * head bytes are read byte-transparently (latin-1), so the scan
    * itself never depends on the answer. NULL when nothing declares.
    */
  def sniffCharset(bytes: Array[Byte]): UTF8String = {
    val n = math.min(bytes.length, 1024)
    val head = new String(bytes, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = indexOfIgnoreCase(head, "<meta", 0)
    while (i >= 0) {
      val gt = head.indexOf('>', i)
      val end = if (gt < 0) head.length else gt
      val tok = charsetTokenAfter(head.substring(i, end), 0)
      if (tok != null && supportedCharset(tok))
        return UTF8String.fromString(tok.toLowerCase(java.util.Locale.ROOT))
      i = indexOfIgnoreCase(head, "<meta", i + 5)
    }
    null
  }

  /** Decode payload bytes with a named charset → string; malformed /
    * unmappable sequences become U+FFFD (browser behavior — a legacy
    * page with one bad byte should not lose the row), but an
    * unsupported charset NAME rejects the whole row to NULL (the
    * caller's coalesce should have supplied a real one).
    */
  def decodeText(bytes: Array[Byte], charset: UTF8String): UTF8String = {
    val name = charset.toString.trim
    if (!supportedCharset(name)) return null
    val dec = java.nio.charset.Charset.forName(name).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
  }

  // ---- robots.txt (RFC 9309) ---------------------------------------- //
  // The crawl-politeness filter: every raw-crawl pipeline that emits
  // fetch lists needs "may agent X fetch path P under this
  // robots.txt". Semantics per RFC 9309:
  //  - groups = one or more `user-agent:` lines followed by
  //    `allow:`/`disallow:` rules; keys case-insensitive; `#` starts
  //    a comment; unknown directives (crawl-delay, sitemap) are
  //    ignored but TERMINATE the user-agent run (a group's agent list
  //    only grows while no rule has intervened);
  //  - group selection: the MOST SPECIFIC matching user-agent — the
  //    longest line value that is a case-insensitive PREFIX of the
  //    crawler's PRODUCT TOKEN (the leading letters/digits/'_'/'-'
  //    run of its user-agent string, §2.2.1); `*` matches anything
  //    but loses to any specific match. ALL groups with the winning
  //    value merge.
  //  - rule matching: patterns anchor at the path START, `*` matches
  //    any run, `$` (final char) anchors the end; the matching rule
  //    with the MOST OCTETS wins; an allow/disallow tie at equal
  //    length is ALLOW (least-restrictive rule, §2.2.2); an empty
  //    pattern is a no-op rule;
  //  - no matching group or no matching rule → allowed.
  // Percent-encoding equivalence is out of scope (compare paths in
  // the encoding the caller uses — the same contract as
  // [[normalize]], which leaves path bytes verbatim).

  /** `pattern` matches a PREFIX of `path`, `*` = any run, trailing
    * `$` = end anchor. Iterative greedy-with-backtrack (the classic
    * star matcher), linear-ish in practice.
    */
  private[functions] def robotsPatternMatches(pattern: String, path: String): Boolean = {
    var pat = pattern
    var anchored = false
    if (pat.endsWith("$")) { anchored = true; pat = pat.substring(0, pat.length - 1) }
    val n = path.length
    val m = pat.length
    var i = 0; var j = 0       // path / pattern cursors
    var starJ = -1; var starI = -1
    while (i < n) {
      // '*' in an RFC 9309 pattern is ALWAYS a wildcard, never a
      // literal — checked before literal equality, otherwise a '*'
      // path char (legal in a URI path) would consume the pattern's
      // star as a literal and lose the backtrack point:
      // "/*.tmp$" must match "/*x.tmp"
      if (j < m && pat.charAt(j) == '*') { starJ = j; starI = i; j += 1 }
      else if (j < m && pat.charAt(j) == path.charAt(i)) { i += 1; j += 1 }
      // unanchored + pattern exhausted = prefix matched — checked
      // BEFORE backtracking, which only helps anchored patterns here
      else if (j >= m && !anchored) return true
      else if (starJ >= 0) { starI += 1; i = starI; j = starJ + 1 }
      else return false
    }
    // path exhausted: rest of pattern must be stars
    while (j < m && pat.charAt(j) == '*') j += 1
    j >= m // anchored or not, the whole path was consumed
  }

  /** Product token of a crawler's user-agent string: the leading run
    * of letters/'_'/'-' (RFC 9309 §2.2.1's token alphabet, plus
    * digits — real tokens like "bot2" carry them), lowercased.
    * "GraftBot/1.0 (+http://…)" → "graftbot". Group matching compares
    * THIS token, never the raw string — a substring match would let a
    * "bot" group govern "abbott/1.0".
    */
  private def productToken(agent: String): String = {
    var e = 0
    while (e < agent.length && {
      val c = agent.charAt(e)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-'
    }) e += 1
    agent.substring(0, e).toLowerCase(java.util.Locale.ROOT)
  }

  /** true/false per the contract above; `null` robots/agent/path are
    * handled by the expression layer (null in → null out).
    */
  def robotsAllowed(robots: UTF8String, agent: UTF8String,
      path: UTF8String): Boolean = {
    val token = productToken(agent.toString)
    val p = path.toString
    // parse: (agentValueLowercase, isAllow, pattern) triples in file
    // order, remembering each rule's owning agent values
    var bestAgent: String = null // longest matching specific value
    var starSeen = false
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(String, Boolean, String)]
    var currentAgents = List.empty[String]
    var inAgentRun = true
    robots.toString.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              val v = value.toLowerCase(java.util.Locale.ROOT)
              if (inAgentRun) currentAgents ::= v
              else { currentAgents = List(v); inAgentRun = true }
              // a line value matches when it is a case-insensitive
              // PREFIX of the crawler's product token (equality
              // included) — "bot" governs "bot-news" but never
              // "abbott"; most-specific = longest such prefix
              if (v == "*") starSeen = true
              else if (token.startsWith(v) &&
                (bestAgent == null || v.length > bestAgent.length))
                bestAgent = v
            case "allow" | "disallow" =>
              inAgentRun = false
              currentAgents.foreach { a =>
                rules += ((a, key == "allow", value))
              }
            case _ => inAgentRun = false // crawl-delay etc: ends the run
          }
        }
      }
    }
    val winner = if (bestAgent != null) bestAgent else if (starSeen) "*" else null
    if (winner == null) return true // no applicable group
    var verdict = true        // default allow
    var bestLen = -1
    rules.foreach { case (a, isAllow, pattern) =>
      if (a == winner && pattern.nonEmpty &&
        robotsPatternMatches(pattern, p)) {
        val len = pattern.length
        // longest wins; equal length: allow beats disallow (§2.2.2)
        if (len > bestLen || (len == bestLen && isAllow)) {
          bestLen = len; verdict = isAllow
        }
      }
    }
    verdict
  }

  /** Sitemap urls declared in a robots.txt (`Sitemap:` lines, any
    * case, comments stripped like [[robotsAllowed]]) in file order —
    * the discovery hop between politeness and [[sitemapLocs]]. Empty
    * array when none are declared.
    */
  def robotsSitemaps(robots: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    robots.toString.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val c = line.indexOf(':')
      if (c > 0 &&
        line.substring(0, c).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) out += UTF8String.fromString(v)
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** `<loc>` contents of a sitemap / sitemap-index xml in document
    * order (the one element both formats share), entity-decoded with
    * the shared table, CDATA-unwrapped, whitespace-trimmed; an
    * unterminated `<loc>` is ignored. No DOM — one linear scan, the
    * [[htmlLinks]] discipline.
    */
  def sitemapLocs(xml: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = xml.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = indexOfIgnoreCase(s, "<loc", 0)
    while (i >= 0) {
      val nameEnd = i + 4
      val isLocTag = nameEnd < n && {
        val ch = s.charAt(nameEnd)
        ch == '>' || Character.isWhitespace(ch)
      }
      if (isLocTag) {
        val gt = s.indexOf('>', i)
        val close = if (gt < 0) -1 else indexOfIgnoreCase(s, "</loc", gt + 1)
        if (gt < 0 || close < 0) {
          i = -1 // unterminated: ignore the tail
        } else {
          var content = s.substring(gt + 1, close).trim
          if (content.startsWith("<![CDATA[") && content.endsWith("]]>"))
            content = content.substring(9, content.length - 3).trim
          if (content.nonEmpty)
            out += UTF8String.fromString(decodeEntities(content))
          i = indexOfIgnoreCase(s, "<loc", close + 5)
        }
      } else i = indexOfIgnoreCase(s, "<loc", i + 4)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  // ---- RFC 3986 §5 reference resolution ---------------------------- //
  // The relative-link resolver the web-graph path needs: html_links
  // emits hrefs AS WRITTEN, and on real pages the majority are
  // relative ("../a", "./b", "/c", "d?q", "//host/e") — without
  // resolution against the page's own uri they reject at
  // url_normalize and the crawl graph silently loses most of its
  // edges. Resolution is the RFC's component algorithm (§5.2.2):
  // transform the reference over the base's (scheme, authority, path,
  // query), merge relative paths (§5.3), remove dot segments (§5.2.4),
  // recompose (§5.3). The base must itself be absolute (have a
  // scheme) — otherwise NULL, the row-local reject contract shared by
  // every kernel in this file. Unlike [[normalize]], the OUTPUT keeps
  // the ref's fragment and applies no canonicalization beyond dot-
  // segment removal: resolve answers "what uri does this anchor point
  // at" and normalize stays the one place canonical form is decided.

  private def isScheme(s: String): Boolean =
    s.nonEmpty && {
      val c0 = s.charAt(0)
      ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')) && {
        var i = 1
        var ok = true
        while (ok && i < s.length) {
          val c = s.charAt(i)
          ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
          i += 1
        }
        ok
      }
    }

  /** Loose URI-reference split per RFC 3986 appendix B — every string
    * is a syntactically valid reference, so this never rejects; null
    * fields mean "component undefined" (the defined-but-empty vs
    * undefined distinction matters: `g?` keeps its empty query,
    * `g` has none). Unlike [[parse]] this accepts authority-less and
    * scheme-less forms — resolution needs them; [[normalize]] keeps
    * its strict contract.
    */
  private def splitRef(s: String):
      (String, String, String, String, String) = {
    var u = s
    var fragment: String = null
    val h = u.indexOf('#')
    if (h >= 0) { fragment = u.substring(h + 1); u = u.substring(0, h) }
    var scheme: String = null
    val c = u.indexOf(':')
    // scheme chars exclude '/' and '?', so a ':' later in a path or
    // query never parses as one
    if (c > 0 && isScheme(u.substring(0, c))) {
      scheme = u.substring(0, c).toLowerCase(java.util.Locale.ROOT)
      u = u.substring(c + 1)
    }
    var authority: String = null
    if (u.startsWith("//")) {
      var e = 2
      while (e < u.length && u.charAt(e) != '/' && u.charAt(e) != '?') e += 1
      authority = u.substring(2, e)
      u = u.substring(e)
    }
    var query: String = null
    val q = u.indexOf('?')
    if (q >= 0) { query = u.substring(q + 1); u = u.substring(0, q) }
    (scheme, authority, u, query, fragment)
  }

  /** §5.2.4 remove_dot_segments — "/a/b/../c" → "/a/c", "/./g" → "/g";
    * leading ".."s with no segment to pop vanish (the RFC's abnormal
    * examples: "../../../g" against "http://a/b/c/d" → "http://a/g").
    */
  private def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    def pop(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out.charAt(i) != '/') i -= 1
      out.setLength(math.max(i, 0))
    }
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); pop() }
      else if (in == "/..") { in = "/"; pop() }
      else if (in == "." || in == "..") in = ""
      else {
        var e = if (in.charAt(0) == '/') 1 else 0
        while (e < in.length && in.charAt(e) != '/') e += 1
        out.append(in, 0, e)
        in = in.substring(e)
      }
    }
    out.toString
  }

  /** §5.3 merge: a relative path grafts onto the base path's directory
    * (everything up to the last '/'); a base with authority but an
    * empty path acts as root.
    */
  private def mergePaths(baseAuth: String, basePath: String,
      refPath: String): String =
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val i = basePath.lastIndexOf('/')
      if (i < 0) refPath else basePath.substring(0, i + 1) + refPath
    }

  /** url_resolve(base, ref) — the absolute uri the reference points at
    * when written on a page at `base`, per RFC 3986 §5.2.2; NULL when
    * the base is not an absolute uri (no scheme). Both inputs
    * ASCII-trim like [[normalize]] (hrefs carry stray whitespace in
    * real markup).
    */
  def resolve(base: UTF8String, ref: UTF8String): UTF8String = {
    val b = splitRef(base.toString.trim)
    if (b._1 == null) return null // base must be absolute
    val r = splitRef(ref.toString.trim)
    var scheme: String = null
    var authority: String = null
    var path: String = null
    var query: String = null
    if (r._1 != null) {
      scheme = r._1; authority = r._2
      path = removeDotSegments(r._3); query = r._4
    } else {
      scheme = b._1
      if (r._2 != null) {
        authority = r._2; path = removeDotSegments(r._3); query = r._4
      } else {
        authority = b._2
        if (r._3.isEmpty) {
          path = b._3
          query = if (r._4 != null) r._4 else b._4
        } else {
          path =
            if (r._3.charAt(0) == '/') removeDotSegments(r._3)
            else removeDotSegments(mergePaths(b._2, b._3, r._3))
          query = r._4
        }
      }
    }
    val sb = new java.lang.StringBuilder(scheme).append(':')
    if (authority != null) sb.append("//").append(authority)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (r._5 != null) sb.append('#').append(r._5)
    UTF8String.fromString(sb.toString)
  }

  /** Registrable domain of the url's host: the last two labels, or the
    * last three when the final two form a known second-level public
    * suffix (`foo.co.uk` → `foo.co.uk`, `www.foo.com` → `foo.com`).
    * Hosts with fewer labels (or ip literals) return as-is. A host
    * that IS a known public suffix ("co.uk") has no registrable domain
    * and rejects to NULL like an unparseable url — otherwise suffix-
    * only hosts would get bucketed as domains in domain-cap/mix
    * pipelines and one bucket would absorb every site under the suffix.
    */
  def registrableDomain(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) return null
    val h = p._2
    if (h.startsWith("[")) return UTF8String.fromString(h) // ipv6 literal
    if (secondLevelSuffixes.contains(h)) return null // bare suffix: no domain
    val labels = h.split("\\.", -1)
    if (labels.length < 2) return UTF8String.fromString(h)
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val n = if (labels.length >= 3 && secondLevelSuffixes.contains(lastTwo)) 3 else 2
    UTF8String.fromString(labels.takeRight(n).mkString("."))
  }

  // ---- HTTP response envelope (RFC 9112) ---------------------------- //
  // A real crawl's WARC `response` record payload is NOT bare html: it
  // is a full HTTP message — `HTTP/1.1 200 OK\r\nheaders\r\n\r\nbody`,
  // with the body frequently Transfer-Encoding: chunked and/or
  // Content-Encoding: gzip/deflate. Three kernels split the envelope
  // so the charset/html chain downstream sees what a browser sees:
  //   http_status(payload)        → status code (int)
  //   http_header(payload, name)  → first header value, name
  //                                 case-insensitive
  //   http_body(payload)          → body bytes, DEchunked then
  //                                 content-DEcoded
  // plus gunzip(bytes) for standalone gzip members (sitemap .xml.gz).
  // All reject row-locally to NULL on a malformed envelope / unknown
  // coding — the shared contract of this file. Line endings are
  // lenient (\r\n or bare \n — real servers emit both); header bytes
  // are read latin-1 (byte-transparent), the body stays bytes so the
  // charset decision happens ONCE, downstream, with the header text
  // this splitter exposes.

  /** (head-text, body-start) of an HTTP message, or null when the
    * bytes do not start with `HTTP/` or no blank line terminates the
    * head.
    */
  private def splitHttp(bytes: Array[Byte]): (String, Int) = {
    val n = bytes.length
    if (n < 7 || bytes(0) != 'H' || bytes(1) != 'T' || bytes(2) != 'T' ||
      bytes(3) != 'P' || bytes(4) != '/') return null
    var i = 0
    while (i < n) {
      if (bytes(i) == '\n') {
        if (i + 1 < n && bytes(i + 1) == '\n')
          return (new String(bytes, 0, i,
            java.nio.charset.StandardCharsets.ISO_8859_1), i + 2)
        if (i + 2 < n && bytes(i + 1) == '\r' && bytes(i + 2) == '\n')
          return (new String(bytes, 0, i,
            java.nio.charset.StandardCharsets.ISO_8859_1), i + 3)
      }
      i += 1
    }
    null
  }

  /** Status code of an HTTP response payload (`HTTP/1.1 200 OK` →
    * 200); null when the payload is not an HTTP message or the status
    * line is malformed.
    */
  def httpStatus(bytes: Array[Byte]): java.lang.Integer = {
    val split = splitHttp(bytes)
    if (split == null) return null
    val head = split._1
    val lineEnd = { val e = head.indexOf('\n'); if (e < 0) head.length else e }
    val line = head.substring(0, lineEnd).stripSuffix("\r")
    val sp = line.indexOf(' ')
    if (sp < 0 || sp + 4 > line.length) return null
    var code = 0
    var i = sp + 1
    while (i < sp + 4) {
      val c = line.charAt(i)
      if (c < '0' || c > '9') return null
      code = code * 10 + (c - '0')
      i += 1
    }
    // a 3-digit field per RFC 9112 §4: the next char (if any) is SP
    if (sp + 4 < line.length && line.charAt(sp + 4) != ' ') return null
    Integer.valueOf(code)
  }

  /** Header lines of a message head with obs-fold continuations
    * (RFC 9112 §5.2: a line starting with SP/HTAB continues the
    * previous header) unfolded into their owning line with one space;
    * the status line is excluded. Deprecated syntax, but real legacy
    * servers emit it and silently dropping the continuation would
    * truncate the very header (Content-Type) the charset chain reads.
    */
  private def headerLines(head: String): List[String] = {
    val raw = head.linesIterator.toList.drop(1) // status line
    val out = scala.collection.mutable.ListBuffer.empty[String]
    raw.foreach { l =>
      if (l.nonEmpty && (l.charAt(0) == ' ' || l.charAt(0) == '\t') &&
        out.nonEmpty)
        out(out.length - 1) = out.last + " " + l.trim
      else out += l
    }
    out.toList
  }

  /** First header value named `name` (case-insensitive) of an HTTP
    * response payload, trimmed; null when absent or the payload is not
    * an HTTP message.
    */
  def httpHeader(bytes: Array[Byte], name: UTF8String): UTF8String = {
    val split = splitHttp(bytes)
    if (split == null) return null
    val want = name.toString
    headerLines(split._1).foreach { line =>
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase(want))
        return UTF8String.fromString(line.substring(c + 1).trim)
    }
    null
  }

  /** Reverse the chunked transfer coding (RFC 9112 §7.1): hex-size
    * lines, chunk bytes, CRLF, a zero-size terminator (trailers
    * ignored). null on any structural violation.
    */
  private def dechunk(bytes: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length - from)
    var pos = from
    val n = bytes.length
    while (true) {
      var e = pos
      while (e < n && bytes(e) != '\n') e += 1
      if (e >= n) return null // unterminated size line
      val sizeLine = new String(bytes, pos, e - pos,
        java.nio.charset.StandardCharsets.ISO_8859_1).stripSuffix("\r")
      // chunk extensions (";ext=v") are legal and discarded
      val semi = sizeLine.indexOf(';')
      val hex = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      if (hex.isEmpty || !hex.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F'))) return null
      val size = try java.lang.Long.parseLong(hex, 16) catch {
        case _: NumberFormatException => return null
      }
      if (size == 0) return out.toByteArray // trailers/final CRLF ignored
      pos = e + 1
      if (pos + size > n) return null // chunk overruns the payload
      out.write(bytes, pos, size.toInt)
      pos += size.toInt
      // the CRLF (or LF) closing the chunk
      if (pos < n && bytes(pos) == '\r') pos += 1
      if (pos >= n || bytes(pos) != '\n') return null
      pos += 1
    }
    null // unreachable
  }

  /** Decompress one-or-more concatenated gzip members; null when the
    * bytes are not well-formed gzip (row-local reject — a claimed
    * .xml.gz that isn't).
    */
  def gunzip(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.max(bytes.length * 3, 64))
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => null }

  /** Inflate a deflate body: zlib-wrapped per the RFC, with the
    * raw-deflate fallback real servers actually send (the same
    * auto-detect browsers do). null when neither parses.
    */
  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] =
      try {
        val inf = new java.util.zip.Inflater(raw)
        inf.setInput(bytes)
        val out = new java.io.ByteArrayOutputStream(math.max(bytes.length * 3, 64))
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          if (k == 0 && (inf.needsInput() || inf.needsDictionary())) {
            inf.end(); return null // truncated / dictionary: malformed
          }
          out.write(buf, 0, k)
        }
        inf.end()
        out.toByteArray
      } catch { case _: java.util.zip.DataFormatException => null }
    val zlib = run(raw = false)
    if (zlib != null) zlib else run(raw = true)
  }

  /** One coding decoded; null = unknown coding or corrupt data. */
  private def decodeOneCoding(bytes: Array[Byte], coding: String): Array[Byte] =
    coding match {
      case "identity"        => bytes
      case "gzip" | "x-gzip" => gunzip(bytes)
      case "deflate"         => inflate(bytes)
      case _                 => null // br/compress/…: undecodable here
    }

  /** Apply a comma-listed coding chain in DECODE direction (the sender
    * applied them left-to-right, so decode right-to-left); null when
    * any hop is unknown or corrupt.
    */
  private def decodeCodingChain(bytes: Array[Byte], codings: List[String]): Array[Byte] =
    codings.reverse.foldLeft(bytes) { (b, c) =>
      if (b == null) null else decodeOneCoding(b, c)
    }

  /** Body bytes of an HTTP response payload: the bytes after the blank
    * line, DEchunked when `Transfer-Encoding` ends in `chunked`, any
    * remaining transfer codings and the `Content-Encoding` chain then
    * decoded right-to-left (gzip/x-gzip, deflate, identity/absent —
    * comma-listed chains like `gzip, chunked` or `deflate, gzip`
    * included). null when the envelope is malformed, any coding is
    * unknown (br, compress, …) or its data doesn't parse — the
    * caller's filter/coalesce decides what to do with rejected rows.
    */
  def httpBody(bytes: Array[Byte]): Array[Byte] = {
    val split = splitHttp(bytes)
    if (split == null) return null
    val (head, bodyAt) = split
    var te: String = null
    var ce: String = null
    // RFC 9110 §5.3: repeated field lines combine IN ORDER into one
    // comma-list — a response carrying two Content-Encoding lines
    // ("deflate" then "gzip") is coded gzip-over-deflate, and keeping
    // only the first line would decode one hop and return wrong bytes
    headerLines(head).foreach { line =>
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val v = line.substring(c + 1).trim.toLowerCase(java.util.Locale.ROOT)
        if (key == "transfer-encoding")
          te = if (te == null) v else te + "," + v
        else if (key == "content-encoding")
          ce = if (ce == null) v else ce + "," + v
      }
    }
    def codings(v: String): List[String] =
      if (v == null) Nil
      else v.split(",").map(_.trim).filter(_.nonEmpty).toList
    val teCodings = codings(te)
    // `chunked` is framing, not compression: strip it via dechunk,
    // then the REST of the transfer chain decodes like content codings
    // (a te list not ending in chunked is length-delimited here — the
    // WARC record's Content-Length bounds the capture, so the raw tail
    // IS the coded body)
    val raw: Array[Byte] =
      if (teCodings.nonEmpty && teCodings.last == "chunked")
        dechunk(bytes, bodyAt)
      else java.util.Arrays.copyOfRange(bytes, bodyAt, bytes.length)
    if (raw == null) return null
    val afterTe = decodeCodingChain(raw,
      if (teCodings.nonEmpty && teCodings.last == "chunked") teCodings.init
      else teCodings)
    if (afterTe == null) return null
    decodeCodingChain(afterTe, codings(ce))
  }
}

private[functions] abstract class UrlUnary extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed input → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.catalogString}")

  protected def kernelMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val code = nullSafeCodeGen(ctx, ev,
      c => s"""
        ${ev.value} = $cls.$kernelMethod($c);
        ${ev.isNull} = ${ev.value} == null;""")
    code
  }
}

/** url_normalize(url) → canonical url string, NULL when unparseable. */
case class UrlNormalize(child: Expression) extends UrlUnary {
  override def prettyName: String = "url_normalize"
  override protected def kernelMethod: String = "normalize"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.normalize(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** url_host(url) → lowercased host, NULL when unparseable. */
case class UrlHost(child: Expression) extends UrlUnary {
  override def prettyName: String = "url_host"
  override protected def kernelMethod: String = "host"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.host(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** html_text(html) → visible text (script/style/comments dropped,
  * tags → word boundaries, entities decoded, whitespace collapsed).
  * Total function over strings — never null on non-null input.
  */
case class HtmlText(child: Expression) extends UrlUnary {
  override def prettyName: String = "html_text"
  // nullable stays UrlUnary's `true` even though the kernel is total:
  // doGenCode assigns ev.isNull, and a non-nullable expression turns
  // ev.isNull into the literal "false" — the generated Java would then
  // assign to a non-lvalue and knock the stage out of codegen.
  override protected def kernelMethod: String = "htmlText"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.htmlText(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** charset_param(content_type) → lowercase charset parameter of a
  * Content-Type header value; NULL when absent or unsupported.
  */
case class CharsetParam(child: Expression) extends UrlUnary {
  override def prettyName: String = "charset_param"
  override protected def kernelMethod: String = "charsetParam"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.charsetParam(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sniff_charset(payload) → meta-declared charset within the first
  * 1024 payload bytes (WHATWG prescan bound); NULL when undeclared.
  */
case class SniffCharset(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sniff_charset"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // undeclared → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.sniffCharset(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.sniffCharset($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** decode_text(payload, charset) → payload bytes decoded with the
  * named charset (malformed sequences → U+FFFD); NULL when the
  * charset name is unsupported.
  */
case class DecodeText(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "decode_text"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // unsupported charset → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    UrlKernel.decodeText(a.asInstanceOf[Array[Byte]], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $cls.decodeText($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** robots_allowed(robots_txt, agent, path) → may `agent` fetch `path`
  * under this robots.txt, per RFC 9309 (most-specific group,
  * longest-match rule, allow wins ties, `*`/`$` patterns). Total on
  * non-null input — an unparseable robots.txt simply contributes no
  * rules (allowed), matching crawler behavior.
  */
case class RobotsAllowed(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "robots_allowed"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string, string), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    UrlKernel.robotsAllowed(r.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (r, a, p) => s"${ev.value} = $cls.robotsAllowed($r, $a, $p);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** url_resolve(base, ref) → absolute uri of `ref` written on a page
  * at `base`, per RFC 3986 §5 reference resolution (merge, dot-segment
  * removal, recomposition); NULL when base has no scheme. The output
  * is NOT canonicalized — chain `url_normalize` for that.
  */
case class UrlResolve(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "url_resolve"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // unparseable base → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    UrlKernel.resolve(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $cls.resolve($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** url_domain(url) → registrable domain, NULL when unparseable. */
case class UrlRegistrableDomain(child: Expression) extends UrlUnary {
  override def prettyName: String = "url_domain"
  override protected def kernelMethod: String = "registrableDomain"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.registrableDomain(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** html_links(html) → array of `<a>` href targets in document order
  * (entity-decoded; empty array when linkless; NULL only on null
  * input). Array type, so it lives outside the [[UrlUnary]] family.
  */
case class HtmlLinks(child: Expression) extends UnaryExpression {
  override def prettyName: String = "html_links"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.htmlLinks(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // the kernel never returns null, so no isNull assignment is needed
    // (and none is safe: a non-nullable child makes ev.isNull a literal)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.htmlLinks($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

private[functions] abstract class UrlStringArrayUnary extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.catalogString}")

  protected def kernelMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // the kernels never return null (empty array instead), so no
    // isNull assignment — and none is safe with non-nullable children
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.$kernelMethod($c);")
  }
}

/** robots_sitemaps(robots_txt) → array of declared Sitemap urls in
  * file order; empty array when none.
  */
case class RobotsSitemaps(child: Expression) extends UrlStringArrayUnary {
  override def prettyName: String = "robots_sitemaps"
  override protected def kernelMethod: String = "robotsSitemaps"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.robotsSitemaps(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Shared shape for binary→binary envelope kernels (http_body,
  * gunzip): reject-to-NULL, full codegen.
  */
private[functions] abstract class UrlBinaryUnary extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed input → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${child.dataType.catalogString}")

  protected def kernelMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.$kernelMethod($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }
}

/** http_status(payload) → status code of an HTTP response message;
  * NULL when the payload is not one.
  */
case class HttpStatus(child: Expression) extends UnaryExpression {
  override def prettyName: String = "http_status"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // not an HTTP message → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.httpStatus(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("status")
      s"""
      java.lang.Integer $boxed = $cls.httpStatus($c);
      ${ev.isNull} = $boxed == null;
      if (!${ev.isNull}) ${ev.value} = $boxed.intValue();"""
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** http_header(payload, name) → first header value of that
  * (case-insensitive) name in an HTTP response message, trimmed; NULL
  * when absent or the payload is not an HTTP message.
  */
case class HttpHeader(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "http_header"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // absent header → null

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    UrlKernel.httpHeader(a.asInstanceOf[Array[Byte]], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $cls.httpHeader($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** http_body(payload) → body bytes of an HTTP response message,
  * dechunked (Transfer-Encoding: chunked) then content-decoded
  * (gzip/deflate/identity); NULL on a malformed envelope or an
  * undecodable coding.
  */
case class HttpBody(child: Expression) extends UrlBinaryUnary {
  override def prettyName: String = "http_body"
  override protected def kernelMethod: String = "httpBody"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.httpBody(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** gunzip(bytes) → decompressed bytes of one-or-more concatenated gzip
  * members; NULL when not well-formed gzip.
  */
case class Gunzip(child: Expression) extends UrlBinaryUnary {
  override def prettyName: String = "gunzip"
  override protected def kernelMethod: String = "gunzip"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.gunzip(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sitemap_locs(xml) → array of `<loc>` targets in document order
  * (urlset or sitemapindex), entity-decoded; empty array when none.
  */
case class SitemapLocs(child: Expression) extends UrlStringArrayUnary {
  override def prettyName: String = "sitemap_locs"
  override protected def kernelMethod: String = "sitemapLocs"
  override protected def nullSafeEval(v: Any): Any =
    UrlKernel.sitemapLocs(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UrlFunctions {
  /** Column form of [[UrlNormalize]]. */
  def urlNormalize(c: Column): Column =
    GraftBridge.column(UrlNormalize(GraftBridge.expression(c)))

  /** Column form of [[UrlHost]]. */
  def urlHost(c: Column): Column =
    GraftBridge.column(UrlHost(GraftBridge.expression(c)))

  /** Column form of [[UrlRegistrableDomain]]. */
  def urlDomain(c: Column): Column =
    GraftBridge.column(UrlRegistrableDomain(GraftBridge.expression(c)))

  /** Column form of [[UrlResolve]]. */
  def urlResolve(base: Column, ref: Column): Column =
    GraftBridge.column(UrlResolve(
      GraftBridge.expression(base), GraftBridge.expression(ref)))

  /** Column form of [[HtmlText]]. */
  def htmlText(c: Column): Column =
    GraftBridge.column(HtmlText(GraftBridge.expression(c)))

  /** Column form of [[HtmlLinks]]. */
  def htmlLinks(c: Column): Column =
    GraftBridge.column(HtmlLinks(GraftBridge.expression(c)))

  /** Column form of [[CharsetParam]]. */
  def charsetParam(c: Column): Column =
    GraftBridge.column(CharsetParam(GraftBridge.expression(c)))

  /** Column form of [[SniffCharset]]. */
  def sniffCharset(c: Column): Column =
    GraftBridge.column(SniffCharset(GraftBridge.expression(c)))

  /** Column form of [[DecodeText]]. */
  def decodeText(payload: Column, charset: Column): Column =
    GraftBridge.column(DecodeText(
      GraftBridge.expression(payload), GraftBridge.expression(charset)))

  /** Column form of [[RobotsAllowed]]. */
  def robotsAllowed(robots: Column, agent: Column, path: Column): Column =
    GraftBridge.column(RobotsAllowed(GraftBridge.expression(robots),
      GraftBridge.expression(agent), GraftBridge.expression(path)))

  /** Column form of [[RobotsSitemaps]]. */
  def robotsSitemaps(c: Column): Column =
    GraftBridge.column(RobotsSitemaps(GraftBridge.expression(c)))

  /** Column form of [[SitemapLocs]]. */
  def sitemapLocs(c: Column): Column =
    GraftBridge.column(SitemapLocs(GraftBridge.expression(c)))

  /** Column form of [[HttpStatus]]. */
  def httpStatus(c: Column): Column =
    GraftBridge.column(HttpStatus(GraftBridge.expression(c)))

  /** Column form of [[HttpHeader]]. */
  def httpHeader(payload: Column, name: Column): Column =
    GraftBridge.column(HttpHeader(
      GraftBridge.expression(payload), GraftBridge.expression(name)))

  /** Column form of [[HttpBody]]. */
  def httpBody(c: Column): Column =
    GraftBridge.column(HttpBody(GraftBridge.expression(c)))

  /** Column form of [[Gunzip]]. */
  def gunzip(c: Column): Column =
    GraftBridge.column(Gunzip(GraftBridge.expression(c)))
}

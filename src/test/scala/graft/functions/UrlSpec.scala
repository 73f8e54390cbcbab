package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UrlKernel / url_* expression semantics — every case hand-computed
  * from the contract in the UrlExpressions scaladoc (the oracle gates
  * q_url_norm / q_url_domain / q_url_dedup recompute expected outputs
  * in closed form, so this spec is where the parser itself is pinned).
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = Seq(u).toDF("u")
      .select(UrlFunctions.urlNormalize(col("u")).as("n")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def host(u: String): String = {
    val r = Seq(u).toDF("u")
      .select(UrlFunctions.urlHost(col("u")).as("h")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def domain(u: String): String = {
    val r = Seq(u).toDF("u")
      .select(UrlFunctions.urlDomain(col("u")).as("d")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("urlNormalize: case, www, default port, tracking params, sort, fragment") {
    assert(norm("HTTP://WWW.Example.COM:80/a/b?utm_source=x&b=2&a=1#frag") ==
      "http://example.com/a/b?a=1&b=2")
    // non-default port kept; scheme-port pairing respected
    assert(norm("https://example.com:8443/x?a=1") ==
      "https://example.com:8443/x?a=1")
    assert(norm("http://example.com:443/x") == "http://example.com:443/x")
    // userinfo dropped, trailing host dot stripped, https:443 dropped
    assert(norm("https://user:pw@Sub.Example.org.:443/") ==
      "https://sub.example.org/")
    // empty path becomes /
    assert(norm("http://example.com") == "http://example.com/")
    // non-http scheme untouched beyond the shared rules
    assert(norm("ftp://Files.example.com/data") == "ftp://files.example.com/data")
    // all-tracking query drops the '?'
    assert(norm("http://example.com/?gclid=1&UTM_CAMPAIGN=z") ==
      "http://example.com/")
    // duplicate keys survive, sorted as whole segments
    assert(norm("http://e.com/p?b=2&b=1&a=3") == "http://e.com/p?a=3&b=1&b=2")
    // empty query segments dropped
    assert(norm("http://e.com/p?&&a=1&") == "http://e.com/p?a=1")
    // ipv6 literal: brackets kept, non-default port kept
    assert(norm("http://[::1]:8080/x") == "http://[::1]:8080/x")
    // percent-encoding and dot-segments deliberately untouched
    assert(norm("http://e.com/a/../b%20c") == "http://e.com/a/../b%20c")
    // www-only host is not stripped to empty: the trailing-dot strip
    // leaves "www", and the www. prefix rule needs a following label
    assert(norm("http://www./x") == "http://www/x")
  }

  test("urlNormalize: malformed inputs reject to NULL, never throw") {
    assert(norm("notaurl") == null)
    assert(norm("://missing-scheme.com") == null)
    assert(norm("ht tp://bad-scheme.com") == null)
    assert(norm("http://") == null)
    assert(norm("http://:80/x") == null)
    assert(norm("http://e.com:notaport/x") == null)
    assert(norm("http://e.com:123456/x") == null) // port > 5 digits
    assert(norm("http://e.com:99999/x") == null) // 5 digits but > 65535
    assert(norm("http://e.com:65535/x") == "http://e.com:65535/x")
    // RFC 3986 §3.1: the FIRST scheme char must be a letter
    assert(norm("1http://e.com/x") == null)
    assert(norm("+ssh://e.com/x") == null)
    assert(norm(".x://e.com/x") == null)
    assert(norm("x1+-.://e.com/x") == "x1+-.://e.com/x") // later chars may
    val nulls = Seq(Option.empty[String]).toDF("u")
      .select(UrlFunctions.urlNormalize(col("u")).as("n")).head()
    assert(nulls.isNullAt(0))
  }

  test("urlHost and urlDomain: labels, second-level suffixes, ip literals") {
    assert(host("HTTP://WWW.Example.COM:80/x") == "www.example.com")
    assert(host("https://user@A.B.C.org./") == "a.b.c.org")
    assert(domain("https://www.foo.co.uk/x") == "foo.co.uk")
    assert(domain("https://a.b.example.com/") == "example.com")
    assert(domain("http://example.com/") == "example.com")
    assert(domain("http://localhost/") == "localhost")
    assert(domain("http://[::1]/") == "[::1]")
    assert(domain("http://www.shop.com.au/") == "shop.com.au")
    assert(host("notaurl") == null)
    assert(domain("notaurl") == null)
    // a host that IS a public suffix has no registrable domain —
    // NULL (reject), not a fake domain bucket
    assert(domain("http://co.uk/") == null)
    assert(domain("http://CO.UK./x") == null)
    // ...but one label under the suffix is a real registrable domain,
    // even when that label is 'www' (www.co.uk is a registered site)
    assert(domain("http://www.co.uk/") == "www.co.uk")
  }

  private def html(u: String): String = {
    val r = Seq(u).toDF("u")
      .select(UrlFunctions.htmlText(col("u")).as("t")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("htmlText: tags, script/style/comment blocks, entities, whitespace") {
    assert(html("<p>Hello <b>world</b>!</p>") == "Hello world !")
    // script content dropped even when it contains a closing-tag-like
    // string literal; case-insensitive element names
    assert(html("a<SCRIPT>var x=\"</p>\";</SCRIPT>b") == "a b")
    assert(html("a<style>p{}</style>b") == "a b")
    assert(html("a<!-- no -->b") == "a b")
    // unterminated script drops to end of input, never throws
    assert(html("keep<script>lost forever") == "keep")
    // entities decode AFTER tag stripping: no element resurrection
    assert(html("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>")
    assert(html("x &amp; y&nbsp;&nbsp;z &#39;q&#39; &quot;r&quot;") ==
      "x & y z 'q' \"r\"")
    // unknown entities pass through verbatim
    assert(html("a &unknown; b") == "a &unknown; b")
    // whitespace runs + tag boundaries collapse; output trimmed
    assert(html("  <div>\n\ta\n\n<p>  b  </p></div>  ") == "a b")
    // attributes with quoted '<' are inside the tag; a raw '>' in an
    // attribute cuts the tag early (documented contract limit)
    assert(html("<img alt=\"a<b\">c") == "c")
    // html5 tokenizer rule: '<' followed by a non-letter is TEXT, so a
    // stray '<' never swallows the rest of the page
    assert(html("price is 3 < 5 here and more") == "price is 3 < 5 here and more")
    assert(html("x < y <p>rest</p>") == "x < y rest")
    assert(html("tail<") == "tail<")
    // raw-text matching requires the NAME to end: custom elements that
    // merely start with script/style keep their visible contents
    assert(html("a<scripture>bible text</scripture>b") == "a bible text b")
    assert(html("a<style-guide>visible</style-guide>b") == "a visible b")
    // ...while attributes/self-closing forms still count as script
    assert(html("a<script src=\"x\">gone</script>b") == "a b")
    // a </scriptx> inside a script block does not terminate it
    assert(html("a<script>var s=\"</scriptx>\";</script>b") == "a b")
    assert(html("") == "")
    val nulls = Seq(Option.empty[String]).toDF("u")
      .select(UrlFunctions.htmlText(col("u")).as("t")).head()
    assert(nulls.isNullAt(0))
  }

  private def links(u: String): Seq[String] = {
    val r = Seq(u).toDF("u")
      .select(UrlFunctions.htmlLinks(col("u")).as("l")).head()
    r.getSeq[String](0)
  }

  test("htmlLinks: anchors, quoting, entities, excluded blocks") {
    assert(links("<a href=\"http://a.com/1\">x</a><a href='/rel'>y</a>") ==
      Seq("http://a.com/1", "/rel"))
    // unquoted value runs to whitespace; '=' may carry spaces
    assert(links("<a href = http://b.com/p >z</a>") == Seq("http://b.com/p"))
    // entity-decoded: &amp; between query params
    assert(links("<a href=\"/p?x=1&amp;y=2\">q</a>") == Seq("/p?x=1&y=2"))
    // anchors in script/style/comment blocks don't count
    assert(links("<script>var s='<a href=\"http://no.com/\">';</script>" +
      "<!-- <a href=\"http://also-no.com/\">x</a> -->" +
      "<a href=\"http://yes.com/\">k</a>") == Seq("http://yes.com/"))
    // no href / empty href emit nothing; <abbr> is not <a>
    assert(links("<a name=\"anchor\">t</a><a href=\"\">e</a><abbr>a</abbr>") ==
      Seq.empty)
    // data-href is not href (attribute name must start at a boundary)
    assert(links("<a data-href=\"/no\">t</a>") == Seq.empty)
    // the attribute TOKENIZER: 'href' inside another attribute's
    // quoted value can't match and can't shadow the real href
    assert(links("<a title=\"href = broken\" href=\"/real\">x</a>") ==
      Seq("/real"))
    // minified html: no whitespace before the attribute name
    assert(links("<a class=\"x\"href=\"/y\">t</a>") == Seq("/y"))
    assert(links("<a/href=\"/z\">t</a>") == Seq("/z"))
    // quote-aware tag end: a raw '>' inside a quoted href survives
    assert(links("<a href=\"/p?a>b\">x</a>") == Seq("/p?a>b"))
    // boolean href (no value) emits nothing
    assert(links("<a href>t</a>") == Seq.empty)
    // linkless page: empty array, not null
    assert(links("<p>nothing here</p>") == Seq.empty)
    val nulls = Seq(Option.empty[String]).toDF("u")
      .select(UrlFunctions.htmlLinks(col("u")).as("l")).head()
    assert(nulls.isNullAt(0))
  }

  private def resolve(base: String, ref: String): String = {
    val r = Seq((base, ref)).toDF("b", "r")
      .select(UrlFunctions.urlResolve(col("b"), col("r")).as("u")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("urlResolve: RFC 3986 §5.4.1 normal reference-resolution examples") {
    val base = "http://a/b/c/d;p?q"
    val expected = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    expected.foreach { case (ref, want) =>
      assert(resolve(base, ref) == want, s"ref '$ref'")
    }
  }

  test("urlResolve: RFC 3986 §5.4.2 abnormal examples (strict parser)") {
    val base = "http://a/b/c/d;p?q"
    val expected = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict-parser branch: same-scheme refs with their own scheme
      // are NOT treated as relative
      "http:g" -> "http:g")
    expected.foreach { case (ref, want) =>
      assert(resolve(base, ref) == want, s"ref '$ref'")
    }
  }

  test("urlResolve: edge contracts beyond the RFC table") {
    // base without a scheme is not absolute → NULL, never throw
    assert(resolve("/just/a/path", "g") == null)
    assert(resolve("", "g") == null)
    // authority-only base: relative path grafts at root
    assert(resolve("http://h", "g") == "http://h/g")
    assert(resolve("http://h?q", "g") == "http://h/g")
    // defined-but-empty query survives ('g?' is not 'g')
    assert(resolve("http://a/b/", "g?") == "http://a/b/g?")
    // base fragment is always discarded (RFC: fragment of the target
    // comes from the reference alone)
    assert(resolve("http://a/b#frag", "g") == "http://a/g")
    assert(resolve("http://a/b#frag", "") == "http://a/b")
    // whitespace-trimmed like normalize; chains into url_normalize
    assert(resolve(" http://a/b/c ", " ../g ") == "http://a/g")
    assert(norm(resolve("http://A/b/", "../d?utm_x=1&a=1#f")) ==
      "http://a/d?a=1")
    val nulls = Seq((Option.empty[String], Option("g"))).toDF("b", "r")
      .select(UrlFunctions.urlResolve(col("b"), col("r")).as("u")).head()
    assert(nulls.isNullAt(0))
  }

  private def cparam(s: String): String = {
    val r = Seq(s).toDF("c")
      .select(UrlFunctions.charsetParam(col("c")).as("p")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def sniff(html: String, charset: String = "ISO-8859-1"): String = {
    val r = Seq(html.getBytes(charset)).toDF("b")
      .select(UrlFunctions.sniffCharset(col("b")).as("s")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def dec(bytes: Array[Byte], cs: String): String = {
    val r = Seq((bytes, cs)).toDF("b", "c")
      .select(UrlFunctions.decodeText(col("b"), col("c")).as("t")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("charsetParam: Content-Type parameter forms; unknown rejects to NULL") {
    assert(cparam("text/html; charset=ISO-8859-1") == "iso-8859-1")
    assert(cparam("text/html; charset=\"windows-1252\"") == "windows-1252")
    assert(cparam("TEXT/HTML; CHARSET = 'utf-8'") == "utf-8")
    assert(cparam("text/html") == null)
    assert(cparam("text/html; charset=") == null)
    // an unknown/unsupported declaration falls through (NULL), like a
    // browser ignoring a bogus charset and moving to the next source
    assert(cparam("text/html; charset=klingon-99") == null)
    // 'charset' must start a parameter token: a name that merely ENDS
    // in it is not a declaration...
    assert(cparam("text/html; notcharset=utf-16") == null)
    // ...and a failed occurrence does not mask a later real one
    assert(cparam("text/html; notcharset=utf-16; charset=utf-8") == "utf-8")
  }

  test("sniffCharset: meta prescan within the first 1024 bytes") {
    assert(sniff("<html><head><meta charset=\"windows-1252\"></head>") ==
      "windows-1252")
    assert(sniff("<html><META HTTP-EQUIV=\"Content-Type\" " +
      "CONTENT=\"text/html; charset=ISO-8859-1\"><body>") == "iso-8859-1")
    // the first SUPPORTED declaration wins; bogus ones are skipped
    assert(sniff("<meta charset=\"not-a-charset\"><meta charset=\"utf-8\">") ==
      "utf-8")
    // 'charset=' outside a <meta> tag is page text, not a declaration
    assert(sniff("<p>set charset=utf-8 in your config</p>") == null)
    // prescan bound: a declaration past byte 1024 is invisible
    assert(sniff("<html>" + "x" * 1100 + "<meta charset=\"utf-8\">") == null)
    assert(sniff("<html><body>no declaration</body></html>") == null)
  }

  test("decodeText: legacy charsets round-trip; malformed bytes become U+FFFD") {
    assert(dec("café".getBytes("ISO-8859-1"), "iso-8859-1") == "café")
    // windows-1252-specific: 0x80 is the euro sign (undefined in 8859-1)
    assert(dec(Array[Byte](0x80.toByte, 'a'), "windows-1252") == "€a")
    assert(dec("snow ☃".getBytes("UTF-8"), "utf-8") == "snow ☃")
    // a lone latin-1 0xE9 is invalid UTF-8 → replacement char, row kept
    assert(dec("café".getBytes("ISO-8859-1"), "utf-8") == "caf�")
    assert(dec("x".getBytes("UTF-8"), "klingon-99") == null)
  }

  test("charset precedence: Content-Type param beats a lying <meta>") {
    // page REALLY iso-8859-1, meta claims utf-8, header says the truth —
    // the documented coalesce chain must decode through the header
    val html = "<html><head><meta charset=\"utf-8\"></head>" +
      "<body><p>café naïve</p></body></html>"
    val df = Seq((html.getBytes("ISO-8859-1"),
      "text/html; charset=iso-8859-1")).toDF("payload", "ct")
    val out = df.select(
      UrlFunctions.htmlText(UrlFunctions.decodeText(col("payload"),
        coalesce(UrlFunctions.charsetParam(col("ct")),
          UrlFunctions.sniffCharset(col("payload")),
          lit("utf-8")))).as("body")).head().getString(0)
    assert(out == "café naïve")
    // without a header the meta is all we have — decoded as declared
    val noCt = Seq(("<meta charset=\"iso-8859-1\"><p>café</p>"
      .getBytes("ISO-8859-1"), Option.empty[String])).toDF("payload", "ct")
    val out2 = noCt.select(
      UrlFunctions.htmlText(UrlFunctions.decodeText(col("payload"),
        coalesce(UrlFunctions.charsetParam(col("ct")),
          UrlFunctions.sniffCharset(col("payload")),
          lit("utf-8")))).as("body")).head().getString(0)
    assert(out2 == "café")
  }

  // ---- HTTP response envelope ---------------------------------------

  private def httpRow(payload: Array[Byte]): org.apache.spark.sql.Row =
    Seq(Tuple1(payload)).toDF("p").select(
      UrlFunctions.httpStatus(col("p")).as("status"),
      UrlFunctions.httpHeader(col("p"), lit("Content-Type")).as("ct"),
      UrlFunctions.httpBody(col("p")).as("body")).head()

  test("httpStatus/httpHeader: status line + case-insensitive first header") {
    val msg = ("HTTP/1.1 200 OK\r\nserver: x\r\n" +
      "CONTENT-TYPE: text/html; charset=utf-8\r\n" +
      "Content-Type: text/plain\r\n\r\nhi").getBytes("ISO-8859-1")
    val r = httpRow(msg)
    assert(r.getInt(0) == 200)
    assert(r.getString(1) == "text/html; charset=utf-8") // first wins
    assert(new String(r.getAs[Array[Byte]](2), "US-ASCII") == "hi")
    // bare-LF servers exist; the splitter is lenient
    val lf = "HTTP/1.0 404 Not Found\nX: y\n\ngone".getBytes("ISO-8859-1")
    val r2 = httpRow(lf)
    assert(r2.getInt(0) == 404 && r2.isNullAt(1))
    assert(new String(r2.getAs[Array[Byte]](2), "US-ASCII") == "gone")
    // not an HTTP envelope at all (no magic / no blank line) → all
    // three reject
    for (bad <- Seq("<html>plain body</html>",
      "HTTP/1.1 200 OK\r\nno-blank-line")) {
      val rb = httpRow(bad.getBytes("ISO-8859-1"))
      assert(rb.isNullAt(0) && rb.isNullAt(1) && rb.isNullAt(2), bad)
    }
    // a garbled STATUS LINE inside a well-formed envelope rejects only
    // http_status — headers and body are still structurally there
    for (bad <- Seq("HTTP/1.1 2x0 Bad\r\n\r\n", "HTTP/1.1 2000 Huh\r\n\r\n")) {
      assert(httpRow(bad.getBytes("ISO-8859-1")).isNullAt(0), bad)
    }
    // status line with no reason phrase is legal
    assert(httpRow("HTTP/1.1 304\r\n\r\n".getBytes("ISO-8859-1")).getInt(0) == 304)
  }

  test("httpBody: identity/gzip/deflate × plain/chunked, per RFC 9112") {
    import graft.sources.Warc
    val body = "café naïve – body".getBytes("ISO-8859-1")
    def get(coding: String, chunked: Boolean): Array[Byte] =
      httpRow(Warc.httpEncode(200, "text/html", body, coding, chunked))
        .getAs[Array[Byte]](2)
    for (coding <- Seq("identity", "gzip", "deflate");
         chunked <- Seq(false, true)) {
      assert(java.util.Arrays.equals(get(coding, chunked), body),
        s"coding=$coding chunked=$chunked")
    }
    // raw (non-zlib) deflate: the browser-style fallback
    val deflRaw = {
      val d = new java.util.zip.Deflater(-1, true)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](4096)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val rawMsg = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
      s"Content-Length: ${deflRaw.length}\r\n\r\n").getBytes("ISO-8859-1") ++ deflRaw
    assert(java.util.Arrays.equals(
      httpRow(rawMsg).getAs[Array[Byte]](2), body))
    // undecodable coding rejects the row, status/headers still parse
    val br = ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxx")
      .getBytes("ISO-8859-1")
    val rBr = httpRow(br)
    assert(rBr.getInt(0) == 200 && rBr.isNullAt(2))
    // truncated chunk / corrupt gzip reject to NULL, never throw
    val cut = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "ff\r\nshort").getBytes("ISO-8859-1")
    assert(httpRow(cut).isNullAt(2))
    val badGz = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip")
      .getBytes("ISO-8859-1")
    assert(httpRow(badGz).isNullAt(2))
    // CODING CHAINS decode right-to-left: 'Transfer-Encoding: gzip,
    // chunked' is dechunked THEN gunzipped (returning the still-gzip'd
    // bytes here would poison the charset chain downstream) ...
    val gz = graft.sources.Warc.gzipCompress(body)
    val chunkedGz = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: gzip, chunked\r\n\r\n" +
        gz.length.toHexString + "\r\n").getBytes("ISO-8859-1"))
      out.write(gz)
      out.write("\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    assert(java.util.Arrays.equals(
      httpRow(chunkedGz).getAs[Array[Byte]](2), body))
    // ... and 'Content-Encoding: deflate, gzip' means deflate was
    // applied first, so gunzip runs before inflate
    val doubled = graft.sources.Warc.gzipCompress(
      graft.sources.Warc.deflateCompress(body))
    val ceChain = ("HTTP/1.1 200 OK\r\n" +
      "Content-Encoding: deflate, gzip\r\n" +
      s"Content-Length: ${doubled.length}\r\n\r\n").getBytes("ISO-8859-1") ++ doubled
    assert(java.util.Arrays.equals(
      httpRow(ceChain).getAs[Array[Byte]](2), body))
    // a chain with any unknown hop rejects whole
    val badChain = ("HTTP/1.1 200 OK\r\nContent-Encoding: br, gzip\r\n\r\nxx")
      .getBytes("ISO-8859-1")
    assert(httpRow(badChain).isNullAt(2))
    // RFC 9110 §5.3: REPEATED field lines combine in order — two
    // Content-Encoding lines ('deflate' then 'gzip') are one
    // deflate,gzip chain, so gunzip runs first, then inflate; keeping
    // only the first line would return the still-gzip'd bytes
    val repeated = ("HTTP/1.1 200 OK\r\n" +
      "Content-Encoding: deflate\r\n" +
      "Content-Encoding: gzip\r\n" +
      s"Content-Length: ${doubled.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      doubled
    assert(java.util.Arrays.equals(
      httpRow(repeated).getAs[Array[Byte]](2), body))
    // repeated Transfer-Encoding lines too: 'gzip' then 'chunked'
    // combine to gzip,chunked — dechunk, then gunzip
    val teRepeated = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: gzip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        gz.length.toHexString + "\r\n").getBytes("ISO-8859-1"))
      out.write(gz)
      out.write("\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    assert(java.util.Arrays.equals(
      httpRow(teRepeated).getAs[Array[Byte]](2), body))
  }

  test("http headers: obs-fold continuation lines unfold into their owning header") {
    // RFC 9112 §5.2 deprecated folding, but legacy servers emit it —
    // and the folded tail here carries the charset parameter itself
    val folded = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html;\r\n \tcharset=iso-8859-1\r\n" +
      "X-Other: a\r\n\tb\r\n\r\nbody").getBytes("ISO-8859-1")
    val r = httpRow(folded)
    assert(r.getString(1) == "text/html; charset=iso-8859-1")
    val cs = Seq(Tuple1(folded)).toDF("p").select(
      UrlFunctions.charsetParam(
        UrlFunctions.httpHeader(col("p"), lit("content-type"))).as("cs"))
      .head().getString(0)
    assert(cs == "iso-8859-1")
  }

  test("gunzip: round-trips, concatenated members, rejects garbage") {
    import graft.sources.Warc
    def gz(b: Array[Byte]): Array[Byte] = {
      val r = Seq(Tuple1(b)).toDF("b")
        .select(UrlFunctions.gunzip(col("b")).as("g")).head()
      if (r.isNullAt(0)) null else r.getAs[Array[Byte]](0)
    }
    val data = "sitemap payload ü".getBytes("UTF-8")
    assert(java.util.Arrays.equals(gz(Warc.gzipCompress(data)), data))
    // two concatenated members decode to the concatenated payloads
    val two = Warc.gzipCompress("a-".getBytes("US-ASCII")) ++
      Warc.gzipCompress("b".getBytes("US-ASCII"))
    assert(new String(gz(two), "US-ASCII") == "a-b")
    assert(gz("plainly not gzip".getBytes("US-ASCII")) == null)
    assert(gz(Array.emptyByteArray) == null)
  }

  test("http envelope → charset chain end-to-end: header tells the truth over a lying meta") {
    import graft.sources.Warc
    val html = "<html><head><meta charset=\"utf-8\"></head>" +
      "<body><p>café</p></body></html>"
    val payload = Warc.httpEncode(200, "text/html; charset=iso-8859-1",
      html.getBytes("ISO-8859-1"), "gzip", chunked = true)
    val out = Seq(Tuple1(payload)).toDF("p")
      .select(UrlFunctions.httpBody(col("p")).as("b"),
        UrlFunctions.httpHeader(col("p"), lit("content-type")).as("ct"))
      .select(UrlFunctions.htmlText(UrlFunctions.decodeText(col("b"),
        coalesce(UrlFunctions.charsetParam(col("ct")),
          UrlFunctions.sniffCharset(col("b")), lit("utf-8")))).as("t"))
      .head().getString(0)
    assert(out == "café")
  }

  private def robots(txt: String, agent: String, path: String): Boolean =
    Seq((txt, agent, path)).toDF("r", "a", "p")
      .select(UrlFunctions.robotsAllowed(col("r"), col("a"), col("p"))
        .as("ok")).head().getBoolean(0)

  test("robotsAllowed: RFC 9309 group selection, longest match, allow ties") {
    val txt =
      """# crawl policy
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/pub$
        |Disallow: /*.tmp$
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /graft-only/
        |Crawl-delay: 10
        |
        |User-agent: graftbot
        |Disallow: /also-this/""".stripMargin
    // the * group governs unknown agents
    assert(!robots(txt, "randombot", "/private/secret"))
    // the longer ($-anchored) allow outranks the /private/ disallow
    assert(robots(txt, "randombot", "/private/pub"))
    // ...but only on the exact anchored path
    assert(!robots(txt, "randombot", "/private/pub2"))
    // wildcard + anchor
    assert(!robots(txt, "randombot", "/x/y.tmp"))
    assert(robots(txt, "randombot", "/x/y.tmpz"))
    assert(robots(txt, "randombot", "/public/fine"))
    // a specific group REPLACES *, it does not merge with it
    assert(robots(txt, "GraftBot/1.2", "/private/secret"))
    assert(!robots(txt, "graftbot", "/graft-only/x"))
    // two groups naming the same agent merge
    assert(!robots(txt, "graftbot", "/also-this/x"))
    // a multi-agent run shares its rules; later groups don't leak back
    assert(!robots(txt, "otherbot", "/graft-only/x"))
    assert(robots(txt, "otherbot", "/also-this/x"))
    // equal-length allow/disallow tie resolves to ALLOW (§2.2.2), in
    // either declaration order
    assert(robots("User-agent: *\nDisallow: /dir/\nAllow: /dir/", "a", "/dir/x"))
    assert(robots("User-agent: *\nAllow: /dir/\nDisallow: /dir/", "a", "/dir/x"))
    // empty disallow is a no-op rule
    assert(robots("User-agent: *\nDisallow:", "a", "/anything"))
    // no parseable groups -> allowed
    assert(robots("not a robots file at all", "a", "/x"))
    assert(robots("", "a", "/x"))
    // the MOST SPECIFIC (longest matching prefix of the product
    // token) wins: crawler token "bot-news" matches both groups,
    // the longer one governs
    val spec = "User-agent: bot\nDisallow: /a/\n\n" +
      "User-agent: bot-news\nDisallow: /b/"
    assert(robots(spec, "Bot-News/2.1", "/a/x")) // 'bot' group loses
    assert(!robots(spec, "Bot-News/2.1", "/b/x"))
    assert(!robots(spec, "bot/1.0", "/a/x"))     // only 'bot' matches
    assert(robots(spec, "bot/1.0", "/b/x"))
    // matching is against the PRODUCT TOKEN as a prefix, never a raw
    // substring: 'abbott' contains 'bot' but is governed by no group
    assert(robots(spec, "abbott/1.0", "/a/x"))
    assert(robots(spec, "abbott/1.0", "/b/x"))
    // an unknown directive ends the agent run: the next user-agent
    // line starts a NEW group rather than extending the old one
    val runEnd = "User-agent: a\nSitemap: http://e.com/s.xml\n" +
      "User-agent: b\nDisallow: /x/"
    assert(robots(runEnd, "a", "/x/1")) // group a has no rules
    assert(!robots(runEnd, "b", "/x/1"))
  }

  test("robotsPatternMatches: anchoring, wildcards, prefix semantics") {
    assert(UrlKernel.robotsPatternMatches("/p", "/path"))
    assert(!UrlKernel.robotsPatternMatches("/p$", "/path"))
    assert(UrlKernel.robotsPatternMatches("/path$", "/path"))
    assert(UrlKernel.robotsPatternMatches("/a*b", "/axxbzz"))
    assert(UrlKernel.robotsPatternMatches("/a*b$", "/axxb"))
    assert(!UrlKernel.robotsPatternMatches("/a*b$", "/axxbzz"))
    assert(UrlKernel.robotsPatternMatches("/*/z", "/x/y/z"))
    assert(UrlKernel.robotsPatternMatches("*", "/anything"))
    assert(UrlKernel.robotsPatternMatches("/a**b", "/ab"))
    assert(!UrlKernel.robotsPatternMatches("/b", "/a/b"))
    // '*' is a legal URI path char: a pattern star facing a literal
    // '*' in the path must still act as a wildcard (and record its
    // backtrack point), never match as a literal
    assert(UrlKernel.robotsPatternMatches("/*.tmp$", "/*x.tmp"))
    assert(UrlKernel.robotsPatternMatches("/*.tmp$", "/*.tmp"))
    assert(!UrlKernel.robotsPatternMatches("/*.tmp$", "/*x.tmpz"))
    assert(UrlKernel.robotsPatternMatches("/a*c", "/a*b*c"))
  }

  test("robotsSitemaps + sitemapLocs: the crawl-discovery hop") {
    def maps(txt: String): Seq[String] =
      Seq(txt).toDF("t").select(UrlFunctions.robotsSitemaps(col("t")).as("m"))
        .head().getSeq[String](0)
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("x").select(UrlFunctions.sitemapLocs(col("x")).as("l"))
        .head().getSeq[String](0)
    assert(maps("User-agent: *\nDisallow: /x\n" +
      "Sitemap: http://e.com/a.xml\n" +
      "SITEMAP: http://e.com/b.xml # mirror\n") ==
      Seq("http://e.com/a.xml", "http://e.com/b.xml"))
    assert(maps("User-agent: *\nDisallow: /x") == Seq.empty)
    assert(maps("Sitemap:") == Seq.empty) // empty value is not a url
    // urlset form: entities decode, CDATA unwraps, whitespace trims
    assert(locs("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc> http://e.com/p?a=1&amp;b=2 </loc><lastmod>x</lastmod></url>" +
      "<url><loc><![CDATA[http://e.com/q]]></loc></url>" +
      "</urlset>") == Seq("http://e.com/p?a=1&b=2", "http://e.com/q"))
    // sitemapindex shares the element; <locker> is not <loc>
    assert(locs("<sitemapindex><sitemap><loc>http://e.com/sm1.xml</loc>" +
      "</sitemap></sitemapindex><locker>no</locker>") ==
      Seq("http://e.com/sm1.xml"))
    // unterminated loc ignored; empty document yields the empty array
    assert(locs("<urlset><url><loc>http://e.com/cut") == Seq.empty)
    assert(locs("<urlset></urlset>") == Seq.empty)
    val nulls = Seq(Option.empty[String]).toDF("t")
      .select(UrlFunctions.robotsSitemaps(col("t")).as("m"),
        UrlFunctions.sitemapLocs(col("t")).as("l")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("urlResolve differential fuzz vs java.net.URI over 2000 seeded pairs") {
    // An independent reference implementation: the JDK's URI.resolve.
    // It implements RFC 2396, which diverges from 3986 exactly on
    // empty/query-only references and above-root ".." clamping — those
    // classes are pinned by the §5.4 tables above, so the fuzz grammar
    // EXCLUDES them (non-empty ref paths, parent-dots never exceeding
    // the base directory depth, no ':' in first segments, and no dot
    // segments at all in absolute-path/absolute-uri refs — 2396 leaves
    // those paths verbatim where 3986 normalizes, a divergence the
    // abnormal table's "/./g" → "/g" row pins on the 3986 side) and
    // the two implementations must agree bit-for-bit everywhere else.
    val seed = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SEED", "20260816").toLong
    val rnd = new scala.util.Random(seed)
    def seg(): String = "s" + rnd.nextInt(30)
    var checked = 0
    (1 to 2000).foreach { i =>
      val dirDepth = 1 + rnd.nextInt(3)
      val baseDirs = Seq.fill(dirDepth)(seg())
      val base = "http://h" + rnd.nextInt(9) + ".example" +
        baseDirs.mkString("/", "/", "") +
        (if (rnd.nextBoolean()) "/f" + rnd.nextInt(9) + ".html" else "/") +
        (if (rnd.nextInt(4) == 0) "?bq=" + rnd.nextInt(9) else "")
      // a relative path that never climbs above its starting depth:
      // optional ../ prefix bounded by the base dir depth, then
      // segments with safe inner ./ and seg/../ noise
      def relPath(maxUp: Int): String = {
        val up = rnd.nextInt(maxUp + 1)
        val sb = new StringBuilder("../" * up)
        var parts = 1 + rnd.nextInt(3)
        while (parts > 0) {
          rnd.nextInt(4) match {
            case 0 => sb.append("./").append(seg())
            case 1 => sb.append(seg()).append("/../").append(seg())
            case _ => sb.append(seg())
          }
          parts -= 1
          if (parts > 0) sb.append("/")
        }
        if (rnd.nextInt(4) == 0) sb.append("/")
        sb.toString
      }
      val ref = rnd.nextInt(5) match {
        case 0 => "http://x" + rnd.nextInt(9) + ".example/" + seg()
        case 1 => "//n" + rnd.nextInt(9) + ".example/" + seg() + "/" + seg()
        case 2 => "/" + seg() + "/" + seg() // dot-free: see grammar note
        case _ => relPath(dirDepth)
      }
      val suffix = (if (rnd.nextInt(3) == 0) "?a=" + rnd.nextInt(9) else "") +
        (if (rnd.nextInt(4) == 0) "#frag" + rnd.nextInt(9) else "")
      val r = ref + suffix
      val got = UrlKernel.resolve(
        org.apache.spark.unsafe.types.UTF8String.fromString(base),
        org.apache.spark.unsafe.types.UTF8String.fromString(r))
      val want = new java.net.URI(base).resolve(r).toString
      assert(got != null && got.toString == want,
        s"seed $seed case $i: resolve('$base', '$r') = " +
          s"${if (got == null) "NULL" else got} but URI says $want")
      checked += 1
    }
    assert(checked == 2000)
  }

  test("kernels compile under codegen with NON-nullable children") {
    // regression: nullable=child.nullable + a doGenCode that assigns
    // ev.isNull made the generated Java assign to the literal "false"
    // whenever the child was non-nullable — a codegen CompileException
    // and a silent interpreted fallback. Generate the projection
    // directly so a compile error fails the test instead of falling
    // back.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val lit = Literal.create("a<b>c</b>", org.apache.spark.sql.types.StringType)
    assert(!lit.nullable)
    val st = org.apache.spark.sql.types.StringType
    val proj = GenerateUnsafeProjection.generate(Seq(
      Alias(HtmlText(lit), "t")(),
      Alias(UrlNormalize(Literal.create("notaurl", st)), "u")(),
      Alias(UrlResolve(Literal.create("http://a/b/", st),
        Literal.create("../g", st)), "r")(),
      Alias(UrlResolve(Literal.create("no-scheme", st),
        Literal.create("g", st)), "rn")()))
    val row = proj(InternalRow.empty)
    assert(row.getUTF8String(0).toString == "a c")
    assert(row.isNullAt(1)) // kernel null survives a non-nullable child
    assert(row.getUTF8String(2).toString == "http://a/g")
    assert(row.isNullAt(3))
  }

  test("url_* SQL registration round-trips the same kernels") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT url_normalize('HTTP://WWW.E.COM:80/p?utm_x=1&b=2&a=1#f') AS n, " +
        "url_host('http://User@WWW.E.COM:8080/') AS h, " +
        "url_domain('https://www.foo.co.uk/x') AS d, " +
        "html_text('<p>a &amp; b</p>') AS t, " +
        "url_resolve('http://a/b/c/d;p?q', '../g') AS rr").head()
    assert(r.getString(0) == "http://e.com/p?a=1&b=2")
    assert(r.getString(1) == "www.e.com")
    assert(r.getString(2) == "foo.co.uk")
    assert(r.getString(3) == "a & b")
    assert(r.getString(4) == "http://a/b/g")
  }
}

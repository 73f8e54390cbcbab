package graft

import graft.functions.{CharShingles, CharsetParam, CosineSimilarity, DecodeText, DotProduct, Gunzip, HtmlLinks, HtmlText, HttpBody, HttpHeader, HttpStatus, HyperplaneBucket, InterleaveBits, JaroWinklerSim, MinhashSignature, RobotsAllowed, RobotsSitemaps, RollingHash, Simhash64, SitemapLocs, SniffCharset, StopwordCount, SubwordCount, UrlHost, UrlNormalize, UrlRegistrableDomain, UrlResolve, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's functions.
  *
  * Two registration paths, same function list:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions injection point), or
  *  - `GraftFunctions.register(spark)` on a live session.
  *
  * After either, `spark.sql("SELECT vec_cosine(a, b) ...")` works, so
  * the engine's capabilities are reachable from pure-SQL clients too —
  * the reference has no SQL layer at all, this is part of the
  * Spark-first re-expression (SURVEY §2.2: expose the engine's function
  * library rather than reimplement per query).
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  /** SQL `array('a','b')` arrives as a foldable CreateArray, not a
    * Literal — accept any foldable array<string>.
    */
  private def litStringSeq(e: Expression, what: String): Seq[String] = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)
        if e.foldable =>
      val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      arr.toSeq[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
        .map(s => if (s == null) null else s.toString)
    case _ => throw new IllegalArgumentException(
      s"$what must be a foldable array<string> literal, got $e")
  }

  /** (name, usage, builder) for every SQL-exposed function.
    *
    * Only true catalyst Expressions can be registered — a Column
    * composed from `functions._` converts to an opaque
    * ColumnNodeExpression that the analyzer won't resolve inside a
    * FunctionRegistry builder. The Column-composed text functions
    * (rollingHash, fingerprint, langId, ...) therefore stay Scala-API
    * only; SQL users reach the same logic via the spark built-ins they
    * compose.
    */
  private def arity(name: String, n: Int)(es: Seq[Expression]): Seq[Expression] = {
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")
    es
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays",
      (es: Seq[Expression]) => { val a = arity("vec_dot", 2)(es); DotProduct(a(0), a(1)) }),
    ("vec_cosine", "vec_cosine(a, b) - cosine similarity, 0.0 on zero norm",
      (es: Seq[Expression]) => { val a = arity("vec_cosine", 2)(es); CosineSimilarity(a(0), a(1)) }),
    ("vec_hyperplane_bucket",
      "vec_hyperplane_bucket(vec, bits, seed) - sign-random-projection LSH bucket",
      (es: Seq[Expression]) => {
        val a = arity("vec_hyperplane_bucket", 3)(es)
        HyperplaneBucket(a(0), Literal(litLong(a(2), "seed")), litInt(a(1), "bits"))
      }),
    ("minhash_signature",
      "minhash_signature(shingles, numHashes) - fused MinHash signature over a string array",
      (es: Seq[Expression]) => {
        val a = arity("minhash_signature", 2)(es)
        MinhashSignature(a(0), litInt(a(1), "numHashes"))
      }),
    ("simhash64",
      "simhash64(words) - fused 64-bit SimHash of a string array (NULL when empty)",
      (es: Seq[Expression]) => { val a = arity("simhash64", 1)(es); Simhash64(a(0)) }),
    ("word_shingles",
      "word_shingles(words, n) - word n-gram shingles; short arrays fall back to one joined shingle",
      (es: Seq[Expression]) => {
        val a = arity("word_shingles", 2)(es)
        WordShingles(a(0), litInt(a(1), "n"))
      }),
    ("jaro_winkler",
      "jaro_winkler(a, b) - byte-level Jaro-Winkler similarity (DuckDB-compatible)",
      (es: Seq[Expression]) => { val a = arity("jaro_winkler", 2)(es); JaroWinklerSim(a(0), a(1)) }),
    ("interleave_bits",
      "interleave_bits(bits, c1, c2, ...) - Morton/Z-order key over the low `bits` of each bigint",
      (es: Seq[Expression]) => {
        require(es.length >= 2, s"interleave_bits expects (bits, col...), got ${es.length} args")
        InterleaveBits(es.tail, litInt(es.head, "bits"))
      }),
    ("char_shingles",
      "char_shingles(str, k) - character k-grams of a string",
      (es: Seq[Expression]) => {
        val a = arity("char_shingles", 2)(es)
        CharShingles(a(0), litInt(a(1), "k"))
      }),
    ("stopword_count",
      "stopword_count(words, stopwords_array) - fused membership count over a string array",
      (es: Seq[Expression]) => {
        val a = arity("stopword_count", 2)(es)
        StopwordCount(a(0), litStringSeq(a(1), "stopwords"))
      }),
    ("subword_count",
      "subword_count(words) - BPE-ish subword token estimate over a string array",
      (es: Seq[Expression]) => { val a = arity("subword_count", 1)(es); SubwordCount(a(0)) }),
    ("rolling_hash",
      "rolling_hash(str) - polynomial rolling hash (document fingerprinting)",
      (es: Seq[Expression]) => { val a = arity("rolling_hash", 1)(es); RollingHash(a(0)) }),
    ("url_normalize",
      "url_normalize(url) - canonical url (lowercase scheme/host, www./userinfo/fragment/default-port stripped, tracking params dropped, query sorted); NULL when unparseable",
      (es: Seq[Expression]) => { val a = arity("url_normalize", 1)(es); UrlNormalize(a(0)) }),
    ("url_host",
      "url_host(url) - lowercased host (port/userinfo stripped); NULL when unparseable",
      (es: Seq[Expression]) => { val a = arity("url_host", 1)(es); UrlHost(a(0)) }),
    ("url_domain",
      "url_domain(url) - registrable domain (last 2 labels, 3 over known second-level suffixes); NULL when unparseable",
      (es: Seq[Expression]) => { val a = arity("url_domain", 1)(es); UrlRegistrableDomain(a(0)) }),
    ("html_text",
      "html_text(html) - visible text: script/style/comments dropped, tags become word boundaries, entities decoded, whitespace collapsed",
      (es: Seq[Expression]) => { val a = arity("html_text", 1)(es); HtmlText(a(0)) }),
    ("html_links",
      "html_links(html) - array of <a> href targets in document order (entity-decoded; anchors in script/style/comments don't count)",
      (es: Seq[Expression]) => { val a = arity("html_links", 1)(es); HtmlLinks(a(0)) }),
    ("url_resolve",
      "url_resolve(base, ref) - absolute uri of a (possibly relative) reference against a base page uri, RFC 3986 section-5 resolution; NULL when base has no scheme",
      (es: Seq[Expression]) => { val a = arity("url_resolve", 2)(es); UrlResolve(a(0), a(1)) }),
    ("charset_param",
      "charset_param(content_type) - lowercase charset parameter of a Content-Type header value; NULL when absent/unsupported",
      (es: Seq[Expression]) => { val a = arity("charset_param", 1)(es); CharsetParam(a(0)) }),
    ("sniff_charset",
      "sniff_charset(payload) - meta-declared charset in the first 1024 payload bytes (WHATWG prescan bound); NULL when undeclared",
      (es: Seq[Expression]) => { val a = arity("sniff_charset", 1)(es); SniffCharset(a(0)) }),
    ("decode_text",
      "decode_text(payload, charset) - payload decoded with the named charset, malformed bytes become U+FFFD; NULL when the charset is unsupported",
      (es: Seq[Expression]) => { val a = arity("decode_text", 2)(es); DecodeText(a(0), a(1)) }),
    ("robots_allowed",
      "robots_allowed(robots_txt, agent, path) - RFC 9309 fetch permission: most-specific group, longest-match rule, allow wins ties, * and $ patterns",
      (es: Seq[Expression]) => { val a = arity("robots_allowed", 3)(es); RobotsAllowed(a(0), a(1), a(2)) }),
    ("robots_sitemaps",
      "robots_sitemaps(robots_txt) - array of Sitemap: urls declared in a robots.txt, file order",
      (es: Seq[Expression]) => { val a = arity("robots_sitemaps", 1)(es); RobotsSitemaps(a(0)) }),
    ("sitemap_locs",
      "sitemap_locs(xml) - array of <loc> targets of a sitemap or sitemap-index xml, document order, entity-decoded",
      (es: Seq[Expression]) => { val a = arity("sitemap_locs", 1)(es); SitemapLocs(a(0)) }),
    ("http_status",
      "http_status(payload) - status code of an HTTP response message; NULL when the payload is not one",
      (es: Seq[Expression]) => { val a = arity("http_status", 1)(es); HttpStatus(a(0)) }),
    ("http_header",
      "http_header(payload, name) - first header value of that name (case-insensitive) in an HTTP response message; NULL when absent",
      (es: Seq[Expression]) => { val a = arity("http_header", 2)(es); HttpHeader(a(0), a(1)) }),
    ("http_body",
      "http_body(payload) - body bytes of an HTTP response message, dechunked then content-decoded (gzip/deflate/identity); NULL when malformed/undecodable",
      (es: Seq[Expression]) => { val a = arity("http_body", 1)(es); HttpBody(a(0)) }),
    ("gunzip",
      "gunzip(bytes) - decompressed bytes of one-or-more concatenated gzip members; NULL when not well-formed gzip",
      (es: Seq[Expression]) => { val a = arity("gunzip", 1)(es); Gunzip(a(0)) })
  )

  /** Register every function into a live session's registry. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, usage, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    val _ = usage
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf"),
        builder))
    }
}

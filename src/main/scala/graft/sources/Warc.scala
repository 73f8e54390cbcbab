package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) record handling — the container
  * format web-scale corpora actually arrive in (CommonCrawl ships
  * ~100 TB rounds as concatenated-record WARC files). Together with
  * [[Source.binaryFiles]] (the listing), the url kernels
  * ([[graft.functions.UrlKernel]]) and `html_text`, this closes the
  * raw-crawl → documents ingestion path: list WARCs → split records →
  * canonicalize the target uri → extract visible text.
  *
  * Scale shape: [[warcRecords]] is a NARROW flatMap — each task parses
  * the blobs of its own input split, emits one row per record, and
  * nothing shuffles until the caller aggregates. The parallel unit is
  * the FILE (CommonCrawl WARCs are ~1 GB, far under a task's reach);
  * a single pathological multi-TB WARC would need an offset-splitting
  * variant, which the format supports but this reader deliberately
  * omits (records would need resync on the `WARC/` magic).
  *
  * Parsing is fail-loud like the media decoders: a blob that is not
  * well-formed WARC raises an operator-named error (junk in a curated
  * crawl drop is a pipeline bug, not data to skip silently); callers
  * that expect dirty input filter first.
  */
object Warc {

  private val CRLF = "\r\n".getBytes("US-ASCII")

  /** Deterministic synthetic WARC blob — the ingestion twin of
    * [[graft.operators.Multimodal.wavEncode]]'s closed-form
    * construction: `nRecords` response records, every one carrying the
    * same `uri` and `payload`, laid out exactly per ISO 28500
    * (version line, headers, empty line, payload, two CRLFs) — so
    * record counts, lengths and payload hashes are all
    * oracle-recomputable from the generating columns.
    */
  def warcEncode(nRecords: Int, uri: String, payload: Array[Byte]): Array[Byte] = {
    require(nRecords >= 1 && uri != null && payload != null,
      s"warcEncode: need nRecords >= 1 and non-null uri/payload, got " +
        s"($nRecords, $uri)")
    // uris are ASCII by spec (RFC 3986), and a CR/LF here would smuggle
    // a fake header line into the record — fail at ENCODE time with
    // this operator's name, not downstream with the parser's
    require(uri.forall(c => c > ' ' && c <= '~'),
      s"warcEncode: uri must be printable ASCII without spaces/CR/LF, got '$uri'")
    val out = new java.io.ByteArrayOutputStream()
    var k = 0
    while (k < nRecords) {
      val header = ("WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$k>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n").getBytes("US-ASCII")
      out.write(header)
      out.write(payload)
      out.write(CRLF); out.write(CRLF)
      k += 1
    }
    out.toByteArray
  }

  /** Parse a WARC blob → one (warcType, recordId, targetUri, payload)
    * per record, LAZILY — the iterator parses a record per `next()` so
    * a task never holds a second full copy of a ~1 GB blob's payloads
    * (the consumer streams them into rows and earlier payloads become
    * collectable). Header names are case-insensitive per the spec;
    * Content-Length is required; each record must terminate with two
    * CRLFs; a ZERO-byte blob fails loudly (a failed fetch / truncated
    * upload losing all its records silently is exactly the bug class
    * the fail-loud contract exists for). Throws
    * IllegalArgumentException (operator-named) on any structural
    * violation.
    */
  def parseRecords(bytes: Array[Byte]): Iterator[(String, String, String, Array[Byte])] = {
    if (bytes.isEmpty)
      throw new IllegalArgumentException(
        "warcRecords: empty blob — zero records is a pipeline bug, not data")
    new Iterator[(String, String, String, Array[Byte])] {
      private var pos = 0
      private val n = bytes.length
      private def fail(what: String): Nothing =
        throw new IllegalArgumentException(s"warcRecords: $what at byte $pos")
      private def readLine(): String = {
        var e = pos
        while (e + 1 < n && !(bytes(e) == '\r' && bytes(e + 1) == '\n')) e += 1
        if (e + 1 >= n) fail("unterminated header line")
        val line = new String(bytes, pos, e - pos, "US-ASCII")
        pos = e + 2
        line
      }
      override def hasNext: Boolean = pos < n
      override def next(): (String, String, String, Array[Byte]) = {
        val version = readLine()
        if (!version.startsWith("WARC/")) fail(s"expected WARC/ magic, got '$version'")
        var warcType: String = null
        var recordId: String = null
        var uri: String = null
        var len = -1L
        var line = readLine()
        while (line.nonEmpty) {
          val c = line.indexOf(':')
          if (c <= 0) fail(s"malformed header '$line'")
          val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(c + 1).trim
          key match {
            case "warc-type"       => warcType = v
            case "warc-record-id"  => recordId = v
            case "warc-target-uri" => uri = v
            case "content-length"  =>
              // pure ASCII digits only: toLong would also accept '+2',
              // which no conformant writer emits — strict here keeps
              // the fail-loud posture of the rest of the parser
              if (v.isEmpty || !v.forall(c => c >= '0' && c <= '9'))
                fail(s"bad Content-Length '$v'")
              len = try v.toLong catch {
                case _: NumberFormatException => fail(s"bad Content-Length '$v'")
              }
            case _                 => () // other headers are legal, ignored
          }
          line = readLine()
        }
        if (len < 0) fail("missing Content-Length")
        if (pos + len > n) fail(s"payload of $len bytes overruns the blob")
        val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
        pos += len.toInt
        // two CRLFs close every record (ISO 28500 §4)
        if (pos + 4 > n || bytes(pos) != '\r' || bytes(pos + 1) != '\n' ||
          bytes(pos + 2) != '\r' || bytes(pos + 3) != '\n')
          fail("record not terminated by two CRLFs")
        pos += 4
        (warcType, recordId, uri, payload)
      }
    }
  }

  /** Attach a synthetic WARC payload built row-locally from columns
    * (narrow map, no shuffle) — pairs with [[warcRecords]] so the
    * gates prove the REAL parser round-trips record structure the
    * table's columns determined.
    */
  def attachSyntheticWarc(df: DataFrame, nCol: Column, uriCol: Column,
      payloadCol: Column, binCol: String = "warc"): DataFrame = {
    val staged = df.withColumn("_wn", nCol.cast("int"))
      .withColumn("_wu", uriCol.cast("string"))
      .withColumn("_wp", payloadCol.cast("string"))
    val schema = StructType(staged.schema.fields :+
      StructField(binCol, BinaryType, nullable = false))
    val (ni, ui, pi) = (staged.schema.fieldIndex("_wn"),
      staged.schema.fieldIndex("_wu"), staged.schema.fieldIndex("_wp"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    staged.mapPartitions { rows =>
      rows.map { r =>
        require(!r.isNullAt(ni) && !r.isNullAt(ui) && !r.isNullAt(pi),
          "attachSyntheticWarc: null construction input")
        // UTF-8, never US-ASCII: ASCII getBytes silently substitutes
        // '?' for non-ASCII chars and the encoded lengths/hashes would
        // quietly disagree with the source text; UTF-8 is lossless and
        // Content-Length counts its bytes (the uri is validated ASCII
        // inside warcEncode)
        Row.fromSeq(r.toSeq :+ warcEncode(r.getInt(ni), r.getString(ui),
          r.getString(pi).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }(enc).drop("_wn", "_wu", "_wp")
  }

  /** Split WARC blobs into records: one output row per record —
    * (idCol, record_idx, warc_type, record_id, target_uri,
    * content_length, payload). Narrow flatMap, no shuffle; see the
    * object scaladoc for the scale contract.
    */
  def warcRecords(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Array(df.schema(idCol)) ++ Seq(
      StructField("record_idx", LongType, nullable = false),
      StructField("warc_type", StringType, nullable = true),
      StructField("record_id", StringType, nullable = true),
      StructField("target_uri", StringType, nullable = true),
      StructField("content_length", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val (idIdx, binIdx) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(binCol))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        parseRecords(r.getAs[Array[Byte]](binIdx)).zipWithIndex.map {
          case ((t, rid, uri, payload), k) =>
            Row(id, k.toLong, t, rid, uri, payload.length.toLong, payload)
        }
      }
    }(enc)
  }
}

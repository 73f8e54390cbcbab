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
  * nothing shuffles until the caller aggregates. Its parallel unit is
  * the FILE (CommonCrawl WARCs are ~1 GB, within a task's reach); for
  * larger files [[warcRecordsFiles]] is the offset-splitting variant:
  * the unit becomes the BYTE RANGE — each task seeks into the file,
  * resyncs forward to the next verified record boundary (CRLF CRLF
  * context + `WARC/` magic + a header block that actually parses) and
  * emits the records that START in its range, so one multi-TB WARC
  * spreads over as many tasks as it has ranges.
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
    val out = new java.io.ByteArrayOutputStream()
    var k = 0
    while (k < nRecords) {
      writeRecord(out, "response", uri, payload, k)
      k += 1
    }
    out.toByteArray
  }

  /** One ISO 28500 record appended to `out` (shared by [[warcEncode]]
    * and [[warcEncodeTyped]]).
    */
  private def writeRecord(out: java.io.ByteArrayOutputStream,
      warcType: String, uri: String, payload: Array[Byte], k: Int): Unit = {
    // uris are ASCII by spec (RFC 3986), and a CR/LF here would smuggle
    // a fake header line into the record — fail at ENCODE time with
    // this operator's name, not downstream with the parser's
    require(uri != null && uri.forall(c => c > ' ' && c <= '~'),
      s"warcEncode: uri must be printable ASCII without spaces/CR/LF, got '$uri'")
    require(warcType != null && warcType.nonEmpty &&
      warcType.forall(c => c > ' ' && c <= '~'),
      s"warcEncode: warc-type must be printable ASCII, got '$warcType'")
    val header = ("WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:uuid:rec-$k>\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("US-ASCII")
    out.write(header)
    out.write(payload)
    out.write(CRLF); out.write(CRLF)
  }

  /** Mixed-record-type WARC blob: one record per (warcType, uri,
    * payload) triple, in order — how real CommonCrawl files actually
    * look (request/response/revisit/metadata interleaved), so gates
    * can pin that a pipeline processes RESPONSES only and counts the
    * rest.
    */
  def warcEncodeTyped(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    require(records.nonEmpty, "warcEncodeTyped: need at least one record")
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((t, uri, payload), k) =>
      writeRecord(out, t, uri, payload, k)
    }
    out.toByteArray
  }

  /** Attach a MIXED-record-type WARC payload built row-locally: an
    * optional `request` record (a real HTTP request message — bytes
    * that would happily parse as text if a pipeline forgot to check
    * the record type), the `response` (the given envelope), then
    * optional `revisit` (empty payload, like a server-side 304
    * dedup) and `metadata` records. The synthetic twin of a real
    * crawl file's record mix for [[warcRecords]] gates.
    */
  def attachSyntheticWarcMixed(df: DataFrame, uriCol: Column,
      responseCol: Column, withRequest: Column, withRevisit: Column,
      withMetadata: Column, binCol: String = "warc"): DataFrame = {
    val staged = df.withColumn("_mu", uriCol.cast("string"))
      .withColumn("_mp", responseCol.cast("binary"))
      .withColumn("_mq", withRequest.cast("boolean"))
      .withColumn("_mr", withRevisit.cast("boolean"))
      .withColumn("_mm", withMetadata.cast("boolean"))
    val schema = StructType(staged.schema.fields :+
      StructField(binCol, BinaryType, nullable = false))
    val (ui, pi, qi, ri, mi) = (staged.schema.fieldIndex("_mu"),
      staged.schema.fieldIndex("_mp"), staged.schema.fieldIndex("_mq"),
      staged.schema.fieldIndex("_mr"), staged.schema.fieldIndex("_mm"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    staged.mapPartitions { rows =>
      rows.map { r =>
        require(!r.isNullAt(ui) && !r.isNullAt(pi) && !r.isNullAt(qi) &&
          !r.isNullAt(ri) && !r.isNullAt(mi),
          "attachSyntheticWarcMixed: null construction input")
        val uri = r.getString(ui)
        val recs = Seq.newBuilder[(String, String, Array[Byte])]
        if (r.getBoolean(qi))
          recs += (("request", uri,
            s"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
        recs += (("response", uri, r.getAs[Array[Byte]](pi)))
        if (r.getBoolean(ri))
          recs += (("revisit", uri, Array.emptyByteArray))
        if (r.getBoolean(mi))
          recs += (("metadata", uri,
            "via: graft-crawler\n".getBytes(
              java.nio.charset.StandardCharsets.US_ASCII)))
        Row.fromSeq(r.toSeq :+ warcEncodeTyped(recs.result()))
      }
    }(enc).drop("_mu", "_mp", "_mq", "_mr", "_mm")
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

  // ---- offset-splitting (byte-range) reader ------------------------ //

  /** Growable byte window over a suffix of a blob: starts with `first`
    * and pulls more bytes from `more()` on demand (`null` = source
    * exhausted). Lets a range task hold ONLY its own bytes plus the
    * tail of the one record that straddles its range end, instead of
    * the whole file.
    */
  private final class ByteWindow(first: Array[Byte],
      more: () => Array[Byte]) {
    private var buf = first
    private var len = first.length
    /** True when at least `n` bytes are available (pulling as needed). */
    def ensure(n: Int): Boolean = {
      if (n < 0) return false // Int overflow upstream = record too big
      while (len < n) {
        val chunk = if (more == null) null else more()
        if (chunk == null || chunk.isEmpty) return false
        if (buf.length - len < chunk.length) {
          val want = len.toLong + chunk.length
          require(want <= Int.MaxValue - 8,
            s"warcRecordsFiles: a single record spans past ${len} buffered " +
              "bytes — records must fit one task's memory")
          val grown = new Array[Byte](
            math.min(math.max(buf.length.toLong * 2, want), Int.MaxValue - 8).toInt)
          System.arraycopy(buf, 0, grown, 0, len)
          buf = grown
        }
        System.arraycopy(chunk, 0, buf, len, chunk.length)
        len += chunk.length
      }
      true
    }
    def available: Int = len
    def apply(i: Int): Byte = buf(i)
    def slice(from: Int, until: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, from, until)
  }

  private val HeaderCap = 64 * 1024 // no real WARC header block is larger

  /** Try to parse a record HEADER at window offset `rel`:
    * (firstPayloadByteRel, warcType, recordId, targetUri, len) — or
    * null when the bytes there are not a well-formed header (version
    * line, `key: value` lines, blank line, pure-digit Content-Length,
    * all within [[HeaderCap]]). Doubles as the resync VERIFIER: a
    * payload that merely contains the `WARC/` magic fails here and the
    * scan moves on.
    */
  private def tryHeader(w: ByteWindow, rel: Int):
      (Int, String, String, String, Long) = {
    var pos = rel
    def line(): String = {
      var e = pos
      while (e - rel < HeaderCap && w.ensure(e + 2) &&
        !(w(e) == '\r' && w(e + 1) == '\n')) e += 1
      if (e - rel >= HeaderCap || !w.ensure(e + 2)) return null
      val s = new String(w.slice(pos, e), "US-ASCII")
      pos = e + 2
      s
    }
    val version = line()
    if (version == null || !version.startsWith("WARC/")) return null
    var warcType: String = null
    var recordId: String = null
    var uri: String = null
    var len = -1L
    var l = line()
    while (l != null && l.nonEmpty) {
      val c = l.indexOf(':')
      if (c <= 0) return null
      val key = l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
      val v = l.substring(c + 1).trim
      key match {
        case "warc-type"       => warcType = v
        case "warc-record-id"  => recordId = v
        case "warc-target-uri" => uri = v
        case "content-length"  =>
          if (v.isEmpty || v.length > 18 ||
            !v.forall(c0 => c0 >= '0' && c0 <= '9')) return null
          len = v.toLong
        case _                 => ()
      }
      l = line()
    }
    if (l == null || len < 0) return null
    (pos, warcType, recordId, uri, len)
  }

  /** Records whose START offset lies in `[start, end)` of a blob
    * (offsets absolute; output rows carry them) — the byte-range
    * kernel behind [[warcRecordsFiles]], exposed for direct use on
    * in-memory blobs. `start == 0` must sit on the blob's first record
    * (fail-loud like [[parseRecords]]); `start > 0` RESYNCS: scan
    * forward for two CRLFs followed by the `WARC/` magic AND a header
    * block that parses — a payload containing magic look-alikes with
    * broken headers cannot fool it (a payload EMBEDDING a fully valid
    * record is genuinely ambiguous, warc-in-warc; documented, not
    * defended). A range interior to one huge payload yields zero
    * records, and the union over any partition of `[0, blob.length)`
    * reassembles the exact [[parseRecords]] list.
    */
  def parseRecordsRange(bytes: Array[Byte], start: Long, end: Long):
      Iterator[(Long, String, String, String, Array[Byte])] = {
    val w = new ByteWindow(bytes, null)
    rangeRecords(w, base = 0L, start, end, "warcRecordsRange")
  }

  /** Shared range loop over a window whose offset 0 is blob offset
    * `base` (file tasks open at `start - 4` so the boundary-context
    * bytes are present; in-memory use has base 0).
    */
  private def rangeRecords(w: ByteWindow, base: Long, start: Long, end: Long,
      op: String): Iterator[(Long, String, String, String, Array[Byte])] = {
    def fail(what: String, at: Long): Nothing =
      throw new IllegalArgumentException(s"$op: $what at byte $at")
    // locate the first record start in [start, end)
    var first = -1L
    if (start == 0L) {
      if (!w.ensure(5) || w(0) != 'W' || w(1) != 'A' || w(2) != 'R' ||
        w(3) != 'C' || w(4) != '/')
        fail("expected WARC/ magic at blob start", 0L)
      first = 0L
    } else {
      var p = math.max(start, 4L) // a boundary needs 2 CRLFs before it
      while (first < 0 && p < end) {
        val rel = (p - base).toInt
        if (w.ensure(rel + 5) &&
          w(rel - 4) == '\r' && w(rel - 3) == '\n' &&
          w(rel - 2) == '\r' && w(rel - 1) == '\n' &&
          w(rel) == 'W' && w(rel + 1) == 'A' && w(rel + 2) == 'R' &&
          w(rel + 3) == 'C' && w(rel + 4) == '/' &&
          tryHeader(w, rel) != null) first = p
        else p += 1
      }
      if (first < 0) return Iterator.empty // interior to one huge payload
    }
    new Iterator[(Long, String, String, String, Array[Byte])] {
      private var at = first
      override def hasNext: Boolean = at < end
      override def next(): (Long, String, String, String, Array[Byte]) = {
        val rel = (at - base).toInt
        val h = tryHeader(w, rel)
        if (h == null) fail("malformed record header", at)
        val (payloadRel, warcType, recordId, uri, len) = h
        // guard the Int window index BEFORE casting: a declared
        // multi-GB payload must fail by name, not wrap negative
        if (payloadRel.toLong + len + 4 > Int.MaxValue - 8)
          fail(s"payload of $len bytes exceeds one task's window", at)
        if (!w.ensure(payloadRel + len.toInt + 4))
          fail(s"payload of $len bytes overruns the blob", at)
        val payload = w.slice(payloadRel, payloadRel + len.toInt)
        val termRel = payloadRel + len.toInt
        if (w(termRel) != '\r' || w(termRel + 1) != '\n' ||
          w(termRel + 2) != '\r' || w(termRel + 3) != '\n')
          fail("record not terminated by two CRLFs", at)
        val out = (at, warcType, recordId, uri, payload)
        at = base + termRel + 4
        out
      }
    }
  }

  /** Offset-splitting distributed WARC reader: list files matching
    * `pattern`, cut each into `splitBytes` byte ranges, parse every
    * range in its OWN task via [[parseRecordsRange]] semantics — one
    * row per record: (path, record_offset, warc_type, record_id,
    * target_uri, content_length, payload). This is the scale path for
    * files too large for [[Source.binaryFiles]] + [[warcRecords]]'s
    * file-per-task unit: parallelism = ceil(size / splitBytes) per
    * file, independent of file count. Each task reads ONLY its range
    * (plus the tail of the one record straddling its end and 4 bytes
    * of boundary context before its start) through the driver's Hadoop
    * conf, so credentials/filesystems carry to executors. Narrow —
    * nothing shuffles until the caller aggregates.
    */
  def warcRecordsFiles(spark: org.apache.spark.sql.SparkSession,
      pattern: String, splitBytes: Long = 128L << 20): DataFrame = {
    require(splitBytes >= 1024 && splitBytes <= (1L << 30),
      s"warcRecordsFiles: splitBytes must be in [1 KiB, 1 GiB], got $splitBytes")
    val hPath = new org.apache.hadoop.fs.Path(pattern)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.globStatus(hPath)
    require(statuses != null && statuses.nonEmpty,
      s"warcRecordsFiles: no files match '$pattern' — an empty crawl " +
        "drop is a pipeline bug, not data")
    val splits: Seq[(String, Long, Long)] = statuses.toSeq
      .filter(_.isFile).flatMap { st =>
        val sz = st.getLen
        require(sz > 0,
          s"warcRecordsFiles: empty file ${st.getPath} — zero records " +
            "is a pipeline bug, not data")
        (0L until sz by splitBytes).map { s0 =>
          (st.getPath.toString, s0, math.min(s0 + splitBytes, sz))
        }
      }
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("record_offset", LongType, nullable = false),
      StructField("warc_type", StringType, nullable = true),
      StructField("record_id", StringType, nullable = true),
      StructField("target_uri", StringType, nullable = true),
      StructField("content_length", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = spark.sparkContext
      .parallelize(splits, math.max(splits.size, 1))
      .flatMap { case (p, s0, e0) =>
        val path = new org.apache.hadoop.fs.Path(p)
        val tfs = path.getFileSystem(conf.value)
        val fileLen = tfs.getFileStatus(path).getLen
        val in = tfs.open(path)
        val readStart = math.max(0L, s0 - 4L) // boundary-context bytes
        val head = new Array[Byte]((e0 - readStart).toInt)
        in.readFully(readStart, head)
        var readPos = e0
        val more: () => Array[Byte] = () =>
          if (readPos >= fileLen) null
          else {
            val n = math.min(4L << 20, fileLen - readPos).toInt
            val chunk = new Array[Byte](n)
            in.readFully(readPos, chunk)
            readPos += n
            chunk
          }
        val w = new ByteWindow(head, more)
        val it = rangeRecords(w, base = readStart, s0, e0, "warcRecordsFiles")
        // a downstream limit/take can abandon the iterator mid-range;
        // the task-completion hook guarantees the handle closes at
        // task end regardless, with the eager closes below kept as the
        // common-path optimization
        var closed = false
        def close(): Unit = if (!closed) { closed = true; in.close() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = try it.hasNext catch { case e: Throwable =>
              close(); throw e
            }
            if (!h) close()
            h
          }
          override def next(): Row = {
            // a parse failure mid-record must not leak the handle
            val (off, t, rid, uri, payload) =
              try it.next() catch { case e: Throwable => close(); throw e }
            Row(p, off, t, rid, uri, payload.length.toLong, payload)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** The driver's Hadoop conf, shipped to tasks (Configuration itself
    * is not java-serializable; Spark's own wrapper is private[spark]).
    */
  private final class SerializableHadoopConf(
      @transient private var c: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = c
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      c.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      c = new org.apache.hadoop.conf.Configuration(false)
      c.readFields(in)
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

  // ---- synthetic HTTP response construction ------------------------- //
  // Encode-side twins of the http_status/http_header/http_body kernels
  // (graft.functions.UrlKernel): the gates build FULL HTTP messages —
  // status line, headers, chunked framing, gzip/deflate content coding
  // — from generating columns, so the decode path is proven against
  // envelopes shaped like a real crawl's, while the oracle recomputes
  // the expected text arithmetically and never parses anything.

  /** gzip-compress one member (deterministic: the JDK writes MTIME=0
    * and a fixed default compression level).
    */
  def gzipCompress(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** zlib-wrapped deflate (the RFC 9110 `deflate` coding). */
  def deflateCompress(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val df = new java.util.zip.DeflaterOutputStream(out)
    df.write(bytes); df.close()
    out.toByteArray
  }

  private def reasonFor(status: Int): String = status match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 304 => "Not Modified"
    case 404 => "Not Found"
    case 500 => "Internal Server Error"
    case _   => "Status"
  }

  /** One HTTP/1.1 response message per RFC 9112: status line, headers,
    * blank line, body — the body content-coded per `coding`
    * ("identity" | "gzip" | "deflate") and, when `chunked`, wrapped in
    * chunked transfer framing (64-byte chunks, a chunk extension on
    * the first — parsers must discard it) instead of Content-Length.
    */
  def httpEncode(status: Int, contentType: String, body: Array[Byte],
      coding: String = "identity", chunked: Boolean = false): Array[Byte] = {
    val encoded = coding match {
      case "identity" => body
      case "gzip"     => gzipCompress(body)
      case "deflate"  => deflateCompress(body)
      case other => throw new IllegalArgumentException(
        s"httpEncode: unknown coding '$other' (identity|gzip|deflate)")
    }
    val head = new java.lang.StringBuilder()
    head.append("HTTP/1.1 ").append(status).append(' ')
      .append(reasonFor(status)).append("\r\n")
    head.append("Server: synthetic/1.0\r\n")
    if (contentType != null)
      head.append("Content-Type: ").append(contentType).append("\r\n")
    if (coding != "identity")
      head.append("Content-Encoding: ").append(coding).append("\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append("Content-Length: ").append(encoded.length).append("\r\n")
    head.append("\r\n")
    val out = new java.io.ByteArrayOutputStream(encoded.length + 256)
    out.write(head.toString.getBytes("ISO-8859-1"))
    if (chunked) {
      var pos = 0
      var firstChunk = true
      while (pos < encoded.length) {
        val n = math.min(64, encoded.length - pos)
        val ext = if (firstChunk) ";x=1" else "" // discarded by parsers
        out.write(s"${n.toHexString}$ext\r\n".getBytes("ISO-8859-1"))
        out.write(encoded, pos, n)
        out.write(CRLF)
        pos += n
        firstChunk = false
      }
      out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
    } else out.write(encoded)
    out.toByteArray
  }

  /** Attach a synthetic HTTP response envelope built row-locally from
    * columns (narrow map): `bodyCol` is BINARY — the body bytes in the
    * page's true charset, so the charset chain downstream is exercised
    * for real. A null `contentTypeCol` omits the header (the
    * sniff-charset fallback case).
    */
  def attachSyntheticHttp(df: DataFrame, statusCol: Column,
      contentTypeCol: Column, codingCol: Column, chunkedCol: Column,
      bodyCol: Column, binCol: String = "http"): DataFrame = {
    val staged = df.withColumn("_hs", statusCol.cast("int"))
      .withColumn("_hct", contentTypeCol.cast("string"))
      .withColumn("_hc", codingCol.cast("string"))
      .withColumn("_hk", chunkedCol.cast("boolean"))
      .withColumn("_hb", bodyCol.cast("binary"))
    val schema = StructType(staged.schema.fields :+
      StructField(binCol, BinaryType, nullable = false))
    val (si, cti, ci, ki, bi) = (staged.schema.fieldIndex("_hs"),
      staged.schema.fieldIndex("_hct"), staged.schema.fieldIndex("_hc"),
      staged.schema.fieldIndex("_hk"), staged.schema.fieldIndex("_hb"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    staged.mapPartitions { rows =>
      rows.map { r =>
        require(!r.isNullAt(si) && !r.isNullAt(ci) && !r.isNullAt(ki) &&
          !r.isNullAt(bi), "attachSyntheticHttp: null construction input")
        val ct = if (r.isNullAt(cti)) null else r.getString(cti)
        Row.fromSeq(r.toSeq :+ httpEncode(r.getInt(si), ct,
          r.getAs[Array[Byte]](bi), r.getString(ci), r.getBoolean(ki)))
      }
    }(enc).drop("_hs", "_hct", "_hc", "_hk", "_hb")
  }

  /** [[attachSyntheticWarc]] with a BINARY payload column — for
    * records whose payload is itself an encoded envelope (a full HTTP
    * message), not text.
    */
  def attachSyntheticWarcBin(df: DataFrame, nCol: Column, uriCol: Column,
      payloadCol: Column, binCol: String = "warc"): DataFrame = {
    val staged = df.withColumn("_wn", nCol.cast("int"))
      .withColumn("_wu", uriCol.cast("string"))
      .withColumn("_wp", payloadCol.cast("binary"))
    val schema = StructType(staged.schema.fields :+
      StructField(binCol, BinaryType, nullable = false))
    val (ni, ui, pi) = (staged.schema.fieldIndex("_wn"),
      staged.schema.fieldIndex("_wu"), staged.schema.fieldIndex("_wp"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    staged.mapPartitions { rows =>
      rows.map { r =>
        require(!r.isNullAt(ni) && !r.isNullAt(ui) && !r.isNullAt(pi),
          "attachSyntheticWarcBin: null construction input")
        Row.fromSeq(r.toSeq :+ warcEncode(r.getInt(ni), r.getString(ui),
          r.getAs[Array[Byte]](pi)))
      }
    }(enc).drop("_wn", "_wu", "_wp")
  }

  /** Attach the gzip of a binary column (narrow map) — the encode-side
    * twin of the `gunzip` kernel, for gz-sitemap construction.
    */
  def attachGzip(df: DataFrame, srcCol: Column, binCol: String): DataFrame = {
    val staged = df.withColumn("_gz", srcCol.cast("binary"))
    val schema = StructType(staged.schema.fields :+
      StructField(binCol, BinaryType, nullable = false))
    val gi = staged.schema.fieldIndex("_gz")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    staged.mapPartitions { rows =>
      rows.map { r =>
        require(!r.isNullAt(gi), "attachGzip: null construction input")
        Row.fromSeq(r.toSeq :+ gzipCompress(r.getAs[Array[Byte]](gi)))
      }
    }(enc).drop("_gz")
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

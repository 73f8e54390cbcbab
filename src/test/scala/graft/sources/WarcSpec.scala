package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warc encode/parse semantics — hand-built records, structural
  * failures, and the length-prefix property that payloads containing
  * header look-alikes never confuse the split.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("warcEncode round-trips through parseRecords") {
    val payload = "hello warc".getBytes("US-ASCII")
    val blob = Warc.warcEncode(3, "http://e.com/x", payload)
    val recs = Warc.parseRecords(blob).toSeq
    assert(recs.length == 3)
    recs.zipWithIndex.foreach { case ((t, rid, uri, p), k) =>
      assert(t == "response")
      assert(rid == s"<urn:uuid:rec-$k>")
      assert(uri == "http://e.com/x")
      assert(java.util.Arrays.equals(p, payload))
    }
  }

  test("mixed-record-type blob: all four types parse in order; only the response routes to text") {
    val resp = Warc.httpEncode(200, "text/html; charset=utf-8",
      "<html><body><p>kept body</p></body></html>".getBytes("UTF-8"), "gzip")
    val blob = Warc.warcEncodeTyped(Seq(
      ("request", "http://e.com/x",
        "GET /x HTTP/1.1\r\nHost: e.com\r\n\r\n".getBytes("US-ASCII")),
      ("response", "http://e.com/x", resp),
      ("revisit", "http://e.com/x", Array.emptyByteArray),
      ("metadata", "http://e.com/x", "via: z\n".getBytes("US-ASCII"))))
    val recs = Warc.parseRecords(blob).toSeq
    assert(recs.map(_._1) == Seq("request", "response", "revisit", "metadata"))
    assert(recs(2)._4.isEmpty) // the revisit carries no representation
    // through the router: response -> html with the decoded body; the
    // request's parseable-as-text payload must NOT leak into the text
    // path; revisit/metadata count as non_response
    val df = Seq(Tuple2("f", blob)).toDF("path", "warc")
    val routed = graft.streaming.CrawlIngest.routeRecords(
      Warc.warcRecords(df, "path", "warc"))
      .select("record_idx", "route", "body")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(routed(0L) == (("non_response", None)))
    assert(routed(1L) == (("html", Some("kept body"))))
    assert(routed(2L) == (("non_response", None)))
    assert(routed(3L) == (("non_response", None)))
  }

  test("payload containing WARC header look-alikes cannot confuse the split") {
    // the payload is length-prefixed, so a record whose BODY is itself
    // a fake WARC record parses as one record, not two
    val evil = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val blob = Warc.warcEncode(1, "http://e.com", evil.getBytes("US-ASCII"))
    val recs = Warc.parseRecords(blob).toSeq
    assert(recs.length == 1)
    assert(new String(recs.head._4, "US-ASCII") == evil)
  }

  test("header names are case-insensitive; unknown headers are ignored") {
    val blob = ("WARC/1.0\r\n" +
      "warc-type: request\r\n" +
      "X-Custom: whatever\r\n" +
      "CONTENT-LENGTH: 2\r\n" +
      "\r\nok\r\n\r\n").getBytes("US-ASCII")
    val recs = Warc.parseRecords(blob).toSeq
    assert(recs.length == 1)
    assert(recs.head._1 == "request")
    assert(recs.head._2 == null) // no record id header
    assert(new String(recs.head._4, "US-ASCII") == "ok")
  }

  test("structural violations fail loudly with the operator name") {
    def bad(s: String): String = {
      val e = intercept[IllegalArgumentException] {
        Warc.parseRecords(s.getBytes("US-ASCII")).foreach(_ => ())
      }
      assert(e.getMessage.contains("warcRecords"))
      e.getMessage
    }
    assert(bad("HTTP/1.1 200 OK\r\n\r\n").contains("magic"))
    assert(bad("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
      .contains("Content-Length"))
    assert(bad("WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n")
      .contains("overruns"))
    assert(bad("WARC/1.0\r\nContent-Length: 2\r\n\r\nokNO-TERMINATOR")
      .contains("terminated"))
    assert(bad("WARC/1.0\r\nContent-Length: x\r\n\r\n\r\n\r\n")
      .contains("Content-Length"))
    // strict digits: '+2' parses under toLong but no conformant
    // writer emits it — reject like any other malformed length
    assert(bad("WARC/1.0\r\nContent-Length: +2\r\n\r\nok\r\n\r\n")
      .contains("Content-Length"))
    assert(bad("WARC/1.0\r\nContent-Length:\r\n\r\n\r\n\r\n")
      .contains("Content-Length"))
    assert(bad("WARC/1.0\r\nnocolon\r\n").contains("malformed header"))
    // a zero-byte blob (failed fetch / truncated upload) fails loudly
    // instead of silently contributing zero records
    assert(bad("").contains("empty blob"))
  }

  test("encode validates the uri and never corrupts non-ASCII payloads") {
    // a CR/LF (or any non-printable) in the uri would smuggle a fake
    // header line into the record — rejected at encode time, named
    val e = intercept[IllegalArgumentException] {
      Warc.warcEncode(1, "http://e.com/\r\nWARC-Type: fake", "x".getBytes)
    }
    assert(e.getMessage.contains("warcEncode"))
    // non-ASCII payloads ride UTF-8 losslessly: Content-Length counts
    // the encoded bytes and the round-trip recovers the exact string
    val df = Seq((1L, 1, "http://e.com/u", "café ☃")).toDF("id", "n", "uri", "body")
    val out = Warc.warcRecords(
      Warc.attachSyntheticWarc(df, col("n"), col("uri"), col("body")),
      "id", "warc").select("content_length", "payload").head()
    val bytes = out.getAs[Array[Byte]](1)
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) ==
      "café ☃")
    assert(out.getLong(0) == bytes.length && bytes.length == 9L)
  }

  // multi-record blob with distinct payloads, several of which are
  // engineered resync traps: CRLFCRLF + "WARC/" magic followed by a
  // header block that does NOT parse (no colon / bad length), plus a
  // bare magic without boundary context — a verified-resync reader
  // must skip all of them
  private def trapBlob(): (Array[Byte], Seq[String]) = {
    val payloads = Seq(
      "plain first payload",
      "\r\n\r\nWARC/1.0\r\nno colon here\r\n\r\n",
      "middle WARC/ magic without boundary",
      "\r\n\r\nWARC/1.0\r\nContent-Length: abc\r\n\r\n",
      "x" * 700, // long payload so some ranges are interior to it
      "\r\n\r\nWARC/9.9\r\n\r\n",
      "tail payload")
    val out = new java.io.ByteArrayOutputStream()
    payloads.zipWithIndex.foreach { case (p, k) =>
      out.write(Warc.warcEncode(1, s"http://e.com/$k", p.getBytes("US-ASCII")))
    }
    (out.toByteArray, payloads)
  }

  test("parseRecordsRange: any byte-range partition reassembles the full list") {
    val (blob, payloads) = trapBlob()
    val full = Warc.parseRecords(blob).toSeq
    assert(full.length == payloads.length)
    val fullRange = Warc.parseRecordsRange(blob, 0, blob.length).toSeq
    assert(fullRange.map(t => new String(t._5, "US-ASCII")) == payloads)
    // offsets are strictly increasing and start at 0
    assert(fullRange.head._1 == 0L)
    assert(fullRange.map(_._1) == fullRange.map(_._1).sorted)
    // for MANY split widths (incl. 1-byte ranges and widths that land
    // mid-magic/mid-header), the union over ranges equals the unsplit
    // parse — records are emitted by the range their START byte is in,
    // exactly once, in offset order
    Seq(1, 7, 64, 97, 256, 701, 1000, blob.length, blob.length + 13)
      .foreach { k =>
        val union = (0 until blob.length by k).flatMap { s =>
          Warc.parseRecordsRange(blob, s, math.min(s + k, blob.length)).toSeq
        }
        assert(union.map(_._1) == fullRange.map(_._1), s"offsets, k=$k")
        assert(union.map(t => new String(t._5, "US-ASCII")) == payloads,
          s"payloads, k=$k")
        assert(union.map(_._4) == full.map(_._3), s"uris, k=$k")
      }
    // a range interior to the long payload has no record start: empty
    val longStart = fullRange(4)._1
    assert(Warc.parseRecordsRange(blob, longStart + 60, longStart + 120).isEmpty)
  }

  test("parseRecordsRange: range 0 demands the magic; traps cannot resync") {
    val (blob, _) = trapBlob()
    val e = intercept[IllegalArgumentException] {
      Warc.parseRecordsRange("junk then WARC/1.0".getBytes("US-ASCII"),
        0, 18).toSeq
    }
    assert(e.getMessage.contains("magic"))
    // a declared multi-GB payload fails by NAME (window is Int-indexed)
    // instead of wrapping negative
    val big = intercept[IllegalArgumentException] {
      Warc.parseRecordsRange(
        "WARC/1.0\r\nContent-Length: 99999999999\r\n\r\n"
          .getBytes("US-ASCII"), 0, 45).toSeq
    }
    assert(big.getMessage.contains("exceeds"))
    // every resync start lands on a REAL record boundary — never
    // inside a trap payload (verified headers, not just magic match)
    val real = Warc.parseRecordsRange(blob, 0, blob.length).map(_._1).toSet
    (1 until blob.length by 11).foreach { s =>
      Warc.parseRecordsRange(blob, s, blob.length).foreach { rec =>
        assert(real.contains(rec._1), s"resync from $s fabricated ${rec._1}")
      }
    }
  }

  test("warcRecordsFiles: byte-range tasks over files reassemble; parallel unit is the range") {
    val dir = java.nio.file.Files.createTempDirectory("warc_split").toFile
    try {
      val (blob, payloads) = trapBlob()
      java.nio.file.Files.write(
        new java.io.File(dir, "a.warc").toPath, blob)
      val single = Warc.warcEncode(3, "http://b.com/x",
        "second file payload".getBytes("US-ASCII"))
      java.nio.file.Files.write(
        new java.io.File(dir, "b.warc").toPath, single)
      val df = Warc.warcRecordsFiles(spark, dir.getAbsolutePath + "/*.warc",
        splitBytes = 1024)
      // parallel unit = byte range: more partitions than files
      assert(df.rdd.getNumPartitions ==
        (blob.length + 1023) / 1024 + (single.length + 1023) / 1024)
      val got = df.collect().map(r => (
        new java.io.File(r.getString(0).stripPrefix("file:")).getName,
        r.getLong(1), r.getString(4),
        new String(r.getAs[Array[Byte]](6), "US-ASCII")))
        .sortBy(t => (t._1, t._2)).toSeq
      val wantA = Warc.parseRecordsRange(blob, 0, blob.length).toSeq
        .map(t => ("a.warc", t._1, t._4, new String(t._5, "US-ASCII")))
      val wantB = Warc.parseRecordsRange(single, 0, single.length).toSeq
        .map(t => ("b.warc", t._1, t._4, new String(t._5, "US-ASCII")))
      assert(got == wantA ++ wantB)
      assert(got.map(_._4).take(payloads.length) == payloads)
      // structural failures stay loud through the distributed path
      java.nio.file.Files.write(
        new java.io.File(dir, "bad.warc").toPath,
        "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
      val e = intercept[org.apache.spark.SparkException] {
        Warc.warcRecordsFiles(spark, dir.getAbsolutePath + "/bad.warc",
          splitBytes = 1024).count()
      }
      assert(e.getMessage.contains("warcRecordsFiles") ||
        e.getCause.getMessage.contains("warcRecordsFiles"))
      // an empty file or an empty glob is a pipeline bug, named
      java.nio.file.Files.write(
        new java.io.File(dir, "empty.warc").toPath, Array.emptyByteArray)
      val e2 = intercept[IllegalArgumentException] {
        Warc.warcRecordsFiles(spark, dir.getAbsolutePath + "/empty.warc")
      }
      assert(e2.getMessage.contains("empty file"))
      val e3 = intercept[IllegalArgumentException] {
        Warc.warcRecordsFiles(spark, dir.getAbsolutePath + "/*.nope")
      }
      assert(e3.getMessage.contains("no files match"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warcRecordsFiles: a record STRADDLING a range end belongs to its start range") {
    // one 2000-byte payload, splitBytes 1024: record 0 starts in range
    // 0 and overruns into range 1; range 1 must emit nothing
    val blob = Warc.warcEncode(2, "http://s.com/big",
      ("y" * 2000).getBytes("US-ASCII"))
    val dir = java.nio.file.Files.createTempDirectory("warc_straddle").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "s.warc").toPath, blob)
      val df = Warc.warcRecordsFiles(spark, dir.getAbsolutePath + "/s.warc",
        splitBytes = 1024)
      assert(df.rdd.getNumPartitions == (blob.length + 1023) / 1024)
      val got = df.select("record_offset", "content_length").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val want = Warc.parseRecordsRange(blob, 0, blob.length)
        .map(t => (t._1, t._5.length.toLong)).toSeq
      assert(got == want && got.map(_._2) == Seq(2000L, 2000L))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("end-to-end: a WARC FILE of full HTTP envelopes through range tasks and the decode chain") {
    // The two halves glued: the offset-splitting range reader
    // (parallel unit = byte range) feeding the envelope → charset →
    // html_text chain (CrawlIngest.recordsToDocs). This is the shape
    // a real crawl file takes — records whose payloads are complete
    // HTTP messages in mixed transfer/content codings, bodies
    // iso-8859-1 — and every decoded body must come back exact.
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    def msg(body: String, coding: String, chunked: Boolean) =
      Warc.httpEncode(200, "text/html; charset=iso-8859-1",
        page(body).getBytes("ISO-8859-1"), coding, chunked)
    // rec c's identity body is long so the file REALLY spans ranges
    // (the coded bodies compress away; identity bytes don't)
    val recs = Seq(
      ("http://e.com/a", msg("café gzip-chunked body", "gzip", true)),
      ("http://e.com/b", msg("naïve deflate body", "deflate", false)),
      ("http://e.com/c", msg("identity body único " + ("pad " * 400),
        "identity", true)))
    val blob = {
      val out = new java.io.ByteArrayOutputStream()
      recs.foreach { case (uri, payload) =>
        out.write(Warc.warcEncode(1, uri, payload))
      }
      out.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("warc_e2e").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "e2e.warc").toPath, blob)
      val ranged = Warc.warcRecordsFiles(spark,
        dir.getAbsolutePath + "/e2e.warc", splitBytes = 1024)
      assert(ranged.rdd.getNumPartitions > 1) // really range-split
      val docs = graft.streaming.CrawlIngest.recordsToDocs(
        ranged.withColumnRenamed("record_offset", "record_idx"))
        .select("url", "body").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(docs == Seq(
        "http://e.com/a" -> "café gzip-chunked body",
        "http://e.com/b" -> "naïve deflate body",
        "http://e.com/c" -> ("identity body único " + ("pad " * 400)).trim))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("attachSyntheticWarc adds exactly one column") {
    val df = Seq((1L, 1, "http://e.com/u", "x")).toDF("id", "n", "uri", "body")
    val out = Warc.attachSyntheticWarc(df, col("n"), col("uri"), col("body"))
    assert(out.columns.toSeq == Seq("id", "n", "uri", "body", "warc"))
  }

  test("warcRecords explodes blobs distributively; attach is narrow") {
    val df = Seq((1L, 2, "http://a.com/1", "one"),
      (2L, 1, "http://b.com/2", "two2")).toDF("id", "n", "uri", "body")
    val withWarc = Warc.attachSyntheticWarc(df, col("n"), col("uri"), col("body"))
    val recs = Warc.warcRecords(withWarc, "id", "warc")
      .select("id", "record_idx", "warc_type", "target_uri", "content_length")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(recs == Set(
      (1L, 0L, "response", "http://a.com/1", 3L),
      (1L, 1L, "response", "http://a.com/1", 3L),
      (2L, 0L, "response", "http://b.com/2", 4L)))
    // null construction inputs fail with the operator's name
    val nulls = Seq((1L, Option.empty[Int], Option("u"), Option("b")))
      .toDF("id", "n", "uri", "body")
    val e = intercept[org.apache.spark.SparkException] {
      Warc.attachSyntheticWarc(nulls, col("n"), col("uri"), col("body")).collect()
    }
    assert(e.getMessage.contains("attachSyntheticWarc"))
  }
}

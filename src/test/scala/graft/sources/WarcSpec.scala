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

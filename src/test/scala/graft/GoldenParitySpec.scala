package graft

import graft.operators.{Relational, Transformer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Parity against the reference's own example fixtures and golden
  * outputs (reference: test/examples/ — read-only inputs; no code
  * reused). These are the reference's de-facto query specs.
  */
class GoldenParitySpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/test/data"
  private val refParcels = "/root/reference/test/examples/parcels"

  test("words-count golden: counts['00']==214, counts['order_created']==107 " +
    "(reference: words_count_test.exs:78-79)") {
    // The reference tokenizer is downcase + split on EVERY single
    // non-word char (~r/[\W]/ — not runs), keeping empty tokens
    // (words_count_test.exs:15-18).
    val counts = spark.read.text(s"$refData/orders.csv")
      .select(explode(split(lower(col("value")), "\\W")).as("word"))
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("00") == 214)
    assert(counts("order_created") == 107)
  }

  // NOTE on the committed golden files: parcels_test.exs REGENERATES
  // orders.csv/parcels.csv with random data on every run and rewrites
  // the golden outputs; the checked-in all_parcels_shipped.csv /
  // threshold_exceeded.csv (73/27) do not correspond to the checked-in
  // inputs — an independent DuckDB evaluation of the reference's
  // decide/2 rule over the committed inputs yields 79/21, matching this
  // engine exactly. We therefore assert (a) the invariant the reference
  // itself asserts (shipped + exceeded == orders), (b) the
  // independently-computed partition, (c) batch/streaming agreement.
  test("parcels fixtures: SLA partition matches independent evaluation of the " +
    "reference rule (reference: test/examples/parcels/*.csv, decide/2)") {
    val orderSchema = StructType(Seq(
      StructField("type", StringType), StructField("occurred_at", StringType),
      StructField("order_number", LongType), StructField("to_ship", IntegerType)))
    val parcelSchema = StructType(Seq(
      StructField("type", StringType), StructField("occurred_at", StringType),
      StructField("order_number", LongType)))

    val orders = spark.read.schema(orderSchema).csv(s"$refParcels/orders.csv")
      .select(col("order_number"), col("occurred_at").cast("timestamp").as("order_ts"),
        col("to_ship"))
    val parcels = spark.read.schema(parcelSchema).csv(s"$refParcels/parcels.csv")
      .select(col("order_number"), col("occurred_at").cast("timestamp").as("ship_ts"))

    val statuses = Relational.shipmentSla(
      orders, parcels, "order_number", "order_ts", "to_ship", "ship_ts", slaDays = 7)
      .select("order_number", "status")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // The reference's own asserted invariant (parcels_test.exs:304).
    assert(statuses.size == 100)
    assert(statuses.values.forall(s => s == "ALL_PARCELS_SHIPPED" || s == "THRESHOLD_EXCEEDED"))
    // Independent evaluation of decide/2 over the committed inputs
    // (DuckDB: any parcel with diff > 604800s => THRESHOLD_EXCEEDED).
    assert(statuses.count(_._2 == "ALL_PARCELS_SHIPPED") == 79)
    assert(statuses.count(_._2 == "THRESHOLD_EXCEEDED") == 21)
  }

  test("parcels fixtures: streaming CEP state machine agrees with the batch operator") {
    import graft.streaming.ParcelsCep._
    def usec(iso: String): Long = {
      val inst = java.time.Instant.parse(iso)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    }
    def lines(p: String) = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(p)).asScala.filter(_.nonEmpty)

    val events =
      lines(s"$refParcels/orders.csv").map { l =>
        val f = l.split(","); OrderEvent(f(2).toLong, "ORDER", usec(f(1)), f(3).toInt)
      } ++ lines(s"$refParcels/parcels.csv").map { l =>
        val f = l.split(","); OrderEvent(f(2).toLong, "SHIPMENT", usec(f(1)), 0)
      }

    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[OrderEvent]
    in.addData(events.toSeq)
    val q = graft.streaming.ParcelsCep(in.toDS(), slaDays = 7).writeStream
      .format("memory").queryName("parcels_golden").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("parcels_golden").as[OrderStatus].collect()
      .map(s => s.orderKey -> s.status).toMap
    assert(out.size == 100)
    assert(out.count(_._2 == "ALL_PARCELS_SHIPPED") == 79)
    assert(out.count(_._2 == "THRESHOLD_EXCEEDED") == 21)
  }

  test("telegram golden: exact re-wrapped lines (reference: telegram_test.exs + test/data/telegram.txt)") {
    // Reference semantics (telegram_test.exs:19-30): words = acc;
    // candidate = join(acc, " ") + " " + word (leading space when acc
    // empty included in the length!); if candidate > 100 chars, emit it
    // AND seed the next acc with the same word (the boundary word is
    // duplicated); no end-of-stream flush.
    val src = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$refData/orders.csv")).asScala
    val words = src.flatMap(_.split(",", -1)).zipWithIndex
      .map { case (w, i) => (i, w) }
    val df = words.toSeq.toDF("pos", "word")

    val schema = StructType(Seq(StructField("line", StringType)))
    val out = Transformer.stateful[List[String]](
      "w", Seq(col("pos")), schema, List.empty[String]) { (r, acc) =>
      val word = r.getString(1)
      val candidate = acc.mkString(" ") + " " + word
      if (candidate.length > 100) (Seq(Row(candidate)), List(word))
      else (Nil, acc :+ word)
    }.apply(Map("w" -> df))("w").as[String].collect().toSeq

    val golden = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$refData/telegram.txt")).asScala.toSeq
    assert(out == golden)
  }

  test("simple-numbers example: mix -> +1 -> odd/even split " +
    "(reference: test/examples/simple_numbers_test.exs:7-35)") {
    import graft.core.Composite
    import graft.operators.{Mixer, Splitter}
    import graft.sources.Source
    val out = Composite(Seq(
      Source.of("numbers1", Seq(1, 2, 3, 4, 5).toDF("v")),
      Source.of("numbers2", Seq(6, 7, 8, 9, 10).toDF("v")),
      Mixer(Seq("numbers1", "numbers2"), "number"),
      Transformer("number")(df => df.withColumn("v", col("v") + 1))))(Map.empty)
    val split = Splitter.predicates(
      "number", Seq("odd" -> (col("v") % 2 === 1), "even" -> (col("v") % 2 === 0)))(out)
    assert(split("odd").select("v").as[Int].collect().sorted.toSeq == Seq(3, 5, 7, 9, 11))
    assert(split("even").select("v").as[Int].collect().sorted.toSeq == Seq(2, 4, 6, 8, 10))
  }

  test("massive call: 3x100k mixed into odd/even predicate outputs, complete " +
    "(reference: gen_mix_test.exs:199-236)") {
    import graft.core.Composite
    import graft.operators.{Mixer, Splitter}
    import graft.sources.Source
    val mixed = Composite(Seq(
      Source.of("numbers1", spark.range(1, 100001).toDF("v")),
      Source.of("numbers2", spark.range(1, 100001).toDF("v")),
      Source.of("numbers3", spark.range(1, 100001).toDF("v")),
      Mixer(Seq("numbers1", "numbers2", "numbers3"), "mixed")))(Map.empty)
    val split = Splitter.predicates("mixed",
      Seq("odd" -> (col("v") % 2 === 1), "even" -> (col("v") % 2 === 0)),
      cache = true)(mixed)
    // the reference's own assertion: each output drains 150,000 events
    assert(split("odd").count() == 150000L)
    assert(split("even").count() == 150000L)
    // stronger than the reference: the multiset is COMPLETE — every
    // value appears exactly 3x, odd values only in the odd output
    val oddCounts = split("odd").groupBy("v").count()
      .select(min(col("count")), max(col("count")), count(lit(1))).head()
    assert(oddCounts.getLong(0) == 3L && oddCounts.getLong(1) == 3L
      && oddCounts.getLong(2) == 50000L)
    assert(split("odd").where(col("v") % 2 === 0).count() == 0L)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("simple-numbers round-robin: n-way zip interleaves one event per stream per turn " +
    "(reference: test/examples/simple_numbers_test.exs round robin, RoundRobinMany)") {
    // The reference builds round-robin mixing from hand-rolled keyed
    // state; the engine's native form is zipByIndexN. Same invariants
    // as the reference asserts: first turn = one event from each
    // stream, last turn likewise, 2-way chunks pair x with 10x.
    val two = Relational.zipByIndex(
      Seq(1, 2, 3).toDF("a"), Seq(col("a")),
      Seq(10, 20, 30).toDF("b"), Seq(col("b")))
    two.collect().foreach(r => assert(r.getInt(1) == r.getInt(0) * 10))
    val three = Relational.zipByIndexN(Seq(
      (Seq(1, 2, 3).toDF("a"), Seq(col("a"))),
      (Seq(10, 20, 30).toDF("b"), Seq(col("b"))),
      (Seq(100, 200, 300).toDF("c"), Seq(col("c")))))
    val rows = three.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(0) * 10 && r.getInt(2) == r.getInt(0) * 100)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling fact tables on their join/agg key at write
  * time so repeated joins and aggregations skip the exchange entirely —
  * the co-located-join strategy SCALE.md prescribes for repeated
  * big-big joins at 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key plans no shuffle exchange") {
    val orders = (1L to 1000L).map(i => (i, i % 7)).toDF("order_id", "status")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("order_id", "item_id")

    // One side written through the Sink API, the other directly — both
    // must carry identical bucket metadata for the exchange-free join.
    graft.sinks.Sink.bucketedTable("orders", "orders_bkt", 8, Seq("order_id"))(
      Map("orders" -> orders))
    items.write.mode("overwrite").bucketBy(8, "order_id").sortBy("order_id")
      .saveAsTable("items_bkt")
    // Disable auto-broadcast: tiny test tables would otherwise be
    // broadcast-joined and the bucketed no-exchange property would
    // never actually be exercised (a vacuous pass).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt").join(spark.table("items_bkt"), "order_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 3000)

      // aggregation on the bucket key also skips the exchange
      val agg = spark.table("items_bkt").groupBy("order_id").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
      assert(agg.count() == 1000)

      // control: the same join on unbucketed data does shuffle
      val plain = orders.join(items, "order_id")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange") ||
        plain.queryExecution.executedPlan.toString.contains("Broadcast"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS items_bkt")
    }
  }

  test("partitionedParquet: a partition-column filter prunes at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1L to 300L).map(i => (i, s"d${i % 3}")).toDF("id", "day")
    graft.sinks.Sink.partitionedParquet("t", dir, Seq("day"))(Map("t" -> df))
    // three hive-style day=… directories on disk
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dirs.toSeq == Seq("day=d0", "day=d1", "day=d2"))
    val back = spark.read.parquet(dir).where(col("day") === "d1")
    assert(back.count() == 100L)
    // pruning is visible in the scan: only one partition directory read
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r16 optimization added a size-adaptive local path to
  * Relational.prefixSums (single round-robin partition below
  * spark.graft.prefixSum.localBytes; range-partitioned offsets above).
  * This spec forces the threshold BOTH ways over the same input and
  * pins byte-identical output — the same forced-both-ways discipline
  * every size-gated switch in the repo carries.
  */
class PrefixSumPathSpec extends AnyFunSuite {
  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withThreshold[A](bytes: Long)(f: => A): A = {
    spark.conf.set("spark.graft.prefixSum.localBytes", bytes.toString)
    try f finally spark.conf.unset("spark.graft.prefixSum.localBytes")
  }

  test("local and distributed prefix-sum paths emit identical rows") {
    import spark.implicits._
    // keys with duplicates-by-value (ties), nulls in the sum column,
    // negative values, and enough rows to spread over 4 partitions
    val df = (1 to 5000).map { i =>
      (i % 977, i.toLong, if (i % 13 == 0) None else Some((i % 59 - 29).toLong))
    }.toDF("k", "id", "v").repartition(4)
    val order = Seq(col("k"), col("id"))
    def run(bytes: Long): Array[String] = withThreshold(bytes) {
      val out = graft.operators.Relational.prefixSums(
        df, order, Seq(col("v") -> "cum", lit(1L) -> "rk"))
      val rows = out.select(col("k"), col("id"), col("cum"), col("rk"))
        .collect().map(_.toString).sorted
      graft.core.CacheRegistry.unpersistAll()
      rows
    }
    val local = run(Long.MaxValue)      // force the one-partition path
    val distributed = run(0L)           // force the range-offset path
    assert(local.length == 5000 && distributed.length == 5000)
    assert(local.sameElements(distributed),
      "local vs distributed prefix-sum outputs diverge")
  }

  test("all-null prefix keeps the nulls-add-zero contract on both paths") {
    import spark.implicits._
    val df = Seq((1L, None: Option[Long]), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    def run(bytes: Long) = withThreshold(bytes) {
      val out = graft.operators.Relational
        .prefixSum(df, Seq(col("id")), col("v"), "cum")
        .orderBy("id").select("cum").as[Long].collect().toSeq
      graft.core.CacheRegistry.unpersistAll()
      out
    }
    assert(run(Long.MaxValue) == Seq(0L, 0L, 7L))
    assert(run(0L) == Seq(0L, 0L, 7L))
  }

  test("a mis-estimated exploded frame never routes onto the local path") {
    import spark.implicits._
    // Generate (explode) stats scale only by row width — blind to
    // multiplicity — so a tiny base exploding 100000x estimates far
    // under any sane local threshold while actually being huge. The
    // routing gate must refuse the single-task sort for it (r16
    // verdict "What's wrong #2": the silent scale cliff), while a
    // same-estimate non-exploding frame still routes local.
    val base = Seq(1L, 2L, 3L).toDF("id")
    val exploded = base
      .withColumn("v", explode(sequence(lit(1L), lit(100000L))))
    withThreshold(Long.MaxValue) {
      assert(!graft.operators.Relational.prefixSumRoutesLocal(exploded),
        "exploded frame with a width-only size estimate routed local")
      assert(graft.operators.Relational.prefixSumRoutesLocal(base),
        "plain small frame should route local")
    }
    // and the distributed path it lands on is still correct end-to-end
    withThreshold(Long.MaxValue) {
      val out = graft.operators.Relational.prefixSum(
          exploded.where(col("v") <= 3), Seq(col("id"), col("v")), col("v"))
        .orderBy("id", "v").select("cum").as[Long].collect().toSeq
      graft.core.CacheRegistry.unpersistAll()
      assert(out == Seq(1L, 3L, 6L, 7L, 9L, 12L, 13L, 15L, 18L))
    }
  }
}

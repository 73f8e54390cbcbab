package graft

import org.apache.spark.sql.SparkSession

/** Scratch audit: run Diagnostics.planLint over every SparkEntry query
  * at sf0.001 and print findings. Dev tool, not a spec.
  */
object LintAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val findings = graft.operators.Diagnostics.planLint(fn(spark, dir))
          .collect()
        findings.foreach { r =>
          println(s"LINT $name ${r.getString(0)} [${r.getString(1)}] ${r.getString(2)}")
        }
      } catch {
        case e: Throwable =>
          println(s"LINT $name BUILD-ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n')}")
      } finally graft.core.CacheRegistry.unpersistAll()
    }
    println("LINT-DONE")
    spark.stop()
  }
}

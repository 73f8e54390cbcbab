package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val centers = Seq(
    Array(10.0f, 0.0f, 0.0f, 0.0f),
    Array(0.0f, 10.0f, 0.0f, 0.0f),
    Array(0.0f, 0.0f, 10.0f, 0.0f))

  // 60 points per cluster, deterministic +-0.02 jitter on one axis.
  private def planted = (0 until 180).map { i =>
    val c = centers(i % 3).clone()
    c(3) = ((i / 3) % 5 - 2) * 0.01f
    (i.toLong, c)
  }.toDF("id", "v")

  test("distributed Lloyd's recovers planted cluster means exactly") {
    val res = Clustering.kmeans(planted, "v", k = 3, maxIter = 10, trainSample = 180)
    assert(res.iters <= 10 && res.lastShift <= 1e-4)
    // every planted cluster maps to one distinct cell
    val cells = Clustering.assign(planted, "v", res.centroids)
      .select((col("id") % 3).as("truth"), col("cell"))
      .distinct().as[(Long, Int)].collect()
    assert(cells.length == 3 && cells.map(_._2).distinct.length == 3)
    // the refined centroid of each cell equals the exact cluster mean:
    // big axis 10.0, jitter axis mean 0.0 (the +-2..+2 pattern sums to 0)
    res.centroids.foreach { c =>
      assert(c.count(x => math.abs(x - 10.0) < 1e-9) == 1)
      assert(math.abs(c(3)) < 1e-9)
    }
  }

  test("kmeans with maxIter=0 returns the sampled init unchanged") {
    val res = Clustering.kmeans(planted, "v", k = 3, maxIter = 0, trainSample = 180)
    assert(res.iters == 0)
    assert(res.centroids.length == 3)
  }

  test("calinskiHarabasz: textbook two well-separated clusters score CH = 50") {
    // cluster 0: (0,0),(0,2); cluster 1: (10,0),(10,2):
    // W = 4, B = 100, CH = (100/1)/(4/2) = 50
    val df = Seq((0, Array(0.0f, 0.0f)), (0, Array(0.0f, 2.0f)),
      (1, Array(10.0f, 0.0f)), (1, Array(10.0f, 2.0f))).toDF("label", "v")
    val r = Clustering.calinskiHarabasz(df, col("label"), col("v")).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("ch") == 50.0)
    // one cluster -> undefined
    val one = Seq((0, Array(0.0f, 0.0f)), (0, Array(1.0f, 1.0f))).toDF("label", "v")
    assert(Clustering.calinskiHarabasz(one, col("label"), col("v"))
      .head().isNullAt(2))
  }

  test("daviesBouldin: symmetric separated clusters score exactly 0.2") {
    // clusters {(0,0),(0,2)} and {(10,0),(10,2)}: S = 1 each,
    // centroid gap 10 -> R = (1+1)/10 = 0.2 both ways -> DB = 0.2
    val df = Seq((0, Array(0.0f, 0.0f)), (0, Array(0.0f, 2.0f)),
      (1, Array(10.0f, 0.0f)), (1, Array(10.0f, 2.0f))).toDF("label", "v")
    val r = Clustering.daviesBouldin(df, col("label"), col("v")).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("db") == 0.2)
    // coincident centroids -> zero separation -> undefined
    val co = Seq((0, Array(0.0f, 1.0f)), (0, Array(0.0f, -1.0f)),
      (1, Array(1.0f, 0.0f)), (1, Array(-1.0f, 0.0f))).toDF("label", "v")
    assert(Clustering.daviesBouldin(co, col("label"), col("v"))
      .head().isNullAt(2))
    // one cluster -> undefined
    val one = Seq((0, Array(0.0f, 0.0f)), (0, Array(1.0f, 1.0f))).toDF("label", "v")
    assert(Clustering.daviesBouldin(one, col("label"), col("v"))
      .head().isNullAt(2))
  }

  test("assign gives null cells to dimension-mismatched vectors") {
    val mixed = Seq(
      (1L, Array(10.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 2.0f))).toDF("id", "v")
    val res = Clustering.kmeans(planted, "v", 3, maxIter = 2, trainSample = 180)
    val out = Clustering.assign(mixed, "v", res.centroids)
      .select("id", "cell").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("silhouetteSimplified: hand means; perfect split 1.0; k=1 null") {
    // 1-D: A = {0, 2} (centroid 1), B = {10, 12} (centroid 11)
    // s = (0.909091 + 0.888889 + 0.888889 + 0.909091) / 4 = 0.898990
    val df = Seq((1L, "A", Array(0.0f)), (2L, "A", Array(2.0f)),
      (3L, "B", Array(10.0f)), (4L, "B", Array(12.0f)))
      .toDF("id", "c", "v")
    val r = Clustering.silhouetteSimplified(df, col("id"), col("c"), col("v"))
      .collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("silhouette") == 0.89899d)
    // every point ON its centroid, clusters apart: s = 1 each
    val tight = Seq((1L, "A", Array(0.0f)), (2L, "A", Array(0.0f)),
      (3L, "B", Array(10.0f)), (4L, "B", Array(10.0f)))
      .toDF("id", "c", "v")
    val rt = Clustering.silhouetteSimplified(tight, col("id"), col("c"),
      col("v")).collect().head
    assert(rt.getAs[Double]("silhouette") == 1.0d)
    // one cluster: b undefined -> summary null
    val one = Seq((1L, "A", Array(0.0f)), (2L, "A", Array(2.0f)))
      .toDF("id", "c", "v")
    val ro = Clustering.silhouetteSimplified(one, col("id"), col("c"),
      col("v")).collect().head
    assert(ro.isNullAt(ro.fieldIndex("silhouette")))
  }
}

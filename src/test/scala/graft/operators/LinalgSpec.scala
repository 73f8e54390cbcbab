package graft.operators

import graft.SparkSpec

class LinalgSpec extends SparkSpec {
  import spark.implicits._

  test("powerIteration: rank-1 data recovers the known direction and eigenvalue") {
    // rows c_i·w with w = (0.6, 0.8) unit and c = (1, 2, 2):
    // X^T X = 9·w·w^T  ->  eigenvector (0.6, 0.8), eigenvalue 9
    val rows = Seq(1.0f, 2.0f, 2.0f)
      .map(c => Tuple1(Array(0.6f * c, 0.8f * c))).toDF("embedding")
    val out = Linalg.powerIteration(rows, "embedding", iters = 2)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0, 1))
    // float32 inputs + 1e-10 term rounding: expect ~1e-6 fidelity
    assert(math.abs(out(0)._1 - 0.6) < 1e-4, s"coord0 ${out(0)._1}")
    assert(math.abs(out(1)._1 - 0.8) < 1e-4, s"coord1 ${out(1)._1}")
    assert(math.abs(out(0)._2 - 9.0) < 1e-3, s"lambda ${out(0)._2}")
    assert(out(0)._2 == out(1)._2) // lambda shared on every row
  }

  test("powerIteration: dimension-mismatched rows are dropped, not folded") {
    val rows = Seq(
      Array(1.0f, 0.0f),
      Array(1.0f, 0.0f),
      Array(9.9f, 9.9f, 9.9f) // ragged: must not perturb the result
    ).map(Tuple1(_)).toDF("embedding")
    val out = Linalg.powerIteration(rows, "embedding", iters = 1)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.size == 2)
    assert(math.abs(out(0) - 1.0) < 1e-9 && math.abs(out(1)) < 1e-9)
  }

  test("topComponents: deflation recovers two orthogonal axes in spectral order") {
    // rows 3·e1 (x2) and 1·e2: X^T X = diag(18, 1) — well-separated, so
    // 3 rounds put v1 within (1/18)^3 of e1 and the residual is ~e2
    val rows = Seq(
      Array(3.0f, 0.0f), Array(3.0f, 0.0f), Array(0.0f, 1.0f)
    ).map(Tuple1(_)).toDF("embedding")
    val out = Linalg.topComponents(rows, "embedding", components = 2, iters = 3)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val v1 = Array(out((1, 0))._1, out((1, 1))._1)
    val v2 = Array(out((2, 0))._1, out((2, 1))._1)
    assert(math.abs(v1(0) - 1.0) < 0.01 && math.abs(v1(1)) < 0.01, v1.toSeq)
    assert(math.abs(v2(1) - 1.0) < 0.01 && math.abs(v2(0)) < 0.01, v2.toSeq)
    assert(math.abs(v1(0) * v2(0) + v1(1) * v2(1)) < 0.01) // orthogonal
    val l1 = out((1, 0))._2
    val l2 = out((2, 0))._2
    assert(l1 > l2 && math.abs(l1 - 18.0) < 0.1 && math.abs(l2 - 1.0) < 0.1)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("powerIteration rejects degenerate all-zero input") {
    val rows = Seq(Array(0.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    intercept[IllegalArgumentException](
      Linalg.powerIteration(rows, "embedding", iters = 1))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("linearCka: proportional prefix scores 1; orthogonal axes score 1/√2") {
    // y = 2x exactly: every centered-scatter cell is proportional, so
    // the prefix spans the full structure -> CKA = 1 (exact integers
    // end-to-end; the readout divides equal products)
    val prop = Seq(1.0f, 2.0f, 3.0f)
      .map(c => Tuple1(Array(c, 2 * c))).toDF("embedding")
    val one = Linalg.linearCka(prop, "embedding", prefixDims = 1)
      .collect().head
    assert((one.getLong(0), one.getInt(1), one.getInt(2)) == ((3L, 2, 1)))
    assert(one.getDouble(3) == 1.0)
    // ±e1/±e2: C is diagonal with equal cells -> num = C11², dx = 2·C11²,
    // dy = C11² -> CKA = 1/√2 (0.707107 at 6dp)
    val ortho = Seq(
      Array(1.0f, 0.0f), Array(-1.0f, 0.0f),
      Array(0.0f, 1.0f), Array(0.0f, -1.0f)).map(Tuple1(_)).toDF("embedding")
    val r = Linalg.linearCka(ortho, "embedding", prefixDims = 1)
      .collect().head
    assert(r.getDouble(3) == 0.707107, s"cka ${r.getDouble(3)}")
    // a prefix >= dim would trivially report 1.0 — rejected, same
    // contract as matryoshkaEval's guard
    intercept[IllegalArgumentException](
      Linalg.linearCka(prop, "embedding", prefixDims = 2))
    graft.core.CacheRegistry.unpersistAll()
  }
}

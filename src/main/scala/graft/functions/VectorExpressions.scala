package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dense-vector kernels.
  *
  * The higher-order-function forms in [[VectorFunctions]] (`zip_with` +
  * `aggregate`) are evaluated interpretively — per-element lambda
  * dispatch and boxing — which dominates wall-clock when millions of
  * candidate pairs are scored (LSH verification, brute-force top-k).
  * These expressions emit a tight primitive loop into whole-stage
  * codegen instead: one pass, three double accumulators, no
  * allocation. Numerics are kept bit-identical to the HOF forms
  * (left-to-right accumulation in double) so DuckDB oracles and the
  * HOF reference implementations agree exactly.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && (l == FloatType || l == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays of float or two arrays of double, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  /** java source reading element i of array `arr` as double. */
  protected def getD(arr: String, i: String): String = elementType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  protected def elemD(arr: ArrayData, i: Int): Double = elementType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
}

/** dot(a, b) = Σ a_i·b_i accumulated left-to-right in double.
  * Mismatched lengths or a null element yield NULL — the same contract
  * as the HOF form (zip_with pads with null, null poisons aggregate).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += elemD(a, i) * elemD(b, i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (${getD(a, i)}) * (${getD(b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), 0.0 when either norm is zero — the
  * same contract as [[VectorFunctions.cosine]], one fused pass.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemD(a, i); val y = elemD(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${getD(a, i)};
         |    double $y = ${getD(b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection bucket id in [0, 2^bits): bit p is the sign
  * of Σ_i a_i·w(seed,p,i), with w ∈ {−1,+1} derived from a splitmix64
  * of (seed, p, i) — the same no-stored-matrix design as the HOF
  * [[VectorFunctions.hyperplaneBucket]], but one fused codegen loop
  * over all planes instead of `bits` interpreted array traversals.
  * (Hash family differs from the HOF form — bucket ids are internal
  * to LSH candidate generation, results are verified exactly. Null
  * elements contribute 0 to the plane dot — harmless for bucketing.)
  */
case class HyperplaneBucket(left: Expression, right: Expression, bits: Int)
    extends VectorBinaryExpression {
  // Without this guard, bits >= 64 silently aliases via Java's shift-
  // mod-64 (1L << 64 == 1L), producing colliding bucket ids instead of
  // an error — reachable from SQL via vec_hyperplane_bucket(v, p, s).
  require(bits >= 1 && bits <= 63, s"vec_hyperplane_bucket: bits must be in [1, 63], got $bits")
  override def prettyName: String = "vec_hyperplane_bucket"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), LongType) if l == FloatType || l == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, bigint seed), got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override protected def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val seed = r.asInstanceOf[Long]
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < bits) {
      var acc = 0.0; var i = 0
      while (i < n) {
        acc += elemD(a, i) * HyperplaneBucket.weight(seed, p, i)
        i += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, seed) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val cls = HyperplaneBucket.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (${getD(a, i)}) * $cls.weight($seed, $p, $i);
         |  }
         |  if ($acc >= 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Index of the nearest centroid by squared euclidean distance — the
  * IVF cell-assignment kernel. Centroids ride along as a codegen
  * reference object (tiny: nlist × dim doubles), so assignment is one
  * fused loop per row inside whole-stage codegen instead of a 16×
  * crossJoin expansion or an ML pipeline pass. Ties break to the
  * lowest cell id; centroids whose dimension mismatches the input are
  * skipped (NULL if none match); null elements contribute 0 like
  * [[HyperplaneBucket]] — assignment is a routing decision, results
  * are verified with exact cosine downstream.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "vec_nearest_centroid: centroids must be non-empty")
  override def prettyName: String = "vec_nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if e == FloatType || e == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")
    }

  private def elementType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def elemD(arr: ArrayData, i: Int): Double = elementType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
  private def getD(arr: String, i: String): String = elementType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var best = -1; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var d = 0.0; var i = 0
        while (i < n) {
          val x = (if (a.isNullAt(i)) 0.0 else elemD(a, i)) - cent(i)
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val cent = ctx.freshName("cent")
      s"""
         |int $n = $a.numElements();
         |int $best = -1; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cent = $cents[$c];
         |  if ($cent.length == $n) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = ($a.isNullAt($i) ? 0.0 : (${getD(a, i)})) - $cent[$i];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Indexes of the `p` nearest centroids (ascending distance, ties to
  * the lowest cell id) — multi-probe assignment for cluster-bounded
  * candidate generation ([[graft.operators.Dedup.semanticPairs]]): a
  * near-dup pair straddling one cell boundary is still caught when any
  * of the p cells overlap. Same kernel shape as [[NearestCentroid]],
  * with p selection passes (p is tiny; each pass excludes the cells
  * already chosen). Centroids with a mismatched dimension are skipped;
  * NULL if none match.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "vec_nearest_centroids: centroids must be non-empty")
  require(p >= 1 && p <= centroids.length,
    s"vec_nearest_centroids: p must be in [1, ${centroids.length}], got $p")
  override def prettyName: String = "vec_nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if e == FloatType || e == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")
    }

  private def elementType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def elemD(arr: ArrayData, i: Int): Double = elementType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
  private def getD(arr: String, i: String): String = elementType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val dists = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var d = 0.0; var i = 0
        while (i < n) {
          val x = (if (a.isNullAt(i)) 0.0 else elemD(a, i)) - cent(i)
          d += x * x; i += 1
        }
        dists(c) = d
      } else dists(c) = Double.NaN // dim mismatch: never selected
      c += 1
    }
    val chosen = new Array[Int](p)
    var found = 0
    while (found < p) {
      var best = -1; var bestD = Double.MaxValue; var c2 = 0
      while (c2 < dists.length) {
        if (!dists(c2).isNaN && dists(c2) < bestD) { bestD = dists(c2); best = c2 }
        c2 += 1
      }
      if (best < 0) {
        return if (found == 0) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(chosen.take(found))
      }
      chosen(found) = best; dists(best) = Double.NaN; found += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(chosen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val dists = ctx.freshName("dists")
      val chosen = ctx.freshName("chosen"); val found = ctx.freshName("found")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c2 = ctx.freshName("c2"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $dists = new double[$cents.length];
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  if ($cents[$c].length == $n) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = ($a.isNullAt($i) ? 0.0 : (${getD(a, i)})) - $cents[$c][$i];
         |      $d += $x * $x;
         |    }
         |    $dists[$c] = $d;
         |  } else $dists[$c] = Double.NaN;
         |}
         |int[] $chosen = new int[$p];
         |int $found = 0;
         |while ($found < $p) {
         |  int $best = -1; double $bestD = Double.MAX_VALUE;
         |  for (int $c2 = 0; $c2 < $dists.length; $c2++) {
         |    if (!Double.isNaN($dists[$c2]) && $dists[$c2] < $bestD) {
         |      $bestD = $dists[$c2]; $best = $c2;
         |    }
         |  }
         |  if ($best < 0) break;
         |  $chosen[$found] = $best; $dists[$best] = Double.NaN; $found++;
         |}
         |if ($found == 0) { ${ev.isNull} = true; }
         |else {
         |  int[] $out = ($found == $p) ? $chosen : java.util.Arrays.copyOf($chosen, $found);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: split the vector into `m` contiguous
  * subspaces and emit, per subspace, the index of the nearest codeword
  * (squared euclidean, ties to the lowest index) — `codebooks(j)` is
  * the `kSub × (dim/m)` codeword table of subspace `j`. One fused scan
  * per (subspace × codeword), no slice allocation, no join. The
  * codebooks ride along as a codegen reference object (m × kSub ×
  * subDim doubles — a few KB). Vectors whose length ≠ m·subDim yield
  * NULL (mixed-dimension corpora never silently mis-encode); null
  * elements contribute 0 like [[NearestCentroid]] — encoding is a
  * routing/compression decision, scores are approximations by design.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: codebooks must be non-empty per subspace")
  require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "pq_encode: all codewords must share one subspace dimension")
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if e == FloatType || e == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")
    }

  private def elementType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def elemD(arr: ArrayData, i: Int): Double = elementType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
  private def getD(arr: String, i: String): String = elementType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val off = j * subDim
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = (if (a.isNullAt(off + i)) 0.0 else elemD(a, off + i)) - cw(i)
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("codes"); val j = ctx.freshName("j")
      val cb = ctx.freshName("cb"); val off = ctx.freshName("off")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val cw = ctx.freshName("cw")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |if ($a.numElements() != ${m * subDim}) { ${ev.isNull} = true; }
         |else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double[][] $cb = $cbs[$j];
         |    int $off = $j * $subDim;
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $cb.length; $c++) {
         |      double[] $cw = $cb[$c];
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        double $x = ($a.isNullAt($off + $i) ? 0.0 : (${getD(a, s"$off + $i")})) - $cw[$i];
         |        $d += $x * $x;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[j·kSub + c] = dot(q_subspace_j,
  * codeword_{j,c}) — computed once per QUERY row (queries are the tiny
  * broadcast side), then reused against every corpus code via
  * [[CodeLookupSum]]. Output is subspace-major, length m·kSub. NULL
  * when the query's length ≠ m·subDim; null elements contribute 0.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_lut: codebooks must be non-empty per subspace")
  private val m = codebooks.length
  private val kSub = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == kSub && cb.forall(_.length == subDim)),
    "pq_lut: ragged codebooks")

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if e == FloatType || e == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")
    }

  private def elementType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def elemD(arr: ArrayData, i: Int): Double = elementType match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
  private def getD(arr: String, i: String): String = elementType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * subDim) return null
    val lut = new Array[Double](m * kSub)
    var j = 0
    while (j < m) {
      val cb = codebooks(j); val off = j * subDim
      var c = 0
      while (c < kSub) {
        val cw = cb(c)
        var acc = 0.0; var i = 0
        while (i < subDim) {
          acc += (if (a.isNullAt(off + i)) 0.0 else elemD(a, off + i)) * cw(i)
          i += 1
        }
        lut(j * kSub + c) = acc; c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val lut = ctx.freshName("lut"); val j = ctx.freshName("j")
      val cb = ctx.freshName("cb"); val off = ctx.freshName("off")
      val c = ctx.freshName("c"); val cw = ctx.freshName("cw")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != ${m * subDim}) { ${ev.isNull} = true; }
         |else {
         |  double[] $lut = new double[${m * kSub}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double[][] $cb = $cbs[$j];
         |    int $off = $j * $subDim;
         |    for (int $c = 0; $c < $kSub; $c++) {
         |      double[] $cw = $cb[$c];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        $acc += ($a.isNullAt($off + $i) ? 0.0 : (${getD(a, s"$off + $i")})) * $cw[$i];
         |      }
         |      $lut[$j * $kSub + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance lookup: Σ_j lut[j·kSub + codes[j]] — the ADC
  * kernel of PQ search. `codes` is the array<int> from [[PqEncode]];
  * `lut` is a per-query (or global) table of `m · kSub` doubles laid
  * out subspace-major. NULL on null inputs, a lut whose length is not
  * a multiple of kSub, or an out-of-range code (defensive: a foreign
  * codes column scores NULL rather than reading garbage).
  */
case class CodeLookupSum(left: Expression, right: Expression, kSub: Int)
    extends BinaryExpression {
  require(kSub >= 1, s"code_lookup_sum: kSub must be >= 1, got $kSub")
  override def prettyName: String = "code_lookup_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<int> codes, array<double> lut), got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]; val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * kSub) return null
    var acc = 0.0; var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= kSub) return null
      if (lut.isNullAt(j * kSub + c)) return null
      acc += lut.getDouble(j * kSub + c); j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $kSub) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $kSub || $lut.isNullAt($j * $kSub + $c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $lut.getDouble($j * $kSub + $c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` — the probe-side kernel
  * of [[graft.operators.Relational.bloomPrunedJoin]]. The filter rides
  * along as a codegen reference object (it is `Serializable`, sized by
  * expectedItems × fpp at build time). Integral keys probe as longs,
  * strings as their UTF-8 bytes — matching how
  * [[graft.operators.Relational.buildBloom]] inserts them. NULL input
  * → NULL (filter semantics drop it, same as an equi-join would).
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an integral or string key, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType    => bloom.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => bloom.mightContainLong(v.asInstanceOf[Int].toLong)
    case ShortType   => bloom.mightContainLong(v.asInstanceOf[Short].toLong)
    case ByteType    => bloom.mightContainLong(v.asInstanceOf[Byte].toLong)
    case StringType =>
      bloom.mightContainBinary(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("bloom", bloom, "org.apache.spark.util.sketch.BloomFilter")
      child.dataType match {
        case StringType => s"${ev.value} = $b.mightContainBinary(($v).getBytes());"
        case _          => s"${ev.value} = $b.mightContainLong((long) $v);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** splitmix64 of (seed, plane, dim) mapped to ±1 — stateless, so
    * executors reconstruct the hyperplanes with zero broadcast.
    */
  def weight(seed: Long, p: Int, i: Int): Double = {
    var z = seed + 0x9E3779B97F4A7C15L * (p.toLong * 1000003L + i + 1L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }
}

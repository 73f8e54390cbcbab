package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused codegen hash-sketch kernels over `array<string>` columns.
  *
  * The composable forms in [[graft.operators.Dedup]] — `transform(sh,
  * xxhash64)` re-hashed per family member, and the 64-conditional-sum
  * SimHash aggregate — are correct but pay interpreted per-element
  * lambda dispatch (`transform` lambdas never enter whole-stage
  * codegen) and, for SimHash, an explode + shuffle per corpus pass.
  * These expressions compute the identical values in one fused
  * primitive loop per row.
  *
  * Bit-compatibility contract (pinned by HashExpressionSpec): every
  * hash matches Spark's `xxhash64` composition exactly —
  * string base = XXH64.hashUTF8String(s, 42), null element base = 42
  * (xxhash64 of a null returns the seed), family member i =
  * hashLong(base, hashInt(i, 42)) = `xxhash64(lit(i), baseHash)` —
  * so swapping the fused and composable forms never changes results.
  */
object HashExpressions {
  val SparkHashSeed = 42L
}

/** MinHash signature straight from the shingle-string array: for each
  * family member i, min over shingles of xxhash64(lit(i),
  * xxhash64(shingle)). One pass per row: each shingle string is hashed
  * once, the 64 family mins update in registers; replaces one
  * interpreted `transform` + `numHashes` interpreted
  * `array_min(transform(...))` traversals.
  * Empty shingle arrays yield an all-null signature (array_min of an
  * empty array is null) — identical to the composable form.
  */
case class MinhashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"minhash_signature: numHashes must be >= 1, got $numHashes")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  // xxhash64(lit(i), h) hashes the int literal first: seed 42 -> hashInt.
  private lazy val famSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, HashExpressions.SparkHashSeed))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base =
        if (arr.isNullAt(j)) HashExpressions.SparkHashSeed
        else XXH64.hashUTF8String(arr.getUTF8String(j), HashExpressions.SparkHashSeed)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(base, famSeeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seeds = ctx.addReferenceObj("famSeeds", famSeeds, "long[]")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val mins = ctx.freshName("mins")
      val base = ctx.freshName("base"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $base = $a.isNullAt($j)
         |      ? ${HashExpressions.SparkHashSeed}L
         |      : $xxh.hashUTF8String($a.getUTF8String($j), ${HashExpressions.SparkHashSeed}L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $h = $xxh.hashLong($base, $seeds[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a word array: per bit, sign of the sum of ±1
  * votes from xxhash64(word) — the same votes as the explode +
  * 64-conditional-sum aggregate in [[graft.operators.Dedup]], with no
  * explode and no shuffle: one loop over the row's words, 64 int
  * accumulators in registers. Empty arrays are NULL (the aggregate
  * form simply has no rows for such a doc — callers filter).
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val acc = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) HashExpressions.SparkHashSeed
        else XXH64.hashUTF8String(arr.getUTF8String(j), HashExpressions.SparkHashSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val acc = ctx.freshName("acc")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |else {
         |  int[] $acc = new int[64];
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $a.isNullAt($j)
         |      ? ${HashExpressions.SparkHashSeed}L
         |      : $xxh.hashUTF8String($a.getUTF8String($j), ${HashExpressions.SparkHashSeed}L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($acc[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles as one fused kernel: position i yields the
  * space-joined words [i, i+n); fewer than n words yield the single
  * all-words shingle — exactly the `transform(sequence, i =>
  * array_join(slice(ws, i, n), " "))` form in
  * [[TextFunctions.wordShinglesFromWords]], which pays an interpreted
  * lambda + a slice allocation per shingle AND (being a HOF) knocks
  * the whole projection out of whole-stage codegen. Null words are
  * skipped inside a shingle, matching array_join's null handling.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_shingles: n must be >= 1, got $n")
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Shared by eval and codegen (the generated code calls this method
    * on the expression reference object — a plain static-shaped call,
    * so the surrounding stage keeps whole-stage codegen).
    */
  def compute(v: ArrayData): ArrayData = {
    val m = v.numElements()
    def join(from: Int, until: Int): org.apache.spark.unsafe.types.UTF8String = {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](until - from)
      var i = from
      while (i < until) { // concatWs skips nulls, like array_join
        parts(i - from) = if (v.isNullAt(i)) null else v.getUTF8String(i)
        i += 1
      }
      org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
    }
    if (m < n) new GenericArrayData(Array[Any](join(0, m)))
    else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) { out(i) = join(i, i + n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character k-shingles of an (already-normalized) string: positions
  * 1..len-k+1 of SQL `substring(s, i, k)`; strings of length <= k
  * yield the single whole-string shingle — the fused form of the
  * `transform(sequence, i => substring(s, i, k))` HOF chain.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_shingles: k must be >= 1, got $k")
  override def prettyName: String = "char_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${child.dataType.catalogString}")
    }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val n = s.numChars()
    if (n <= k) new GenericArrayData(Array[Any](s))
    else {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { out(i) = s.substringSQL(i + 1, k); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of words present in a fixed (small) stopword set — the fused
  * form of `size(filter(ws, w => w.isInCollection(stops)))`. Null
  * words never match (SQL IN semantics in a filter).
  */
case class StopwordCount(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  require(stopwords.nonEmpty, "stopword_count: stopwords must be non-empty")
  override def prettyName: String = "stopword_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  private lazy val stops: Array[org.apache.spark.unsafe.types.UTF8String] =
    stopwords.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0; var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        var j = 0
        var found = false
        while (j < stops.length && !found) { found = stops(j) == w; j += 1 }
        if (found) c += 1
      }
      i += 1
    }
    c
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("stopwordCount", this, classOf[StopwordCount].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-ish subword count: Σ ceil(numChars(w)/4) over the word array —
  * the fused form of the `aggregate(ws, 0, acc + ceil(len/4))` HOF.
  * A null word poisons the result to NULL, matching the aggregate
  * (null arithmetic propagates through the lambda).
  */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "subword_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L; var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc += (arr.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ($a.getUTF8String($i).numChars() + 3) / 4;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint h = (h·31 + codePoint) mod
  * 1_000_000_007 over the code points of an (already-normalized)
  * string — the fused form of split('')/filter/aggregate-with-ascii.
  * Every intermediate stays < 2^35, so the value is reproducible in
  * any engine with 64-bit ints.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rolling_hash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${child.dataType.catalogString}")
    }

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers for the fused hash-sketch kernels. */
object HashFunctions {
  /** Fused MinHash signature from shingle strings (one pass, bit-identical
    * to `minhashSignature(transform(sh, xxhash64), n)`).
    */
  def minhashSignatureFused(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinhashSignature(GraftBridge.expression(shingles), numHashes))

  /** Fused 64-bit SimHash from a word array (NULL for empty arrays). */
  def simhash64Fused(wordArr: Column): Column =
    GraftBridge.column(Simhash64(GraftBridge.expression(wordArr)))

  /** Fused word n-gram shingles (bit-identical to the HOF form in
    * [[TextFunctions.wordShinglesFromWords]]).
    */
  def wordShinglesFused(wordArr: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(wordArr), n))

  /** Fused character k-shingles of an already-normalized string. */
  def charShinglesFused(s: Column, k: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(s), k))

  /** Fused stopword-membership count over a word array. */
  def stopwordCountFused(wordArr: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(StopwordCount(GraftBridge.expression(wordArr), stopwords))

  /** Fused BPE-ish subword count over a word array. */
  def subwordCountFused(wordArr: Column): Column =
    GraftBridge.column(SubwordCount(GraftBridge.expression(wordArr)))

  /** Fused rolling polynomial fingerprint of an already-normalized string. */
  def rollingHashFused(s: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(s)))
}

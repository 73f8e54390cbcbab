package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer TRAINING and ENCODING — the canonical
  * "train the tokenizer on the corpus" step of an LLM data pipeline,
  * re-expressed Spark-first.
  *
  * The scale split mirrors the quantizer design ([[graft.operators
  * .Similarity]]): the distributed pass reduces the corpus to a WORD
  * FREQUENCY table (vocabulary-sized — Zipf-bounded, ~10⁵–10⁶ rows at
  * any corpus size, and optionally df-capped), the merge loop runs on
  * the driver over that table (classic Sennrich BPE with incremental
  * pair counts — each merge touches only the words containing it), and encoding returns to the cluster as a fused expression
  * with the learned ranks riding along as a reference object — no
  * join, no UDF registry, one pass per row.
  *
  * Determinism: pair selection breaks frequency ties lexicographically,
  * so the same corpus always yields the same merge table.
  */
object Bpe {

  /** End-of-word marker, the classic `</w>` — keeps "est" in "highest"
    * distinct from "est</w>" in "lowest".
    */
  val Eow = "</w>"

  /** Initial symbols of a word: one per UNICODE CODE POINT (splitting
    * UTF-16 code units would break surrogate pairs — a non-BMP char
    * would shatter into two lone surrogates that can never re-encode),
    * plus the terminal marker.
    */
  private[functions] def toSymbols(word: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out += Eow
    out.toArray
  }

  /** Learn `numMerges` merge rules from the corpus: ONE distributed
    * word-count aggregate (its output is the vocabulary, not the
    * corpus), then the driver-local merge loop. `maxVocab` guards the
    * collect: training uses the most frequent `maxVocab` words (the
    * standard cap — rare-word tails contribute ~nothing to pair
    * counts but dominate |vocabulary|).
    */
  def learnMerges(
      wordsDf: org.apache.spark.sql.DataFrame,
      wordCol: String,
      numMerges: Int,
      minPairFreq: Long = 2L,
      maxVocab: Int = 65536): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val freq = wordsDf
      .where(col(wordCol).isNotNull && length(col(wordCol)) > 0)
      .groupBy(col(wordCol).as("w")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    learnLocal(freq, numMerges, minPairFreq)
  }

  /** The Sennrich merge loop over a word-frequency table. */
  def learnLocal(
      wordFreq: Seq[(String, Long)],
      numMerges: Int,
      minPairFreq: Long): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val vocab: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      toSymbols(w) -> n
    }.toArray
    // Incremental counting: pair counts and a pair -> word-ids index
    // are built ONCE; each merge re-counts only the words that contain
    // the merged pair (index entries can go stale after a rewrite, so
    // membership is re-verified on read). Selection is a scan of the
    // standing count map — no per-merge rebuild of anything global.
    val counts = mutable.Map.empty[(String, String), Long]
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def index(idx: Int, syms: Array[String], n: Long, sign: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * n
        if (c <= 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.Set.empty) += idx
        i += 1
      }
    }
    def rewrite(syms: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    vocab.zipWithIndex.foreach { case ((syms, n), idx) => index(idx, syms, n, 1L) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue && merges.length < numMerges) {
      if (counts.isEmpty) continue = false
      else {
        // max by frequency; lexicographic pair tiebreak = determinism
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < minPairFreq) continue = false
        else {
          val (a, b) = best._1
          merges += ((a, b))
          where.getOrElse((a, b), mutable.Set.empty).toArray.sorted.foreach { idx =>
            val (syms, n) = vocab(idx)
            var contains = false
            var i = 0
            while (i < syms.length - 1 && !contains) {
              if (syms(i) == a && syms(i + 1) == b) contains = true
              i += 1
            }
            if (contains) {
              index(idx, syms, n, -1L)
              val next = rewrite(syms, a, b)
              vocab(idx) = (next, n)
              index(idx, next, n, 1L)
            }
          }
          where.remove((a, b))
        }
      }
    }
    merges.toSeq
  }

  /** Greedy lowest-rank-first encoding of one word (the standard BPE
    * apply): repeatedly merge the adjacent pair with the best (lowest)
    * learned rank until none applies.
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = toSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = syms(bestAt) + syms(bestAt + 1)
        syms = (syms.take(bestAt) :+ merged) ++ syms.drop(bestAt + 2)
      }
    }
    syms
  }

  /** Column form: `array<string>` of words → `array<string>` of BPE
    * tokens (word-terminal tokens carry the `</w>` suffix).
    */
  def encode(wordsCol: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(wordsCol), merges))
}

/** Fused BPE encoder over an `array<string>` of words. The merge-rank
  * table is a broadcast-by-closure reference object (like the centroid
  * tables); per row: one greedy merge loop per word, output tokens
  * appended in word order. Null words are skipped; null input is null.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${child.dataType.catalogString}")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val toks = Bpe.encodeWord(arr.getUTF8String(i).toString, ranks)
        var j = 0
        while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression instance (with its rank table) rides into the
    // generated code as a reference object; one virtual call per row
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Bit-interleaving (Morton / Z-order) kernel for data-layout
  * clustering. Interleaving the low `bits` of each key column yields a
  * single long whose sort order visits the key space along a Z-curve —
  * range-partitioning and sorting files by it co-locates rows that are
  * close in EVERY key dimension, so min/max footer stats prune scans
  * for predicates on any subset of the keys (the standard lakehouse
  * multi-dimensional clustering trick; at 100 TB this is what turns a
  * two-column selective scan from "read everything" into "read a few
  * files").
  *
  * Bit i of column c lands at output position `i * numCols + c`
  * (column 0 owns the least-significant lane). Inputs are masked to
  * `bits` low bits — callers bucket/normalize beforehand. Null in any
  * input yields null.
  */
case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {
  require(children.nonEmpty, "interleave_bits: at least one input column")
  require(bits >= 1 && bits <= 63, s"interleave_bits: bits must be in [1,63], got $bits")
  require(bits * children.size <= 63,
    s"interleave_bits: $bits bits x ${children.size} cols exceeds a long (max 63)")

  override def prettyName: String = "interleave_bits"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(!_.dataType.isInstanceOf[LongType.type]) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint inputs, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  private val n = children.size
  private val mask = (1L << bits) - 1L

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      val masked = v.asInstanceOf[Long] & mask
      var i = 0
      while (i < bits) {
        z |= ((masked >>> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
    val evals = children.map(_.genCode(ctx))
    val isNull = ctx.freshName("isNull")
    val value = ctx.freshName("value")
    val v = ctx.freshName("v")
    val i = ctx.freshName("i")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck = evals.map(_.isNull.toString).mkString(" || ")
    val lanes = evals.zipWithIndex.map { case (e, c) =>
      s"""{
         |  long $v = ${e.value} & ${mask}L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $value |= (($v >>> $i) & 1L) << ($i * $n + $c);
         |  }
         |}""".stripMargin
    }.mkString("\n")
    val body =
      s"""$childCode
         |boolean $isNull = $nullCheck;
         |long $value = 0L;
         |if (!$isNull) {
         |$lanes
         |}""".stripMargin
    ev.copy(code = code"$body",
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

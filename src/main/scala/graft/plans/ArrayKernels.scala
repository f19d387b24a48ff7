package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native codegen kernels for the hot array loops of the similarity
  * operators — the (b) extension path of the build brief: custom
  * Catalyst `Expression`s, not UDFs, so the pair loops of the
  * brute-force cosine join (q26/q45), the LSH candidate ranking (q27),
  * and the signature-agreement pre-filter (q24) stay inside
  * whole-stage codegen.
  *
  * Why: the higher-order-function forms (`aggregate(zip_with(a, b,
  * (x, y) -> x * y), 0D, ...)`) allocate an intermediate array per row
  * and evaluate two lambdas per element through the interpreted
  * HigherOrderFunction path; on an all-pairs join (millions of rows ×
  * 64 elements) that dominated the round-2 bench (q45: 403 s at
  * sf0.1). These kernels are a single primitive loop — no allocation,
  * no virtual calls — and produce bit-identical doubles (same
  * left-to-right summation order), so the DuckDB oracles are unchanged.
  *
  * Reference dataflow being accelerated: the cosine/Jaccard
  * verification steps of Assignment3/task1.py:84-99 (candidate
  * verification loop) — re-expressed as vectorized join-side
  * expressions instead of driver dict lookups.
  */

/** `graft_dot(array<double>, array<double>)` → double: Σ aᵢ·bᵢ over the
  * common prefix, left-to-right (bit-identical to the zip_with/aggregate
  * HOF form and DuckDB's list_sum(list_transform(...))). */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    // fresh names: fixed identifiers collide with enclosing
    // whole-stage-codegen locals (silently demotes to interpreted)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_eqcount(array<long>, array<long>)` → int: number of positions
  * where the two arrays agree (over the common prefix) — the
  * signature-agreement pre-filter of the banded-LSH join (q24). */
case class EqCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_eqcount requires (array<bigint>, array<bigint>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eqcount"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) cnt += 1; i += 1 }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val cnt = ctx.freshName("cnt")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountExpr =
    copy(left = newLeft, right = newRight)
}

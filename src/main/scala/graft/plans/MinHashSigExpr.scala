package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the MinHash signature inner loop:
  * given the array of 31-bit token hashes, returns
  * [min_j((a_i·x_j + b_i) mod m)]_{i<k} in ONE pass over the array.
  *
  * This is the (b) extension path of the build brief — a codegen'd
  * `Expression`, not a UDF. The higher-order-function form
  * (q23: k × `array_min(transform(...))`) allocates k intermediate
  * arrays per row and re-traverses the input k times; this kernel is a
  * single traversal with a k-length register array, no allocation
  * beyond the output. Values are bit-identical to the HOF form (same
  * seeds, same arithmetic), so the two share one DuckDB oracle —
  * PlansSpec asserts equality and SimilaritySpec's properties apply to
  * both.
  *
  * Interpreted `nullSafeEval` and generated `doGenCode` paths are both
  * implemented; whole-stage codegen uses the latter.
  */
case class MinHashSigExpr(
    child: Expression,
    seedsA: Array[Long],
    seedsB: Array[Long],
    mod: Long)
  extends UnaryExpression {

  require(seedsA.length == seedsB.length && seedsA.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = seedsA.length
    val mins = Array.fill(k)(mod) // mod > any (x mod m); empty set → m
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (seedsA(j) * x + seedsB(j)) % mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val aRef = ctx.addReferenceObj("seedsA", seedsA, "long[]")
    val bRef = ctx.addReferenceObj("seedsB", seedsB, "long[]")
    // every local gets a fresh name — fixed identifiers collide with
    // enclosing whole-stage-codegen locals (Janino "Redefinition of
    // local variable", which silently demotes the plan to interpreted)
    val k = ctx.freshName("k")
    val mins = ctx.freshName("mins")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val x = ctx.freshName("x")
    val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${mod}L);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $x + $bRef[$j]) % ${mod}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
  : MinHashSigExpr = copy(child = newChild)
}

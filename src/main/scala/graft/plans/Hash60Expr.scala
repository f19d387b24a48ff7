package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Hash60Expr]]: md5 → top 60 bits, without the hex
  * string round-trip. The SQL form (`conv(substring(md5(x), 1, 15),
  * 16, 10)`) allocates the 32-char hex string and re-parses it per
  * hash; this digests bytes and assembles the value directly — the
  * first 15 hex chars are exactly the digest's first 7.5 bytes, i.e.
  * big-endian(first 8 bytes) >>> 4. MessageDigest is not thread-safe,
  * hence per-thread instances. */
object Hash60 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def hash60(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xFFL); i += 1 }
    l >>> 4
  }
}

/** `graft_h60(string)` → bigint: the engine's portable 60-bit md5
  * hash ([[graft.functions.Hashing]]), as a native kernel. Value is
  * bit-identical to the `conv(substring(md5(x), 1, 15), 16, 10)` form
  * (PlansSpec asserts it), so every DuckDB oracle is unchanged; the
  * win is dropping the per-hash hex encode + radix parse on the hot
  * hashing paths (minhash signatures over every shingle/token, bloom
  * probes, FM, sampling). */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_h60 requires string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : Hash60Expr = copy(child = newChild)
}

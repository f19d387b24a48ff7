package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.mining.SetSimilarity

/** Session extension registering the engine's native expressions —
  * activate with `.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")` (or `.withExtensions`). The public,
  * supported mechanism for adding catalog functions without touching
  * Spark internals.
  *
  * `graft_minhash(array<long>)` → the [[MinHashSigExpr]] kernel with the
  * engine's standard 32-seed family (mod 26189), bit-identical to q23's
  * HOF form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val seedsA = SetSimilarity.MinHashSeeds.map(_._1).toArray
    val seedsB = SetSimilarity.MinHashSeeds.map(_._2).toArray
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == 1, "graft_minhash takes one array<long> arg")
      MinHashSigExpr(args.head, seedsA, seedsB, SetSimilarity.MinHashMod)
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      builder))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_dot takes two array<double> args")
        DotProductExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cos"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cos"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_cos takes two array<double> args")
        CosineSimExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dist2"),
      new ExpressionInfo(classOf[Dist2Expr].getName, "graft_dist2"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_dist2 takes two array<double> args")
        Dist2Expr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_isize"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName,
        "graft_isize"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "graft_isize takes two sorted array<string> args")
        SortedIntersectSizeExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_h60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "graft_h60"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_h60 takes one string arg")
        Hash60Expr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_eqcount"),
      new ExpressionInfo(classOf[EqCountExpr].getName, "graft_eqcount"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_eqcount takes two array<bigint> args")
        EqCountExpr(args(0), args(1))
      }))
    // HOF → native-kernel auto-rewrite; inert unless the session sets
    // spark.graft.autoKernel=true (see KernelRewrite's safety notes)
    ext.injectOptimizerRule(_ => KernelRewrite)
  }
}

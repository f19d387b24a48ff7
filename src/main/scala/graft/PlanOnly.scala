package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-only construction mode (`spark.graft.planOnly`, set by
  * [[ExplainDump]]): building a query's DataFrame must run ZERO Spark
  * jobs, so dumping plans never pays gate-estimate aggregates,
  * checkpoint materializations, or driver-side index collects.
  *
  * The contract every volume gate in the repo honors (the LSH
  * estimate, the graph pair mass, the recommender dimension
  * measures): under planOnly an estimate reads as 0, which selects
  * the below-guard / in-gate branch — the true executing plan at
  * every oracle SF, where the estimates are far under their guards.
  * The above-guard branches are pinned by plan tests instead
  * (RecommendSpec / SimilaritySpec / GraphSpec).
  *
  * Checkpoints are substituted, not lazified: a LAZY
  * `localCheckpoint(eager = false)` is NOT jobless — it still runs
  * `queryExecution.toRdd`, whose `prepare()` submits every
  * broadcast-exchange future in the subtree (measured: 90+ jobs just
  * constructing the recommender family's dumps). [[cp]] instead
  * returns a same-schema empty-`LogicalRDD` stand-in under planOnly:
  * the dumped plan shows the identical `Scan ExistingRDD` node a
  * production checkpoint leaves, and nothing of the subtree prepares
  * or executes. A plan dump never evaluates the frame, so the
  * stand-in's emptiness is unobservable there; planOnly frames must
  * never be executed or cached for later real use ([[Memo]] skips its
  * cache under planOnly for exactly this reason).
  *
  * What remains under planOnly is parquet SCHEMA INFERENCE — Spark
  * 4 reads footers in a tiny job per `spark.read.parquet` — the
  * irreducible metadata cost of knowing a source's schema, paid by
  * any engine before it can even name a plan's columns. PlanOnlySpec
  * pins the rest to zero.
  *
  * SCOPE: the zero-job guarantee covers the recommender family
  * (q87–q93, pinned by PlanOnlySpec) and every operator whose plan is
  * data-independent. Operators that ITERATE AT CONSTRUCTION to a
  * data-dependent fixpoint (star-contraction CC, Lloyd seeding,
  * Girvan–Newman) have no single "the plan" to dump without running —
  * their construction legitimately executes under any mode, which is
  * why ExplainDump does not dump them and the guarantee does not
  * claim them.
  */
object PlanOnly {
  def apply(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.planOnly").exists(_.toBoolean)

  def apply(df: DataFrame): Boolean = apply(df.sparkSession)

  /** localCheckpoint that stays jobless under plan-only construction:
    * a real checkpoint in production (`eager` defaults to today's
    * eager behavior at every call site; the streaming index builders
    * pass `eager = false` to defer materialization to the first
    * batch), the `Scan ExistingRDD` stand-in under planOnly. */
  def cp(df: DataFrame, eager: Boolean = true): DataFrame =
    if (!apply(df)) df.localCheckpoint(eager)
    else // stats/constraint-preserving empty stand-in: the same
      // LogicalRDD.fromDataset a real checkpoint wraps its RDD in, so
      // downstream broadcast decisions in the dumped plan match
      // production (a bare empty createDataFrame defaults to
      // defaultSizeInBytes and flips them to sort-merge)
      org.apache.spark.sql.classic.GraftPlanStandIn.emptyLike(df)

  /** `.cpLocal()` — drop-in planOnly-aware spelling of
    * `.localCheckpoint(...)` for call-site chains. */
  implicit final class CpOps(private val df: DataFrame) extends AnyVal {
    def cpLocal(eager: Boolean = true): DataFrame = cp(df, eager)
  }
}

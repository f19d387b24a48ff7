package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LogicalRDD

/** Plan-dump scaffolding for [[graft.PlanOnly]]: an empty
  * `LogicalRDD` stand-in that PRESERVES the source frame's origin
  * statistics and constraints — exactly what `Dataset.localCheckpoint`
  * leaves behind (`LogicalRDD.fromDataset` is the same private[sql]
  * constructor the checkpoint path calls), minus the materialization.
  * Without the origin stats the stand-in would default to
  * `defaultSizeInBytes` and every downstream broadcast-hash join in a
  * dumped plan would silently re-plan as sort-merge — the dump would
  * show a plan production never runs. Never used by library code
  * paths outside plan-only construction. */
object GraftPlanStandIn {
  def emptyLike(df: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    val spark = ds.sparkSession
    val rdd = spark.sparkContext.emptyRDD[InternalRow]
    Dataset.ofRows(spark,
      LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }
}

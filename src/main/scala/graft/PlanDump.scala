package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of registered
  * queries (PLANS.md is maintained from this output).
  * Usage: runMain graft.PlanDump <sfDir> <query>[,<query>...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // subset-key co-partitioning (q93/q87 scoring tail): the CF
      // chain's explicit u-exchange serves the (u,j) aggregate, the
      // ownership anti-join AND the top-k window only when the planner
      // may co-partition a join on a PREFIX of its keys; per-u group
      // fan-out is cap-bounded there, so the relaxation is safe at any
      // scale (see Recommend.scoreFromNbr)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      // "_edge_build": the un-checkpointed co-purchase edge subtree
      // (inside registered queries it sits behind a localCheckpoint
      // scan, so its plan is otherwise invisible in PLANS.md)
      val df =
        if (n == "_edge_build")
          graft.graph.Graphs.capBySourceDf(
            graft.graph.Graphs.custParts(spark, sfDir, None),
            graft.graph.Graphs.MaxSourceDf)
        else SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}

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
    import org.apache.spark.sql.functions.col
    // bounded-subgraph round inputs for the `_lpa_round`/`_cc_round`
    // dumps — checkpointed like the production loops' inputs, so the
    // dumped round plan starts from the same ExistingRDD scans
    lazy val ue = {
      val ed = graft.graph.Graphs.edges(spark, sfDir,
        Some(graft.graph.Graphs.SubNations),
        graft.graph.Graphs.SubThreshold)
      ed.select(col("src"), col("dst"))
        .unionByName(ed.select(col("dst").as("src"),
          col("src").as("dst")))
        .localCheckpoint()
    }
    lazy val labels0 = ue.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint()
    names.foreach { n =>
      println(s"===== $n =====")
      // "_edge_build": the un-checkpointed co-purchase edge subtree;
      // "_lpa_round"/"_cc_round": one un-checkpointed iteration of
      // q35/q36 over a prebuilt edge list (inside the registered
      // queries these sit behind localCheckpoint scans, so their
      // plans are otherwise invisible in PLANS.md)
      val df = n match {
        case "_edge_build" =>
          graft.graph.Graphs.capBySourceDf(
            graft.graph.Graphs.custParts(spark, sfDir, None),
            graft.graph.Graphs.MaxSourceDf)
        case "_lpa_round" => graft.graph.Graphs.lpaRound(ue, labels0)
        case "_cc_round" => graft.graph.Graphs.ccRound(ue, labels0)
        case _ => SparkEntry.queries(n)(spark, sfDir)
      }
      // formatted by default (the plans/rNN before/after artifacts);
      // SPARK_GRAFT_PLAN_MODE=simple for the compact tree
      println(df.queryExecution.explainString(
        if (sys.env.get("SPARK_GRAFT_PLAN_MODE").contains("simple"))
          org.apache.spark.sql.execution.SimpleMode
        else org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

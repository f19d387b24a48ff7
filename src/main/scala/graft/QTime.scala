package graft
import org.apache.spark.sql.SparkSession

/** Minimal single-query timer for targeted binary A/Bs (diagnostic
  * scaffolding, like [[StageProbe]] — no library code path uses it):
  * `java ... graft.QTime <query> [sfDir] [runs]` — one untimed
  * codegen-warm run at sf0.001, then N timed runs with Bench's
  * session hygiene between them; per-run seconds on stderr, min on
  * stdout. Exists because Bench's warmup covers the whole registry
  * (right for the round artifact, ~2 min of irrelevant work for a
  * one-query A/B such as VERDICT r15 item 6's q86 checkpoint
  * confirmation), and bisect_bench.sh compares COMMITS while an A/B
  * of an uncommitted variant needs to run from saved class dirs. */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.graft.autoKernel", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case t: Throwable =>
      System.err.println(s"[qtime] warm failed: $t") }
    val times = (1 to runs).map { i =>
      val keep = Memo.liveIds(spark)
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !keep(id) }
        .values.foreach(_.unpersist(blocking = true))
      val lb = HostLoad.loadavg()
      val t = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t) / 1e9
      System.err.println(f"[qtime] $name r$i: $sec%.2f s " +
        f"($rows rows, load1m $lb%.1f→${HostLoad.loadavg()}%.1f)")
      sec
    }
    println(f"${times.min}%.3f")
    spark.stop()
  }
}

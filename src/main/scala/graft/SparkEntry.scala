package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.pricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Text.queries ++ ops.Pipeline.queries ++
      mining.SetSimilarity.queries ++ mining.VectorSimilarity.queries ++
      mining.Son.queries ++ mining.Recommend.queries ++
      sketch.Sketches.queries ++ ops.Windows.queries ++
      graph.Graphs.queries ++ graph.GirvanNewman.queries ++
      cluster.KMeans.queries ++ cluster.Bfr.queries ++
      multimodal.Multimodal.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Text.oracle ++ ops.Pipeline.oracle ++
      mining.SetSimilarity.oracle ++ mining.VectorSimilarity.oracle ++
      mining.Son.oracle ++ mining.Recommend.oracle ++
      sketch.Sketches.oracle ++ ops.Windows.oracle ++
      graph.Graphs.oracle ++ graph.GirvanNewman.oracle ++
      cluster.KMeans.oracle ++ multimodal.Multimodal.oracle
  /** EXPLICIT allowlist of queries that are correct-by-internal-check
    * instead of by oracle: q16 emits rows only when its partition
    * histogram sums to an independent count(*); q41 require()s R² ≥
    * 0.3× the hash-verified q40 Lloyd baseline. Verify stamps ONLY
    * these `self_gating` in query_modes.json — a new oracle-less
    * query is an ERROR until either an oracle or a declared (and
    * implemented) internal gate exists. Deriving the marker from
    * oracle ABSENCE would make the no-oracle failure path dead. */
  val selfGating: Set[String] = Set("q16_partition_hist", "q41_bfr")
}

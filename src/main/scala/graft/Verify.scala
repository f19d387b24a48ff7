package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated name filter for fast local
    // iteration (driver always passes exactly two args).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // the correctness gate runs WITH the native-kernel rewrite on:
      // every oracle hash is therefore also a proof that the rule
      // preserves results (it fuses q147's composition to graft_cos
      // and must change nothing anywhere else)
      .config("spark.graft.autoKernel", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing gate metadata (VERDICT r14 item 6): queries
    // registered WITHOUT an oracle are self-gating BY DESIGN — their
    // correctness check runs inside the query (q16 emits rows only if
    // the histogram sum equals an independent count(*); q41 requires
    // R² ≥ 0.3× the hash-verified q40 baseline), so a rows>0 record
    // IS the verification. This sidecar marks them so a "no_oracle"
    // row is distinguishable from a breakage without reading SURVEY §8.
    val modes = SparkEntry.queries.keys
      .filter(k => !SparkEntry.oracleSql.contains(k))
      .map(k => s"${q(k)}: ${q("self_gating")}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/query_modes.json"), modes)
    spark.stop()
  }
}

package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Executes every registered oracle SQL string in DuckDB (via
  * tools/run_oracles.py) against sf0.001 during `sbt test`.
  *
  * Two driver-gate incidents lived in oracle TEXT, not engine code —
  * q63's teleport-constant ulp and the r6 uncast-sum decimal128 type
  * bug — and neither could fail locally before the driver ran. This
  * spec makes the execution half fail in CI: any oracle that no
  * longer parses, references a missing table/CTE, or trips one of its
  * own error() guards (q37's BFS cap, q38's fingerprint dispatch)
  * breaks the build. Value/type parity stays with check_oracle.py
  * (which needs Verify's Spark outputs, too heavy for a unit test).
  */
class OracleSpec extends AnyFunSuite {

  test("every oracle SQL executes in DuckDB at sf0.001") {
    // same JSON escaping as Verify's oracle_sql.json dump
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
    val f = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(f, json)
    val out = new StringBuilder
    val code = scala.sys.process.Process(
      Seq("python3", "tools/run_oracles.py", f.toString,
        "/root/testdata/sf0.001"),
      new java.io.File(".")).!(
      scala.sys.process.ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(f)
    assert(code == 0, s"oracle execution failed:\n$out")
    assert(out.toString.contains("ORACLE-EXEC OK"), out.toString)
  }

  test("oracle names are a subset of query names (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}

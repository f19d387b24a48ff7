package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** README's headline counts, GENERATED from the build (VERDICT r9
  * item 9: the hand-written numbers drifted twice). The spec computes
  * the real counts — registered queries and oracles from SparkEntry,
  * ScalaTest registrations by scanning the test sources (every suite
  * registers statically at two-space indent; the count is exact, see
  * the regex note) — rewrites README.md in place when stale (the same
  * self-healing convention as GoldenRefreshSpec), and then asserts the
  * file agrees. `sbt test` therefore cannot pass with drifted counts.
  */
class CountsSpec extends AnyFunSuite {

  private val readme = Paths.get("README.md")

  test("README's query/oracle/test counts equal the build's") {
    val nQueries = SparkEntry.queries.size
    val nOracles = SparkEntry.oracleSql.size
    val nRowsOnly = nQueries - nOracles
    // static registrations only: every suite writes `test(`/`property(`
    // at exactly two-space class-body indent and none registers in a
    // loop — verified by comparing this count to the last full
    // `sbt test` summary whenever a suite is added
    val testDir = Paths.get("src", "test", "scala", "graft")
    val reg = "^  (test|property)\\(".r
    val nTests = Files.list(testDir).toArray.map(_.toString)
      .filter(_.endsWith(".scala"))
      .map { f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines()
          .count(l => reg.findFirstIn(l).isDefined)
      }.sum
    val before = new String(Files.readAllBytes(readme), "UTF-8")
    val after = before
      .replaceAll("\\d+ registered queries", s"$nQueries registered queries")
      .replaceAll("\\d+ hash-compared", s"$nOracles hash-compared")
      .replaceAll("\\d+ ScalaTests", s"$nTests ScalaTests")
      .replaceAll("The \\w+ rows-only queries",
        s"The ${if (nRowsOnly == 2) "two" else nRowsOnly.toString} " +
          "rows-only queries")
    if (after != before) {
      Files.write(readme, after.getBytes("UTF-8"))
      info(s"README counts refreshed: $nQueries queries, $nOracles " +
        s"oracles, $nTests tests")
    }
    val now = new String(Files.readAllBytes(readme), "UTF-8")
    assert(now.contains(s"$nQueries registered queries"))
    assert(now.contains(s"$nOracles hash-compared"))
    assert(now.contains(s"$nTests ScalaTests"))
  }

  test("Bench.parsePrevTotal gates the round-over-round baseline") {
    // shape of the artifact Bench itself writes (headline first, then
    // per-query values that must NOT be mistaken for the total)
    val art = """{"metric":"total","value":131.75,"unit":"sec",""" +
      """"queries":{"q01_pricing_summary":0.42,"q93_cf_eval":10.4},""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parsePrevTotal(art, "/root/testdata/sf0.1")
      .contains(131.75))
    // a different SF is not a baseline (a local sf0.01 iteration file
    // must not masquerade as the round total)
    assert(Bench.parsePrevTotal(art, "/root/testdata/sf0.01").isEmpty)
    // the anchored match skips a "value" key that is not the headline
    // metric: an earlier stray "value" does not shadow the total, and
    // a body with per-query values but no headline yields no baseline
    val shuffled = """{"queries":{"value":9.9},"metric":"total",""" +
      """"value":42.0,"sf":"d"}"""
    assert(Bench.parsePrevTotal(shuffled, "d").contains(42.0))
    assert(Bench.parsePrevTotal(
      """{"queries":{"value":9.9},"sf":"d"}""", "d").isEmpty)
    // a BENCH_ONLY subset artifact at the SAME SF is not a baseline
    // either — its total covers a handful of queries
    assert(Bench.parsePrevTotal(
      """{"metric":"total","value":19.2,"bench_only":true,""" +
        """"sf":"/root/testdata/sf0.1"}""", "/root/testdata/sf0.1").isEmpty)
    // non-positive totals and garbage never produce a baseline
    assert(Bench.parsePrevTotal(
      """{"metric":"total","value":0,"sf":"d"}""", "d").isEmpty)
    assert(Bench.parsePrevTotal("", "d").isEmpty)
    assert(Bench.parsePrevTotal("not json at all", "d").isEmpty)
    // the driver's round artifact (BENCH_rNN.json `parsed` object)
    // re-serializes the same line with ": " spacing — the fallback
    // baseline path must parse it, including its subset refusal
    val round = """{"n": 12, "rc": 0, "parsed": {"metric": "total", """ +
      """"value": 124.572, "unit": "sec", "n_queries": 148, """ +
      """"sf": "/root/testdata/sf0.1"}}"""
    assert(Bench.parsePrevTotal(round, "/root/testdata/sf0.1")
      .contains(124.572))
    assert(Bench.parsePrevTotal(round
        .replace("\"rc\": 0", "\"rc\": 0, \"bench_only\": true"),
      "/root/testdata/sf0.1").isEmpty)
  }

  test("StreamBench delta guard: accounting marker + prev-rate parse") {
    // shape of the artifact StreamBench itself writes
    val art = """{"duration_sec_per_run":12,"runs":2,"warm_runs":1,""" +
      """"cpus":8,"excludes_first_batch":true,"streams":{""" +
      """"curation_stateless":{"rows_per_sec":[100127.4,115098.9],""" +
      """"input_rows":[1100000,1100000]},""" +
      """"zero_batch":{"rows_per_sec":[0.0,0.0],"input_rows":[0,0]}}}"""
    assert(StreamBench.sameAccounting(art))
    // a pre-r11 artifact (wall-clock accounting) is not comparable
    assert(!StreamBench.sameAccounting(
      """{"duration_sec_per_run":12,"streams":{}}"""))
    // best = max across runs
    assert(StreamBench.prevBestRate(art, "curation_stateless")
      .contains(115098.9))
    // a zero-batch previous run yields no baseline (the delta division
    // would emit Infinity/NaN into the JSON)
    assert(StreamBench.prevBestRate(art, "zero_batch").isEmpty)
    // absent stream → no delta entry
    assert(StreamBench.prevBestRate(art, "no_such_stream").isEmpty)
    // calibration probe (r14+): top-level array, best = max; absent or
    // zero in older artifacts → None (raw deltas only, no normalization)
    val artCal = art.dropRight(1) +
      ""","calibration_rows_per_sec":[1852001.5,2104330.0]}"""
    assert(StreamBench.prevCalibration(artCal).contains(2104330.0))
    assert(StreamBench.prevCalibration(art).isEmpty)
    assert(StreamBench.prevCalibration(
      art.dropRight(1) + ""","calibration_rows_per_sec":[0.0]}""").isEmpty)
  }

  test("GitStamp resolves HEAD to the current commit (artifact staleness " +
      "is a string compare, not a timestamp guess)") {
    val expected = scala.sys.process.Process(
      Seq("git", "rev-parse", "HEAD")).!!.trim.take(12)
    assert(GitStamp.sha == expected)
    assert(GitStamp.shaOf(
      java.nio.file.Paths.get("/no/such/.git")) == "unknown")
  }

  test("GitStamp follows the .git-file gitdir indirection and the " +
      "worktree commondir ref store (bisect worktrees would otherwise " +
      "stamp 'unknown')") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("gitstamp")
    // layout: main/.git with the shared ref store; wt/.git a FILE
    // pointing at main/.git/worktrees/wt whose HEAD is a branch ref
    // resolved through commondir — the linked-worktree shape
    val mainGit = tmp.resolve("main/.git")
    Files.createDirectories(mainGit.resolve("refs/heads"))
    val sha = "0123456789abcdef0123456789abcdef01234567"
    Files.write(mainGit.resolve("refs/heads/feature"),
      (sha + "\n").getBytes("UTF-8"))
    val wtGitDir = mainGit.resolve("worktrees/wt")
    Files.createDirectories(wtGitDir)
    Files.write(wtGitDir.resolve("HEAD"),
      "ref: refs/heads/feature\n".getBytes("UTF-8"))
    Files.write(wtGitDir.resolve("commondir"),
      "../..\n".getBytes("UTF-8"))
    val wt = tmp.resolve("wt")
    Files.createDirectories(wt)
    val dotGit = wt.resolve(".git")
    Files.write(dotGit,
      s"gitdir: $wtGitDir\n".getBytes("UTF-8"))
    assert(GitStamp.shaOf(dotGit) == sha.take(12))
    // detached-HEAD worktree (what bisect_bench.sh checks out): the
    // worktree HEAD holds the raw sha, no ref hop needed
    Files.write(wtGitDir.resolve("HEAD"),
      (sha.reverse + "\n").getBytes("UTF-8"))
    assert(GitStamp.shaOf(dotGit) == sha.reverse.take(12))
    // relative gitdir pointer resolves against the .git file's parent
    Files.write(dotGit,
      "gitdir: ../main/.git/worktrees/wt\n".getBytes("UTF-8"))
    assert(GitStamp.shaOf(dotGit) == sha.reverse.take(12))
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GirvanNewman

/** q38 golden lifecycle: a testdata refresh must degrade to a golden
  * REGENERATION (via the independent pure-Python replay), never to the
  * oracle's error(). These tests drive the refresh path end-to-end and
  * hold the two-implementation cross-check: the replay's partition
  * must equal the Scala engine loop's on the same edge set.
  */
class GoldenRefreshSpec extends AnyFunSuite {
  import SparkTestSession._

  private val resource =
    Paths.get("src", "main", "resources", "graft", "gn_golden.txt")

  /** The engine loop's golden-format rows for an edge set:
    * (min member, size, best_q@4dp), size desc / community asc. */
  private def engineRows(edges: Seq[(Long, Long)])
  : Seq[(Long, Long, Double)] = {
    val (q, comms) = GirvanNewman.gnCommunities(edges)
    comms.map(c => (c.min, c.size.toLong,
        math.floor(q * 1e4 + 0.5) / 1e4))
      .sortBy(t => (-t._2, t._1))
  }

  test("simulated NEW fingerprint: refresh regenerates, replay " +
      "matches the engine loop, existing groups survive the merge") {
    // a graph the shipped golden has never seen: two triangles + a
    // bridge + a pendant — asymmetric enough to exercise removal order
    val edges: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))
    val fp = GirvanNewman.edgeFingerprint(edges)
    val tmp = Files.createTempFile("gn_golden_test", ".txt")
    try {
      // seed the file with an unrelated group — the merge must keep it
      val other: Seq[(Long, Long)] = Seq((10L, 11L), (11L, 12L))
      GirvanNewman.refreshGolden(other, tmp)
      val otherFp = GirvanNewman.edgeFingerprint(other)
      assert(!GirvanNewman.goldenFingerprints(tmp).contains(fp),
        "fingerprint must start unknown for this test to mean anything")

      GirvanNewman.refreshGolden(edges, tmp)
      val fps = GirvanNewman.goldenFingerprints(tmp)
      assert(fps.contains(fp), "refresh admits the new fingerprint")
      assert(fps.contains(otherFp), "merge keeps unrelated groups")
      // the cross-check: independent Python replay == Scala engine loop
      assert(GirvanNewman.goldenRows(tmp, fp) == engineRows(edges),
        "pure-Python replay and engine GN loop must agree")
      // idempotence: refreshing again changes nothing
      val before = new String(Files.readAllBytes(tmp), "UTF-8")
      GirvanNewman.refreshGolden(edges, tmp)
      assert(new String(Files.readAllBytes(tmp), "UTF-8") == before)
    } finally Files.deleteIfExists(tmp)
  }

  test("a source-tree refresh is visible to the q38 oracle in the SAME " +
      "run, without a recompile") {
    // the oracle used to read only the COMPILED classpath resource, so
    // a refresh and its verify disagreed until the next sbt compile
    // (ADVICE r9); it now merges the source-tree file over the
    // classpath copy on every read
    val before = Files.readAllBytes(resource)
    try {
      // a fingerprint no real testdata can produce (synthetic ids)
      val edges: Seq[(Long, Long)] =
        Seq((900001L, 900002L), (900002L, 900003L))
      val fp = GirvanNewman.edgeFingerprint(edges)
      assert(!GirvanNewman.gnCommunitiesSql.get.contains(
        s"(CAST(${fp._1} AS BIGINT), CAST(${fp._2} AS BIGINT)"),
        "test fingerprint must start absent")
      GirvanNewman.refreshGolden(edges, resource)
      val sql = GirvanNewman.gnCommunitiesSql.get
      assert(sql.contains(
        s"(CAST(${fp._1} AS BIGINT), CAST(${fp._2} AS BIGINT)"),
        "refreshed source-tree group is not visible to the oracle " +
          "within the same JVM run")
      // and the oracle map re-reads too (it must not be a cached val)
      assert(SparkEntry.oracleSql("q38_gn_communities").contains(
        s"(CAST(${fp._1} AS BIGINT), CAST(${fp._2} AS BIGINT)"))
    } finally Files.write(resource, before)
  }

  test("shipped golden covers every testdata SF (regenerates on miss)" +
      " and the replay agrees with the engine at each") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
      .filter(d => Files.exists(Paths.get(d))).foreach { d =>
        val edges = GirvanNewman.gnEdges(spark, d)
        val fp = GirvanNewman.edgeFingerprint(edges)
        if (!GirvanNewman.goldenFingerprints(resource).contains(fp)) {
          // testdata refresh path: regenerate instead of erroring; the
          // next sbt (re)compile embeds the refreshed resource for the
          // q38 oracle.
          info(s"$d: fingerprint $fp unknown — regenerating golden")
          GirvanNewman.refreshGolden(edges, resource)
        }
        assert(GirvanNewman.goldenFingerprints(resource).contains(fp),
          s"$d fingerprint present after (re)generation")
        assert(GirvanNewman.goldenRows(resource, fp) == engineRows(edges),
          s"$d: golden rows must equal the engine loop's partition")
      }
  }
}

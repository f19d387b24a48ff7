package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Edge betweenness (Brandes), modularity, and the Girvan–Newman
  * community loop — the reference's Assignment4/task2.py re-expressed.
  *
  * [[betweenness]] is distributed: the edge list (a bounded summary, not
  * data) is broadcast; one task per BFS root computes that root's
  * shortest-path DAG and dependency credits (proper Brandes — σ(child) =
  * Σ σ(parents); the reference instead counted discovering parents,
  * task2.py:81-82, which equals Brandes only while every parent has σ=1;
  * divergence noted per SURVEY §7.4 and verified against hand-computed
  * graphs in GraphSpec). Credits sum in one shuffle and halve (each
  * unordered pair contributes from both endpoints' roots).
  *
  * [[gnCommunities]] is the reference's driver loop (remove the
  * max-betweenness edge, recompute, track best modularity with A and
  * degrees frozen to the original graph — task2.py:177-202). It runs on
  * the collected edge list: Girvan–Newman is inherently O(V·E) per
  * round and is only sane on graph *summaries*; at 100 TB scale you
  * partition communities with LPA/CC (q35/q36) and reserve GN for
  * bounded subgraphs like this one.
  */
object GirvanNewman {

  /** GN subgraph bound: nations < 2, shared-part threshold 4
    * (~70 edges at sf0.01). */
  val GnNations = 2
  val GnThreshold = 4

  type Edge = (Long, Long)

  private def canon(a: Long, b: Long): Edge = if (a < b) (a, b) else (b, a)

  /** Brandes single-source edge credits over an unweighted graph.
    *
    * `referenceSigma = true` reproduces the reference's path-count
    * approximation (Assignment4/task2.py:81-82): σ(child) = its number
    * of discovering parents, rather than Σ σ(parents). The two agree
    * whenever every parent has σ = 1 (e.g. trees and the reference's
    * sparse co-review graphs) and diverge on denser multi-path graphs —
    * GraphSpec pins both behaviors. Default is correct Brandes. */
  private[graph] def brandesRoot(
      adj: Map[Long, Array[Long]], root: Long,
      referenceSigma: Boolean = false): Iterator[(Edge, Double)] = {
    val dist = mutable.Map(root -> 0)
    val sigma = mutable.Map(root -> 1.0)
    val order = mutable.ArrayBuffer(root)
    val queue = mutable.Queue(root)
    val preds = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      adj.getOrElse(v, Array.empty).foreach { w =>
        if (!dist.contains(w)) {
          dist(w) = dist(v) + 1
          queue.enqueue(w)
          order += w
        }
        if (dist(w) == dist(v) + 1) {
          sigma(w) = sigma.getOrElse(w, 0.0) +
            (if (referenceSigma) 1.0 else sigma(v))
          preds.getOrElseUpdate(w, mutable.ArrayBuffer.empty) += v
        }
      }
    }
    val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    val credits = mutable.Map.empty[Edge, Double]
    order.reverseIterator.foreach { w =>
      preds.getOrElse(w, mutable.ArrayBuffer.empty).foreach { v =>
        val c = sigma(v) / sigma(w) * (1.0 + delta(w))
        credits(canon(v, w)) = credits.getOrElse(canon(v, w), 0.0) + c
        delta(v) += c
      }
    }
    credits.iterator
  }

  private def toAdj(edges: Seq[Edge]): Map[Long, Array[Long]] =
    (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toArray }

  /** Full edge betweenness of an edge list, one Spark task per root.
    * `referenceSigma` selects the reference's σ approximation. */
  def edgeBetweenness(s: SparkSession, edgeList: Seq[Edge],
      referenceSigma: Boolean = false): Map[Edge, Double] = {
    val adj = toAdj(edgeList)
    val bc = s.sparkContext.broadcast(adj)
    s.sparkContext.parallelize(adj.keys.toSeq.sorted, math.min(32, math.max(1, adj.size)))
      .flatMap(root => brandesRoot(bc.value, root, referenceSigma))
      .reduceByKey(_ + _)
      .mapValues(_ / 2.0)
      .collect().toMap
  }

  /** Local (driver) betweenness for the GN inner loop. */
  private[graph] def edgeBetweennessLocal(edges: Seq[Edge])
  : Map[Edge, Double] = {
    val adj = toAdj(edges)
    val acc = mutable.Map.empty[Edge, Double].withDefaultValue(0.0)
    adj.keys.foreach { root =>
      brandesRoot(adj, root).foreach { case (e, c) => acc(e) += c }
    }
    acc.map { case (e, c) => e -> c / 2.0 }.toMap
  }

  private[graph] def componentsLocal(nodes: Set[Long], edges: Seq[Edge])
  : Seq[Set[Long]] = {
    val adj = toAdj(edges)
    val seen = mutable.Set.empty[Long]
    val out = mutable.ArrayBuffer.empty[Set[Long]]
    nodes.toSeq.sorted.foreach { n =>
      if (!seen.contains(n)) {
        val comp = mutable.Set(n)
        val q = mutable.Queue(n)
        seen += n
        while (q.nonEmpty) {
          val v = q.dequeue()
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (!seen.contains(w)) { seen += w; comp += w; q.enqueue(w) }
          }
        }
        out += comp.toSet
      }
    }
    out.toSeq
  }

  /** Newman modularity with adjacency and degrees frozen to the
    * original graph (the reference's §4.3.2 hint): Q = (1/2m)·Σ_{i≠j,
    * same community} (A_ij − k_i·k_j/2m). */
  private[graph] def modularity(
      communities: Seq[Set[Long]], origEdges: Seq[Edge]): Double = {
    val m = origEdges.size.toDouble
    if (m == 0) return 0.0
    val a = origEdges.map(e => canon(e._1, e._2)).toSet
    val k = mutable.Map.empty[Long, Int].withDefaultValue(0)
    origEdges.foreach { case (u, v) => k(u) += 1; k(v) += 1 }
    var q = 0.0
    communities.foreach { c =>
      val members = c.toSeq
      for (i <- members; j <- members if i != j) {
        val aij = if (a.contains(canon(i, j))) 1.0 else 0.0
        q += aij - k(i) * k(j) / (2.0 * m)
      }
    }
    q / (2.0 * m)
  }

  /** Girvan–Newman: repeatedly remove the max-betweenness edge
    * (deterministic tie-break: smallest (src, dst)), recompute
    * betweenness from scratch (reference semantics, task2.py:185-215),
    * keep the best-modularity partition.
    *
    * Both comparisons run on ROUNDED values (betweenness at 4 dp,
    * modularity at 6 dp, the floor-half-up-with-ulp-slack idiom q37's
    * oracle proved cross-engine-exact): credit and modularity sums
    * accumulate in implementation-defined orders, and rounding before
    * the max/argmax makes the whole loop a deterministic function of
    * the edge SET — so an independent replay (tools/gn_golden.py, the
    * q38 oracle's golden generator) reproduces every removal decision
    * and the final partition bit-for-bit. Near-ties within 1e-4
    * betweenness resolve by the smallest-(src, dst) rule in both. */
  def gnCommunities(edgeList: Seq[Edge]): (Double, Seq[Set[Long]]) = {
    val orig = edgeList.map(e => canon(e._1, e._2)).distinct
    val nodes = orig.flatMap(e => Seq(e._1, e._2)).toSet
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-9) / 1e6
    var current = orig
    var best = (q6(modularity(componentsLocal(nodes, current), orig)),
      componentsLocal(nodes, current))
    while (current.nonEmpty) {
      val bt = edgeBetweennessLocal(current).map { case (e, c) =>
        e -> (math.floor(c * 1e4 + 0.5 + 1e-9) / 1e4)
      }
      val maxC = bt.values.max
      val topEdge = bt.collect { case (e, c) if c == maxC => e }.min
      current = current.filterNot(_ == topEdge)
      val comps = componentsLocal(nodes, current)
      val q = q6(modularity(comps, orig))
      if (q > best._1) best = (q, comps)
    }
    best
  }

  /** The GN subgraph edge list — built distributed, collected as the
    * bounded summary the driver loop operates on. */
  private[graft] def gnEdges(s: SparkSession, d: String): Seq[Edge] =
    Graphs.edges(s, d, Some(GnNations), GnThreshold)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** The q38 golden's edge-set fingerprint — (count, XOR of per-edge
    * h60("src,dst")), identical to what the oracle's `fp` CTE and
    * tools/gn_golden.py compute. */
  def edgeFingerprint(edges: Seq[Edge]): (Long, Long) =
    (edges.size.toLong,
      edges.foldLeft(0L)((x, e) =>
        x ^ graft.functions.Hashing.h60Local(s"${e._1},${e._2}")))

  /** Fingerprints present in a golden file (the `G` lines). */
  def goldenFingerprints(path: java.nio.file.Path): Set[(Long, Long)] =
    if (!java.nio.file.Files.exists(path)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(path).asScala
        .map(_.trim).filter(l => l.startsWith("G "))
        .map { l => val p = l.split("\\s+"); (p(1).toLong, p(2).toLong) }
        .toSet
    }

  /** Golden rows for one fingerprint from a golden FILE (not the
    * classpath): (community, csize, best_q) in file order. */
  def goldenRows(path: java.nio.file.Path, fp: (Long, Long))
  : Seq[(Long, Long, Double)] = {
    import scala.jdk.CollectionConverters._
    var open = false
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    java.nio.file.Files.readAllLines(path).asScala.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
        val p = l.split("\\s+")
        p(0) match {
          case "G" => open = (p(1).toLong, p(2).toLong) == fp
          case "R" if open => out += ((p(1).toLong, p(2).toLong, p(3).toDouble))
          case _ => ()
        }
      }
    out.toSeq
  }

  /** Regenerate/merge the golden group for `edges` into `goldenPath`
    * by invoking the INDEPENDENT replay (tools/gn_golden.py --edges).
    * This is the testdata-refresh path: an unknown fingerprint
    * degrades to a regeneration instead of the oracle's error() —
    * GoldenRefreshSpec drives it from `sbt test` and then asserts the
    * replay agrees with the engine's own loop, preserving the
    * two-implementation cross-check. Requires python3 (present
    * wherever the DuckDB oracle tooling runs). */
  def refreshGolden(edges: Seq[Edge], goldenPath: java.nio.file.Path,
      tool: java.nio.file.Path = java.nio.file.Paths.get(
        "tools", "gn_golden.py")): Unit = {
    val tmp = java.nio.file.Files.createTempFile("gn_edges", ".txt")
    try {
      java.nio.file.Files.write(tmp,
        edges.map(e => s"${e._1} ${e._2}").mkString("\n").getBytes("UTF-8"))
      val pb = new ProcessBuilder("python3", tool.toString,
        "--edges", tmp.toString, "--out", goldenPath.toString)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val log = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      val rc = proc.waitFor()
      require(rc == 0, s"gn_golden.py --edges failed (rc=$rc):\n$log")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** q37: top-20 betweenness edges of the GN subgraph (distributed
    * Brandes), hash-verified against [[betweennessTopSql]] — a full
    * unrolled Brandes replay in DuckDB (BFS levels → σ forward pass →
    * δ backward pass). Rounding is floor-half-up with a 1e-9 slack on
    * BOTH sides: credit sums accumulate in different orders in the two
    * engines, and the slack absorbs the resulting ≤1-ulp drift at
    * exact .00005 boundaries (σ ratios are small rationals, so such
    * boundaries actually occur). */
  def betweennessTop(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = edgeBetweenness(s, gnEdges(s, d)).toSeq
      .map { case ((u, v), c) =>
        (u, v, math.floor(c * 1e4 + 0.5 + 1e-9) / 1e4) }
    s.createDataset(b).toDF("src", "dst", "betweenness")
      .orderBy(col("betweenness").desc, col("src").asc, col("dst").asc)
      .limit(20)
  }

  /** Deepest BFS level the oracle unrolls — must exceed the subgraph
    * diameter (11 at sf0.01; levels past the diameter are empty CTEs
    * and cost nothing). The oracle self-checks: a `guard` CTE calls
    * DuckDB `error()` if any shortest path reaches this cap, so a
    * larger-diameter subgraph at a bigger SF fails loudly instead of
    * silently dropping nodes from the σ/δ passes (ADVICE r6). */
  val BrandesMaxLevel = 16

  /** Unrolled-SQL Brandes over the GN subgraph: a capped recursive BFS
    * walk gives shortest-path distances; σ unrolls forward one CTE per
    * level (σ(c) = Σ σ(parents)); δ unrolls backward
    * (δ(w) = Σ_children σ(w)/σ(c)·(1+δ(c))); per-DAG-edge credits sum
    * over roots and halve (undirected double-count). Same output shape
    * and rounding as [[betweennessTop]]. */
  val betweennessTopSql: String = {
    val l = BrandesMaxLevel
    val sigs = (1 to l).map { k =>
      s"""s$k AS (SELECT p.root, c.node, sum(p.sigma) AS sigma
         |  FROM s${k - 1} p JOIN ue e ON e.src = p.node
         |  JOIN sp c ON c.root = p.root AND c.node = e.dst
         |    AND c.dist = $k
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val sigUnion = (0 to l).map(k => s"SELECT * FROM s$k")
      .mkString(" UNION ALL ")
    val deltas = (l - 1 to 0 by -1).map { k =>
      s"""d$k AS (
         |  SELECT w.root, w.node,
         |    coalesce(sum(sw.sigma / sc.sigma * (1.0 + dn.delta)), 0.0)
         |      AS delta
         |  FROM sp w
         |  JOIN sig sw ON sw.root = w.root AND sw.node = w.node
         |  LEFT JOIN pc ON pc.root = w.root AND pc.w = w.node
         |  LEFT JOIN sig sc ON sc.root = pc.root AND sc.node = pc.c
         |  LEFT JOIN d${k + 1} dn ON dn.root = pc.root AND dn.node = pc.c
         |  WHERE w.dist = $k
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val dallUnion = (0 to l).map(k => s"SELECT * FROM d$k")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${Graphs.edgesSql(Some(GnNations), GnThreshold)},
       |walk AS (
       |  SELECT src AS root, src AS node, 0 AS d
       |  FROM (SELECT DISTINCT src FROM ue)
       |  UNION
       |  SELECT w.root, e.dst AS node, w.d + 1 AS d
       |  FROM walk w JOIN ue e ON e.src = w.node
       |  WHERE w.d < $l),
       |sp AS MATERIALIZED (
       |  SELECT root, node, min(d) AS dist FROM walk GROUP BY 1, 2),
       |pc AS MATERIALIZED (
       |  SELECT p.root, p.node AS w, c.node AS c
       |  FROM sp p JOIN ue e ON e.src = p.node
       |  JOIN sp c ON c.root = p.root AND c.node = e.dst
       |    AND c.dist = p.dist + 1),
       |s0 AS (SELECT root, node, CAST(1 AS DOUBLE) AS sigma
       |       FROM sp WHERE dist = 0),
       |$sigs,
       |sig AS MATERIALIZED ($sigUnion),
       |d$l AS (SELECT root, node, CAST(0 AS DOUBLE) AS delta
       |        FROM sp WHERE dist = $l),
       |$deltas,
       |dall AS ($dallUnion),
       |cred AS (
       |  SELECT least(pc.w, pc.c) AS src, greatest(pc.w, pc.c) AS dst,
       |    sw.sigma / sc.sigma * (1.0 + dd.delta) AS credit
       |  FROM pc
       |  JOIN sig sw ON sw.root = pc.root AND sw.node = pc.w
       |  JOIN sig sc ON sc.root = pc.root AND sc.node = pc.c
       |  JOIN dall dd ON dd.root = pc.root AND dd.node = pc.c),
       |guard AS (
       |  SELECT CASE WHEN max(dist) >= $l THEN error(
       |    'q37 oracle: BFS reached BrandesMaxLevel=$l — diameter '
       |    || 'exceeds the unroll cap, raise BrandesMaxLevel')
       |    ELSE 0 END AS ok FROM sp)
       |SELECT src, dst,
       |  floor(sum(credit) / 2.0 * 1e4 + 0.5 + 1e-9) / 1e4 AS betweenness
       |FROM cred CROSS JOIN guard GROUP BY 1, 2
       |ORDER BY 3 DESC, 1 ASC, 2 ASC LIMIT 20""".stripMargin
  }

  /** q38: Girvan–Newman best-modularity communities of the subgraph —
    * (community = min member id, size, best_q). best_q re-rounds the
    * loop's 6-dp modularity to 4 dp; the input double is identical in
    * the golden replay, so plain floor-half-up matches. */
  def gnCommunitiesDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (q, comms) = gnCommunities(gnEdges(s, d))
    val rows = comms.map(c => (c.min, c.size.toLong,
      math.floor(q * 1e4 + 0.5) / 1e4))
    s.createDataset(rows).toDF("community", "csize", "best_q")
      .orderBy(col("csize").desc, col("community").asc)
  }

  /** The q38 oracle: golden rows generated by an INDEPENDENT replay
    * (tools/gn_golden.py — pure-Python Brandes + modularity + removal
    * loop over the same edge list, which DuckDB builds from the input
    * tables with the q37-verified edge SQL), committed as the
    * `graft/gn_golden.txt` resource, and dispatched on the input's
    * edge-set fingerprint (count + bit_xor of per-edge h60). An input
    * whose fingerprint matches no golden errors loudly instead of
    * diffing against the wrong constant (same posture as q37's
    * BFS-cap guard); regenerate with the tool to admit a new SF. */
  def gnCommunitiesSql: Option[String] = {
    // Merge BOTH copies of the golden, freshest last (ADVICE r9): the
    // compiled classpath resource is what a packaged jar ships, but a
    // GoldenRefreshSpec regeneration writes the SOURCE-TREE file — a
    // same-run refresh+verify must agree without a recompile, so any
    // source-tree group overrides its classpath twin (fingerprint
    // keyed; a refresh only ever adds/replaces whole groups). A `def`,
    // not a `lazy val`: a refresh earlier in the same JVM run must be
    // visible to every later oracle read.
    val cpLines = Option(getClass.getResourceAsStream("/graft/gn_golden.txt"))
      .map(r => scala.io.Source.fromInputStream(r, "UTF-8").getLines().toSeq)
      .getOrElse(Seq.empty)
    val srcPath = java.nio.file.Paths.get(
      "src", "main", "resources", "graft", "gn_golden.txt")
    val srcLines =
      if (java.nio.file.Files.exists(srcPath))
        scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(srcPath)).asScala
          .toSeq
      else Seq.empty
    // format: "G <n_edges> <xor>" opens a group; "R <community>
    // <csize> <best_q>" rows belong to the open group
    def groups(lines: Seq[String]): Seq[((String, String), Seq[String])] = {
      var fp: (String, String) = null
      val out = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), scala.collection.mutable.ArrayBuffer[String]]
      lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .foreach { l =>
          val p = l.split("\\s+")
          p(0) match {
            case "G" =>
              fp = (p(1), p(2))
              out.getOrElseUpdate(fp,
                scala.collection.mutable.ArrayBuffer.empty)
            case "R" =>
              out(fp) += s"(CAST(${fp._1} AS BIGINT), " +
                s"CAST(${fp._2} AS BIGINT), " +
                s"CAST(${p(1)} AS BIGINT), CAST(${p(2)} AS BIGINT), " +
                s"CAST(${p(3)} AS DOUBLE))"
            case other =>
              throw new IllegalStateException(s"gn_golden.txt: bad tag $other")
          }
        }
      out.toSeq.map { case (k, v) => k -> v.toSeq }
    }
    val merged = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Seq[String]]
    (groups(cpLines) ++ groups(srcLines)).foreach { case (k, v) =>
      merged(k) = v // source tree parsed second → wins on collision
    }
    val rows = merged.values.flatten.toSeq
    if (rows.isEmpty) None
    else Some(
        s"""WITH ${Graphs.edgesSql(Some(GnNations), GnThreshold)},
           |fp AS (SELECT count(*) AS n, coalesce(bit_xor(
           |    ${graft.functions.Hashing.h60Sql("concat_ws(',', src, dst)")}
           |  ), 0) AS x FROM ed),
           |golden(gn, gx, community, csize, best_q) AS (
           |  VALUES ${rows.mkString(",\n    ")}),
           |guard AS (
           |  SELECT CASE WHEN NOT EXISTS (
           |    SELECT 1 FROM golden g, fp WHERE g.gn = fp.n AND g.gx = fp.x)
           |  THEN error('q38 oracle: no golden for this edge-set ' ||
           |    'fingerprint — regenerate tools/gn_golden.py for this input')
           |  ELSE 0 END AS ok FROM fp)
           |SELECT g.community, g.csize, g.best_q
           |FROM golden g, fp, guard
           |WHERE g.gn = fp.n AND g.gx = fp.x
           |ORDER BY g.csize DESC, g.community ASC""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_betweenness" -> (betweennessTop _),
    "q38_gn_communities" -> (gnCommunitiesDf _))

  /** q37 replays Brandes in unrolled SQL; q38 compares against the
    * independently-generated golden partition (fingerprint-dispatched);
    * GraphSpec additionally holds the loop's structural goldens. A
    * `def`: the q38 oracle must re-read the golden so a same-run
    * refresh is visible (see [[gnCommunitiesSql]]). */
  def oracle: Map[String, String] =
    Map("q37_betweenness" -> betweennessTopSql) ++
      gnCommunitiesSql.map("q38_gn_communities" -> _)
}

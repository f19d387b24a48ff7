package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.PlanOnly.CpOps
import graft.Tables._

/** Graph analytics over the co-purchase graph — the Spark-native form of
  * the reference's co-review graph (Assignment4/task1.py:28-60):
  * customers are vertices; an undirected edge joins two customers whose
  * distinct purchased-part sets overlap by ≥ threshold.
  *
  * The edge build is the J2 shape done right: explode to (custkey,
  * partkey), self-equi-join on partkey, count per pair — a shuffle join,
  * never the reference's O(V²) driver loop (task1.py:32-47). At 100 TB
  * the join keys are parts: per-key fan-out is bounded by the
  * [[MaxSourceDf]] cap (a key with f rows emits f² pairs — the cap
  * removes the pathological keys before the join; AQE skew splitting
  * handles the merely-uneven rest); everything downstream operates on
  * the edge list, which is orders of magnitude smaller than the input.
  *
  * LPA and connected components are synchronous join-iterations with
  * explicit deterministic tie-breaks (count desc, label asc) — unlike
  * library LPA implementations whose hash-order ties defeat replay. The
  * DuckDB oracle replays LPA exactly (unrolled iterations) and CC via a
  * recursive CTE, so even the iterative graph operators are
  * hash-verified, not rows-only.
  */
object Graphs {

  /** Full-graph edge threshold (shared distinct parts). */
  val EdgeThreshold = 5
  /** Skew guard: a part bought by f distinct customers emits O(f²)
    * candidate pairs in the self-join — one ubiquitous part at 100×
    * data (f ≈ 10⁶) would emit 10¹² pairs from a single join key and
    * stall the stage. Parts with df above this cap are excluded from
    * the edge build BEFORE the join, the standard co-occurrence-mining
    * guard (ubiquitous items carry no pair signal — the market-basket
    * stop-word rule). The cap sits far above the testdata's max df
    * (53 at sf0.1) so results here are unchanged, and the SQL oracle
    * applies the same cap, so Spark and oracle agree at EVERY scale,
    * not just the tested ones. */
  val MaxSourceDf = 1000
  /** Subgraph: nations < 5, threshold 4 — the bounded graph for
    * triangle/LPA/CC queries (306 nodes / ~650 edges at sf0.01). */
  val SubNations = 5
  val SubThreshold = 4
  val LpaIters = 5

  /** Distinct (custkey, partkey) purchases, optionally nation-bounded. */
  private[graft] def custParts(s: SparkSession, d: String, maxNation: Option[Int])
  : DataFrame = {
    val base = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
    val bounded = maxNation.fold(base)(n =>
      base.join(
        broadcast(customer(s, d).filter(col("c_nationkey") < n)
          .select(col("c_custkey").as("ck"))), Seq("ck")))
    // one pk-exchange for the whole cp build (guide §2.4): the dedup
    // and the df-cap window that follows ([[capBySourceDf]]) both
    // accept a pk clustering, so exchanging ONCE on pk here lets the
    // distinct run post-shuffle and the window inherit the layout —
    // the stock plan exchanged twice ((ck,pk) for the distinct, pk
    // again for the window). The trade is the dedup moving above the
    // exchange (no map-side partial dedup): raw (ck,pk) carries ~1.1×
    // the deduped rows on this data — measured far under one
    // exchange's worth. Skew unchanged: a hot pk already landed whole
    // in one window partition.
    bounded.repartition(col("pk")).distinct()
  }

  /** Drop join keys whose fan-out exceeds `maxDf` — the pre-join skew
    * guard for the f² self-join. One window on the join key; Catalyst
    * reuses its hash-partitioning exchange for the self-join that
    * follows, so the guard costs no extra shuffle. */
  private[graft] def capBySourceDf(cp: DataFrame, maxDf: Int): DataFrame =
    cp.withColumn("_df",
        count(lit(1)).over(Window.partitionBy(col("pk"))))
      .filter(col("_df") <= maxDf)
      .drop("_df")

  /** Canonical undirected edges (src < dst). */
  def edges(s: SparkSession, d: String, maxNation: Option[Int], thr: Int)
  : DataFrame = {
    // localCheckpoint: cp feeds BOTH sides of the self-join (and every
    // caller reuses the edge list 2–4×) — without it Spark recomputes
    // the scan→join→distinct→window subtree once per reference (q33
    // paid it 4×). Materializing cp once trades bounded storage
    // (distinct (ck,pk) pairs) for never re-reading the fact tables.
    val cp = capBySourceDf(custParts(s, d, maxNation), MaxSourceDf)
      .cpLocal()
    // Exact pair mass, memoized per (dataset, nation cap) so a
    // session's 2–4 edge-list consumers pay the one-aggregate local
    // scan once; plan-only construction skips it (the gate takes its
    // below-guard branch — the stock plan at every oracle SF).
    // Deliberately NOT skipped for nation-bounded subgraphs (ADVICE
    // r14): "bounded" is a constant FRACTION of customers, not a
    // constant size — the guard stays armed at any corpus scale, and
    // the memoized estimate costs one local-scan job per session key.
    val mass =
      if (planOnly(s)) 0L
      else graft.Memo.scalarOf[java.lang.Long](s, d,
        s"edges_pair_mass_${maxNation.getOrElse(-1)}")(
        Long.box(pairMass(cp))).longValue
    edgesFromCp(cp, thr, mass)
  }

  /** Exact (src,dst) pair mass of the pk self-join: a key with f
    * distinct sources emits f(f−1)/2 canonical pairs into the
    * shared-count aggregate. One aggregate over the CHECKPOINTED cp —
    * a local scan, the same cost class as the LSH volume-gate
    * estimate. */
  private[graft] def pairMass(cp: DataFrame): Long = {
    val r = cp.groupBy(col("pk")).agg(count(lit(1)).as("f"))
      .agg(coalesce(sum(col("f") * (col("f") - lit(1))), lit(0L))
        .cast("long")).first()
    (if (r.isNullAt(0)) 0L else r.getLong(0)) / 2
  }

  /** The edge build over a prebuilt cp, volume-gated like the CF
    * scoring shuffle (Recommend.sizedByCardinality): BELOW the
    * narrow-pair guard the stock plan stands — partial aggregation at
    * the session layout, the proven plan at every oracle SF. PAST it
    * the pair stream is clustered by (src,dst) at cardinality-scaled
    * parallelism BEFORE the aggregate, so per-task hash state stays
    * in memory: at the 100× corpus the ungated aggregate put 28M pair
    * rows under each of 32 fixed partitions and spilled 82 GiB per
    * aggregate pass (diag/r14/q33probe_100x_pre.out) — the same
    * defect shape the CF chain's gate closed in r11, cured the same
    * way. Pair rows are two longs, so the guard is the dedup family's
    * narrow-row bound, not the CF wide-row one. Test seam: specs pass
    * `mass` directly to pin both regimes. */
  private[graft] def edgesFromCp(cp: DataFrame, thr: Int, mass: Long)
  : DataFrame =
    graft.mining.Recommend.sizedByCardinality(
      cp.select(col("ck").as("src"), col("pk"))
        .join(cp.select(col("ck").as("dst"), col("pk")), Seq("pk"))
        .filter(col("src") < col("dst")),
      mass, graft.mining.SetSimilarity.PairDedupGuardRowsPerTask,
      col("src"), col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= thr)
      .select(col("src"), col("dst"))

  private def planOnly(s: SparkSession): Boolean = graft.PlanOnly(s)

  /** Both-direction edges (neighbor expansion). */
  private def undirected(ed: DataFrame): DataFrame =
    ed.select(col("src"), col("dst"))
      .unionByName(ed.select(col("dst").as("src"), col("src").as("dst")))

  private def cpSql(maxNation: Option[Int]): String = {
    val where = maxNation.fold("")(n =>
      s"""WHERE o_custkey IN (SELECT c_custkey FROM customer
         |    WHERE c_nationkey < $n)""".stripMargin)
    s"""cp AS MATERIALIZED (
       |  SELECT ck, pk FROM (
       |    SELECT ck, pk, count(*) OVER (PARTITION BY pk) AS df FROM (
       |      SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
       |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |      $where))
       |  WHERE df <= $MaxSourceDf),""".stripMargin
  }

  private[graft] def edgesSql(maxNation: Option[Int], thr: Int): String =
    s"""${cpSql(maxNation)}
       |ed AS MATERIALIZED (
       |  SELECT a.ck AS src, b.ck AS dst
       |  FROM cp a JOIN cp b ON a.pk = b.pk AND a.ck < b.ck
       |  GROUP BY 1, 2 HAVING count(*) >= $thr),
       |ue AS MATERIALIZED (
       |  SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed)""".stripMargin

  // ---------------------------------------------------------------- q33
  /** q33: degree histogram of the full co-purchase graph — (degree,
    * n_customers). The heavy edge build runs over all customers; the
    * result is histogram-sized regardless of scale. */
  def degreeHist(s: SparkSession, d: String): DataFrame =
    // edges checkpointed: undirected() references it twice
    degreeHistFromEdges(edges(s, d, None, EdgeThreshold).cpLocal())
      .orderBy(col("degree"))

  /** q33's histogram tail over a prebuilt edge list — the ONE
    * definition both the registered query and the 100× scale probe
    * (graft.StageProbe) measure, so the probe can never drift from
    * the production plan (ADVICE r14). */
  private[graft] def degreeHistFromEdges(ed: DataFrame): DataFrame =
    undirected(ed)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_customers"))

  val degreeHistSql: String =
    s"""WITH ${edgesSql(None, EdgeThreshold)},
       |deg AS (SELECT src, count(*) AS degree FROM ue GROUP BY 1)
       |SELECT degree, count(*) AS n_customers
       |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q34
  /** q34: triangle count on the bounded subgraph — canonical-edge 3-way
    * self-join (a<b<c counts each triangle once). */
  def triangles(s: SparkSession, d: String): DataFrame = {
    // edge list referenced three times below
    val ed = edges(s, d, Some(SubNations), SubThreshold).localCheckpoint()
    val e1 = ed.select(col("src").as("a"), col("dst").as("b"))
    val e2 = ed.select(col("src").as("b"), col("dst").as("c"))
    val e3 = ed.select(col("src").as("a"), col("dst").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val trianglesSql: String =
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)}
       |SELECT count(*) AS n_triangles
       |FROM ed e1 JOIN ed e2 ON e2.src = e1.dst
       |           JOIN ed e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin

  // ---------------------------------------------------------------- q35
  /** q35: Label Propagation communities, 5 synchronous iterations
    * (reference maxIter = 5, Assignment4/task1.py:64-65), deterministic
    * tie-break (highest neighbor-label count, then smallest label).
    * Each iteration: edge join → (node, label) counts → per-node argmax
    * — two shuffles per iteration on edge-sized data. */
  def lpa(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint truncates the lineage each round — without it the
    // logical plan compounds per iteration and analysis time explodes.
    // (On a cluster you'd use reliable checkpoint() to survive executor
    // loss; local mode has no such failure domain.)
    val ue = undirected(edges(s, d, Some(SubNations), SubThreshold))
      .localCheckpoint()
    var labels = ue.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to LpaIters) {
      labels = lpaRound(ue, labels).localCheckpoint()
    }
    labels.orderBy(col("node"))
  }

  /** One LPA round over a both-direction edge list — the un-checkpointed
    * plan, shared by [[lpa]] and PlanDump's `_lpa_round` evidence dump
    * (an inline rebuild there could silently drift, ADVICE r14).
    * Deterministic argmax via max_by over a (cnt, −lbl) struct key —
    * same (highest count, then smallest label) winner the oracle's
    * row_number window replays, minus the per-iteration sort the
    * window form needed after the count aggregate.
    * One src-exchange per round (guide §2.4): both aggregates —
    * (node,lbl) counts and the per-node argmax — accept a src
    * clustering, so the explicit repartition replaces the stock
    * plan's two chained aggregate exchanges. The exchange carries
    * the raw neighbor-label stream instead of partially-counted
    * (node,lbl) pairs; per-partition multiplicity of a (node,lbl)
    * key is ~0 on any partition-count ≫ degree layout, so that
    * partial pass was shipping its input unreduced anyway (the
    * CF-chain measurement: 0.9% reduction). */
  private[graft] def lpaRound(ue: DataFrame, labels: DataFrame)
  : DataFrame =
    ue.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
      .repartition(col("src"))
      .groupBy(col("src").as("node"), col("lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("node"))
      .agg(max_by(col("lbl"),
        struct(col("cnt"), (-col("lbl")).as("nl"))).as("lbl"))

  val lpaSql: String = {
    val iters = (1 to LpaIters).map { k =>
      val prev = if (k == 1) "l0" else s"l${k - 1}"
      s"""l$k AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT e.src AS node, l.lbl, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY e.src
         |        ORDER BY count(*) DESC, l.lbl ASC) AS rn
         |    FROM ue e JOIN $prev l ON l.node = e.dst
         |    GROUP BY e.src, l.lbl)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ue),
       |$iters
       |SELECT node, lbl FROM l$LpaIters ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q36
  /** q36: connected components by synchronous min-label propagation to
    * convergence (driver checks the change count — a scalar, not data).
    * Output: component label (min member id) and size. */
  def components(s: SparkSession, d: String): DataFrame = {
    // labels is referenced twice per round (min-propagation + change
    // count) — localCheckpoint keeps the plan constant-size; without it
    // the logical tree doubles per iteration (exponential analysis).
    val ue = undirected(edges(s, d, Some(SubNations), SubThreshold))
      .localCheckpoint()
    var labels = ue.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val next = ccRound(ue, labels).localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("node"), col("lbl"))
      iter += 1
    }
    labels.groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("csize"))
      .orderBy(col("component"))
  }

  /** One min-label-propagation round — the un-checkpointed plan,
    * shared by [[components]] and PlanDump's `_cc_round` evidence
    * dump. The change indicator rides INSIDE the round's one
    * materialized frame (the old label is already on hand from the
    * `least` join), so the caller's convergence check is a
    * filter-count over the fresh checkpoint — the previous shape
    * re-joined next with labels per round (two more exchanges + an
    * aggregate, ~2 extra jobs every iteration of an O(diameter) loop)
    * purely to recompute a difference this projection already knows. */
  private[graft] def ccRound(ue: DataFrame, labels: DataFrame)
  : DataFrame =
    ue.join(labels.withColumnRenamed("node", "dst")
        .withColumnRenamed("lbl", "nlbl"), Seq("dst"))
      .groupBy(col("src").as("node"))
      .agg(min(col("nlbl")).as("minNbr"))
      .join(labels, Seq("node"))
      .select(col("node"), least(col("lbl"), col("minNbr")).as("lbl"),
        (col("minNbr") < col("lbl")).as("chg"))

  val componentsSql: String =
    s"""WITH RECURSIVE ${edgesSql(Some(SubNations), SubThreshold)},
       |r AS (
       |  SELECT src AS node, src AS lbl FROM ue
       |  UNION
       |  SELECT e.src AS node, r.lbl
       |  FROM r JOIN ue e ON e.dst = r.node),
       |comp AS (SELECT node, min(lbl) AS component FROM r GROUP BY node)
       |SELECT component, count(*) AS csize
       |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin

  /** Connected components by alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the 100-TB upgrade path over [[components]]'s
    * min-label propagation: label propagation needs O(diameter)
    * rounds (a 10⁶-node path is 10⁶ shuffles), star contraction
    * converges in O(log n) rounds on any topology. Each round is two
    * node-keyed aggregations + joins over the current edge set, which
    * only shrinks. Returns (node, component) with the component
    * labeled by its minimum member id. Registered as q64 over the
    * bounded subgraph (same recursive-CTE oracle as q36); GraphSpec
    * additionally proves it against union-find on random graphs and a
    * long path.
    *
    * Round shapes (u's neighborhood N, m = min(N ∪ {u})):
    *   large-star: for v ∈ N(u) with v > u, emit (v, m)
    *   small-star: for v ∈ N(u) with v ≤ u, emit (v, m), plus (u, m)
    */
  /** Edge-count bound for the small-graph fast path in
    * [[componentsLargeStar]]: at or below it the contraction runs as a
    * single-pass driver union-find (a BOUNDED collect — ≤ 2·10⁵ longs
    * ≈ 3 MB — never input-proportional: the count gates it), because
    * near-dup pair lists are output-sized and the per-round job
    * overhead dominates tiny graphs. Above it, the distributed
    * O(log n) rounds. Same dispatcher shape as q45's embedding
    * near-dup (threshold routes to the scale path). */
  val LocalCcMaxEdges = 100000L

  def componentsLargeStar(edges: DataFrame,
      localMaxEdges: Long = LocalCcMaxEdges): DataFrame = {
    val s = edges.sparkSession
    // planOnly (the ExplainDump contract): the contraction iterates
    // to a data-dependent fixpoint — there is no single "the plan"
    // to build without running it (PlanOnly scaladoc's SCOPE note).
    // Compositions that EMBED it behind a checkpoint boundary (q86's
    // train pipeline) dump the same Scan-ExistingRDD stand-in a
    // production run's materialized rounds leave, and construct
    // joblessly (PlanOnlySpec pins q86 to zero non-schema jobs).
    if (graft.PlanOnly(edges))
      return graft.PlanOnly.cp(edges
        .select(col("src").as("node"), col("dst").as("component")))
    // one src-exchange per symmetrization (guide §2.4): the dedup, the
    // min-neighbor aggregate AND the star join that follow all accept
    // a src clustering, so the explicit repartition replaces three
    // chained ENSURE_REQUIREMENTS exchanges per star step ((src,dst)
    // dedup, src aggregate, join re-exchange). Per-src fan-out is the
    // node degree — the same key distribution every one of those
    // stages already grouped on.
    def undir(e: DataFrame): DataFrame =
      e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst"))
        .repartition(col("src")).distinct()
    def minNbr(ue: DataFrame): DataFrame =
      ue.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
    var e = undir(edges).localCheckpoint()
    var eCnt = e.count()
    if (eCnt <= localMaxEdges) {
      import s.implicits._
      val es = e.select(col("src"), col("dst"))
        .as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find + path compression: the max-under-min union
      // rule has no rank balancing, so an adversarial edge order can
      // chain 10⁵ parent hops — recursion would overflow the stack
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      return nodes.map(n => (n, find(n))).toSeq
        .toDF("node", "component").orderBy(col("node"))
    }
    var done = false
    var iter = 0
    while (!done && iter < 60) {
      val ue1 = undir(e)
      val large = ue1.join(minNbr(ue1), "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val e1 = large.filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint()
      val ue2 = undir(e1)
      val nm = minNbr(ue2)
      val small = ue2.join(nm, "src")
        .filter(col("dst") <= col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(nm.select(col("src"), col("m").as("dst")))
      val e2 = small.filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint()
      // fixpoint: the star edge set stops changing. Counts first (the
      // previous round's is carried, so this is ONE cheap job); the
      // edge-sized symmetric difference runs only when counts agree —
      // typically just the final round
      val e2Cnt = e2.count()
      done = e2Cnt == eCnt && e2.exceptAll(e).isEmpty
      e = e2
      eCnt = e2Cnt
      iter += 1
    }
    // 60 rounds is far past O(log n) convergence for any real graph;
    // if it's ever hit, fail loudly — a partially-contracted labeling
    // is a silently wrong answer.
    require(done,
      s"componentsLargeStar: no fixpoint after $iter rounds")
    // stars point children at the component min; the min itself
    // appears only as a dst — add the roots' self labels
    val members = e.select(col("src").as("node"), col("dst").as("component"))
    members
      .unionByName(members.select(col("component").as("node"),
        col("component")))
      .distinct()
      .orderBy(col("node"))
  }

  /** q64: the same bounded-subgraph component census as q36, computed
    * by the O(log n) star-contraction path — the designated 100-TB
    * variant, hash-verified against the identical recursive-CTE
    * oracle rather than only property-tested. Pins localMaxEdges = 0
    * so the DISTRIBUTED rounds are what the oracle certifies (the
    * small-graph union-find shortcut would otherwise capture this
    * bounded subgraph). */
  def componentsStar(s: SparkSession, d: String): DataFrame =
    componentsLargeStar(edges(s, d, Some(SubNations), SubThreshold), 0L)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("csize"))
      .orderBy(col("component"))

  // ---------------------------------------------------------------- q63
  /** PageRank iterations and damping — the web-quality signal a
    * training-data pipeline computes over its link graph (beyond the
    * reference's surface, like LPA's oracle an unrolled-SQL replay). */
  val PrIters = 5
  val PrDamping = 0.85

  /** q63: PageRank on the bounded co-purchase subgraph, 5 synchronous
    * iterations: pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)/deg(u) over the
    * both-direction edge list (no dangling nodes — every vertex has an
    * edge by construction, so mass is conserved). Each iteration is
    * one edge-sized join + a node-keyed sum; pr is rounded to 6 dp per
    * iteration so Spark's and DuckDB's group-sum orders can't drift
    * (the q40 unrolled-Lloyd precedent). The constant (1−d)/N is
    * computed with the same IEEE ops both engines apply. */
  def pagerank(s: SparkSession, d: String): DataFrame =
    pagerankOn(
      undirected(edges(s, d, Some(SubNations), SubThreshold))
        .localCheckpoint())

  /** q63 over a caller-supplied both-direction (src, dst) edge list
    * with no dangling nodes. */
  def pagerankOn(ue: DataFrame): DataFrame = {
    val deg = ue.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count()
    var pr = deg.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to PrIters) {
      val contrib = ue
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("inflow"))
      pr = deg.join(contrib, Seq("node"))
        // scaled floor-half-up, not round(x, 6): mode-independent at
        // exact .xxxxxx5 doubles (pr mass is non-negative, so +0.5
        // floor is half-up on both engines)
        .withColumn("pr", floor(
          (lit((1 - PrDamping) / n) + lit(PrDamping) * col("inflow"))
            * 1e6 + 0.5) / 1e6)
        .select(col("node"), col("deg"), col("pr"))
        .localCheckpoint()
    }
    pr.select(col("node"), col("pr")).orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q91
  /** Seeds for personalized PageRank — the top-K hub items (degree
    * desc, node asc ties), picked deterministically inside the query
    * so both engines derive the same set. */
  val PprSeedK = 5

  /** q91: personalized PageRank — teleport mass restricted to a seed
    * set instead of uniform (1−d)/N: ppr'(v) = (1−d)·s(v) + d·Σ_{u→v}
    * ppr(u)/deg(u), s = 1/|S| on seeds, 0 elsewhere. This is the
    * graph-proximity "related items" recommender (random walks with
    * restart from the items of interest), the production complement to
    * q87's co-occurrence CF and q89's content profiles. Same scale and
    * parity machinery as q63: edge-sized join + node-keyed sum per
    * iteration, 6-dp FP sync per round, teleport constants evaluated
    * as the identical IEEE double on both engines (the seed-count
    * division mirrors q63's (1−d)/N precedent; zero-mass nodes add
    * exact 0.0 terms, which cannot perturb either engine's sum). */
  def personalizedPagerank(s: SparkSession, d: String): DataFrame =
    pprOn(undirected(edges(s, d, Some(SubNations), SubThreshold))
      .cpLocal())

  /** q91 over a caller-supplied both-direction (src, dst) edge list
    * with no dangling nodes. */
  def pprOn(ue: DataFrame): DataFrame = {
    val deg = ue.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).cpLocal()
    val seeds = deg.orderBy(col("deg").desc, col("node").asc)
      .limit(PprSeedK).select(col("node"), lit(1).as("is_seed"))
    // ≤ PprSeedK rows — a scalar driver sync; 1 under plan-only
    // construction so the teleport constants baked into the dumped
    // plan stay finite (the dump never executes them)
    val k = if (graft.PlanOnly(ue)) 1L else seeds.count()
    val degS = deg
      .join(broadcast(seeds), Seq("node"), "left_outer")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(0)))
      .cpLocal() // read every iteration + the seed indicator
    var pr = degS.withColumn("pr",
      when(col("is_seed") === 1, lit(1.0 / k)).otherwise(lit(0.0)))
    for (_ <- 1 to PrIters) {
      val contrib = ue
        .join(pr.select(col("node").as("src"), col("pr"), col("deg")),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("deg")).as("inflow"))
      pr = degS.join(contrib, Seq("node"))
        .withColumn("pr", floor(
          (when(col("is_seed") === 1, lit((1 - PrDamping) / k))
            .otherwise(lit(0.0)) + lit(PrDamping) * col("inflow"))
            * 1e6 + 0.5) / 1e6)
        .select(col("node"), col("deg"), col("is_seed"), col("pr"))
        .cpLocal()
    }
    pr.select(col("node"), col("is_seed").cast("long").as("is_seed"),
        col("pr").as("ppr"))
      .orderBy(col("node"))
  }

  val pprSql: String = {
    val iters = (1 to PrIters).map { k =>
      val prev = s"p${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT d.node, d.deg, d.is_seed,
         |    floor((CASE WHEN d.is_seed = 1
         |        THEN ${1 - PrDamping} / sc.k ELSE 0.0 END
         |      + $PrDamping * i.inflow) * 1e6 + 0.5) / 1e6 AS pr
         |  FROM ds d
         |  JOIN (SELECT e.dst AS node, sum(p.pr / p.deg) AS inflow
         |        FROM ue e JOIN $prev p ON p.node = e.src
         |        GROUP BY 1) i ON i.node = d.node
         |  CROSS JOIN sc)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |deg AS (SELECT src AS node, count(*) AS deg FROM ue GROUP BY 1),
       |seeds AS (SELECT node FROM deg
       |          ORDER BY deg DESC, node LIMIT $PprSeedK),
       |sc AS (SELECT count(*) AS k FROM seeds),
       |ds AS (SELECT d.node, d.deg,
       |         CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
       |       FROM deg d LEFT JOIN seeds s ON s.node = d.node),
       |p0 AS (SELECT node, deg, is_seed,
       |         CASE WHEN is_seed = 1
       |           THEN CAST(1 AS DOUBLE) / sc.k ELSE 0.0 END AS pr
       |       FROM ds CROSS JOIN sc),
       |$iters
       |SELECT node, CAST(is_seed AS BIGINT) AS is_seed, pr AS ppr
       |FROM p$PrIters ORDER BY node""".stripMargin
  }

  val pagerankSql: String = {
    val iters = (1 to PrIters).map { k =>
      val prev = s"p${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT d.node, d.deg,
         |    floor((${1 - PrDamping} / nc.n + $PrDamping * i.inflow)
         |      * 1e6 + 0.5) / 1e6 AS pr
         |  FROM deg d
         |  JOIN (SELECT e.dst AS node, sum(p.pr / p.deg) AS inflow
         |        FROM ue e JOIN $prev p ON p.node = e.src
         |        GROUP BY 1) i ON i.node = d.node
         |  CROSS JOIN nc)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |deg AS (SELECT src AS node, count(*) AS deg FROM ue GROUP BY 1),
       |nc AS (SELECT count(*) AS n FROM deg),
       |p0 AS (SELECT node, deg, 1.0 / nc.n AS pr FROM deg CROSS JOIN nc),
       |$iters
       |SELECT node, pr FROM p$PrIters ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q97
  /** k for the q97 core; rounds cap shared by the Spark loop and the
    * oracle unrolling (the loop require()s convergence within it, the
    * oracle error()s on divergence at it — the q37 cap discipline). */
  val KCoreK = 3
  val KCoreMaxRounds = 8

  /** q97: k-core decomposition (iterative peeling) — repeatedly drop
    * nodes of degree < k until fixpoint; the surviving induced
    * subgraph is the k-core, the standard "dense cohesive region"
    * extractor (spam/bot rings in interaction graphs, seed sets for
    * community mining) next to q34's triangles and q35's communities.
    *
    * Scale: each round is one degree aggregate + two semi-joins, all
    * keyed on node ids — never more than edge-linear work; rounds are
    * bounded by the peeling depth (≤ max coreness, here capped and
    * convergence-asserted). Per-round localCheckpoint pins the shrinking
    * edge list, so round r+1 scans round r's output, not the whole
    * lineage. */
  def kcore(s: SparkSession, d: String): DataFrame =
    kcoreOn(edges(s, d, Some(SubNations), SubThreshold), KCoreK)

  /** q97 over an arbitrary (src, dst) canonical edge list. */
  def kcoreOn(ed: DataFrame, k: Int): DataFrame = {
    val all = undirected(ed).localCheckpoint() // peel input + node roster
    var ue = all
    var n = ue.count()
    var done = false
    var round = 0
    while (!done && round < KCoreMaxRounds) {
      val keep = ue.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      val next = ue.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val m = next.count()
      done = m == n
      ue = next; n = m; round += 1
    }
    require(done, s"q97: k-core peeling not converged in " +
      s"$KCoreMaxRounds rounds — raise KCoreMaxRounds")
    val core = ue.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
    all.select(col("src").as("node")).distinct()
      .join(core, Seq("node"), "left_outer")
      .select(col("node"), col("core_deg").isNotNull.as("in_kcore"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .orderBy(col("node"))
  }

  val kcoreSql: String = {
    val k = KCoreK
    val r = KCoreMaxRounds
    val rounds = (1 to r).map { i =>
      val prev = s"e${i - 1}"
      s"""d$i AS (SELECT src, count(*) AS deg FROM $prev GROUP BY 1),
         |e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM $prev e
         |  JOIN d$i a ON a.src = e.src AND a.deg >= $k
         |  JOIN d$i b ON b.src = e.dst AND b.deg >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |e0 AS MATERIALIZED (SELECT src, dst FROM ue),
       |$rounds,
       |core AS (SELECT src AS node, count(*) AS core_deg
       |         FROM e$r GROUP BY 1),
       |guard AS (
       |  SELECT CASE WHEN (SELECT count(*) FROM e$r)
       |      <> (SELECT count(*) FROM e${r - 1}) THEN error(
       |    'q97 oracle: peeling still shrinking at round $r — '
       |    || 'raise KCoreMaxRounds')
       |    ELSE 0 END AS ok)
       |SELECT n.node, (c.node IS NOT NULL) AS in_kcore,
       |  coalesce(c.core_deg, 0) AS core_deg
       |FROM (SELECT DISTINCT src AS node FROM ue) n
       |LEFT JOIN core c ON c.node = n.node
       |CROSS JOIN guard
       |ORDER BY n.node""".stripMargin
  }

  // --------------------------------------------------------------- q108
  /** q108: local clustering coefficient — per node on the bounded
    * subgraph: degree, triangle membership count, and
    * lcc = 2·t / (deg·(deg−1)) at 6 dp (0 when deg < 2). The per-node
    * refinement of q34's global count: the same canonical a<b<c
    * triangle join, then each triangle credits its three corners via a
    * UNION ALL explode — edge-list-sized shuffles only, and the
    * coefficient arithmetic is one integer-exact ratio pushed through
    * a double division written identically in both engines. Nodes in
    * no triangle surface through the left join with lcc 0, not by
    * dropping out. */
  def localClustering(s: SparkSession, d: String): DataFrame =
    localClusteringOn(edges(s, d, Some(SubNations), SubThreshold))

  /** q108 over an arbitrary canonical (src < dst) edge list. */
  def localClusteringOn(edgeList: DataFrame): DataFrame = {
    // edge list referenced four times (degree + 3-way triangle join)
    val ed = edgeList.localCheckpoint()
    val deg = undirected(ed)
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
    val e1 = ed.select(col("src").as("a"), col("dst").as("b"))
    val e2 = ed.select(col("src").as("b"), col("dst").as("c"))
    val e3 = ed.select(col("src").as("a"), col("dst").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    val corners = tri.select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(corners, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc", when(col("degree") < 2, lit(0.0))
        .otherwise(floor((col("n_tri") * 2).cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double")
          * 1e6 + 0.5) / 1e6))
      .orderBy(col("node"))
  }

  val localClusteringSql: String =
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |deg AS (SELECT src AS node, count(*) AS degree FROM ue GROUP BY 1),
       |tri AS (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM ed e1 JOIN ed e2 ON e2.src = e1.dst
       |             JOIN ed e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |corners AS (
       |  SELECT node, count(*) AS n_tri FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY 1)
       |SELECT d.node, d.degree,
       |  CAST(coalesce(c.n_tri, 0) AS BIGINT) AS n_tri,
       |  CASE WHEN d.degree < 2 THEN 0.0
       |    ELSE floor(CAST(coalesce(c.n_tri, 0) * 2 AS DOUBLE)
       |      / CAST(d.degree * (d.degree - 1) AS DOUBLE)
       |      * 1e6 + 0.5) / 1e6 END AS lcc
       |FROM deg d LEFT JOIN corners c ON c.node = d.node
       |ORDER BY d.node""".stripMargin

  // --------------------------------------------------------------- q118
  /** q118: degree assortativity — the Pearson correlation of endpoint
    * degrees over all directed edge orientations, the one-number
    * answer to "do hubs connect to hubs?" (positive: social-style
    * core; negative: hub-and-spoke). Cross-engine-exact by
    * construction: every moment (Σx, Σxy, Σx², n) is an INTEGER sum of
    * integer degrees — order-independent, no FP accumulation — and the
    * final r is a handful of identically-written double ops plus one
    * correctly-rounded sqrt. The moment aggregate is edge-keyed
    * map-side work; the output is a single row at any scale. Long
    * arithmetic holds while n·Σx² < 2⁶³ — far beyond the bounded
    * subgraph this runs on (the factors go through doubles before the
    * one multiply that could overflow). */
  def assortativity(s: SparkSession, d: String): DataFrame =
    assortativityOn(edges(s, d, Some(SubNations), SubThreshold))

  /** q118 over an arbitrary canonical (src < dst) edge list. */
  def assortativityOn(edgeList: DataFrame): DataFrame = {
    val ue = undirected(edgeList.localCheckpoint())
    val deg = ue.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val xy = ue
      .join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst")
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    m.select(col("n"), col("sx"), col("sy"), col("sxy"),
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")).as("num"),
        ((col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          * (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")))
          .as("den"))
      .select(col("n").as("n_directed_edges"),
        // a REGULAR graph has zero degree variance — correlation is
        // undefined there, surface null, not NaN
        when(col("den") === 0.0, lit(null).cast("double"))
          .otherwise(floor(col("num") / sqrt(col("den")) * 1e6 + 0.5)
            / 1e6).as("assortativity"))
  }

  val assortativitySql: String =
    s"""WITH ${edgesSql(Some(SubNations), SubThreshold)},
       |deg AS (SELECT src AS node, count(*) AS deg FROM ue GROUP BY 1),
       |xy AS (
       |  SELECT a.deg AS x, b.deg AS y
       |  FROM ue JOIN deg a ON a.node = ue.src
       |          JOIN deg b ON b.node = ue.dst),
       |m AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM xy),
       |nd AS (
       |  SELECT n,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
       |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den
       |  FROM m)
       |SELECT n AS n_directed_edges,
       |  CASE WHEN den = 0.0 THEN NULL
       |    ELSE floor(num / sqrt(den) * 1e6 + 0.5) / 1e6
       |  END AS assortativity
       |FROM nd""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q118_assortativity" -> (assortativity _),
    "q108_local_clustering" -> (localClustering _),
    "q97_kcore" -> (kcore _),
    "q33_degree_hist" -> (degreeHist _),
    "q34_triangles" -> (triangles _),
    "q35_lpa" -> (lpa _),
    "q36_components" -> (components _),
    "q63_pagerank" -> (pagerank _),
    "q64_components_star" -> (componentsStar _),
    "q91_ppr" -> (personalizedPagerank _))

  val oracle: Map[String, String] = Map(
    "q118_assortativity" -> assortativitySql,
    "q108_local_clustering" -> localClusteringSql,
    "q97_kcore" -> kcoreSql,
    "q33_degree_hist" -> degreeHistSql,
    "q34_triangles" -> trianglesSql,
    "q35_lpa" -> lpaSql,
    "q36_components" -> componentsSql,
    "q64_components_star" -> componentsSql,
    "q63_pagerank" -> pagerankSql,
    "q91_ppr" -> pprSql)
}

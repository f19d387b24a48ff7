package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GirvanNewman, Graphs}

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._

  test("edge-build skew guard drops hot join keys, keeps the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // part 99 is "hot": bought by 6 customers (> cap 5) → must emit no
    // pairs; part 1 is normal: 3 customers → C(3,2) pairs survive.
    val hot = (1 to 6).map(c => (c.toLong, 99L))
    val cold = (1 to 3).map(c => (c.toLong, 1L))
    val cp = (hot ++ cold).toDF("ck", "pk")
    val capped = graft.graph.Graphs.capBySourceDf(cp, maxDf = 5)
    assert(capped.filter(col("pk") === 99L).count() == 0,
      "hot key excluded before the self-join")
    assert(capped.filter(col("pk") === 1L).count() == 3,
      "normal keys untouched")
  }

  test("large-star/small-star components == union-find on random graphs") {
    import spark.implicits._
    // deterministic LCG
    var seed = 0xBEEFL
    def next(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n + n) % n).toInt
    }
    def unionFind(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
      val p = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (p(r) != r) r = p(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to the component MIN (roots are minimal by the
      // max-points-to-min union rule)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    (1 to 3).foreach { trial =>
      val n = 30 + next(40)
      val es = (0 until (n + next(n)))
        .map(_ => (next(n).toLong, next(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // localMaxEdges = 0 pins the DISTRIBUTED rounds (the small-graph
      // union-find shortcut would capture every generated graph)
      val got = graft.graph.Graphs
        .componentsLargeStar(es.toDF("src", "dst"), 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, es)
      // only nodes with at least one edge are emitted
      val touched = es.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched, s"trial $trial node set")
      touched.foreach { v =>
        assert(got(v) == want(v), s"trial $trial node $v")
      }
      // the small-graph fast path must agree with the distributed rounds
      val local = graft.graph.Graphs
        .componentsLargeStar(es.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == got, s"trial $trial local/distributed agreement")
    }
    // long path: label propagation would need ~500 rounds; star
    // contraction must finish inside the 60-round cap
    val path = (0L until 499L).map(i => (i, i + 1))
    val labels = graft.graph.Graphs
      .componentsLargeStar(path.toDF("src", "dst"), 0L).collect()
    assert(labels.length == 500 && labels.forall(_.getLong(1) == 0L),
      "path collapses to component 0")
  }

  test("pagerank: mass conserved, star center dominates, symmetry holds") {
    import spark.implicits._
    // star K1,3: center 0, leaves 1..3, both directions
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val pr = graft.graph.Graphs.pagerankOn(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // no dangling nodes → total mass stays 1 (up to 6-dp rounding)
    assert(math.abs(pr.values.sum - 1.0) < 1e-4, s"mass ${pr.values.sum}")
    assert(pr(0L) > pr(1L), "center outranks leaves")
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L), "leaves symmetric")
    // path 1-2-3: ends symmetric, middle dominates
    val path = Seq((1L, 2L), (2L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val pp = graft.graph.Graphs.pagerankOn(path).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pp(1L) == pp(3L), "path ends symmetric")
    assert(pp(2L) > pp(1L), "middle dominates")
  }

  test("personalized pagerank: seed teleport, mass conserved, symmetry") {
    import spark.implicits._
    // star K1,7: center 0, leaves 1..7. Seeds (top-5 by degree desc,
    // node asc) = {0, 1, 2, 3, 4}: the center plus four seed leaves.
    val star = (1L to 7L).map(l => (0L, l))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val pr = graft.graph.Graphs.pprOn(star).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val seeds = pr.filter(_._2 == 1L).map(_._1).toSet
    assert(seeds == Set(0L, 1L, 2L, 3L, 4L), s"seeds $seeds")
    val m = pr.map(r => r._1 -> r._3).toMap
    // teleport only re-injects what damping removes → mass stays 1
    assert(math.abs(m.values.sum - 1.0) < 1e-4, s"mass ${m.values.sum}")
    assert(m(1L) == m(2L) && m(2L) == m(3L) && m(3L) == m(4L),
      "seed leaves symmetric")
    assert(m(5L) == m(6L) && m(6L) == m(7L), "non-seed leaves symmetric")
    assert(m(1L) > m(5L), "seed leaves outrank non-seed leaves")
    assert(m(0L) > m(1L), "hub seed dominates")
  }

  test("brandes edge betweenness: path graph 1-2-3-4") {
    val b = GirvanNewman.edgeBetweenness(spark, Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    // pairs crossing each edge: (1,2)=3, (2,3)=4, (3,4)=3
    assert(math.abs(b((1L, 2L)) - 3.0) < 1e-9)
    assert(math.abs(b((2L, 3L)) - 4.0) < 1e-9)
    assert(math.abs(b((3L, 4L)) - 3.0) < 1e-9)
  }

  test("brandes edge betweenness: star K1,3 — every edge 3.0") {
    val b = GirvanNewman.edgeBetweenness(spark,
      Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(b.values.forall(v => math.abs(v - 3.0) < 1e-9))
  }

  test("brandes splits equally across two shortest paths (4-cycle)") {
    // cycle 1-2-4-3-1: two equal paths between opposite corners; each
    // edge carries 1 (adjacent pair) + 2×0.5 (split diagonals) = 2
    val b = GirvanNewman.edgeBetweenness(spark,
      Seq((1L, 2L), (2L, 4L), (3L, 4L), (1L, 3L)))
    assert(b.values.forall(v => math.abs(v - 2.0) < 1e-9))
  }

  test("reference-sigma mode: agrees on trees, diverges on multi-path") {
    // tree (path graph): every parent has sigma=1 → identical results
    val tree = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val exact = GirvanNewman.edgeBetweenness(spark, tree)
    val ref = GirvanNewman.edgeBetweenness(spark, tree,
      referenceSigma = true)
    assert(exact == ref)
    // diamond 1-{2,3}-4 plus tail 4-5: two shortest paths 1→4, so
    // sigma(4)=2 matters for the tail edge's dependency share
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val exactD = GirvanNewman.edgeBetweenness(spark, diamond)
    val refD = GirvanNewman.edgeBetweenness(spark, diamond,
      referenceSigma = true)
    assert(exactD != refD,
      "parent-count sigma must diverge from Brandes on multi-path graphs")
    // correct Brandes golden for the tail edge: pairs crossing = 4
    assert(math.abs(exactD((4L, 5L)) - 4.0) < 1e-9)
  }

  test("girvan-newman separates two triangles joined by a bridge") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // triangle A
      (4L, 5L), (4L, 6L), (5L, 6L), // triangle B
      (3L, 4L)) // bridge — highest betweenness (9.0: 3×3 pairs)
    val bt = GirvanNewman.edgeBetweenness(spark, edges)
    assert(bt.maxBy(_._2)._1 == ((3L, 4L)))
    assert(math.abs(bt((3L, 4L)) - 9.0) < 1e-9)
    val (q, comms) = GirvanNewman.gnCommunities(edges)
    assert(comms.map(_.toSeq.sorted).toSet ==
      Set(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
    assert(q > 0.3, s"modularity of the 2-community split: $q")
  }

  test("k-core: triangle survives 2-core, pendant chain peels off") {
    import spark.implicits._
    val ed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graphs.kcoreOn(ed, 2).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(got == Set((1L, true, 2L), (2L, true, 2L), (3L, true, 2L),
      (4L, false, 0L), (5L, false, 0L)))
  }

  test("k-core: K4 is a 3-core; K4 minus an edge peels to nothing") {
    import spark.implicits._
    val k4 = (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
      .toDF("src", "dst")
    assert(Graphs.kcoreOn(k4, 3).collect().forall(_.getBoolean(1)))
    // drop edge (3,4): degrees 3,3,2,2 → cascade empties the 3-core
    val broken = (for (a <- 1L to 4L; b <- a + 1 to 4L
                       if (a, b) != (3L, 4L)) yield (a, b))
      .toDF("src", "dst")
    assert(Graphs.kcoreOn(broken, 3).collect().forall(!_.getBoolean(1)))
  }

  test("local clustering coefficient: triangle-plus-pendant golden") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4 hanging off node 1:
    //   deg(1)=3 t(1)=1 lcc=2/(3·2)=0.333333; deg(2)=deg(3)=2 t=1 lcc=1;
    //   deg(4)=1 → lcc 0 by convention
    val ed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graphs.localClusteringOn(ed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 3L, 1L, 0.333333), (2L, 2L, 1L, 1.0),
      (3L, 2L, 1L, 1.0), (4L, 1L, 0L, 0.0)))
  }

  test("assortativity: star is perfectly disassortative; regular graph is null") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Graphs.assortativityOn(star).collect().head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == -1.0, s"star assortativity ${r.getDouble(1)}")
    // a triangle is 2-regular: degree variance 0 → undefined → null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Graphs.assortativityOn(tri).collect().head
    assert(t.isNullAt(1), "regular graph must yield null, not NaN")
  }

  test("local clustering: K4 is fully clustered, star is zero") {
    import spark.implicits._
    val k4 = (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
      .toDF("src", "dst")
    assert(Graphs.localClusteringOn(k4).collect()
      .forall(r => r.getDouble(3) == 1.0 && r.getLong(2) == 3L))
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(Graphs.localClusteringOn(star).collect()
      .forall(r => r.getDouble(3) == 0.0))
  }

  test("edge pair-aggregate volume gate: exact pair mass; stock plan " +
      "below the guard, cardinality-scaled clustering past it; " +
      "results identical in both regimes") {
    import spark.implicits._
    // fanouts 3 / 2 / 1 → pair mass C(3,2)+C(2,2)+0 = 4; at thr=1
    // every canonical pair is an edge
    val cp = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("ck", "pk").localCheckpoint()
    assert(Graphs.pairMass(cp) == 4L, "Σ f(f−1)/2 over join keys")
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val below = Graphs.edgesFromCp(cp, 1, mass = 4L)
    val belowPlan = below.queryExecution.executedPlan.toString
    assert(!belowPlan.contains("REPARTITION_BY_NUM"),
      s"below-guard edge build must keep the stock session plan:\n" +
        belowPlan)
    assert(edgeSet(below) == want)
    // pair-mass regime (the r14 100× probe: 897M pair rows over 32
    // fixed partitions spilled 82 GiB per aggregate pass) — the pair
    // stream must cluster by (src,dst) at est/2M partitions BEFORE
    // the aggregate. The mass is DERIVED from the session layout
    // (mass/partitions = 2× the guard), so the regime stays
    // above-guard under any spark.sql.shuffle.partitions, and the
    // expected repartition width follows the same arithmetic the
    // gate applies (ADVICE r14).
    val parts = spark.sessionState.conf.numShufflePartitions
    val mass = parts.toLong *
      graft.mining.SetSimilarity.PairDedupGuardRowsPerTask * 2
    val expParts = math.min(4096L,
      mass / graft.mining.Recommend.ShuffleRowsPerPartition).toInt
    val above = Graphs.edgesFromCp(cp, 1, mass)
    val abovePlan = above.queryExecution.executedPlan.toString
    val repart =
      s"hashpartitioning\\(src#\\d+L?, dst#\\d+L?, $expParts\\)".r
    assert(abovePlan.contains("REPARTITION_BY_NUM") &&
      repart.findFirstIn(abovePlan).isDefined,
      s"above-guard pair stream must repartition on (src,dst) at " +
        s"mass/2M = $expParts:\n" + abovePlan)
    assert(edgeSet(above) == want,
      "the gate changes layout, never results")
  }
}

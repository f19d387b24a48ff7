package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mining.Recommend

/** Hand-computed goldens for the item-CF composition (q87) on a
  * planted interaction matrix — the cosine arithmetic, the coMin
  * pair filter, the ownership anti-join, and the power-user cap. */
class RecommendSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ui(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("u", "i")
  }

  test("item-CF recommends the co-purchased neighbor, skips owned") {
    // users 1,2 own {10,20}; user 3 owns {10,30}.
    // deg: 10→3, 20→2, 30→1. Only (10,20) passes coMin=2:
    // sim = 2/√(3·2) = 0.816497 (6 dp). User 3 gets item 20 via its
    // owned 10; users 1,2 own both ends → no candidates.
    val recs = Recommend.itemCfOn(
        ui(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L,
          3L -> 10L, 3L -> 30L),
        cap = 64, coMin = 2, topM = 20, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(recs.toSeq == Seq((3L, 1L, 20L, 0.8165)))
  }

  test("scores sum across multiple owned neighbors") {
    // user 4 owns {10, 20}; both co-occur with 30 (c=2 each, via users
    // 1,2,3 owning {10,20,30}): score(30 for 4) = sim(10,30)+sim(20,30)
    val m = ui(
      1L -> 10L, 1L -> 20L, 1L -> 30L,
      2L -> 10L, 2L -> 20L, 2L -> 30L,
      3L -> 10L, 3L -> 20L, 3L -> 30L,
      4L -> 10L, 4L -> 20L)
    // deg: 10→4, 20→4, 30→3; sim(10,30)=3/√12=0.866025=sim(20,30)
    val recs = Recommend.itemCfOn(m, 64, 2, 20, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val u4 = recs.filter(_._1 == 4L)
    assert(u4 == Seq((4L, 1L, 30L, 1.7321)), s"got $u4")
  }

  test("ingest-time recs are stateless on a stream and match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static neighbor index from the co-purchase history
    val hist = ui(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L,
      3L -> 10L, 3L -> 30L)
    val nbr = Recommend.neighborTable(
      hist.localCheckpoint(), coMin = 2, topM = 20).localCheckpoint()
    // batch path
    val batchIn = Seq((9L, 10L), (9L, 99L)).toDF("u", "i")
    val batchOut = Recommend.recsForInteractions(batchIn, nbr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // item 10's only neighbor is 20; unknown item 99 emits nothing
    assert(batchOut.toSeq == Seq((9L, 10L, 20L)))
    // stream path: same operator, memory source, zero state operators
    val mem = MemoryStream[(Long, Long)]
    val q = Recommend.recsForInteractions(
        mem.toDF().toDF("u", "i"), nbr)
      .writeStream.format("memory").queryName("recs_out")
      .outputMode("append").start()
    try {
      mem.addData((9L, 10L), (9L, 99L))
      q.processAllAvailable()
      val got = spark.table("recs_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == batchOut.toSeq)
      assert(q.lastProgress.stateOperators.isEmpty,
        "ingest-time recommendation stream must carry no state operator")
    } finally q.stop()
  }

  test("content-based rec: cosine over df-capped features, hand golden") {
    import spark.implicits._
    // catalog of 20, df cap = N/10 = 2: parts 1-17 share name "common
    // widget" (df 17, dropped) and everyone shares type T (df 20,
    // dropped); "rare gem" (18, 19) sits exactly on the cap edge
    // (df 2, kept), "odd bolt" (20) and every unique brand are kept.
    val parts = ((1 to 17).map(i => (i.toLong, "common widget",
        s"B$i", "T")) ++
      Seq((18L, "rare gem", "B18", "T"), (19L, "rare gem", "B19", "T"),
        (20L, "odd bolt", "B20", "T")))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
    // u1 owns {18}: profile {rare gem:1, B18:1}, un²=2. Item 19 (class
    //   {rare gem, B19}, nf=2) matches via the name: 1/√(2·2) = 0.5.
    // u2 owns {1,2}: only unique brands survive the cap → every
    //   candidate is already owned → no recs (the df cap at work).
    // u3 owns {19,20}: un²=4; item 18 via rare gem: 1/√(4·2)=0.353553.
    val recs = Recommend.contentRecOn(
        ui(1L -> 18L, 2L -> 1L, 2L -> 2L, 3L -> 19L, 3L -> 20L),
        parts, cap = 64, profTopF = 32, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._2)) // *On is unsorted
    assert(recs == Seq(
      (1L, 1L, 19L, 0.5),
      (3L, 1L, 18L, 0.353553)), s"got $recs")
  }

  test("content-based rec: class item cap reproduces exact top-k") {
    import spark.implicits._
    // One class of 6 identical items (name "same part", brand BB —
    // df 6 = exactly the N/10 cap with 54 unique-feature fillers,
    // N=60). cap=2, k=2 → the per-class item list keeps only the 4
    // smallest ids [11,12,13,14] of the 6-item class. u9 owns the two
    // smallest — the exact top-2 must still be 13, 14 (ownership
    // cannot starve the bounded list), proving the cap+k bound.
    val parts = ((11 to 16).map(i => (i.toLong, "same part", "BB", "T"))
      ++ (1 to 54).map(j => (100L + j, s"filler$j", s"F$j", "T")))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
    // profile: {same part: 2, BB: 2}, un² = 8; class dot = 4, nf = 2
    // → score = 4/√16 = 1.0 for every unowned class member.
    val recs = Recommend.contentRecOn(
        ui(9L -> 11L, 9L -> 12L), parts, cap = 2, profTopF = 32, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._2)) // *On is unsorted
    assert(recs == Seq((9L, 1L, 13L, 1.0), (9L, 2L, 14L, 1.0)),
      s"got $recs")
  }

  test("hybrid rec: rank fusion matches a scala-side blend of cf+content") {
    import spark.implicits._
    // Both paths active: the CF fixture (items 10/20/30, no catalog
    // features — parts absent from the catalog) plus the rare-gem
    // catalog driving content matches. Expected output is recomputed
    // here with the operator's own arithmetic over the two REGISTERED
    // outputs, so any fusion drift (weights, coalesce, tie order)
    // fails loudly.
    val m = ui(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L,
      3L -> 10L, 3L -> 30L, 1L -> 18L, 3L -> 19L)
    val parts = ((1 to 17).map(i => (i.toLong, "common widget",
        s"B$i", "T")) ++
      Seq((18L, "rare gem", "B18", "T"), (19L, "rare gem", "B19", "T"),
        (20L, "odd bolt", "B20", "T")))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val cf = rows(Recommend.itemCfOn(m, 64, 2, 20, 3)).toMap
    val cn = rows(Recommend.contentRecOn(m, parts, 64, 32, 3)).toMap
    val expected = (cf.keySet ++ cn.keySet).toSeq
      .map { key => (key, math.floor(
        (0.5 * cf.getOrElse(key, 0.0) + 0.5 * cn.getOrElse(key, 0.0))
          * 1e6 + 0.5) / 1e6) }
      .groupBy(_._1._1).toSeq.flatMap { case (u, cands) =>
        cands.sortBy { case ((_, i), s) => (-s, i) }.take(3).zipWithIndex
          .map { case (((_, i), s), r) => (u, (r + 1).toLong, i, s) }
      }.sortBy(t => (t._1, t._2))
    val got = Recommend.hybridRecOn(m, parts, 64, 2, 20, 32, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._2)) // *On is unsorted
    assert(cf.nonEmpty && cn.nonEmpty, "fixture must exercise both paths")
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("cf eval: deterministic leave-one-out hit-rate, hand golden") {
    // u1,u2 own {10,20}; u3 owns {10,20,30}. Holdout (max id, ≥2
    // items): u1→20, u2→20, u3→30. Train: u1{10}, u2{10}, u3{10,20}.
    // With coMin=1, sim(10,20) = 1/√3 → u1,u2 get item 20 back (HIT);
    // u3 owns both ends of the only pair → no candidates (MISS).
    val m = ui(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L,
      3L -> 10L, 3L -> 20L, 3L -> 30L)
    val r = Recommend.cfEvalOn(m, cap = 64, coMin = 1, topM = 20, k = 3)
      .collect()
    assert(r.length == 1)
    val row = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2))
    assert(row == ((3L, 2L, 0.6667)), s"got $row")
  }

  test("power-user cap removes capped users from matrix and scoring") {
    // cap=2: user 1 (3 items) is excluded everywhere — with only
    // users 2,3 left no pair reaches coMin=2 co-users
    val m = ui(1L -> 10L, 1L -> 20L, 1L -> 30L,
      2L -> 10L, 2L -> 20L, 3L -> 10L, 3L -> 30L)
    val capped = Recommend.itemCfOn(m, 2, 2, 20, 3).collect()
    assert(capped.isEmpty)
    // without the cap, pairs form and recommendations flow
    val uncapped = Recommend.itemCfOn(m, 64, 2, 20, 3).collect()
    assert(uncapped.nonEmpty)
  }

  test("dimension-table broadcast gate: small dims broadcast, " +
      "corpus-scale dims fall back to a shuffle hash join, and a " +
      "measured payload past the byte cap blocks the broadcast even " +
      "under the row-count bound") {
    import spark.implicits._
    // same join, all three gate regimes — results must agree and the
    // physical plans must take the promised shapes
    val facts = (1L to 200L).map(i => (i % 20, i)).toDF("i", "u")
    val dim = (0L to 19L).map(i => (i, i * 100)).toDF("i", "v")
    def planOf(rows: Long, bytes: Long): (String, Long) = {
      val j = facts.join(Recommend.dimHint(dim, rows, bytes), "i")
      (j.queryExecution.executedPlan.toString, j.count())
    }
    val okBytes = Recommend.fixedDimBytes(20L, 2)
    val (small, nSmall) = planOf(Recommend.BroadcastDimRows, okBytes)
    val (big, nBig) = planOf(Recommend.BroadcastDimRows + 1, okBytes)
    // rows under the count bound but a measured payload past the byte
    // cap — the wide-row case the count proxy cannot see
    val (fat, nFat) = planOf(20L, Recommend.DimBroadcastBytes + 1)
    assert(small.contains("BroadcastHashJoin"),
      s"small dim did not broadcast:\n$small")
    assert(!big.contains("BroadcastHashJoin") &&
      big.contains("ShuffledHashJoin"),
      s"over-gate dim did not fall back to shuffle hash:\n$big")
    assert(!fat.contains("BroadcastHashJoin") &&
      fat.contains("ShuffledHashJoin"),
      s"byte-capped dim did not fall back to shuffle hash:\n$fat")
    assert(nSmall == nBig && nSmall == nFat && nSmall == 200L)
  }

  test("class-index gate: in-gate catalogs score through the " +
      "broadcast ContentScoreAgg, a byte-capped index rides the " +
      "users×classes shuffle chain — identical recs in both regimes") {
    import spark.implicits._
    // the q89 feature shapes on a small catalog: shared name/brand
    // features so classes have >1 item and nf > 1, plus fillers so
    // the df cap keeps the shared features
    val parts = ((11 to 16).map(i => (i.toLong, "same part", "BB", "T"))
      ++ (1 to 54).map(j => (100L + j, s"filler$j", s"F$j", "T")))
      .toDF("p_partkey", "p_name", "p_brand", "p_type")
    val inter = ui(9L -> 11L, 9L -> 12L, 7L -> 13L, 5L -> 101L)
    def run(idxEst: Option[(Long, Long)])
    : (String, Seq[(Long, Long, Long, Double)]) = {
      val r = Recommend.contentTop(
        Recommend.uiMatrix(inter, 64), parts, 2, 32, 2, idxEst)
      (r.queryExecution.executedPlan.toString,
        r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getDouble(3))).toSeq.sortBy(t => (t._1, t._2)))
    }
    // measured (real) gate: vocabulary-bounded → broadcast index
    val (inGate, rIn) = run(None)
    // injected estimate past the byte cap under the row bound: the
    // wide-payload vocabulary the count proxy cannot see
    val (past, rPast) = run(Some((100L, Recommend.DimBroadcastBytes + 1)))
    assert(inGate.contains("ContentScoreAgg") ||
      inGate.contains("contentscoreagg"),
      s"in-gate plan must score through the broadcast aggregate:\n$inGate")
    assert(!past.contains("ContentScoreAgg") &&
      !past.contains("contentscoreagg"),
      s"past-gate plan must not driver-collect/broadcast the index:\n$past")
    assert(past.contains("ShuffledHashJoin"),
      s"past-gate ck joins must ride shuffle-hash:\n$past")
    assert(rIn == rPast && rIn.nonEmpty,
      s"gate branches must agree on the recs: $rIn vs $rPast")
  }

  test("degree joins in the f² pair build are size-gated: an " +
      "items-scale catalog falls back to shuffle hash, same results") {
    import spark.implicits._
    val ui = (1L to 60L).map(u => (u, u % 6)).toDF("u", "i")
      .unionByName((1L to 60L).map(u => (u, (u + 1) % 6)).toDF("u", "i"))
      .distinct()
    def run(nItems: Long): (String, Seq[(Long, Long, Double)]) = {
      val p = Recommend.simsPlan(ui, 1, nItems)
      (p.queryExecution.executedPlan.toString,
        p.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSeq.sortBy(t => (t._1, t._2)))
    }
    val (small, rSmall) = run(6L)
    val (big, rBig) = run(Recommend.BroadcastDimRows + 1)
    // key the asserts on the degree-join keys (ia/ib) — the u-key
    // self-join upstream broadcasts legitimately in both branches
    assert(small.contains("BroadcastHashJoin [ia") &&
      small.contains("BroadcastHashJoin [ib"),
      s"small catalog's degree joins did not broadcast:\n$small")
    assert(big.contains("ShuffledHashJoin [ia") &&
      big.contains("ShuffledHashJoin [ib") &&
      !big.contains("BroadcastHashJoin [ia") &&
      !big.contains("BroadcastHashJoin [ib"),
      s"items-scale catalog did not fall back to shuffle hash:\n$big")
    assert(rSmall == rBig && rSmall.nonEmpty,
      "gate branches must agree on the similarity table")
  }

  test("scoring shuffles are volume-gated: below the spill guard the " +
      "stock plan is untouched, above it the candidate stream is " +
      "repartitioned at cardinality-scaled parallelism, same results") {
    import spark.implicits._
    val ui = (1L to 40L).map(u => (u, u % 8)).toDF("u", "i")
      .unionByName((1L to 40L).map(u => (u, (u + 1) % 8)).toDF("u", "i"))
      .distinct()
    val nbr = (0L to 7L).flatMap(i => Seq((i, (i + 2) % 8, 0.5),
      (i, (i + 3) % 8, 0.25))).toDF("i", "j", "sim")
    def run(candEst: Long): (String, Seq[(Long, Long, Long)]) = {
      val r = Recommend.scoreFromNbr(ui, nbr, 16L, 3, candEst)
      (r.queryExecution.executedPlan.toString,
        r.collect().map(x => (x.getLong(0), x.getLong(1),
          x.getLong(2))).toSeq.sortBy(t => (t._1, t._2)))
    }
    val floor = spark.sessionState.conf.numShufflePartitions
    val (small, rSmall) = run(Recommend.SpillGuardRowsPerTask * floor)
    val (big, rBig) = run(Recommend.ShuffleRowsPerPartition * 100L)
    // repartition(n, cols) plans as an Exchange tagged
    // REPARTITION_BY_NUM — absent below the guard, present (with the
    // scaled count) above it
    assert(!small.contains("REPARTITION_BY_NUM"),
      s"below-guard plan must be the stock session plan:\n$small")
    assert(big.contains("REPARTITION_BY_NUM") &&
      big.contains("hashpartitioning(u#") && big.contains(", 100)"),
      s"over-guard plan must repartition at est/2M = 100:\n$big")
    assert(rSmall == rBig && rSmall.nonEmpty,
      "guard branches must agree on the recommendations")
  }

  test("ContentScoreAgg buffer law: bounded-insert reduce ≡ stable " +
      "sort-then-take, in any reduce/merge split (200 scalacheck runs)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the law the per-row hot path must keep (VERDICT r10 item 4):
    // folding reduce over any input order, with arbitrary partition
    // splits merged pairwise, lands on exactly what the old
    // `(all).sorted(ord).take(topF)` produced — including w ties
    // (f asc breaks them) and duplicate features.
    val idx = spark.sparkContext.broadcast(
      Recommend.ClassIndex(Map.empty, Array.emptyLongArray, Array.empty))
    val rowGen: Gen[(String, Long)] = for {
      f <- Gen.chooseNum(0, 9).map(i => s"f$i") // few names → many ties
      w <- Gen.chooseNum(0L, 5L)
    } yield (f, w)
    val caseGen: Gen[(Int, List[(String, Long)], Int)] = for {
      topF <- Gen.chooseNum(1, 6)
      rows <- Gen.listOf(rowGen)
      nSplit <- Gen.chooseNum(1, 4)
    } yield (topF, rows, nSplit)
    val ord: Ordering[(String, Long)] =
      Ordering.by { case (f, w) => (-w, f) }
    (0 until 200).foreach { i =>
      val (topF, rows, nSplit) =
        caseGen(Gen.Parameters.default, Seed(0xC0FFEEL + i)).get
      val agg = new Recommend.ContentScoreAgg(idx, topF, topF + 2)
      val parts = rows.grouped(math.max(1, rows.size / nSplit)).toSeq
      val got = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val want = rows.sorted(ord).take(topF)
      assert(got == want,
        s"case $i (topF=$topF, splits=${parts.size}): $got != $want " +
          s"for $rows")
    }
    idx.destroy()
  }
}

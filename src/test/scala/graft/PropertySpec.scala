package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.mining.Son
import graft.streaming.Streams
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import graft.plans.{DotProductExpr, EqCountExpr, SortedIntersectSizeExpr}

/** Property-based checks (SURVEY §5.3) for the algorithm kernels that
  * have no SQL oracle — scalacheck properties run under fixed seeds via
  * Test.check, asserted through ScalaTest. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(Seed(42L)), p)
    assert(res.passed, res.status.toString)
  }

  private val basketsGen: Gen[List[List[String]]] =
    Gen.listOfN(30, Gen.nonEmptyListOf(
      Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.distinct.sorted))

  test("local a-priori == brute-force frequent itemsets on random baskets") {
    check(Prop.forAll(basketsGen) { baskets =>
      val arr = baskets.map(_.toArray)
      val got = Son.aprioriLocal(arr, supportFrac = 0.3, maxSize = 4)
        .map(_.mkString(",")).toSet
      val thr = math.max(1L, math.ceil(0.3 * baskets.size).toLong)
      val counts = scala.collection.mutable.Map.empty[String, Long]
      baskets.foreach { b =>
        (1 to math.min(4, b.size)).foreach { k =>
          b.combinations(k).foreach { c =>
            val key = c.mkString(",")
            counts.update(key, counts.getOrElse(key, 0L) + 1)
          }
        }
      }
      got == counts.filter(_._2 >= thr).keySet
    })
  }

  test("FM sketch merge law: merge(sketch(A), sketch(B)) == sketch(A ++ B)") {
    val xsGen = Gen.listOf(Gen.chooseNum(0L, 1000000L))
    check(Prop.forAll(xsGen, xsGen) { (a, b) =>
      val sa = a.foldLeft(Streams.FmSketchAgg.zero)(Streams.FmSketchAgg.reduce)
      val sb = b.foldLeft(Streams.FmSketchAgg.zero)(Streams.FmSketchAgg.reduce)
      val su = (a ++ b).foldLeft(Streams.FmSketchAgg.zero)(
        Streams.FmSketchAgg.reduce)
      Streams.FmSketchAgg.merge(sa, sb).toSeq == su.toSeq
    })
  }

  test("FM estimate is duplicate-insensitive") {
    val xsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))
    check(Prop.forAll(xsGen) { xs =>
      val once = xs.distinct.foldLeft(Streams.FmSketchAgg.zero)(
        Streams.FmSketchAgg.reduce)
      val thrice = (xs ++ xs ++ xs).foldLeft(Streams.FmSketchAgg.zero)(
        Streams.FmSketchAgg.reduce)
      Streams.FmSketchAgg.finish(once) == Streams.FmSketchAgg.finish(thrice)
    })
  }

  test("bloom positions: membership of trained value always predicted") {
    // relational-Bloom invariant at kernel level: for any value set, all
    // k positions of a trained value are in the position set
    val vals = (1 to 200).map(i => s"v$i")
    val seeds = graft.functions.Hashing.seeds(6, salt = 29L)
    def positions(v: String): Seq[Long] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) %
        graft.functions.Hashing.M31
      seeds.map { case (a, b) => (a * h + b) % 7000L }
    }
    val trained = vals.take(100).flatMap(positions).toSet
    vals.take(100).foreach { v =>
      assert(positions(v).forall(trained.contains), s"false negative on $v")
    }
  }

  // ---- native kernel properties (interpreted eval path; the codegen
  // path is pinned by PlansSpec's fixed cases) ----

  private val dblArr: Gen[List[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0))

  test("graft_dot eval == fold dot product; ragged input is NULL") {
    check(Prop.forAll(dblArr, dblArr) { (a, b) =>
      val got = DotProductExpr(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType))).eval(null)
      val expect = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      got == expect
    })
    val ragged = DotProductExpr(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Seq(1.0), ArrayType(DoubleType))).eval(null)
    assert(ragged == null)
  }

  test("graft_eqcount eval == position-wise equality count") {
    val lngArr = Gen.listOfN(6, Gen.chooseNum(0L, 3L))
    check(Prop.forAll(lngArr, lngArr) { (a, b) =>
      val got = EqCountExpr(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null)
      got == a.zip(b).count { case (x, y) => x == y }
    })
    val ragged = EqCountExpr(
      Literal.create(Seq(1L, 2L), ArrayType(LongType)),
      Literal.create(Seq(1L), ArrayType(LongType))).eval(null)
    assert(ragged == null, "ragged signature pair must be NULL")
  }

  test("graft_isize eval == set-intersection size on sorted arrays") {
    val strArr = Gen.listOf(Gen.oneOf(
        "a", "b", "c", "d", "e", "f", "g", "h", "aa", "ab"))
      .map(_.distinct.sorted)
    check(Prop.forAll(strArr, strArr) { (a, b) =>
      val got = SortedIntersectSizeExpr(
        Literal.create(a, ArrayType(StringType)),
        Literal.create(b, ArrayType(StringType))).eval(null)
      got == a.toSet.intersect(b.toSet).size
    })
  }

  test("BoundedMinK over any reduce/merge split == sorted.take(k)") {
    val xsGen = Gen.listOf(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue))
    val kGen = Gen.chooseNum(1, 12)
    check(Prop.forAll(xsGen, xsGen, kGen) { (a, b, k) =>
      val agg = new graft.functions.BoundedMinK(k)
      // arbitrary partitioning: reduce each side, then merge
      val left = a.foldLeft(agg.zero)(agg.reduce)
      val right = b.foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(left, right)).toSeq
      got == (a ++ b).sorted.take(k)
    })
  }

  test("BoundedTopByCount over any split == global (count desc, label asc) top-k") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 50L),
      Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val xsGen = Gen.listOf(rowGen)
    val kGen = Gen.chooseNum(1, 5)
    check(Prop.forAll(xsGen, xsGen, kGen) { (a, b, k) =>
      val agg = new graft.functions.BoundedTopByCount(k)
      val got = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)))
      got == (a ++ b).sortBy { case (c, w) => (-c, w) }.take(k)
    })
  }

  test("ContentScoreAgg profile buffer: bounded insert over any " +
      "reduce/merge split == stable sort.take(topF)") {
    import SparkTestSession._
    // finish() is exercised by the q89 oracle; this pins the BUFFER
    // law after the per-row sort became a bounded insert (VERDICT r10
    // item 4): any partitioning of the input rows must produce exactly
    // the global (w desc, f asc) top-F profile
    val idx = spark.sparkContext.broadcast(
      graft.mining.Recommend.ClassIndex(
        Map.empty, Array.empty[Long], Array.empty))
    val rowGen = Gen.zip(
      Gen.oneOf("a", "b", "c", "d", "e", "f", "g"),
      Gen.chooseNum(1L, 50L))
    val xsGen = Gen.listOf(rowGen)
    val fGen = Gen.chooseNum(1, 6)
    check(Prop.forAll(xsGen, xsGen, fGen) { (a, b, topF) =>
      val agg = new graft.mining.Recommend.ContentScoreAgg(idx, topF, 4)
      val got = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      got == (a ++ b).sortBy { case (f, w) => (-w, f) }.take(topF)
    })
  }

  test("q148 distributed packing == sequential greedy replay on random " +
      "corpora") {
    import SparkTestSession._
    import spark.implicits._
    // random doc lengths (incl. oversized), random capacity/budget —
    // the distributed shard-then-pack must equal a single sequential
    // pass that shards by the same running-token rule then packs
    // greedily within each shard
    // 0-length docs included (ADVICE r10): a zero-token doc opening a
    // shard followed by an over-capacity doc is exactly the case where
    // a `fill > 0` guard and the oracle's first-row rule diverge
    val lensGen = Gen.listOfN(40, Gen.chooseNum(0, 80))
    val capGen = Gen.chooseNum(20L, 60L)
    val budGen = Gen.chooseNum(100L, 300L)
    check(Prop.forAll(lensGen, capGen, budGen) { (lens, cap, budget) =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val got = graft.ops.Pipeline.packSequencesOn(docs, budget, cap)
        .collect().map(r => (r.getLong(0),
          (r.getLong(2), r.getLong(3)))).toMap
      // reference: one sequential pass over doc_id order, first row of
      // a shard always opens bin 0 (the oracle CTE's rn=1 anchor)
      var cum = 0L
      var shardState = Map.empty[Long, (Long, Long)] // shard -> (bin, fill)
      val want = lens.zipWithIndex.map { case (n, i) =>
        val shard = cum / budget
        cum += n
        val (nb, nf) = shardState.get(shard) match {
          case None => (0L, n.toLong)
          case Some((bin, fill)) =>
            if (fill + n > cap) (bin + 1, n.toLong)
            else (bin, fill + n)
        }
        shardState += shard -> (nb, nf)
        i.toLong -> (shard, nb)
      }.toMap
      got == want
    })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sketch.Sketches
import graft.streaming.Streams

class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bloom filter has zero false negatives; FPR below 0.5") {
    val rows = Sketches.bloomMembership(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, predicted, actual) =>
      if (actual) assert(predicted, s"false negative on $v — impossible for Bloom")
    }
    val negatives = rows.filter(!_._3)
    if (negatives.nonEmpty) {
      val fpr = negatives.count(_._2).toDouble / negatives.size
      assert(fpr < 0.5, s"FPR $fpr")
    }
  }

  test("fm estimate within a loose envelope of exact distinct") {
    val rows = Sketches.fmDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact / 8.0 && est <= exact * 8.0,
        s"$t: estimate $est vs exact $exact (FM should be within ~8x)")
    }
  }

  test("FmSketchAgg (streaming aggregator) matches the relational q30 math") {
    val fm = udaf(Streams.FmSketchAgg)
    val viaAgg = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("x31", expr(graft.functions.Hashing.h31SparkSql("user_id")))
      .groupBy(col("event_type"))
      .agg(fm(col("x31")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaQuery = Sketches.fmDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    viaQuery.foreach { case (t, v) =>
      assert(math.abs(viaAgg(t) - v) < 0.02,
        s"$t: aggregator ${viaAgg(t)} vs query $v")
    }
  }

  test("fm merge(a,b) == sketch of union (algebraic aggregate law)") {
    val a = (1L to 50L).foldLeft(Streams.FmSketchAgg.zero)(
      Streams.FmSketchAgg.reduce)
    val b = (30L to 90L).foldLeft(Streams.FmSketchAgg.zero)(
      Streams.FmSketchAgg.reduce)
    val union = (1L to 90L).foldLeft(Streams.FmSketchAgg.zero)(
      Streams.FmSketchAgg.reduce)
    assert(Streams.FmSketchAgg.merge(a, b).toSeq == union.toSeq)
  }

  test("count-min never underestimates; collisions visible at w=16") {
    val rows = Sketches.countMinHh(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // one-sided error: est ≥ true for every reported term
    rows.foreach { case (t, c, e, o) =>
      assert(e >= c, s"$t underestimated: est $e < true $c")
      assert(o == e - c)
    }
    // 31 terms into 16 buckets ⇒ some cell must be shared in every row;
    // with d=3 at least one reported term should still carry overcount
    assert(rows.exists(_._4 > 0),
      "no collisions at w=16 over a 31-term vocabulary — sketch wiring suspect")
  }

  test("q103 bloom runtime-filter join is bit-identical to the plain join") {
    import org.apache.spark.sql.functions._
    import graft.sketch.Sketches
    val got = SparkEntry.queries("q103_bloom_join")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === Sketches.RfBrand),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg((floor(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,6)")).cast("double") * 1e2 + 0.5) / 1e2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("p_type")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == plain)
  }

  test("q103 prefilter has no false negatives and real selectivity") {
    import org.apache.spark.sql.functions._
    import graft.sketch.Sketches._
    val dim = Tables.part(spark, sfDir).filter(col("p_brand") === RfBrand)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val posArr = "array(" + RfSeeds.map { case (a, b) =>
      s"($a * ${graft.functions.Hashing.h31SparkSql("p_partkey")} + $b) % $RfM"
    }.mkString(", ") + ")"
    val bitmap = new Array[Boolean](RfM)
    Tables.part(spark, sfDir).filter(col("p_brand") === RfBrand)
      .select(explode(expr(posArr)).as("pos")).distinct()
      .collect().foreach(r => bitmap(r.getLong(0).toInt) = true)
    val keys = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"))
      .withColumn("hk", expr(graft.functions.Hashing.h31SparkSql("l_partkey")))
      .withColumn("pass", RfSeeds.map { case (a, b) =>
        element_at(typedLit(bitmap.toSeq),
          ((lit(a) * org.apache.spark.sql.functions.col("hk") + lit(b))
            % RfM + 1).cast("int"))
      }.reduce(_ && _))
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    // no false negatives: every true-member row passes
    keys.filter(k => dim.contains(k._1)).foreach { case (k, p) =>
      assert(p, s"false negative on partkey $k")
    }
    // the filter actually filters: most non-members die before the join
    val nonMembers = keys.filterNot(k => dim.contains(k._1))
    if (nonMembers.nonEmpty) {
      val fpr = nonMembers.count(_._2).toDouble / nonMembers.size
      assert(fpr < 0.2, f"runtime-filter FPR $fpr%.3f too high")
    }
  }

  test("q110 approx quantiles land within one bin width of exact") {
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, sfDir).select(col("value"))
      .collect().map(_.getDouble(0)).sorted
    val width = (vals.last - vals.head) / Sketches.AqBins
    val got = SparkEntry.queries("q110_approx_quantiles")(spark, sfDir)
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Sketches.AqQuantiles.map(_.toDouble).toSet)
    got.foreach { case (p, est) =>
      // exact p-quantile by rank (ceil(p·n), 1-based)
      val exact = vals(math.ceil(p * vals.length).toInt - 1)
      assert(math.abs(est - exact) <= width + 1e-9,
        f"p=$p est=$est%.4f exact=$exact%.4f width=$width%.4f")
      assert(est >= vals.head - 1e-9 && est <= vals.last + 1e-9)
    }
    // monotone in p
    val sortedByP = got.toSeq.sortBy(_._1).map(_._2)
    assert(sortedByP == sortedByP.sorted)
  }

  test("q144 HLL estimate within 3.5σ of exact; both branches behave") {
    // sfDir (sf0.001): tiny per-type distincts → the linear-counting
    // branch (raw ≤ 2.5m with empty registers) must engage and the
    // estimate must still track exact within the envelope
    val rows = SparkEntry.queries("q144_hll_distinct")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val sigma = 1.04 / math.sqrt(Sketches.HllM) // ≈ 9.2% at m=128
    rows.foreach { case (t, exact, nEmpty, est) =>
      assert(est > 0, s"$t: non-positive estimate")
      val rel = math.abs(est - exact) / math.max(exact, 1L)
      assert(rel <= 3.5 * sigma,
        f"$t: HLL off by ${rel * 100}%.1f%% (exact=$exact est=$est)")
      // tiny cardinalities cannot fill all 128 registers
      if (exact < Sketches.HllM) assert(nEmpty > 0)
    }
    // raw branch on a large synthetic set: 20k distinct keys
    import spark.implicits._
    val big = (1L to 20000L)
      .map(i => ("t", s"u$i")).toDF("event_type", "user_id")
      .withColumn("h", expr(
        graft.functions.Hashing.h60SparkSql("user_id")))
    // replay the register math directly on the frame
    val m = Sketches.HllM
    val sums = big.select(col("event_type"), col("h"))
      .distinct()
      .withColumn("reg", expr(s"h % $m"))
      .withColumn("w", expr(s"h div $m"))
      .groupBy(col("reg"))
      .agg(max(expr("54 - (" + (52 to 0 by -1).map(k =>
        s"WHEN w >= ${1L << k} THEN ${k + 1}")
        .mkString("CASE ", " ", " ELSE 0 END") + ")")).as("mr"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(54 - mr AS INT))"))
        .as("sp"), count(lit(1)).as("nb"))
      .collect()(0)
    val sumint = sums.getLong(0) + (m - sums.getLong(1)) * (1L << 54)
    val raw = Sketches.HllNumer / sumint.toDouble
    assert(raw > 2.5 * m, "20k distincts must take the raw branch")
    assert(math.abs(raw - 20000) / 20000.0 <= 3.5 * sigma,
      f"raw HLL off: $raw%.0f vs 20000")
  }

  test("HllSketchAgg: merge(a,b) == sketch of union; estimate equals " +
      "the oracle-verified q144 pipeline on the same keys") {
    val agg = Streams.HllSketchAgg
    def h(s: String): Long = graft.functions.Hashing.h60Local(s)
    def sketch(keys: Seq[String]): Array[Int] =
      keys.foldLeft(agg.zero)((b, k) => agg.reduce(b, h(k)))
    val a = (1 to 400).map(i => s"a$i")
    val b = (200 to 700).map(i => s"a$i") // overlaps a
    val merged = agg.merge(sketch(a), sketch(b))
    val union = sketch((a ++ b).distinct)
    assert(merged.sameElements(union), "algebraic merge law broken")
    // estimate accuracy on the union (700 distinct)
    val est = agg.finish(merged)
    assert(math.abs(est - 700) / 700.0 <= 3.5 * 1.04 /
      math.sqrt(Sketches.HllM), s"estimate $est vs 700")
    // parity with the registered q144 on the driver events table:
    // aggregator over the same distinct (type, user) hashes must give
    // the query's exact hll_estimate values
    val q = SparkEntry.queries("q144_hll_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val keysByType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id").cast("string"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq)
    keysByType.foreach { case (t, users) =>
      val viaAgg = agg.finish(sketch(users))
      assert(viaAgg == q(t),
        s"$t: aggregator $viaAgg != q144 ${q(t)}")
    }
  }
}

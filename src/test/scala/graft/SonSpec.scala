package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mining.Son

class SonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("SON equals brute-force frequent itemsets on sf0.001") {
    val got = Son.sonItemsets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap

    // brute force, driver-side, from the same baskets
    val baskets = Son.baskets(spark, sfDir)
      .select(col("basket")).collect()
      .map(_.getSeq[String](0).toSet).toSeq
    val minsup = math.max(1L,
      math.ceil(Son.SupportFrac * baskets.size).toLong)
    val expect = scala.collection.mutable.Map.empty[String, Long]
    baskets.foreach { b =>
      val items = b.toSeq.sorted
      (1 to Son.MaxSize).foreach { k =>
        items.combinations(k).foreach { c =>
          val key = c.mkString(",")
          expect.update(key, expect.getOrElse(key, 0L) + 1)
        }
      }
    }
    val frequent = expect.filter(_._2 >= minsup).toMap
    assert(got == frequent,
      s"SON ${got.size} itemsets vs brute force ${frequent.size}")
  }

  test("SON agrees with ml.fpm.FPGrowth (different algorithm, same answer)") {
    import org.apache.spark.ml.fpm.FPGrowth
    val b = Son.baskets(spark, sfDir).select(col("basket").as("items"))
    val model = new FPGrowth()
      .setItemsCol("items").setMinSupport(Son.SupportFrac).fit(b)
    val fp = model.freqItemsets.collect()
      .filter(_.getSeq[String](0).size <= Son.MaxSize)
      .map(r => (r.getSeq[String](0).sorted.mkString(","), r.getLong(1)))
      .toMap
    val son = Son.sonItemsets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(son == fp, s"SON ${son.size} vs FPGrowth ${fp.size} itemsets")
  }

  test("local a-priori has no false negatives at partition scope") {
    val baskets = Seq(
      Array("a", "b", "c"), Array("a", "b"), Array("a", "c"),
      Array("b", "c"), Array("a", "b", "c"), Array("d"))
    val out = Son.aprioriLocal(baskets, supportFrac = 0.5, maxSize = 3)
      .map(_.mkString(",")).toSet
    // support 3 of 6: a(4) b(4) c(4) ab(3) ac(3) bc(3) abc(2 — out)
    assert(out == Set("a", "b", "c", "a,b", "a,c", "b,c"))
  }
}

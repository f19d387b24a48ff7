package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("all registered queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates are internally consistent") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    val liCount = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(total == liCount)
  }

  test("q02 top users ordered desc by count, ties by key desc") {
    val rows = SparkEntry.queries("q02_top_users")(spark, sfDir).collect()
    val pairs = rows.map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("user_id")))
    pairs.sliding(2).foreach { case Array((c1, u1), (c2, u2)) =>
      assert(c1 > c2 || (c1 == c2 && u1 > u2))
    case _ => ()
    }
  }

  test("q09 anti join disjoint from q08 semi join") {
    val semi = SparkEntry.queries("q08_semi_join")(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val anti = SparkEntry.queries("q09_anti_join")(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(semi.intersect(anti).isEmpty)
  }

  test("q10 rank ties include all keys at tied counts") {
    val rows = SparkEntry.queries("q10_rank_ties")(spark, sfDir).collect()
    val byRank = rows.groupBy(_.getAs[Long]("rnk"))
    assert(byRank.keySet.subsetOf(Set(1L, 2L, 3L)))
    // all rows with the same rank share one count
    byRank.values.foreach { g =>
      assert(g.map(_.getAs[Long]("cnt")).toSet.size == 1)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mining.SetSimilarity

class PlansSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native graft_minhash equals the HOF signature bit-for-bit") {
    val hof = SetSimilarity.minhashSig(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = SetSimilarity.minhashSigNative(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, sig) => assert(sig == hof(id), s"doc $id") }
  }

  test("graft_minhash survives whole-stage codegen and interpreted eval") {
    import spark.implicits._
    val df = Seq((1L, Seq(5L, 17L, 123456789L)), (2L, Seq(42L)))
      .toDF("id", "xs")
    val expected = {
      val (as, bs) = (SetSimilarity.MinHashSeeds.map(_._1),
        SetSimilarity.MinHashSeeds.map(_._2))
      Map(
        1L -> as.indices.map(j => Seq(5L, 17L, 123456789L)
          .map(x => (as(j) * x + bs(j)) % SetSimilarity.MinHashMod).min),
        2L -> as.indices.map(j =>
          (as(j) * 42L + bs(j)) % SetSimilarity.MinHashMod))
    }
    // codegen path (default)
    val got = df.select(col("id"), expr("graft_minhash(xs)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    got.foreach { case (id, s) => assert(s == expected(id)) }
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got2 = df.select(col("id"), expr("graft_minhash(xs)").as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      got2.foreach { case (id, s) => assert(s == expected(id)) }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}

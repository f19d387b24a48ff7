package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.Streams

case class TestEv(ts: Timestamp, user_id: Long, event_type: String)
case class TestDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mkEvents(n: Int): Seq[TestEv] =
    (0 until n).map { i =>
      TestEv(new Timestamp(1700000000000L + i * 1000L), // 1 event/sec
        user_id = i % 37, event_type = s"t${i % 3}")
    }

  test("sliding FM window agg over MemoryStream matches batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEv]
    val q = Streams.slidingFmDistinct(mem.toDF())
      .writeStream.format("memory").queryName("fm_win")
      .outputMode("complete").start()
    try {
      val evs = mkEvents(120)
      mem.addData(evs.take(60): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(60): _*)
      q.processAllAvailable()
      val streamed = spark.table("fm_win")
        .select(col("window_start"), col("approx_users"), col("fm_estimate"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Streams.slidingFmDistinct(evs.toDF())
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch,
        "streaming (2 micro-batches) and batch produce identical windows")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("reservoir keeps everything below capacity, caps at capacity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.ResEvent]
    val q = Streams.reservoirTopTags(mem.toDS())
      .writeStream.format("memory").queryName("res_out")
      .outputMode("append").start()
    try {
      mem.addData((1 to 80).map(i => Streams.ResEvent(i.toLong, s"tag${i % 5}")): _*)
      q.processAllAvailable()
      mem.addData((81 to 300).map(i => Streams.ResEvent(i.toLong, s"tag${i % 5}")): _*)
      q.processAllAvailable()
      val rows = spark.table("res_out")
        .orderBy(col("seq")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.length == 300, "one emission per event")
      rows.foreach { case (seq, n, size) =>
        assert(n == seq)
        if (n <= Streams.ReservoirSize) assert(size == n,
          s"below capacity all retained (n=$n size=$size)")
        else assert(size == Streams.ReservoirSize)
      }
    } finally q.stop()
  }

  test("reservoir top-tags ties: all tags at the top-3 counts emitted") {
    val st = org.apache.spark.sql.streaming.TestGroupState.create[Streams.ResState](
      org.apache.spark.api.java.Optional.empty[Streams.ResState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val evs = Seq("a", "a", "b", "b", "c", "d").zipWithIndex
      .map { case (t, i) => Streams.ResEvent(i + 1L, t) }
    val out = Streams.processReservoir(0, evs.iterator, st).toSeq
    // final emission: counts a=2 b=2 c=1 d=1 → ranks: 2 and 1 → all four
    assert(out.last.topTags == "a:2,b:2,c:1,d:1")
  }

  test("streaming exact dedup keeps first occurrence across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestDoc]
    val q = Streams.streamingExactDedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      mem.addData(
        TestDoc(1, "alpha beta", new Timestamp(t0)),
        TestDoc(2, "gamma delta", new Timestamp(t0 + 1000)),
        TestDoc(3, "alpha beta", new Timestamp(t0 + 2000))) // dup of 1
      q.processAllAvailable()
      mem.addData(
        TestDoc(4, "gamma delta", new Timestamp(t0 + 3000)), // dup of 2
        TestDoc(5, "epsilon", new Timestamp(t0 + 4000)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 5L),
        s"dups dropped across micro-batches, got $ids")
    } finally q.stop()
    // batch path: same operator, same keep-one semantics
    val batch = Streams.streamingExactDedup(Seq(
      TestDoc(1, "x y", new Timestamp(0)),
      TestDoc(2, "x y", new Timestamp(1000)),
      TestDoc(3, "z", new Timestamp(2000))).toDF())
    assert(batch.count() == 2)
  }

  test("streaming session windows match the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEv]
    val q = Streams.sessionizeStream(mem.toDF(), gap = "30 seconds",
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      val t0 = 1700000000000L
      // user 1: two sessions (gap 60s > 30s); user 2: one session
      val evs = Seq(
        TestEv(new Timestamp(t0), 1, "a"),
        TestEv(new Timestamp(t0 + 10000), 1, "a"),
        TestEv(new Timestamp(t0 + 80000), 1, "a"),
        TestEv(new Timestamp(t0 + 5000), 2, "b"))
      mem.addData(evs.take(2): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      val batch = Streams.sessionizeStream(evs.toDF(), gap = "30 seconds")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(streamed == batch,
        s"streaming sessions == batch sessions; got $streamed vs $batch")
      assert(streamed.count(_._1 == 1L) == 2, "user 1 has two sessions")
    } finally q.stop()
  }
}

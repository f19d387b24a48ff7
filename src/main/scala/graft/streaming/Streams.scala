package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}
import graft.sketch.Sketches

/** Structured Streaming operators — the reference's DStream surface
  * (Assignment6) on readStream/writeStream.
  *
  * The aggregation bodies are the same ones the batch queries verify
  * against DuckDB (q30/q31/q32): batch runs prove the math, streaming
  * runs prove the micro-batch/watermark semantics (StreamingSpec drives
  * them through MemoryStream). This is the Spark-native split of the
  * reference's foreachRDD+collect pattern (Assignment6/task2.py:33-76),
  * where the sketch math ran single-node on the driver.
  */
object Streams {

  /** ST2: sliding 30s/10s window counts + exact distinct users, with a
    * watermark for state cleanup (the reference had no late-data story —
    * ST7; the watermark is the explicit Spark-native choice). Works on a
    * batch or streaming DataFrame with (ts, user_id) columns. */
  def slidingUserCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "30 seconds", "10 seconds"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("approx_users"))

  /** Stream-static enrichment: join each micro-batch against a static
    * (or slowly-refreshed) dimension on `key` — the ingest-time
    * enrichment shape every event pipeline runs (events × user/device/
    * geo dim). Stateless, so no watermark is involved; `broadcast` on
    * the dim keeps the join map-side in every micro-batch, which is
    * the only plan that holds when the stream side is unbounded.
    * Left join: an event without a dim row must flow through (with
    * nulls), not silently drop. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String)
  : DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (attribution): each view joined to
    * the same user's purchases landing within `horizon` AFTER the
    * view. BOTH sides carry watermarks and the join condition carries
    * the time-range predicate — exactly the two things Spark needs to
    * bound the join state store: without them a stream-stream join
    * buffers both streams forever; with them, rows beyond
    * watermark + horizon are evicted each micro-batch. Inner join, so
    * matches emit as soon as both sides arrive (no watermark-flush
    * latency). The same code runs on batch frames — the predicate is
    * ordinary SQL — which is what the parity test asserts. */
  def attributeStream(views: DataFrame, purchases: DataFrame,
      horizon: String = "30 seconds", watermark: String = "1 minute")
  : DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    v.join(p, col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("v_user").as("user_id"), col("view_ts"),
        col("purchase_ts"))
  }

  /** ST4: Flajolet–Martin sketch as a typed Aggregator — buffer is the
    * 40 per-hash maxima; merge is element-wise max, which is what makes
    * FM an algebraic aggregate (partial aggregation + shuffle merge,
    * also usable inside streaming state). Input is the portable 31-bit
    * hash of the key (compute with graft.functions.Hashing.h31). The
    * estimate math (mod 500, r(0)=1, group means, median) is exactly
    * the oracle-verified q30 pipeline. */
  object FmSketchAgg extends Aggregator[Long, Array[Int], Double] {
    def zero: Array[Int] = Array.fill(Sketches.FmHashes)(0)
    def reduce(b: Array[Int], x31: Long): Array[Int] = {
      var i = 0
      while (i < Sketches.FmHashes) {
        val (a, c) = Sketches.FmSeeds(i)
        val v = (a * x31 + c) % Sketches.FmMod
        val r = if (v == 0L) 1
          else java.lang.Long.numberOfTrailingZeros(v)
        if (r > b(i)) b(i) = r
        i += 1
      }
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] =
      a.zip(b).map { case (x, y) => math.max(x, y) }
    def finish(b: Array[Int]): Double = {
      val perGroup = Sketches.FmHashes / Sketches.FmGroups
      val means = b.map(r => math.pow(2.0, r))
        .grouped(perGroup).map(g => g.sum / g.length).toArray.sorted
      val n = means.length
      val median =
        if (n % 2 == 1) means(n / 2)
        else (means(n / 2 - 1) + means(n / 2)) / 2.0
      math.rint(median * 100.0) / 100.0
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoderHelper.intArray
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private object ExpressionEncoderHelper {
    /** Catalyst-native array<int> encoder: buffer ser/de is a primitive
      * array copy per partial-merge/state-store round-trip, not a Java
      * serialization stream (the previous javaSerialization encoder
      * paid object-graph serialization on every merge). */
    val intArray: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  }

  /** HyperLogLog as a typed Aggregator — the streaming form of q144,
    * exactly as FmSketchAgg is the streaming form of q30. Buffer is
    * the 128 register maxima; merge is element-wise max (algebraic —
    * partial aggregation, shuffle merge, streaming state all reuse
    * it); input is the portable h60 hash. The finish math (integer
    * register sum scaled by 2^54, α_m bias, linear-counting branch)
    * is exactly the oracle-verified q144 pipeline, so the streaming
    * estimate equals the batch query's on the same keys. */
  object HllSketchAgg extends Aggregator[Long, Array[Int], Double] {
    def zero: Array[Int] = Array.fill(Sketches.HllM)(0)
    def reduce(b: Array[Int], h60: Long): Array[Int] = {
      val reg = (h60 % Sketches.HllM).toInt
      val w = h60 / Sketches.HllM
      // 54 − bit length of the 53-bit word (w=0 → ρ=54), identical to
      // the q144 CASE cascade
      val rho = 54 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > b(reg)) b(reg) = rho
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] =
      a.zip(b).map { case (x, y) => math.max(x, y) }
    def finish(b: Array[Int]): Double = {
      var sumint = 0L
      var empty = 0
      b.foreach { m =>
        if (m == 0) empty += 1
        sumint += (1L << (54 - m))
      }
      val raw = Sketches.HllNumer / sumint.toDouble
      val est =
        if (raw <= 2.5 * Sketches.HllM && empty > 0)
          Sketches.HllM * math.log(Sketches.HllM.toDouble / empty)
        else raw
      math.floor(est * 1e2 + 0.5) / 1e2
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoderHelper.intArray
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** FM distinct-user estimate per sliding window — the full streaming
    * form of the reference's windowed FM (ST1–ST5): the sketch merges
    * inside the window aggregation, so nothing is collected. */
  def slidingFmDistinct(events: DataFrame): DataFrame = {
    val fm = udaf(FmSketchAgg)
    events
      .withWatermark("ts", "1 minute")
      .withColumn("x31", expr(graft.functions.Hashing.h31SparkSql("user_id")))
      .groupBy(window(col("ts"), "30 seconds", "10 seconds"))
      // exact distinct is not allowed in streaming aggs — HLL++ is the
      // built-in cousin shipped alongside the FM sketch (SURVEY ST4)
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        fm(col("x31")).as("fm_estimate"))
      .select(col("window.start").as("window_start"),
        col("approx_users"), col("fm_estimate"))
  }

  /** Session windows on a stream — the incremental form of q50's
    * sessionization: per-user 30-minute-gap sessions that close (and
    * emit, in append mode) once the watermark passes the session end.
    * Same aggregate body as the batch query, so the batch oracle
    * (gaps-and-islands SQL) proves the math and StreamingSpec proves
    * the micro-batch/watermark semantics. */
  def sessionizeStream(events: DataFrame,
      gap: String = "30 minutes", watermark: String = "1 hour")
  : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact deduplication — the incremental form of q21's
    * content-hash dedup, for ingest pipelines that must drop duplicate
    * documents as they arrive rather than in a nightly batch. The key
    * is the md5 of the content (computed map-side; only the hash is
    * kept in the state store). `dropDuplicatesWithinWatermark` bounds
    * state to the watermark horizon — the honest 100 TB posture: exact
    * dedup within the replay window, with the batch job (q21) as the
    * periodic full-history pass. Works on batch frames too (Spark
    * falls back to plain dropDuplicates semantics in batch).
    *
    * Input needs (doc_id, text, ts); emits the surviving rows. */
  def streamingExactDedup(docs: DataFrame, watermark: String = "1 hour")
  : DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col("text")))
    if (docs.isStreaming)
      hashed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_hash")
        .drop("content_hash")
    else {
      // batch parity: dropDuplicates keeps an ARBITRARY row per key —
      // pin first-occurrence (earliest ts, doc_id tie-break) so batch
      // and streaming agree on which document survives. min(struct)
      // aggregate + join, not row_number over a hash partition: the
      // window form buffers a whole dup group in one task (a corpus of
      // identical docs = one giant partition); the aggregate
      // partial-combines map-side
      val firsts = hashed.groupBy(col("content_hash"))
        .agg(min(struct(col("ts"), col("doc_id"))).as("_f"))
      hashed.join(firsts, "content_hash")
        .filter(col("ts") === col("_f.ts") &&
          col("doc_id") === col("_f.doc_id"))
        .drop("_f", "content_hash")
    }
  }

  /** Streaming twin of q112's CDC latest-state compaction: the SAME
    * max-of-struct aggregate (`Relational.latestStateOn`) run on a
    * changelog stream in UPDATE mode. Spark's streaming hash aggregate
    * keeps exactly ONE struct per key in the state store — no history
    * is ever buffered — and each micro-batch emits only the keys it
    * changed; a downstream upsert sink applies them. State size is
    * O(live keys), which is the semantic minimum for "current state
    * per key" (evict retired keys with a TTL'd state operator if the
    * key space churns). StreamingSpec pins final-state parity against
    * the batch q112 on the same rows. */
  def latestStateStream(changelog: DataFrame): DataFrame =
    graft.ops.Relational.latestStateOn(changelog)

  case class ChangeEvent(user_id: Long, tsl: Long, event_id: Long,
    event_type: String, value: Double)
  case class UserLatest(tsl: Long, event_id: Long, event_type: String,
    value: Double)
  case class UserLatestOut(user_id: Long, last_ts_us: Long,
    last_event_id: Long, last_type: String, last_value: Double)

  /** The transformWithState processor behind [[latestStateTtl]]: one
    * TTL'd ValueState per key holding the newest (tsl, event_id)
    * record. TTL is what the plain streaming aggregate
    * ([[latestStateStream]]) cannot express — retired keys age out of
    * the state store instead of accumulating forever, which at 100 TB
    * of churn is the difference between state ∝ live keys and state ∝
    * all keys ever seen. */
  class LatestStateProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, ChangeEvent, UserLatestOut] {
    @transient private var state: ValueState[UserLatest] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserLatest]("latest",
        Encoders.product[UserLatest], TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[ChangeEvent],
        timers: TimerValues): Iterator[UserLatestOut] = {
      var best = if (state.exists()) state.get() else null
      rows.foreach { e =>
        if (best == null || e.tsl > best.tsl ||
            (e.tsl == best.tsl && e.event_id > best.event_id))
          best = UserLatest(e.tsl, e.event_id, e.event_type, e.value)
      }
      state.update(best)
      Iterator.single(UserLatestOut(key, best.tsl, best.event_id,
        best.event_type, best.value))
    }
  }

  /** q112's latest-state compaction on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): identical per-key semantics to
    * [[latestStateStream]], plus a state TTL. Requires the RocksDB
    * state store provider. Emits the changed key's state each
    * micro-batch (update semantics — feed an upsert sink). */
  def latestStateTtl(changelog: Dataset[ChangeEvent],
      ttl: java.time.Duration): Dataset[UserLatestOut] = {
    implicit val outEnc: Encoder[UserLatestOut] =
      Encoders.product[UserLatestOut]
    changelog.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new LatestStateProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Streaming session paths — q127's per-session path stage on a
    * stream: the SAME `Windows.sessionPathFrame` aggregate behind a
    * watermark. Spark's session_window state merges/extends sessions
    * per user and emits each (user, session, path) exactly once, when
    * the session's window falls behind the watermark — so state is
    * bounded by open sessions, and the downstream path census is a
    * plain batch aggregate over the emitted rows. */
  def sessionPathsStream(events: DataFrame, watermark: String = "1 hour")
  : DataFrame =
    graft.ops.Windows.sessionPathFrame(
      events.withWatermark("ts", watermark))

  /** Streaming curation — the q59 cascade minus its one stateful rule.
    * Every quality/repetition signal is a per-row expression (the
    * repetition ratios are a sorted-run HOF, no shuffle), so the
    * verdict runs STATELESS on a stream: length → quality → repetition,
    * same order and thresholds as batch. The exact-dup rule needs
    * cross-row state; compose with [[streamingExactDedup]] upstream for
    * the within-watermark equivalent (batch q59 remains the
    * full-history pass). Works identically on batch frames —
    * StreamingSpec pins stream/batch parity row for row. */
  def streamingCuration(docs: DataFrame): DataFrame =
    graft.ops.Text.signalChainOn(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("repetitive"))
      .withColumn("reason",
        when(col("n_tokens") < graft.ops.Text.CurationMinTokens,
          "too_short")
          .when(col("quality") < 0.5, "low_quality")
          .when(col("repetitive"), "repetitive")
          .otherwise("ok"))
      .select(col("doc_id"), col("reason"),
        (col("reason") === "ok").as("keep"))

  case class ResEvent(seq: Long, tag: String)
  case class ResState(n: Long, sample: List[String])
  case class ResOut(seq: Long, n: Long, sampleSize: Long, topTags: String)

  val ReservoirSize = 100

  /** Deterministic stand-in for the reference's random.randint draws
    * (Assignment6/task3.py:53-58) — an LCG keyed on the arrival index,
    * so replays and tests are exact. Probability structure matches:
    * element n kept with P = size/n, evictee uniform. */
  private def lcg(x: Long): Long = {
    val a = 6364136223846793005L
    val c = 1442695040888963407L
    math.abs(a * x + c) % 1000000007L
  }

  /** ST6+ST8: reservoir sampling with top-tags emission per record,
    * as flatMapGroupsWithState over a single logical group. State is
    * O(ReservoirSize) — the same bound the reference kept on the
    * driver, here managed by the state store. */
  def reservoirTopTags(events: Dataset[ResEvent])
  : Dataset[ResOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processReservoir)
  }

  private[graft] def processReservoir(
      key: Int, rows: Iterator[ResEvent], state: GroupState[ResState])
  : Iterator[ResOut] = {
    var st = state.getOption.getOrElse(ResState(0L, Nil))
    val out = scala.collection.mutable.ArrayBuffer[ResOut]()
    rows.toSeq.sortBy(_.seq).foreach { ev =>
      val n = st.n + 1
      val sample =
        if (st.sample.size < ReservoirSize) ev.tag :: st.sample
        else if (lcg(n) % n < ReservoirSize) {
          val idx = (lcg(n * 31 + 7) % ReservoirSize).toInt
          st.sample.updated(idx, ev.tag)
        } else st.sample
      st = ResState(n, sample)
      // top-3 distinct frequencies, all tags at each, lexicographic —
      // the A14/O6 tie semantics (Assignment6/task3.py:86-97).
      val freq = sample.groupBy(identity).map { case (t, l) => (t, l.size) }
      val top3 = freq.values.toSeq.distinct.sorted.reverse.take(3)
      val tags = freq.toSeq
        .filter { case (_, c) => top3.contains(c) }
        .sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => s"$t:$c" }.mkString(",")
      out += ResOut(ev.seq, n, sample.size.toLong, tags)
    }
    state.update(st)
    out.iterator
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming micro-benchmark (VERDICT r7 item 7): the batch twins of
  * every stream operator are benched per-round, but the streaming
  * RUNTIME had no number attached. This main drives the production
  * stream shapes from a `rate` source for a fixed window each, twice
  * (so the artifact shows run-to-run stability), and reports
  * throughput (rows/sec processed) and state-store size
  * (stateOperators.numRowsTotal of the last progress) into
  * STREAMBENCH.json.
  *
  * Streams covered: stateless curation cascade, within-watermark
  * exact dedup, near-dup screen against a static index (stream-static
  * joins), ingest-time recommendations (stream-static broadcast join
  * against the precomputed neighbor index), latest-state compaction
  * (update-mode aggregate), TTL'd latest-state
  * (transformWithState/RocksDB), session paths (session_window
  * state).
  *
  * Event time is synthesized from the rate `value` (1 synthetic second
  * per row ÷ fan-out) so watermarks/session gaps advance ~10³× faster
  * than wall time and stateful operators actually evict/emit inside
  * the measurement window — a wall-clock `ts` would leave every
  * session open and understate state turnover.
  *
  * Run: sbt "runMain graft.StreamBench" (writes STREAMBENCH.json).
  */
object StreamBench {

  /** True when a previous STREAMBENCH artifact was produced under the
    * same throughput accounting as this program (processing-time,
    * first batch excluded) — a delta against any other artifact
    * compares accounting regimes, not engines (ADVICE r11: the
    * unguarded r10→r11 delta printed +398% on ingest_recs). */
  private[graft] def sameAccounting(prevTxt: String): Boolean =
    prevTxt.contains("\"excludes_first_batch\":true")

  /** Best (max) rows/s recorded for stream `name` in a STREAMBENCH
    * artifact body, or None when the stream is absent or its best is
    * non-positive — a zero-batch run's 0.0 would turn the delta
    * division into Infinity/NaN and break the JSON (ADVICE r11).
    * Unit-tested (CountsSpec): the regex over this program's own
    * output format is the fragile piece of the round gate. */
  private[graft] def prevBestRate(
      prevTxt: String, name: String): Option[Double] = {
    val re = ("\"" + java.util.regex.Pattern.quote(name) +
      "\":\\{\"rows_per_sec\":\\[([0-9.,]+)\\]").r.unanchored
    prevTxt match {
      case re(arr) =>
        Some(arr.split(",").map(_.toDouble).max).filter(_ > 0.0)
      case _ => None
    }
  }

  /** Best calibration-probe rate in a previous artifact (the
    * top-level `calibration_rows_per_sec` array, present from r14
    * on), or None — without it round deltas can only be read raw. */
  private[graft] def prevCalibration(prevTxt: String): Option[Double] = {
    val re = "\"calibration_rows_per_sec\":\\[([0-9.,]+)\\]".r.unanchored
    prevTxt match {
      case re(arr) =>
        Some(arr.split(",").map(_.toDouble).max).filter(_ > 0.0)
      case _ => None
    }
  }

  /** Raw and calibration-normalized delta for one stream, plus the
    * host-drift label the round artifact's stderr trail carries
    * (VERDICT r14 item 4 — the labeling logic itself, extracted so a
    * synthetic drifted probe can pin it). The normalization divides
    * each side's rate by ITS round's null-op probe rate: the probe's
    * own delta is pure host, so the division cancels the host term —
    * a raw "regression" whose normalized delta is quiet labels itself
    * a host-drift candidate instead of costing a binary A/B.
    * Returns (rawPct, normalizedPct when both probes exist, tag);
    * tag is empty while the raw move is quieter than −30%. */
  private[graft] def deltaLabel(curBest: Double, prevBest: Double,
      cal: Option[Double], prevCal: Option[Double])
  : (Double, Option[Double], String) = {
    val pct = (curBest - prevBest) / prevBest * 100.0
    val norm = for (cb <- cal; pc <- prevCal)
      yield ((curBest / cb) - (prevBest / pc)) / (prevBest / pc) * 100.0
    val tag =
      if (pct > -30.0) ""
      else if (norm.isEmpty)
        "  <<< REGRESSION ≥30% (no calibration on one side " +
          "— raw only, not normalized)"
      else if (norm.exists(_ > -30.0))
        "  <<< raw ≥30% but calibration-normalized quiet: " +
          "HOST-DRIFT CANDIDATE"
      else "  <<< REGRESSION ≥30% (survives calibration " +
        "normalization)"
    (pct, norm, tag)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val durSec = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEC", "12").toInt
    val corpusDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // subset-key co-partitioning (q93/q87 scoring tail): the CF
      // chain's explicit u-exchange serves the (u,j) aggregate, the
      // ownership anti-join AND the top-k window only when the planner
      // may co-partition a join on a PREFIX of its keys; per-u group
      // fan-out is cap-bounded there, so the relaxation is safe at any
      // scale (see Recommend.scoreFromNbr)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // commit per-batch CHANGELOGS instead of full RocksDB snapshots:
      // with ~10^5 state rows the snapshot upload dominated every
      // micro-batch commit (the r9 neardup_screen throughput gap)
      .config("spark.sql.streaming.stateStore.rocksdb" +
        ".changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rate(rowsPerSec: Int): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSec)
        // one generator partition per core: the screen's whole probe
        // chain is narrow (broadcast joins, no shuffle until the
        // dedup), so input parallelism IS stage parallelism
        .option("numPartitions", cpus.toInt)
        .load() // (timestamp, value)

    // synthetic event time: value-driven, so watermarks advance fast
    def synthTs(perUser: Int): org.apache.spark.sql.Column =
      timestamp_micros(lit(1704067200000000L) + // 2024-01-01
        expr(s"value div $perUser") * 1000000L)

    // deterministic pseudo-documents: ~24 tokens drawn from a 1000-word
    // vocab, content keyed on value%2000 so exact dups recur at ~1/2000
    def rateDocs(rowsPerSec: Int): DataFrame =
      rate(rowsPerSec)
        .withColumn("doc_id", col("value"))
        .withColumn("ts", synthTs(1))
        .withColumn("k", pmod(col("value"), lit(2000)))
        .withColumn("text", expr(
          "array_join(transform(sequence(1, 24), " +
            "i -> concat('w', pmod(k * 131 + i * 17, 1000))), ' ')"))
        .select(col("doc_id"), col("ts"), col("text"))

    def rateChangelog(rowsPerSec: Int): DataFrame =
      rate(rowsPerSec)
        .select(pmod(col("value"), lit(50000)).as("user_id"),
          synthTs(1).as("ts"), col("value").as("event_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase"),
            lit("signup"), lit("error")),
            (pmod(col("value"), lit(5)) + 1).cast("int")).as("event_type"),
          (pmod(col("value"), lit(997)).cast("double") / 10).as("value"))

    // the near-dup screen probes a STATIC index built from the real
    // sf corpus; incoming docs replay corpus texts (join on idx — a
    // stateless stream-static join, like the screen itself)
    lazy val corpusDocs = Tables.documents(spark, corpusDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    lazy val corpusN = corpusDocs.count()
    lazy val corpusLookup = corpusDocs
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id")))
        .cast("long") - 1)
      .select(col("idx"), col("text")).localCheckpoint()
    def rateCorpusDocs(rowsPerSec: Int): DataFrame =
      rate(rowsPerSec)
        .select((col("value") + 1000000L).as("doc_id"),
          synthTs(1).as("ts"),
          pmod(col("value"), lit(corpusN)).as("idx"))
        // broadcast: the lookup is a checkpointed frame with no stats —
        // an un-hinted join re-sorts it every micro-batch, and that
        // GENERATOR cost would be billed to the screen under test
        .join(broadcast(corpusLookup), "idx")
        .select(col("doc_id"), col("ts"), col("text"))

    import graft.streaming.Streams
    // Rates deliberately OVERSUBSCRIBE each stream (we measure engine
    // capacity, not the generator): with a backlog the micro-batches
    // grow and rows/sec converges to sustained throughput.
    val streams: Seq[(String, () => DataFrame)] = Seq(
      "curation_stateless" -> (() =>
        Streams.streamingCuration(rateDocs(100000))),
      "exact_dedup_watermark" -> (() =>
        Streams.streamingExactDedup(rateDocs(100000), "10 minutes")),
      // offered ≈ measured capacity (~30k after the broadcast-index /
      // changelog-checkpointing / full-width-partition / first-band
      // dedup fixes): far over-subscribing this one just grows the
      // backlog batches, and with them the dedup store's PEAK row
      // count — near capacity the batches, and so the state peak,
      // stay flat run to run
      "neardup_screen" -> (() =>
        graft.mining.SetSimilarity.screenAgainstIndex(
          rateCorpusDocs(40000), corpusDocs, "10 minutes")),
      // ingest-time recommendations: the q87 event path — stateless
      // stream-static broadcast join of incoming (u, i) interactions
      // against the precomputed item-neighbor index (built once from
      // the real sf corpus)
      "ingest_recs" -> (() => {
        val nbr = graft.mining.Recommend.neighborTable(
          graft.mining.Recommend
            .copurchases(spark, corpusDir).distinct().localCheckpoint(),
          graft.mining.Recommend.CoMinUsers,
          graft.mining.Recommend.NeighborTopM).localCheckpoint()
        graft.mining.Recommend.recsForInteractions(
          rate(500000).select(pmod(col("value"), lit(50000)).as("u"),
            pmod(col("value") * 31L, lit(20000)).as("i"),
            synthTs(1).as("ts")),
          broadcast(nbr))
      }),
      "latest_state" -> (() =>
        Streams.latestStateStream(rateChangelog(500000))),
      "latest_state_ttl" -> (() =>
        Streams.latestStateTtl(
          rateChangelog(500000).withColumn("tsl", unix_micros(col("ts")))
            .selectExpr("user_id", "tsl", "event_id", "event_type", "value")
            .as[Streams.ChangeEvent],
          java.time.Duration.ofMinutes(30)).toDF()),
      "session_paths" -> (() =>
        Streams.sessionPathsStream(
          rateChangelog(200000)
            .withColumn("user_id", pmod(col("user_id"), lit(200))),
          "5 minutes")))

    // A window that closes before even ONE post-startup batch commits
    // measures NOTHING — recording it as 0 rows/s would write
    // quantization into the artifact as if it were capacity (seen
    // live: the screen's shuffle-plan batches exceed a 12 s window
    // under host noise, and the round artifact claimed a −100%
    // regression the isolated re-run disproved). Retry once with a
    // doubled window; a genuine stall still surfaces as a zero-batch
    // DOUBLE window, now labeled by the retry line.
    // the 6th element is the window that actually produced the run's
    // numbers (ADVICE r13: a zero-batch retry doubles it, and without
    // the per-run record the artifact's input_rows/batches were
    // silently incomparable round-over-round — the retry lived only
    // on stderr)
    def measure(name: String, mk: () => DataFrame)
    : (Double, Long, Long, Long, Double, Int) = {
      val first = measureOnce(name, mk, durSec)
      if (first._3 > 0L) first
      else {
        System.err.println(s"[streambench] $name: 0 batches in a " +
          s"$durSec s window (measured nothing) — retrying at " +
          s"${durSec * 2} s")
        measureOnce(name, mk, durSec * 2)
      }
    }

    def measureOnce(name: String, mk: () => DataFrame, winSec: Int)
    : (Double, Long, Long, Long, Double, Int) = {
      // session_window aggregations only support Append on streams;
      // everything else here emits per-key updates
      val mode =
        if (name == "session_paths")
          org.apache.spark.sql.streaming.OutputMode.Append()
        else org.apache.spark.sql.streaming.OutputMode.Update()
      val q = mk().writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"sb_$name").toString)
        .start()
      // The timed window OPENS after the first batch commits (VERDICT
      // r10 item 2 — "report build-excluded cold throughput"): batch 0
      // pays query startup, the per-query broadcast build of any
      // static index, and state-store open — one-time costs a real
      // ingest pays once per restart, not per row. startup_sec reports
      // that cost separately so nothing is hidden.
      val w0 = System.nanoTime()
      while (q.recentProgress.isEmpty &&
          (System.nanoTime() - w0) < 120e9 && q.isActive)
        Thread.sleep(50)
      val skip = q.recentProgress.map(_.batchId).toSet
      val startupSec = (System.nanoTime() - w0) / 1e9
      val t0 = System.nanoTime()
      Thread.sleep(winSec * 1000L)
      val allProgs = q.recentProgress.toSeq
      // stop() interrupts any in-flight micro-batch commit; the state
      // stores recover from the checkpoint — noise, not failure
      try { q.stop(); q.awaitTermination() }
      catch { case _: Throwable => () }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val progs = allProgs.filterNot(p => skip(p.batchId))
      val inputRows = progs.map(_.numInputRows).sum
      val batches = progs.size.toLong
      // throughput over the counted batches' PROCESSING time, not the
      // wall window: with ~3 s batches a 12 s window truncates mid-
      // batch (rows uncounted, time counted) and quantization noise
      // swamps the capacity number. Σ triggerExecution is the engine
      // time that actually produced inputRows.
      val procMs = progs.map { p =>
        Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
      }.sum
      // PEAK state size across the WHOLE run incl. batch 0 (watermark
      // eviction can empty the store by the last batch — the peak is
      // the capacity number)
      val stateRows = allProgs
        .filter(p => p.stateOperators != null && p.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val thr =
        if (procMs > 0) inputRows * 1000.0 / procMs
        else inputRows / elapsed
      (thr, inputRows, batches, stateRows, startupSec, winSec)
    }

    def r1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    // Optional local-iteration filter (comma-separated stream names);
    // the round artifact always covers everything.
    val only = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
      .map(_.split(",").toSet)
    // host-load bracket (VERDICT r13 item 5), sampled around the whole
    // measured section
    val hostLoadBefore = HostLoad.loadavg()
    // ---- fixed calibration probe (VERDICT r13 item 6): a null-op
    // rate-source stream — no joins, no state, no shuffle — measured
    // by the same machinery as the real streams. Its throughput moves
    // with the HOST, not with this repo's code, so a round delta can
    // be read both raw and normalized to the probe, and host-drift
    // candidates label themselves instead of costing a binary A/B.
    // skipped on SPARK_GRAFT_STREAM_ONLY subset iterations: the
    // subset artifact never serves as a round baseline, so the probe
    // would cost ~3 measured windows and feed nothing
    val calibration: Seq[(Double, Long, Long, Long, Double, Int)] =
      if (only.isDefined) Nil else {
      val mk = () => rate(2000000)
        .select((col("value") * 2L + 1L).as("v"))
      val w = measure("calibration", mk)
      System.err.println(f"[streambench] calibration warm: " +
        f"${w._1}%.0f rows/s")
      (1 to 2).map { i =>
        val r = measure("calibration", mk)
        System.err.println(
          f"[streambench] calibration run$i: ${r._1}%.0f rows/s")
        r
      }
    }
    // None when the probe was skipped OR measured nothing (a stalled
    // probe's 0.0 must not become an Infinity/NaN denominator in the
    // normalized deltas — the same guard prevBestRate applies to the
    // previous side)
    val calBestOpt = calibration.map(_._1).maxOption.filter(_ > 0.0)
    val results = streams
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, mk) =>
      // one discarded warm run first: a stream's first batches pay
      // codegen/JIT plus the startup backlog, which belongs to neither
      // capacity number (same stance as Bench's sf0.001 warmup pass)
      val w = measure(name, mk)
      System.err.println(f"[streambench] $name warm: ${w._1}%.0f rows/s")
      val runs = (1 to 2).map { i =>
        val r = measure(name, mk)
        System.err.println(f"[streambench] $name run$i: " +
          f"${r._1}%.0f rows/s (${r._2} rows, ${r._3} batches, " +
          f"state ${r._4} rows, startup ${r._5}%.1f s)")
        r
      }
      name -> runs
    }
    // ---- screen index-size decade (VERDICT r12 item 5): the batch
    // dedup family has 100× evidence, but the STREAMING screen's
    // growth axis in production is the standing-corpus INDEX, not the
    // per-batch delta. Scale the index 10× and 30× (disjoint-shingle
    // replicas — the incoming docs replay base-corpus texts, so hit
    // rate and output are CONSTANT while only the index grows) and
    // measure each point under BOTH plans: broadcast-forced and
    // shuffle-forced (`spark.graft.screenBroadcastDocs`) — the flip
    // cost at constant index size, plus each plan's own scaling. The
    // shuffle points exercise the r13 non-broadcast gate (index sides
    // ride shuffle_hash; pre-r9 evidence was 1.7–10k rows/s when AQE
    // re-sorted the static index per micro-batch).
    val idxScales = sys.env.getOrElse("SPARK_GRAFT_SCREEN_INDEX_SCALES",
      "10,30").split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
      .filter(_ => only.forall(_.contains("neardup_screen")))
    val idxScaleField = if (idxScales.isEmpty) "" else {
      val entries = idxScales.map { n =>
        // track the ids this decade's checkpoints persist so the
        // blocks can be DROPPED before the next decade — without the
        // sweep the 30× points would run with the 10× index (and its
        // streams' checkpoints) still resident, competing for the
        // executor memory the scaling numbers are supposed to measure
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val scaled = (0 until n).map { k =>
          val d = corpusDocs.withColumn("doc_id",
            col("doc_id") + lit(k * ScaleStress.IdOffset))
          if (k == 0) d
          else d.withColumn("text", expr("array_join(transform(" +
            s"split(text, ' '), t -> concat(t, '_r$k')), ' ')"))
        }.reduce(_ unionByName _).localCheckpoint()
        val idxDocs = scaled.count()
        def point(plan: String, bcastConf: String): String = {
          spark.conf.set("spark.graft.screenBroadcastDocs", bcastConf)
          // a FORCED plan point must force both bounds: the screen's
          // broadcast gate is also byte-capped, and at a large-enough
          // index the default 2 GiB cap would silently flip the
          // "bcast" point onto the shuffle plan, recording shuffle
          // numbers under the bcast label
          spark.conf.set("spark.graft.screenBroadcastBytes",
            if (bcastConf == "0") "0" else Long.MaxValue.toString)
          try {
            // discarded warm run, same stance as the main streams: the
            // first batches pay codegen/JIT, which belongs to neither
            // plan's capacity number (each plan shape compiles its own
            // stages, so each point warms separately)
            val w = measure(s"screen_idx${n}x_$plan", () =>
              graft.mining.SetSimilarity.screenAgainstIndex(
                rateCorpusDocs(40000), scaled, "10 minutes"))
            System.err.println(f"[streambench] screen idx${n}x " +
              f"$plan warm: ${w._1}%.0f rows/s")
            val runs = (1 to 2).map { i =>
              val r = measure(s"screen_idx${n}x_$plan", () =>
                graft.mining.SetSimilarity.screenAgainstIndex(
                  rateCorpusDocs(40000), scaled, "10 minutes"))
              System.err.println(f"[streambench] screen idx${n}x " +
                f"$plan run$i: ${r._1}%.0f rows/s (state ${r._4} rows, " +
                f"startup ${r._5}%.1f s)")
              r
            }
            s""""$plan":{"rows_per_sec":[${runs.map(r => r1(r._1))
              .mkString(",")}],"state_rows":[${runs.map(_._4)
              .mkString(",")}],"startup_sec":[${runs.map(r => r1(r._5))
              .mkString(",")}],"window_sec":[${runs.map(_._6)
              .mkString(",")}]}"""
          } finally {
            spark.conf.unset("spark.graft.screenBroadcastDocs")
            spark.conf.unset("spark.graft.screenBroadcastBytes")
          }
        }
        val bc = point("bcast", "10000000")
        val sh = point("shuffle", "0")
        val keep = graft.Memo.liveIds(spark)
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !before(id) && !keep(id) }
          .values.foreach(_.unpersist(blocking = false))
        s""""${n}x":{"index_docs":$idxDocs,$bc,$sh}"""
      }
      s""","screen_index_scale":{${entries.mkString(",")}}"""
    }
    val js = results.map { case (name, runs) =>
      s""""$name":{"rows_per_sec":[${runs.map(r => r1(r._1)).mkString(",")}],""" +
        s""""input_rows":[${runs.map(_._2).mkString(",")}],""" +
        s""""batches":[${runs.map(_._3).mkString(",")}],""" +
        s""""state_rows":[${runs.map(_._4).mkString(",")}],""" +
        s""""startup_sec":[${runs.map(r => r1(r._5)).mkString(",")}],""" +
        s""""window_sec":[${runs.map(_._6).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    // Per-stream round-over-round delta (VERDICT r10 item 5): compare
    // this round's best run against the previous round's artifact so a
    // throughput regression is one glance, not a two-file diff. The
    // previous file is this program's own output — a regex over the
    // rows_per_sec arrays is format-stable.
    val roundN = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt)
    // Deltas are only meaningful when BOTH rounds used the same
    // throughput accounting (ADVICE r11: r11 switched to
    // processing-time/excludes-first-batch, so an unguarded r10→r11
    // delta compared accounting regimes, not engines — ingest_recs
    // printed +398%). The marker is this program's own
    // `"excludes_first_batch":true` field; a previous artifact without
    // it gets a `not comparable` note instead of numbers. prevBest ≤ 0
    // (zero-batch run) is skipped too — the division would emit
    // Infinity/NaN and break the JSON.
    val deltaField = roundN.map { r =>
      // Baseline: the previous round's stamped copy; when that run
      // lacked SPARK_GRAFT_ROUND (r14 did — the copy was recovered by
      // hand from the sha-stamped STREAMBENCH.json), fall back to the
      // tree's own STREAMBENCH.json, still on disk from the previous
      // run at this point (the Bench bench_queries.json discipline).
      // A fallback wrapping THIS commit is refused — self-comparison.
      val stamped =
        java.nio.file.Paths.get(f"STREAMBENCH_r${r - 1}%02d.json")
      val prevPath =
        if (java.nio.file.Files.exists(stamped)) Some(stamped)
        else {
          val own = java.nio.file.Paths.get("STREAMBENCH.json")
          if (!java.nio.file.Files.exists(own)) None
          else {
            val sha = "\"generated_at_sha\":\"([^\"]+)\"".r
              .findFirstMatchIn(new String(
                java.nio.file.Files.readAllBytes(own), "UTF-8"))
              .map(_.group(1))
            // refuse on a matching sha, when this run's own sha is
            // unresolvable, AND when the fallback carries no sha at
            // all (ADVICE r15: an unstamped/corrupt file equally
            // cannot be proven to predate this commit — accepting it
            // as "…@unstamped" was the one hole in the refusal) —
            // none of these can rule out a 0%-delta self-comparison
            if (GitStamp.sha == "unknown" || sha.isEmpty ||
                sha.contains(GitStamp.sha)) {
              System.err.println("[streambench] no stamped baseline " +
                "and STREAMBENCH.json cannot be proven to predate " +
                s"this commit (its sha ${sha.getOrElse("absent")}, " +
                s"ours ${GitStamp.sha}) — refused as a possible " +
                "self-comparison")
              None
            } else {
              System.err.println(s"[streambench] r${r - 1} stamped " +
                "artifact absent — falling back to the tree's own " +
                "STREAMBENCH.json as baseline")
              Some(own)
            }
          }
        }
      if (prevPath.isEmpty) ""
      else {
        val prevTxt = new String(
          java.nio.file.Files.readAllBytes(prevPath.get), "UTF-8")
        if (!sameAccounting(prevTxt)) {
          System.err.println(s"[streambench] r${r - 1} artifact uses a " +
            "different accounting — deltas not comparable, omitted")
          // type-stable (ADVICE r12): the pct field is an OBJECT or
          // absent, never a string — the explanation rides its own key
          s""","delta_vs_prev_round_note":"not comparable: r${r - 1} """ +
            s"""artifact predates processing-time accounting""""
        } else {
          // calibration-normalized reading (VERDICT r13 item 6): the
          // probe's own round delta is pure host; dividing each
          // stream's rate by its round's probe rate before comparing
          // cancels the host term, so a raw "regression" whose
          // normalized delta is quiet labels itself a host-drift
          // candidate instead of costing a binary A/B
          // normalization needs BOTH rounds' probes: the previous
          // artifact's field (absent before r14) and a non-stalled
          // probe this run
          val prevCal = prevCalibration(prevTxt)
          val calPct = for (cb <- calBestOpt; pc <- prevCal)
            yield (cb - pc) / pc * 100.0
          calPct.foreach(p => System.err.println(
            f"[streambench] calibration probe Δ r${r - 1}→r$r: " +
              f"$p%+.0f%% (pure host term)"))
          val normParts = scala.collection.mutable.ListBuffer[String]()
          val parts = results.flatMap { case (name, runs) =>
            prevBestRate(prevTxt, name).map { prevBest =>
              val curBest = runs.map(_._1).max
              val (pct, norm, tag) =
                deltaLabel(curBest, prevBest, calBestOpt, prevCal)
              norm.foreach(p => normParts += s""""$name":${r1(p)}""")
              System.err.println(
                f"[streambench] Δ r${r - 1}→r$r $name: " +
                  f"$prevBest%.0f → $curBest%.0f rows/s ($pct%+.0f%%" +
                  norm.map(n => f", normalized $n%+.0f%%").getOrElse("") +
                  s")$tag")
              s""""$name":${r1(pct)}"""
            }
          }
          val calField = calPct
            .map(p => s""","calibration_delta_pct":${r1(p)}""")
            .getOrElse("")
          val normField =
            if (normParts.isEmpty) ""
            else s""","delta_vs_prev_round_norm_pct":${
              normParts.mkString("{", ",", "}")}"""
          // provenance of the numbers above: WHICH file (and whose
          // commit) served as the baseline — a fallback several
          // rounds old must say so on the artifact, like Bench's
          // prev_total_source
          val baseSha = "\"generated_at_sha\":\"([^\"]+)\"".r
            .findFirstMatchIn(prevTxt).map(_.group(1))
            .getOrElse("unstamped")
          val baseField = s""","delta_baseline":"${
            prevPath.get.getFileName}@$baseSha""""
          if (parts.isEmpty) ""
          else s""","delta_vs_prev_round_pct":${
            parts.mkString("{", ",", "}")}$normField$calField$baseField"""
        }
      }
    }.getOrElse("")
    val subsetField =
      if (only.isDefined) s""","stream_only":true""" else ""
    val hostFields =
      HostLoad.jsonFields(hostLoadBefore, HostLoad.loadavg())
    // absent (not an empty array) when the probe was skipped, so a
    // later round's prevCalibration cleanly returns None
    val calField =
      if (calibration.isEmpty) ""
      else s""""calibration_rows_per_sec":${
        calibration.map(r => r1(r._1)).mkString("[", ",", "]")},"""
    val line = s"""{"duration_sec_per_run":$durSec,"runs":2,"warm_runs":1,"cpus":$cpus,"excludes_first_batch":true,"generated_at_sha":"${GitStamp.sha}",$calField$hostFields$subsetField,"streams":$js$deltaField$idxScaleField}"""
    // a STREAM_ONLY subset run must not clobber the round artifact
    // (the Bench lesson, ADVICE r12: a subset iteration quietly
    // replacing the baseline is how gates stop firing) — it gets its
    // own file and never the round-stamped copy
    java.nio.file.Files.write(java.nio.file.Paths.get(
        if (only.isDefined) "STREAMBENCH_subset.json" else "STREAMBENCH.json"),
      (line + "\n").getBytes("UTF-8"))
    // round-over-round trail (VERDICT r9 item 5): a stamped copy per
    // round so streaming-throughput regressions can gate like BENCH's
    if (only.isEmpty) roundN.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"STREAMBENCH_r$r%02d.json"),
        (line + "\n").getBytes("UTF-8"))
    }
    println(line)
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Drop leaked localCheckpoint blocks: the iterative queries
    * (LPA/CC/K-Means/BFR/IVF) localCheckpoint per round and nothing
    * unpersists those RDDs, so over ~150 query executions the block
    * manager fills and later queries degrade 3–8× (q33 measured 40 s
    * polluted vs 6 s clean). Unpersisting between queries keeps each
    * timing independent of session history. Memo-owned blocks are
    * EXCLUDED: they back the shared recommender artifacts (bounded,
    * dimension-sized), and localCheckpoint cut their lineage — an
    * unpersisted memo block would be unrecoverable, and re-measuring
    * the shared-artifact build per query would mis-state what a real
    * session pays (the artifact reuse IS the design; the first
    * querying pass pays the build). */
  private def dropCheckpoints(spark: SparkSession): Unit = {
    val keep = Memo.liveIds(spark)
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !keep(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  /** Previous round's headline total from a `bench_queries.json` body,
    * or None when it can't serve as a baseline: different SF (a local
    * sf0.01 iteration file must not masquerade as the round baseline),
    * a BENCH_ONLY subset artifact (same masquerade at the round SF),
    * a non-positive/absent total, or malformed content. The value
    * match is anchored on the headline `"metric":"total","value":`
    * prefix so a per-query number can never be mistaken for the
    * total. Unit-tested (CountsSpec) — this string surgery is the one
    * piece of the round-over-round gate that regexes could silently
    * get wrong. */
  private[graft] def parsePrevTotal(
      txt: String, sfDir: String): Option[Double] = {
    // whitespace-tolerant after separators: this program emits compact
    // JSON, but the driver's round artifacts (BENCH_rNN.json, the
    // fallback baseline) re-serialize the same object with ": " spacing
    val sfOk = "\"sf\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
      .exists(_.group(1) == sfDir)
    // a BENCH_ONLY subset artifact covers a handful of queries — its
    // total must never become a full run's baseline
    if (!sfOk || "\"bench_only\":\\s*true".r.findFirstIn(txt).isDefined)
      None
    else "\"metric\":\\s*\"total\",\\s*\"value\":\\s*([0-9.]+)".r
      .findFirstMatchIn(txt)
      .map(_.group(1).toDouble).filter(_ > 0)
  }

  /** Attribution evidence for a ≥10% total move (VERDICT r14 item 1:
    * the gate only LABELED — r14's own flag fired and the headline
    * −13.5% shipped with no same-host A/B). Looks for a
    * `bisect_bench_*.out` artifact in any round directory under
    * `diag/` (the output of
    * tools/bisect_bench.sh, the tool built for exactly this) STRICTLY
    * NEWER than the newest driver round artifact `BENCH_rNN.json` —
    * an old round's bisect cannot attribute a new round's move.
    * Returns the newest qualifying path (repo-relative), or "MISSING":
    * the stamp rides in the artifact next to `total_moved_ge_10pct`,
    * so an unattributed double-digit move is visible on the artifact's
    * face instead of depending on a reader to notice the absence.
    * Unit-tested (CountsSpec) like [[parsePrevTotal]]. */
  private[graft] def attributionFor(root: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    def mtime(p: java.nio.file.Path): Long =
      try java.nio.file.Files.getLastModifiedTime(p).toMillis
      catch { case _: Throwable => 0L }
    def list(dir: java.nio.file.Path, glob: String) =
      try {
        val s = java.nio.file.Files.newDirectoryStream(dir, glob)
        try s.iterator.asScala.toList finally s.close()
      } catch { case _: Throwable => Nil }
    val cutoff = list(root, "BENCH_r*.json").map(mtime)
      .foldLeft(0L)(math.max)
    list(root.resolve("diag"), "*")
      .filter(java.nio.file.Files.isDirectory(_))
      .flatMap(d => list(d, "bisect_bench_*.out"))
      .filter(p => mtime(p) > cutoff)
      .sortBy(p => (mtime(p), p.toString)).lastOption
      .map(p => root.relativize(p).toString)
      .getOrElse("MISSING")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // same stance as Verify: bench what the gate verifies — the
      // sessions this repo itself builds opt into the kernel rewrite
      .config("spark.graft.autoKernel", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest SF: compiles each query's codegen
    // (same generated classes — plans differ only in file paths) and JITs
    // the hot paths, so the timed pass measures steady-state engine
    // throughput rather than one-time Janino/JIT costs. Cold-start totals
    // are reported alongside for transparency.
    val warmDir = "/root/testdata/sf0.001"
    // host-load bracket (VERDICT r13 item 5): sampled before warmup
    // and after the last timed pass, written into the artifact so a
    // moved total carries its own host-contention evidence
    val hostLoadBefore = HostLoad.loadavg()
    val t0 = System.nanoTime()
    // Warmup runs concurrently: per-plan first-run cost is dominated by
    // driver-side compile/JIT, so overlapping them collapses wall time
    // (Spark's scheduler interleaves the tiny sf0.001 jobs fine).
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      // Bounded pool: 8-way overlap hides per-plan compile latency
      // without thrashing the scheduler (42-way made every job queue
      // behind every other and warmup wall time ballooned).
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val fs = SparkEntry.queries.toSeq.map { case (name, fn) =>
        Future {
          val t = System.nanoTime()
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
          System.err.println(
            f"[bench] warmup $name: ${(System.nanoTime() - t) / 1e9}%.1f s")
        }
      }
      // a warmup overrun must not kill the bench — timed runs still
      // produce the JSON line (first runs just pay the residual JIT)
      try Await.result(Future.sequence(fs), 10.minutes)
      catch { case _: java.util.concurrent.TimeoutException =>
        // kill the stragglers too — otherwise they keep computing and
        // contend with the timed runs on the same cores
        spark.sparkContext.cancelAllJobs()
        System.err.println("[bench] warmup timed out; continuing") }
      // shutdownNow, not shutdown: graceful shutdown still EXECUTES the
      // queued warmup futures, which would launch fresh Spark jobs
      // concurrently with the timed rounds after a timeout (on the
      // success path the queue is empty and this is equivalent)
      pool.shutdownNow()
      dropCheckpoints(spark)
    }
    val warmupSec = (System.nanoTime() - t0) / 1e9
    // Three timed rounds, INTERLEAVED (full pass over every query, then
    // repeat), min per query: the host shows external interference in
    // multi-minute windows (identical plans vary 1 s ↔ 80 s). Two
    // back-to-back runs of one query both land inside a bad window;
    // interleaving separates a query's samples by a whole pass, so the
    // min dodges any window shorter than ~1/3 of the bench.
    // Global budget: a full pass is mandatory (every query gets a
    // number); extra passes only run while inside the budget, so a
    // noise-stretched bench degrades to fewer samples instead of
    // overrunning the caller's timeout (round 2 recorded rc=124 — a
    // killed bench reports nothing at all).
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "420").toDouble
    // Optional local-iteration filter (comma-separated query names);
    // the driver never sets it, so driver runs bench everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val names = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
    def inBudget: Boolean = (System.nanoTime() - t0) / 1e9 < budgetSec
    // Spread = second-smallest / smallest sample: "is the min
    // reproducible?" — the question that decides whether the reported
    // number is trustworthy. (max/min would chase queries forever
    // whose FIRST run paid a one-time cost — e.g. the shared-artifact
    // build — even after two consistent lows exist.)
    def spreadOf(name: String): Double = {
      val runs = samples.getOrElse(name, Nil)
      if (runs.size < 2) Double.PositiveInfinity
      else {
        val sorted = runs.sorted
        sorted(1) / math.max(sorted.head, 1e-3)
      }
    }
    // Spread above which a query's timing is treated
    // as noise-contaminated and re-sampled by the adaptive passes —
    // the host shows external interference in multi-minute windows
    // (identical plans vary 1 s ↔ 80 s), and ADVICE r7 flagged that a
    // real 1.5× regression was indistinguishable from that noise.
    val SpreadThresh = 1.5
    var round = 1
    var fullPasses = 0
    while (round == 1 || (round <= 6 && inBudget)) {
      // Passes 1–2 run EVERY query, interleaved (a query's two samples
      // are separated by a whole pass, so the min dodges any noise
      // window shorter than ~half the bench). Passes 3+ are ADAPTIVE:
      // only queries that still look noisy — fewer than 2 samples
      // (budget cut pass 2 short) or spread > SpreadThresh — so the
      // remaining budget buys variance where variance exists instead
      // of a third sample of a stable 0.2 s query.
      val pass = names.filter { case (n, _) =>
        round <= 2 || samples.getOrElse(n, Nil).size < 2 ||
          spreadOf(n) > SpreadThresh
      }
      if (pass.isEmpty) { round = 7 } // all stable — stop early
      else {
        if (round >= 3) System.err.println(
          s"[bench] adaptive pass $round: ${pass.size} noisy queries")
        val it = pass.iterator
        while (it.hasNext && (round == 1 || inBudget)) {
          val (name, fn) = it.next()
          dropCheckpoints(spark) // session hygiene OUTSIDE the timed window
          val t = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          val sec = (System.nanoTime() - t) / 1e9
          samples(name) = sec :: samples.getOrElse(name, Nil)
          System.err.println(f"[bench] r$round $name: $sec%.1f s")
        }
        if (!it.hasNext && pass.size == names.size) fullPasses += 1
        round += 1
      }
    }
    val hostLoadAfter = HostLoad.loadavg()
    val results = names.map { case (name, _) =>
      val runs = samples(name).reverse
      System.err.println(f"[bench] $name: ${runs.min}%.1f s (runs: " +
        runs.map(s => f"$s%.1f").mkString(", ") + ")")
      name -> runs.min
    }.toMap
    // ms precision — sub-ms digits are noise and the per-query map must
    // fit the caller's 2000-char output-tail window (round 5's 9-dp
    // line overflowed it and the driver recorded parsed: null).
    // Locale.ROOT: the f-interpolator honors the JVM default locale and
    // a comma-decimal locale would emit invalid JSON (ADVICE r6).
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Per-query variance (ADVICE r7): how many samples each min came
    // from and the min-reproducibility spread, so a real regression is
    // distinguishable from host noise when reading the artifact.
    val residualNoisy = names.count { case (n, _) =>
      spreadOf(n) > SpreadThresh }
    val sampleCounts = names.map { case (n, _) =>
      samples.getOrElse(n, Nil).size }
    // Shared-artifact build cost (ADVICE r9): min-of-samples hides the
    // Memo build inside discarded first samples — surface it so
    // q87/q89/q92 totals stay comparable across memo changes. Keyed by
    // artifact (rec_ui/rec_cf/rec_cn), timed-SF entries only.
    val memoByArtifact = Memo.buildSeconds(spark).toSeq.collect {
      case (k, v) if k.startsWith(s"$sfDir#") =>
        k.substring(sfDir.length + 1) -> v
    }.toMap
    val memoSec = memoByArtifact.toSeq
      .map { case (a, v) => s"\"$a\":${r3(v)}" }
      .sorted.mkString("{", ",", "}")
    // Artifact→query mapping (VERDICT r10 item 6): a reader shouldn't
    // need the memo's artifact naming to reconstruct what a COLD
    // session pays per recommender query — warm (min-of-samples) +
    // the builds that query triggers when nothing is memoized yet.
    val artifactsFor = Seq(
      "q87_item_cf" -> Seq("rec_ui", "rec_cf"),
      "q89_content_rec" -> Seq("rec_ui", "rec_cn"),
      "q92_hybrid_rec" -> Seq("rec_ui", "rec_cf", "rec_cn"))
    val memoByQuery = artifactsFor.flatMap { case (q, arts) =>
      results.get(q).map { warm =>
        val b = arts.map(a => memoByArtifact.getOrElse(a, 0.0)).sum
        s"\"$q\":{\"warm\":${r3(warm)},\"build\":${r3(b)}," +
          s"\"cold_total\":${r3(warm + b)}}"
      }
    }.mkString("{", ",", "}")
    // Round-over-round total gate (VERDICT r11 item 5): r11's headline
    // total moved +15.7% and nothing tripped — the repo gated
    // correctness, plans, state and slopes but never the number the
    // judge reads first. The PREVIOUS run's total comes from this
    // program's own artifact (bench_queries.json, still on disk from
    // the last round when the driver runs in the repo root), read
    // BEFORE it is overwritten below; the delta only reports when the
    // previous run covered the same SF (a local sf0.01 iteration file
    // must not masquerade as a baseline).
    // A BENCH_ONLY subset run can't participate on either side of the
    // gate: its total covers a handful of queries (comparing it to a
    // full run is meaningless) and its artifact must not become the
    // next full run's baseline — same masquerade risk as the
    // different-SF case, and easier to hit (subset iterations run at
    // the round SF).
    val isSubset = only.isDefined
    // Baseline resolution: the tree's own last full-run artifact
    // first; when it is absent (a fresh working tree carries no local
    // artifact — seen live this round: the gate silently skipped) fall
    // back to the NEWEST driver-written round artifact BENCH_rNN.json,
    // whose `parsed` object holds the same compact line. Either way a
    // missing/refused baseline says so on stderr — the gate must never
    // skip silently (ADVICE r12).
    val prevTotal: Option[(Double, String)] = if (isSubset) None else {
      def tryFile(p: java.nio.file.Path,
          refuseSelfSha: Boolean = false): Option[(Double, String)] =
        try {
          if (!java.nio.file.Files.exists(p)) None
          else {
            val txt =
              new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
            // A FALLBACK baseline generated from the SAME commit as
            // this run turns the round-over-round gate into a
            // self-comparison that trivially passes (ADVICE r13): in
            // a fresh tree the newest BENCH_rNN.json can wrap this
            // very HEAD's numbers. Artifacts carry their generating
            // sha from r14 on — refuse a same-sha fallback and keep
            // walking to older rounds. (The tree's OWN
            // bench_queries.json is exempt: same-sha local iteration
            // deltas are the point of that baseline.)
            val sha = "\"sha\":\\s*\"([^\"]+)\"".r
              .findFirstMatchIn(txt).map(_.group(1))
            if (refuseSelfSha && GitStamp.sha != "unknown" &&
                sha.contains(GitStamp.sha)) {
              System.err.println(s"[bench] fallback baseline " +
                s"${p.getFileName} was generated from this same " +
                s"commit (${GitStamp.sha}) — refused as a " +
                "self-comparison; trying older rounds")
              None
            } else parsePrevTotal(txt, sfDir)
              .map((_, p.getFileName.toString))
          }
        } catch { case _: Throwable => None }
      val ownPath = java.nio.file.Paths.get("bench_queries.json")
      val own = tryFile(ownPath)
      if (own.isEmpty && java.nio.file.Files.exists(ownPath))
        System.err.println(
          "[bench] previous artifact not usable as baseline " +
            "(bench_only subset / different sf / malformed) — " +
            "trying round artifacts")
      val resolved = own.orElse {
        import scala.jdk.CollectionConverters._
        val roundNum = "BENCH_r(\\d+)\\.json".r
        val rounds = try {
          val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
          // numeric sort: lexicographic misorders across digit-width
          // changes (r100 would sort between r10 and r11)
          try stream.iterator.asScala.flatMap { p =>
            p.getFileName.toString match {
              case roundNum(n) => Some((n.toInt, p))
              case _ => None
            }
          }.toList.sortBy(-_._1).map(_._2)
          finally stream.close()
        } catch { case _: Throwable => Nil }
        rounds.view.flatMap(tryFile(_, refuseSelfSha = true)).headOption
      }
      if (resolved.isEmpty) System.err.println(
        "[bench] no usable baseline (bench_queries.json and " +
          "BENCH_r*.json all absent/refused) — delta omitted")
      resolved
    }
    val totalDelta = prevTotal.map { case (pt, src) =>
      val pct = (total - pt) / pt * 100.0
      val moved = math.abs(pct) >= 10.0
      if (moved) System.err.println(
        f"[bench] TOTAL MOVED $pct%+.1f%% vs previous run " +
          f"($pt%.1f s -> $total%.1f s, baseline $src) — attribute " +
          "before shipping (this run's host_load_1m " +
          f"before/after: $hostLoadBefore%.1f/$hostLoadAfter%.1f " +
          s"on ${HostLoad.cpus} cpus, in the artifact; an elevated " +
          "load column is host drift on its face, a quiet one earns " +
          "tools/bisect_bench.sh)")
      // the flag now carries its own evidence pointer (VERDICT r14
      // item 1): a fresh diag/*/bisect_bench_*.out, or "MISSING" —
      // stamped, not refused, so the driver's artifact capture never
      // loses the round's numbers, but an unattributed move is
      // condemned on the artifact's face
      val attribution = if (!moved) "" else {
        val a = attributionFor(java.nio.file.Paths.get("."))
        if (a == "MISSING") System.err.println(
          "[bench] ATTRIBUTION MISSING: the >=10% gate fired and no " +
            "diag/*/bisect_bench_*.out newer than the last round " +
            "artifact exists — run tools/bisect_bench.sh " +
            "<prev-round-commit> and commit its output before " +
            "shipping this number")
        // recency is the qualifier but CONTENT is the receipt: state
        // which binaries the stamped bisect actually compared, so a
        // stale same-round bisect paired with a different move is
        // visible to the reader instead of laundered by its mtime
        val compared = if (a == "MISSING") "" else {
          try {
            val txt = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(a)), "UTF-8")
            val m = "\\[bisect\\] prev (\\w+): runs".r
              .findFirstMatchIn(txt).map(_.group(1))
            val c = "\\[bisect\\] cur  (\\w+): runs".r
              .findFirstMatchIn(txt).map(_.group(1))
            (for (p <- m; q <- c) yield
              s""","attribution_compared":"prev $p vs cur $q"""")
              .getOrElse("")
          } catch { case _: Throwable => "" }
        }
        s""","attribution":"$a"$compared"""
      }
      s""","prev_total_sec":${r3(pt)},"delta_vs_prev_total_pct":${r3(pct)}""" +
        s""","prev_total_source":"$src"""" +
        (if (moved) s""","total_moved_ge_10pct":true$attribution"""
         else "")
    }.getOrElse("")
    val subsetField = if (isSubset) s""","bench_only":true""" else ""
    val hostFields = HostLoad.jsonFields(hostLoadBefore, hostLoadAfter)
    val full = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"warmup_sf0001_sec":${r3(warmupSec)},"timed_runs":$fullPasses,"samples_min":${if (sampleCounts.isEmpty) 0 else sampleCounts.min},"samples_max":${if (sampleCounts.isEmpty) 0 else sampleCounts.max},"noisy_spread_gt_${SpreadThresh}":$residualNoisy,"memo_build_sec":$memoSec,"memo_build_by_query":$memoByQuery$totalDelta$subsetField,"sha":"${GitStamp.sha}",$hostFields,"agg":"min","interleaved":true,"adaptive_passes":true,"sf":"$sfDir"}"""
    // The driver's tail capture clipped the FRONT of the full line in
    // round 6 (17 of 85 per-query timings lost) — persist the complete
    // per-query map as its own artifact so it survives any stdout
    // truncation. The artifact additionally carries every raw sample
    // and the per-query spread (the stdout line stays compact).
    val sampleJson = names.map { case (n, _) =>
      val runs = samples.getOrElse(n, Nil).reverse
      val spread =
        if (runs.size < 2) "null"
        else { val s = runs.sorted; r3(s(1) / math.max(s.head, 1e-3)) }
      s"\"$n\":{\"min\":${r3(if (runs.isEmpty) -1 else runs.min)}," +
        s"\"spread\":$spread," +
        runs.map(r3).mkString("\"runs\":[", ",", "]}")
    }.mkString("{", ",", "}")
    val artifact = full.dropRight(1) + s""","samples":$sampleJson}"""
    // Subset iterations write to their OWN artifact (ADVICE r12): a
    // BENCH_ONLY run overwriting bench_queries.json destroyed the full
    // run's baseline, silently disabling the next full run's
    // round-over-round gate. parsePrevTotal's bench_only refusal stays
    // as defense-in-depth for pre-split artifacts.
    val artifactPath =
      if (isSubset) "bench_queries_subset.json" else "bench_queries.json"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(artifactPath),
      (artifact + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] $artifactPath write failed: $e") }
    println(full)
    // compact duplicate LAST: even if the full line above is clipped by
    // a bounded tail capture, this one always parses. It carries the
    // subset marker too — the driver's round artifact wraps THIS line,
    // and without "bench_only" a subset total would pass the fallback
    // baseline's refusal check
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"note":"full line above; complete per-query map also in $artifactPath","n_queries":${results.size}$totalDelta$subsetField,"sha":"${GitStamp.sha}",$hostFields,"sf":"$sfDir"}""")
    spark.stop()
  }
}

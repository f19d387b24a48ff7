package graft.mining

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.PlanOnly.CpOps
import graft.functions.Hashing
import graft.ops.Text.{toksExpr, toksSqlExpr}

/** Set-similarity and near-duplicate detection over `documents` — the
  * dedup core of a training-data pipeline, and the Spark-native
  * re-expression of the reference's MinHash+LSH self-join
  * (Assignment3/task1.py:25-99).
  *
  * Three scale regimes, all shuffle-based (no driver collect):
  *  - [[neardupJaccard]]: EXACT all-pairs set-similarity join with
  *    prefix filtering (AllPairs/PPJoin-style) — the candidate set is
  *    provably complete, so results equal the brute-force oracle.
  *  - [[minhashSig]] + [[neardupLsh]]: the reference's banded-minhash
  *    pipeline with deterministic seeds; every step (hash, signature,
  *    band, verify) is reproduced bit-for-bit by the DuckDB oracle.
  *  - [[simhash]]: 32-bit rotation-invariant fingerprints over word
  *    3-shingles; hamming-≤k pairs via the pigeonhole band join
  *    ([[simhashPairs]]), exact for k < bands.
  */
object SetSimilarity {

  /** Spread a small input across the cluster before CPU-heavy per-row
    * work: a few-MB parquet file arrives as ONE scan split, which
    * serializes the tokenize/shingle/hash projections on a single core
    * (q58 measured 5.0 of its 5.8 s inside that one-partition stage at
    * sf0.1). When the scan already has ≥ defaultParallelism splits —
    * any real corpus — this is an exact no-op, so the shuffle cost
    * never appears at scale. */
  private def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Distinct-token sets per document (the similarity universe),
    * ascending-sorted so the merge-intersection kernel (`graft_isize`)
    * applies. Set semantics are order-free, so the sort changes no
    * result (the DuckDB oracle's list_distinct keeps encounter order —
    * only order-insensitive ops consume it there).
    * `docs` is any (doc_id, text) DataFrame — the public `*On` entry
    * points route a caller's own corpus through here. */
  private def tokenSetsOf(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(col("doc_id"),
        sort_array(array_distinct(expr(toksExpr))).as("ts"))

  private def tokenSets(s: SparkSession, d: String): DataFrame =
    tokenSetsOf(documents(s, d))

  private val tokenSetsSql =
    s"SELECT doc_id, list_distinct($toksSqlExpr) AS ts FROM documents"

  /** Exact Jaccard verification of candidate (doc_a, doc_b) pairs.
    * Intersection size via the codegen merge kernel over the sorted
    * sets ([[graft.plans.SortedIntersectSizeExpr]]) — `array_intersect`
    * hash-builds and materializes per row, which was 72 of q24's 76
    * bench seconds over 1.7M candidates at sf0.1. */
  private def verifyExact(cand: DataFrame, toks: DataFrame, tau: Double,
      lookupHint: DataFrame => DataFrame = identity)
  : DataFrame =
    cand
      // sort on the corpus-sized side (cheap), not per candidate pair:
      // the merge kernel needs ascending input whatever the caller fed.
      // `lookupHint` is the caller's volume gate: LSH callers pass a
      // shuffle-hash hint once the candidate stream is pair-mass-scale
      // (sorting millions of rows PER TASK with token arrays attached
      // spilled 75 GiB at the 100× stress); small-candidate callers
      // leave Catalyst's own choice (broadcast) alone.
      .join(lookupHint(toks.select(col("doc_id").as("doc_a"),
        sort_array(col("ts")).as("ts_a"))), "doc_a")
      .join(lookupHint(toks.select(col("doc_id").as("doc_b"),
        sort_array(col("ts")).as("ts_b"))), "doc_b")
      .withColumn("inter", expr("graft_isize(ts_a, ts_b)"))
      .withColumn("j", col("inter").cast("double") /
        (size(col("ts_a")) + size(col("ts_b")) - col("inter")))
      .filter(col("j") >= tau)
      // floor-half-up on the scaled double (identical in both engines;
      // round() diverges at exact .xxxx5 — integer-ratio jaccards land
      // there routinely)
      .select(col("doc_a"), col("doc_b"),
        (floor(col("j") * 1e4 + 0.5) / 1e4).as("jaccard"))

  // ---------------------------------------------------------------- q22
  val JaccardTau = 0.95

  /** General-τ exact set-similarity self-join via prefix filtering
    * (AllPairs): tokens ordered by ascending global document frequency;
    * a pair with J ≥ τ must share a token within the first
    * n − ⌈τ·n⌉ + 1 of each ordering (J ≥ τ ⟹ overlap ≥ ⌈τ·max(n_a,
    * n_b)⌉). Exact at any τ; efficient when token frequencies are
    * skewed (real corpora). Exposed for library use and verified
    * against brute force in SimilaritySpec; q22 itself uses
    * [[neardupJaccard]]'s deletion-neighborhood join, because on THIS
    * synthetic corpus (40-token vocabulary, near-uniform df) every
    * document's "rarest" tokens are shared by most documents and the
    * prefix index degenerates to ~all-pairs (94 s at sf0.1). */
  def prefixFilterJoin(toks: DataFrame, tau: Double): DataFrame = {
    val ranked = toks.select(explode(col("ts")).as("tok"))
      .groupBy("tok").count()
      .select(col("tok"), row_number()
        .over(Window.orderBy(col("count").asc, col("tok").asc)).as("rk"))
    val prefix = toks.select(col("doc_id"), explode(col("ts")).as("tok"))
      .join(broadcast(ranked), "tok")
      .groupBy("doc_id")
      .agg(expr("transform(sort_array(collect_list(struct(rk, tok))), " +
        "x -> x.tok)").as("st"))
      .select(col("doc_id"), expr(
        s"slice(st, 1, size(st) - CAST(ceil($tau * size(st)) AS INT) + 1)")
        .as("prefix"))
    val pa = prefix.select(col("doc_id").as("doc_a"),
      explode(col("prefix")).as("tok"))
    val pb = prefix.select(col("doc_id").as("doc_b"),
      explode(col("prefix")).as("tok"))
    val cand = pa.join(pb, "tok")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyExact(cand, toks, tau)
  }

  /** Set size from which double-deletion signatures are also emitted:
    * the B ⊂ A, |A| = |B|+2 case needs J = (n−2)/n ≥ τ, i.e.
    * n ≥ 2/(1−τ) = 40 at τ = 0.95 — below that, single deletions
    * provably suffice. */
  val DoubleDelMin: Int =
    math.ceil(2 / (1 - JaccardTau)).toInt

  /** q22: exact near-duplicate pairs at Jaccard ≥ 0.95 via the
    * deletion-neighborhood (SymSpell-style) join. J ≥ τ = 0.95 forces
    * |AΔB| ≤ 2 for sets up to ~58 tokens, and each |AΔB| ≤ 2 case is
    * covered by a shared signature: identical sets → full-set hash;
    * |AΔB| = 1 and the equal-size two-diff case → a single-deletion
    * hash; the B ⊂ A, |A| = |B|+2 case → A's double-deletion hash =
    * B's full-set hash (double deletions are emitted only for sets ≥
    * [[DoubleDelMin]], the size below which that case cannot reach τ —
    * zero cost on corpora of short documents). Bucket by signature,
    * verify candidates exactly; candidates ≈ true pairs and the index
    * stays linear in corpus size. */
  def neardupJaccard(s: SparkSession, d: String): DataFrame =
    neardupJaccardOn(documents(s, d)).orderBy(col("doc_a"), col("doc_b"))

  /** q22 over a caller-supplied (doc_id, text) corpus. */
  def neardupJaccardOn(docs: DataFrame): DataFrame = {
    // token sets feed the signature explode AND both verify joins
    val toks = tokenSetsOf(docs).localCheckpoint()
    // XOR set-hash signatures (guide §1.2 step 2 — per-task work):
    // the bucket key for "this set minus k elements" is the XOR of
    // per-token graft_h60 longs with the deleted tokens' hashes
    // XORed back out (self-inverse, so no ANSI overflow — a Long sum
    // of 2⁶⁰-scale hashes throws under Spark 4's ANSI default).
    // The previous form md5-hashed the CONCATENATED remaining set per
    // deletion — O(n) bytes for each of the O(n²) double deletions,
    // O(n³) hashed bytes per document (the whole-query probe charged
    // q22's candidate job 8.4 s to exactly this projection); here each
    // token is md5'd ONCE and every deletion signature is one or two
    // XORs. Equality still holds exactly where the covering argument
    // needs it (equal remaining sets ⟹ equal XOR of token hashes),
    // and an XOR collision — like any 60-bit collision before —
    // can only ADD a candidate that verifyExact
    // then rechecks against exact Jaccard (the oracle is brute force,
    // signature-free). 8-byte join keys as before.
    val del2 =
      "CASE WHEN size(st) >= " + DoubleDelMin + " THEN " +
        "flatten(transform(sequence(1, size(hs) - 1), i -> " +
        "transform(sequence(i + 1, size(hs)), j -> " +
        "tot ^ hs[i - 1] ^ hs[j - 1]))) " +
        "ELSE transform(slice(st, 1, 0), x -> 0L) END"
    val sigs = toks
      .select(col("doc_id"), col("ts").as("st")) // tokenSets pre-sorts
      .withColumn("hs", expr("transform(st, t -> graft_h60(t))"))
      .withColumn("tot",
        expr("aggregate(hs, 0L, (acc, x) -> acc ^ x)"))
      .select(col("doc_id"), explode(expr(
        "concat(array(tot), " +
          "transform(hs, h -> tot ^ h), " +
          del2 + ")"))
        .as("sig"))
    val cand = sigs.select(col("doc_id").as("doc_a"), col("sig"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig")), Seq("sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    verifyExact(cand, toks, JaccardTau)
  }

  val neardupJaccardSql: String =
    s"""WITH t AS ($tokenSetsSql),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        len(list_intersect(a.ts, b.ts)) AS inter,
       |        len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS uni
       |      FROM t a JOIN t b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  floor(CAST(inter AS DOUBLE) / uni * 1e4 + 0.5) / 1e4 AS jaccard
       |FROM p WHERE CAST(inter AS DOUBLE) / uni >= $JaccardTau
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q23
  /** MinHash parameters — reference parity: 32 hash functions, modulus
    * 26189 (Assignment3/task1.py:40-42), deterministic seeds instead of
    * random.randint so the oracle can replay them. */
  val NumHashes = 32
  val MinHashMod = 26189L
  val MinHashSeeds: Seq[(Long, Long)] = Hashing.seeds(NumHashes, salt = 3L)

  /** q23: per-document MinHash signature — sig_i = min over tokens of
    * (a_i·h(tok) + b_i) mod m (SURVEY.md A8). One scan, all 32 mins in a
    * single projection, no shuffle at all. */
  /** `withPayloadBytes` adds a `pb` column (estimated bytes of the
    * doc's token-set row — [[payloadBytesExpr]]) for [[lshEstimate]]'s
    * broadcast byte cap; 8 bytes/row through the checkpoint, pruned
    * out of every join branch. */
  private def sigsOf(docs: DataFrame,
      withPayloadBytes: Boolean = false): DataFrame = {
    // native one-pass kernel (graft.plans.MinHashSigExpr) — bit-identical
    // to the k × array_min(transform(...)) HOF form (PlansSpec asserts
    // it), one array traversal instead of k with no per-hash allocation
    val base = tokenSetsOf(docs)
      .withColumn("xs",
        expr(s"transform(ts, t -> ${Hashing.h31SparkSql("t")})"))
    if (withPayloadBytes)
      base.select(col("doc_id"), expr("graft_minhash(xs)").as("sig"),
        expr(payloadBytesExpr("ts")).as("pb"))
    else base.select(col("doc_id"), expr("graft_minhash(xs)").as("sig"))
  }

  private def sigs0(s: SparkSession, d: String): DataFrame =
    sigsOf(documents(s, d))

  /** Driver-facing form: the signature as a comma-joined string — the
    * external correctness gate hashes result cells with pandas, which
    * cannot hash array columns (ADVICE r02: q23/q43 recorded err).
    * [[sigs0]] keeps the array form for the LSH pipeline. */
  def minhashSig(s: SparkSession, d: String): DataFrame =
    sigs0(s, d)
      .select(col("doc_id"),
        array_join(col("sig").cast("array<string>"), ",").as("sig"))
      .orderBy(col("doc_id"))

  /** q43: same signatures through the native codegen kernel
    * ([[graft.plans.MinHashSigExpr]], registered as `graft_minhash` by
    * GraftExtensions) — one array traversal instead of k; shares q23's
    * oracle because the values are bit-identical. Requires a session
    * built with spark.sql.extensions=graft.plans.GraftExtensions. */
  def minhashSigNative(s: SparkSession, d: String): DataFrame =
    tokenSets(s, d)
      .withColumn("xs",
        expr(s"transform(ts, t -> ${Hashing.h31SparkSql("t")})"))
      .select(col("doc_id"),
        array_join(expr("graft_minhash(xs)").cast("array<string>"), ",")
          .as("sig"))
      .orderBy(col("doc_id"))

  /** The 32 per-seed min expressions as one DuckDB list literal —
    * shared by the token-set (q23/q24) and shingle-set (q58) oracles. */
  private val sigListSql: String = MinHashSeeds.map { case (a, b) =>
    s"list_min(list_transform(xs, x -> ($a * x + $b) % $MinHashMod))"
  }.mkString("[", ", ", "]")

  private val minhashSigSqlInner: String =
    s"""WITH t AS ($tokenSetsSql),
       |x AS (SELECT doc_id,
       |        list_transform(ts, t -> ${Hashing.h31Sql("t")}) AS xs
       |      FROM t)
       |SELECT doc_id, $sigListSql AS sig FROM x""".stripMargin

  val minhashSigSql: String =
    s"""SELECT doc_id, array_to_string(sig, ',') AS sig
       |FROM ($minhashSigSqlInner) ORDER BY doc_id""".stripMargin

  /** q70: pairwise source-overlap estimation from MERGED MinHash
    * signatures — the "how duplicated are my datasets against each
    * other" census a pipeline runs before mixing sources. The minhash
    * of a union is the component-wise min of the parts' signatures,
    * so per-source signatures come from one (source, pos) min
    * aggregate over the per-doc signatures (partial-aggregated
    * map-side; nothing source-level ever sees raw tokens), and the
    * pairwise estimate ĵ = |equal components|/k touches only the
    * sources²-sized signature table. At 100 TB this is the point of
    * sketches: per-source state is k longs regardless of corpus size.
    * floor-half-up rounding: k/32 hits .xxxx5 exactly (32 = 2^5). */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val srcSig = documents(s, d).select(col("doc_id"), col("source"))
      .join(sigsOf(documents(s, d)), "doc_id")
      .select(col("source"), posexplode(col("sig")).as(Seq("pos", "v")))
      .groupBy(col("source"), col("pos"))
      .agg(min(col("v")).as("v"))
    srcSig.as("a")
      .join(srcSig.as("b"),
        col("a.pos") === col("b.pos") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg((floor(
        sum(when(col("a.v") === col("b.v"), 1L).otherwise(0L))
          .cast("double") / NumHashes * 1e4 + 0.5) / 1e4)
        .as("est_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapSql: String =
    s"""WITH s0 AS ($minhashSigSqlInner),
       |m AS (SELECT d.source, g.i, s0.sig[g.i] AS v
       |      FROM s0 JOIN documents d ON d.doc_id = s0.doc_id
       |      CROSS JOIN
       |        (SELECT unnest(generate_series(1, $NumHashes)) AS i) g),
       |g2 AS (SELECT source, i, min(v) AS v FROM m GROUP BY 1, 2)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  floor(CAST(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS DOUBLE)
       |    / $NumHashes * 1e4 + 0.5) / 1e4 AS est_jaccard
       |FROM g2 a JOIN g2 b ON a.i = b.i AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q24
  /** LSH banding: 4 bands × 8 rows, verify τ = 0.95. Deterministic, so
    * the oracle replicates the band join exactly — recall loss vs the
    * exact join (≈1.4% at τ=0.95: 1−(1−τ⁸)⁴) is a property both sides
    * share, not a test tolerance. r=8 is the candidate-count dial: this
    * corpus is globally self-similar (mean pairwise J ≈ 0.7), and at
    * r=4 the bucket join emitted nearly all 12.5M pairs at sf0.1
    * (257 s); τ⁸ cuts the J≈0.7 mass ~4× while keeping J≥0.95 pairs. */
  val LshBands = 4
  val LshRows = 8
  val LshVerifyTau = 0.95

  /** Candidates must agree on ≥ 28 of 32 signature positions before the
    * exact verify — a deterministic second-stage filter the oracle
    * replays. The corpus's J≈0.7 mass survives banding (≈3M candidate
    * pairs at sf0.1) but almost never reaches 28/32 agreement, while
    * J ≥ 0.95 pairs pass with P ≈ 0.97; this cuts the expensive
    * token-array verify join ~30×. */
  val LshMinSigMatches = 28

  /** q24: banded-LSH near-dup pairs — signature → band buckets →
    * bucket self-join (sig carried through) → signature-agreement
    * pre-filter → exact Jaccard verify ≥ 0.95. The Spark-native reshape
    * of the reference's split_by_bands + candidate_pair flatMap
    * (Assignment3/task1.py:64-99): explode to (band#, band-sig) keys,
    * shuffle groups the buckets, and the verify join replaces the
    * driver-side dict lookup (Assignment3/task1.py:84-88). */
  /** Banded-LSH candidate pairs over a (doc_id, sig) table: explode to
    * (band#, band-key) buckets, id-only bucket self-join, dedup, then
    * the signature-agreement pre-filter on the distinct pairs.
    *
    * The bucket self-join carries ONLY ids: on a self-similar corpus
    * it emits millions of matches, and carrying both 32-long
    * signatures through that join shuffled ~0.5 KB/row (q24 was the
    * bench's slowest query). Ids are deduped first, then the two
    * signature lookups run on the much smaller distinct-pair set —
    * broadcast joins here (the sig table is corpus-sized, not
    * pair-sized; at larger scale Catalyst falls back to shuffle join). */
  /** The banded h60 keys of a signature column as one explodable
    * array expression — shared by the batch LSH self-join and the
    * streaming screen. */
  private def bandStructsExpr(nBands: Int, nRows: Int): String = {
    val structs = (1 to nBands).map { i =>
      val elems = (1 to nRows)
        .map(r => s"CAST(element_at(sig, ${(i - 1) * nRows + r}) AS STRING)")
        .mkString(", ")
      s"named_struct('band', $i, 'key', " +
        s"${Hashing.h60SparkSql(s"concat_ws(',', $elems)")})"
    }.mkString(", ")
    s"array($structs)"
  }

  /** True when the session asked for plan-only construction
    * (`spark.graft.planOnly` — set by ExplainDump): cardinality
    * estimates are skipped (volume gates take their below-guard
    * branch, the proven plan at every oracle SF) so building a
    * DataFrame runs ZERO cluster jobs. Never set by Verify/Bench. */
  private def planOnly(df: DataFrame): Boolean = graft.PlanOnly(df)

  /** Exact volume-gate inputs for [[lshCandidates]]: the corpus size,
    * the EXACT pre-distinct band-bucket pair count Σ n·(n−1)/2, and
    * the measured verify-table payload bytes (token/shingle arrays —
    * what a forced broadcast would actually ship; 0 = unmeasured,
    * treated as small: the spec seam for count-axis tests, never a
    * library path — [[lshEstimate]] always measures). */
  private[graft] case class LshEst(nDocs: Long, candEst: Long,
      payloadBytes: Long = 0L)

  /** Up to this many docs the verify-lookup side tables (signatures,
    * token/shingle sets) are FORCED broadcast when the candidate
    * stream is pair-mass — same payload class and threshold as
    * [[ScreenBroadcastDocsDefault]] (~150 MB of sigs + sets at the
    * boundary). Past it the lookups ride shuffle-hash instead. */
  val LshLookupBroadcastDocs = 200000L

  /** Byte cap on the same forced broadcast: the doc-count bound alone
    * is a proxy calibrated on THIS corpus's ~1 KB documents — a
    * sub-200k-doc corpus of LARGE documents (web pages run 50 KB+)
    * would sail past Spark's 8 GiB broadcast hard limit and kill the
    * job (or the driver) long before the count bound fired, where the
    * pre-gate plan merely spilled. [[lshEstimate]] measures the
    * verify table's actual array payload in the same single aggregate
    * job; the mid-regime broadcast fires only when BOTH bounds hold,
    * otherwise the lookups ride shuffle-hash (correct at any payload:
    * the index is the per-task build map, the pair stream probes
    * unsorted). 2 GiB: 4× the calibrated boundary payload, a quarter
    * of the hard limit. */
  val LshLookupBroadcastBytes = 2L << 30

  /** Estimated in-memory bytes of a verify-table set column `c`
    * (ascending string arrays): UTF-8 payload + per-element and
    * per-row overhead. Order-of-magnitude honest — the consumers
    * compare it against the 2 GiB [[LshLookupBroadcastBytes]] cap,
    * they don't budget with it. */
  private def payloadBytesExpr(c: String): String =
    s"aggregate($c, 64L, (a, x) -> a + octet_length(x) + 16L)"

  /** Spill guard for the (doc_a, doc_b) candidate dedup — two longs
    * per row, ~48 B of aggregate state per entry, an order of
    * magnitude narrower than the CF rows
    * [[Recommend.SpillGuardRowsPerTask]] was measured on. Bracketed
    * by measured endpoints on the same dedup: 5.0M rows/task ran
    * fully in memory at the 30× corpus (zero spill, stock plan,
    * diag/r12/q24probe_30x.out) while 16.7M rows/task spilled 30 GiB
    * at 100× (diag/r12/q24probe_100x.out); the midpoint keeps the
    * proven-stock regime stock and re-sizes well before the measured
    * spill point. */
  val PairDedupGuardRowsPerTask = 8000000L

  /** Compute [[LshEst]] with ONE aggregate job over the band table
    * (nDocs·nBands rows, never pair-scale): the band explode emits
    * exactly nBands rows per doc, so Σn over buckets recovers nDocs
    * and no separate count job is needed (r12 ran two jobs here —
    * the round's only bench regression, q58 +30%). Registered
    * entries memoize the result per (session, dataset) via
    * [[graft.Memo.scalarOf]] — the production analogue of a cached
    * index statistic. Under plan-only construction ([[planOnly]])
    * returns the zero estimate joblessly. */
  private[graft] def lshEstimate(sigTable: DataFrame, nBands: Int,
      nRows: Int): LshEst = {
    if (planOnly(sigTable)) return LshEst(0L, 0L)
    // a `pb` column (payload bytes, [[sigsOf]]) rides the same explode:
    // each doc contributes nBands rows carrying its pb, so Σpb/nBands
    // recovers the verify table's total bytes — still one job
    val pbCol =
      if (sigTable.columns.contains("pb")) col("pb") else lit(0L)
    val r = sigTable
      .select(explode(expr(bandStructsExpr(nBands, nRows))).as("b"),
        pbCol.as("pb"))
      .groupBy(col("b.band"), col("b.key"))
      .agg(count(lit(1)).as("n"), sum(col("pb")).as("pbs"))
      .agg(sum(col("n")).cast("long"),
        sum(col("n") * (col("n") - lit(1))).cast("long"),
        sum(col("pbs")).cast("long"))
      .first()
    if (r.isNullAt(0)) LshEst(0L, 0L)
    else LshEst(r.getLong(0) / nBands, r.getLong(1) / 2,
      (if (r.isNullAt(2)) 0L else r.getLong(2)) / nBands)
  }

  /** Returns the candidate pairs AND the volume-gated lookup hint the
    * caller must apply to its own verify-join doc-table sides. Plan
    * construction is LAZY — `est` comes in like `simsPlan`'s
    * `pairsEst` does (VERDICT r12 item 1/3), which is also what lets
    * SimilaritySpec pin BOTH gate branches' physical plans. */
  private[graft] def lshCandidates(sigTable: DataFrame, nBands: Int,
      nRows: Int, minMatches: Int, est: LshEst)
  : (DataFrame, DataFrame => DataFrame) = {
    // band key = h60 of the comma-joined row values, not an r-long
    // struct: the bucket self-join emits millions of pairs out of hot
    // buckets, and comparing one long per advance beats an r-field
    // struct comparator. A key collision merges two buckets — extra
    // CANDIDATES only, which the agreement filter + exact verify
    // remove; the oracle applies the same hash, so both engines see
    // identical buckets at every scale.
    val bands0 = sigTable
      .select(col("doc_id"),
        explode(expr(bandStructsExpr(nBands, nRows))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    // Volume gate — the CF chain's knob (Recommend.sizedByCardinality)
    // applied to this family's one corpus-explosive shuffle: the
    // candidate dedup. The band table itself is small (nDocs·nBands
    // rows — its self-join BROADCASTS well past 30×, per-node probe
    // diag/r12/q24probe_30x.out), but its self-join's output is the
    // corpus's pair mass: 160.7M raw pairs / 98.6M distinct at 30×,
    // ~3.3× that at 100× — hash-aggregated at the session's fixed
    // width that is ~10M groups per task, the exact memory-starved
    // dedup shape that spilled 30 GiB/stage in the pre-r11 CF chain
    // (and measured here: q24's 30×→100× decade ran ~6× super-linear
    // per replica while 1×→30× stayed linear). Below the guard
    // sizedByCardinality returns the frame untouched and the proven
    // stock plan stands at every oracle-gated SF. The band frame
    // keeps its own (band, key) gate for the far decade where even
    // nDocs·nBands stops being small.
    val candEst = est.candEst
    val bands = Recommend.sizedByCardinality(bands0,
      est.nDocs * nBands, col("band"), col("key"))
    val rawPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // the pair stream is two longs wide — its dedup state holds far
    // more rows per task than the CF chain's wide rows the default
    // guard was measured on, so it gets its own bracketed bound
    val cand0 = Recommend.sizedByCardinality(rawPairs, candEst,
        PairDedupGuardRowsPerTask, col("doc_a"), col("doc_b"))
      .distinct()
    // The doc-table lookups (sig here, token sets in the caller's
    // verify) join the PAIR-MASS stream against a doc-count-sized
    // table. Below the guard Catalyst's own pick is proven at every
    // oracle SF. Past it the plan must be chosen by which side is
    // small: when the DOC TABLE still broadcasts, the pair stream
    // must never enter an exchange at all — r13's first post-gate 30×
    // ScaleStress caught the conservative always-shuffle-hash form
    // shipping 29.7 GiB + 28.6 GiB of sig/shingle-carrying pair rows
    // through two exchanges that the pre-gate broadcast plan (all
    // BroadcastHashJoins, diag/r12/q24probe_30x.out) never
    // materialized — 13.5 s → 44.8 s at 30×, the measured cost ADVICE
    // r12 predicted. Forcing broadcast() (not identity) also protects
    // the regime against AQE flipping to sort-merge on the stats-free
    // checkpointed tables. The force is DOUBLE-bounded — doc count AND
    // the measured payload bytes ([[LshLookupBroadcastBytes]]): the
    // count bound alone is a proxy calibrated on ~1 KB docs, and a
    // 150k-doc corpus of 50 KB pages would blow Spark's 8 GiB
    // broadcast hard limit where the ungated plan merely chose a
    // slower join. Only when the doc table outgrows
    // broadcast on either axis (the 100× regime: 500k docs; at
    // 100 TB, billions) do
    // the lookups ride shuffle-hash — the doc table is the per-task
    // build map, the pair stream PROBES without ever sorting or
    // materializing (AQE's sort-merge there spilled 70–75 GiB per
    // sort of the 95–102 GiB payload streams,
    // diag/r12/q24probe_100x.out; post-fix probe: zero spill).
    // The candEst input is DELIBERATELY the RAW pre-distinct,
    // pre-sig-agreement pair count (ADVICE r12): the post-filter
    // cardinality cannot be known without running the candidate
    // pipeline itself, and at the scales where the gate fires the
    // filtered stream is pair-mass too (100×: 328M distinct of 534M
    // raw).
    val floor = math.max(1, sigTable.sparkSession
      .sessionState.conf.numShufflePartitions).toLong
    // the byte side of the double bound covers BOTH broadcast payload
    // classes: the measured token/shingle arrays (est.payloadBytes)
    // and the signature-fixed sig rows this function broadcasts itself
    // (nBands·nRows longs + id + overhead per doc — data-independent,
    // so count × width IS the measurement)
    val sigBytes = est.nDocs * (8L * nBands * nRows + 72L)
    val lookupHint: DataFrame => DataFrame =
      if (candEst / floor <= Recommend.SpillGuardRowsPerTask) identity
      else if (est.nDocs <= LshLookupBroadcastDocs &&
        est.payloadBytes + sigBytes <= LshLookupBroadcastBytes) broadcast(_)
      else _.hint("shuffle_hash")
    val cand = cand0
      .join(lookupHint(sigTable
        .select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))), "doc_a")
      .join(lookupHint(sigTable
        .select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))), "doc_b")
      // native codegen eq-count (graft.plans.ArrayKernels) — the HOF
      // zip_with/aggregate form ran interpreted (q24 was 125 s at sf0.1)
      .filter(expr(s"graft_eqcount(sig_a, sig_b) >= $minMatches"))
      .select(col("doc_a"), col("doc_b"))
    (cand, lookupHint)
  }

  def neardupLsh(s: SparkSession, d: String): DataFrame =
    neardupLshOn(documents(s, d), estMemoKey = Some((d, "lsh_est_tok")))
      .orderBy(col("doc_a"), col("doc_b"))

  /** q24 over a caller-supplied (doc_id, text) corpus. `estMemoKey`
    * (registered entries only — (datasetDir, name)) caches the
    * volume-gate estimate per session via [[graft.Memo.scalarOf]] so
    * re-executions stop re-paying the estimate job; anonymous-corpus
    * callers compute it per call (one band-table-sized aggregate).
    * Checkpoints are LAZY (eager = false): the signature and
    * token-set tables still materialize exactly once — at the first
    * action instead of at construction — so plan-only consumers
    * (ExplainDump) run no jobs. */
  def neardupLshOn(docs: DataFrame,
      estMemoKey: Option[(String, String)] = None): DataFrame = {
    // same reuse story as q58: the signature and token-set tables feed
    // multiple join branches — materialize each once
    val sigTable = sigsOf(docs, withPayloadBytes = true)
      .cpLocal(eager = false)
    val est = lshEstimateMemo(sigTable, LshBands, LshRows, estMemoKey)
    val (cand, lookupHint) =
      lshCandidates(sigTable, LshBands, LshRows, LshMinSigMatches, est)
    verifyExact(cand,
      tokenSetsOf(docs).cpLocal(eager = false), LshVerifyTau,
      lookupHint)
  }

  /** [[lshEstimate]] through the session scalar memo when a
    * (datasetDir, name) key exists, direct otherwise. */
  private def lshEstimateMemo(sigTable: DataFrame, nBands: Int,
      nRows: Int, key: Option[(String, String)]): LshEst = key match {
    case Some((d, name)) if !planOnly(sigTable) =>
      graft.Memo.scalarOf(sigTable.sparkSession, d, name)(
        lshEstimate(sigTable, nBands, nRows))
    case _ => lshEstimate(sigTable, nBands, nRows)
  }

  val neardupLshSql: String = {
    val bandCols = (1 to LshRows)
      .map(r => s"CAST(sig[(i - 1) * $LshRows + $r] AS VARCHAR)")
      .mkString(", ")
    val keyExpr = Hashing.h60Sql(s"concat_ws(',', $bandCols)")
    s"""WITH sigs AS ($minhashSigSqlInner),
       |t AS ($tokenSetsSql),
       |bands AS (SELECT doc_id, sig, i, $keyExpr AS key
       |          FROM sigs CROSS JOIN
       |            (SELECT unnest(generate_series(1, $LshBands)) AS i) g),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.i = y.i AND x.key = y.key AND x.doc_id < y.doc_id
       |         WHERE len(list_filter(generate_series(1, $NumHashes),
       |             j -> x.sig[j] = y.sig[j])) >= $LshMinSigMatches),
       |v AS (SELECT doc_a, doc_b,
       |        len(list_intersect(a.ts, b.ts)) AS inter,
       |        len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS uni
       |      FROM cand JOIN t a ON a.doc_id = doc_a
       |                JOIN t b ON b.doc_id = doc_b)
       |SELECT doc_a, doc_b,
       |  floor(CAST(inter AS DOUBLE) / uni * 1e4 + 0.5) / 1e4 AS jaccard
       |FROM v WHERE CAST(inter AS DOUBLE) / uni >= $LshVerifyTau
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q25
  val SimHashBits = 32

  /** Word-3-shingle sets (distinct), the simhash feature universe —
    * built on the shared short-doc-guarded n-gram helper
    * ([[graft.ops.Text.ngramExpr]], ADVICE r02). */
  private val shinglesExpr =
    s"array_distinct(${graft.ops.Text.ngramExpr("toks", 3)})"
  private val shinglesSqlExpr =
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), i -> " +
      "concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))"

  /** q25: 32-bit SimHash per document over word 3-shingles: bit j is set
    * when Σ_shingles (±1 by bit j of the shingle hash) ≥ 0. Pure
    * map-side expression work — no shuffle; at 100 TB this is a linear
    * scan emitting 4 bytes per doc. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val bitTerms = (0 until SimHashBits).map { j =>
      s"(CASE WHEN aggregate(xs, 0L, (acc, x) -> acc + " +
        s"(CASE WHEN (shiftright(x, $j) & 1) = 1 THEN 1 ELSE -1 END)) >= 0 " +
        s"THEN ${1L << j}L ELSE 0L END)"
    }.mkString(" + ")
    documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .select(col("doc_id"), expr(shinglesExpr).as("sh"))
      .withColumn("xs",
        expr(s"transform(sh, t -> ${Hashing.h31SparkSql("t")})"))
      // empty shingle set pinned to 0: the unguarded aggregate's base
      // case would set every bit (Σ over ∅ = 0 ≥ 0), while DuckDB's
      // list_sum(∅) is NULL → 0 — pin both engines to 0 (ADVICE r02)
      .select(col("doc_id"),
        expr(s"CASE WHEN size(xs) = 0 THEN 0L ELSE ($bitTerms) END")
          .as("simhash"))
      .orderBy(col("doc_id"))
  }

  val simhashSqlInner: String = {
    val bitTerms = (0 until SimHashBits).map { j =>
      s"(CASE WHEN list_sum(list_transform(xs, x -> " +
        s"CASE WHEN ((x >> $j) & 1) = 1 THEN 1 ELSE -1 END)) >= 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $toksSqlExpr AS toks FROM documents),
       |sh AS (SELECT doc_id, $shinglesSqlExpr AS sh FROM t),
       |x AS (SELECT doc_id,
       |        list_transform(sh, s -> ${Hashing.h31Sql("s")}) AS xs
       |      FROM sh)
       |SELECT doc_id,
       |  CASE WHEN len(xs) = 0 THEN CAST(0 AS BIGINT)
       |       ELSE ($bitTerms) END AS simhash
       |FROM x""".stripMargin
  }

  val simhashSql: String =
    s"SELECT * FROM ($simhashSqlInner) ORDER BY doc_id"

  /** Hamming-≤k pairs over [[simhash]] fingerprints, via the pigeonhole
    * band join: split 32 bits into k+1 bands — any pair within hamming k
    * agrees exactly on ≥1 band, so the band equi-join is a complete
    * candidate generator (exact, not probabilistic). Verify with
    * bit_count(xor). Not registered as a driver query (the synthetic
    * corpus has no hamming-close pairs); exercised by SimilaritySpec. */
  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val width = SimHashBits / nBands
    val bandExprs = (0 until nBands).map { i =>
      s"named_struct('band', $i, 'key', " +
        s"(shiftright(simhash, ${i * width}) & ${(1L << width) - 1}L))"
    }.mkString(", ")
    val bands = sigs
      .select(col("doc_id"), col("simhash"),
        explode(expr(s"array($bandExprs)")).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band").as("band"), col("b.key").as("key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- q58
  /** Shingle-space thresholds: word 3-shingles discriminate far harder
    * than token sets (this corpus's token-J≈0.7 background collapses to
    * shingle-J≈0.2), so near-dup grade is τ = 0.8 with a wider banding:
    * 8 bands × 4 rows catches J = 0.8 with P ≈ 0.99 (1−(1−τ⁴)⁸), and
    * the ≥20/32 agreement pre-filter kills the J≈0.2 background before
    * the shingle-array verify. All deterministic — the oracle replays
    * banding, agreement, and verify exactly, so the (shared) LSH recall
    * property never shows up as a diff. */
  val ShingleTau = 0.8
  val ShingleBands = 8
  val ShingleRows = 4
  val ShingleMinSigMatches = 20

  /** Distinct word-3-shingle sets, ascending for the merge kernel;
    * docs with < 3 tokens have no shingles and can match nothing, so
    * they exit before the signature build (J over ∅ is 0/0). */
  private def shingleSetsOf(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .select(col("doc_id"), sort_array(expr(shinglesExpr)).as("ts"))
      .filter(size(col("ts")) > 0)

  /** q58: n-gram Jaccard near-duplicates — the same MinHash+LSH+verify
    * pipeline as q24 but over word-3-shingle sets, the n-gram dedup
    * family (shingling detects reordered/boilerplate-shifted copies
    * that token-set Jaccard misses, and is the standard web-dedup
    * feature space). Shares [[lshCandidates]] and the merge-intersect
    * verify; only the feature extractor and thresholds differ. */
  def shingleNeardup(s: SparkSession, d: String): DataFrame =
    shingleNeardupOn(documents(s, d),
      estMemoKey = Some((d, "lsh_est_shingle")))
      .orderBy(col("doc_a"), col("doc_b"))

  /** q58 over a caller-supplied (doc_id, text) corpus. `estMemoKey`:
    * see [[neardupLshOn]]. */
  def shingleNeardupOn(docs: DataFrame,
      estMemoKey: Option[(String, String)] = None): DataFrame = {
    // localCheckpoint both tables: the shingle build (split → n-gram →
    // distinct → md5-hash per shingle) feeds five plan branches (band
    // self-join ×2, sig lookups ×2, verify ×2) — recomputing it per
    // branch made q58 the bench's slowest query (12.5 s at sf0.1; the
    // materialized tables are corpus-sized, ~doc_id + 32 longs / the
    // shingle arrays, so storage is bounded and the hash runs once).
    // Lazy, like q24's: first action materializes, ExplainDump doesn't.
    val sh = shingleSetsOf(docs).cpLocal(eager = false)
    val sigTable = sh
      .withColumn("xs",
        expr(s"transform(ts, t -> ${Hashing.h31SparkSql("t")})"))
      .select(col("doc_id"), expr("graft_minhash(xs)").as("sig"),
        expr(payloadBytesExpr("ts")).as("pb"))
      .cpLocal(eager = false)
    val est =
      lshEstimateMemo(sigTable, ShingleBands, ShingleRows, estMemoKey)
    val (cand, lookupHint) = lshCandidates(sigTable, ShingleBands,
      ShingleRows, ShingleMinSigMatches, est)
    verifyExact(cand, sh, ShingleTau, lookupHint)
  }

  /** Ingest-time near-dup screen: flag each INCOMING document whose
    * shingle-Jaccard against some REFERENCE-corpus document reaches
    * [[ShingleTau]] — the production shape of dedup-at-ingest (batch
    * q58 remains the periodic full self-join). `incoming` may be a
    * STREAM: every step is stateless — the incoming side's features
    * (shingles + signature) are computed map-side and carried THROUGH
    * the band explode, so candidate verification never re-joins the
    * stream with itself (which would be a stateful stream-stream
    * join); the index sides are static checkpointed tables, so the
    * band-bucket match and the post-filter shingle lookup are both
    * stateless stream-static joins.
    * Multi-band hits are deduped within the watermark when `incoming`
    * is a stream (needs a `ts` column), or exactly in batch.
    * Output: (doc_a incoming, dup_of reference, jaccard). */
  /** Below this many REFERENCE-CORPUS docs, [[screenAgainstIndex]]
    * broadcasts its static index tables into the stream-static joins.
    * Why it matters: the index frames are localCheckpointed (ExistingRDD
    * scans with no stats), so without the hint Spark plans sort-merge
    * joins that RE-EXCHANGE AND RE-SORT the static index on every
    * micro-batch — measured 1.7–10k rows/s on the r9 STREAMBENCH vs 90k+
    * for the sibling streams. Broadcast turns both probes map-side.
    * At threshold size the payload is ~150 MB (sigs + shingle arrays);
    * a larger index keeps the shuffle plan, which is the correct shape
    * when the index itself is corpus-scale. Override per session with
    * `spark.graft.screenBroadcastDocs`. The count bound is paired with
    * a MEASURED byte bound ([[LshLookupBroadcastBytes]], override
    * `spark.graft.screenBroadcastBytes`) so a small-count index of
    * huge documents never force-broadcasts past Spark's 8 GiB hard
    * limit. */
  val ScreenBroadcastDocsDefault = 200000L

  def screenAgainstIndex(incoming: DataFrame, corpus: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    screenAgainstIndex(incoming, corpus, watermark, None, None)

  /** Full-control overload (VERDICT r12 item 2). `estMemoKey`: see
    * [[neardupLshOn]]. `candEstOverride` injects the delta×corpus
    * candidate-mass estimate — the test seam that lets SimilaritySpec
    * pin BOTH branches of the non-broadcast volume gate on small data
    * (the same contract `Recommend.scoreFromNbr` has with `candEst`). */
  private[graft] def screenAgainstIndex(incoming: DataFrame,
      corpus: DataFrame, watermark: String,
      estMemoKey: Option[(String, String)],
      candEstOverride: Option[Long]): DataFrame = {
    // the band table carries only the 32-long signature through the ×8
    // explode; the (heavy) shingle arrays stay in a separate static
    // table joined AFTER the sig-agreement filter — an 8× storage
    // amplification of the whole reference index otherwise.
    // Checkpoints are lazy: the broadcast-size count below (or, for a
    // stream, the first micro-batch) materializes them once.
    val idxSh0 = shingleSetsOf(corpus)
      .select(col("doc_id").as("dup_of"), col("ts").as("sh_b"))
      .cpLocal(eager = false)
    val idxBands0 = shingleSetsOf(corpus)
      .withColumn("xs",
        expr(s"transform(ts, t -> ${Hashing.h31SparkSql("t")})"))
      .withColumn("sig", expr("graft_minhash(xs)"))
      .select(col("doc_id").as("dup_of"), col("sig").as("sig_b"),
        explode(expr(bandStructsExpr(ShingleBands, ShingleRows))).as("b"))
      .select(col("dup_of"), col("sig_b"),
        col("b.band").as("band"), col("b.key").as("key"))
      .cpLocal(eager = false)
    // one cheap count decides the plan (an AQE-style runtime choice
    // the checkpointed frames' missing stats would otherwise forfeit);
    // plan-only construction assumes the broadcast branch joblessly
    val bcastDocs = incoming.sparkSession.conf
      .getOption("spark.graft.screenBroadcastDocs")
      .map(_.toLong).getOrElse(ScreenBroadcastDocsDefault)
    // the count bound is a proxy calibrated on ~1 KB docs — the same
    // single job also measures the index's actual shingle payload, and
    // the broadcast fires only under BOTH bounds (a 150k-doc index of
    // 50 KB pages would blow the 8 GiB broadcast hard limit long
    // before the count bound did). Cap overridable per session with
    // spark.graft.screenBroadcastBytes.
    val bcastBytes = incoming.sparkSession.conf
      .getOption("spark.graft.screenBroadcastBytes")
      .map(_.toLong).getOrElse(LshLookupBroadcastBytes)
    val small = planOnly(corpus) || {
      val r = idxSh0.agg(count(lit(1)).cast("long"),
        sum(expr(payloadBytesExpr("sh_b"))).cast("long")).first()
      val n = if (r.isNullAt(0)) 0L else r.getLong(0)
      val shBytes = if (r.isNullAt(1)) 0L else r.getLong(1)
      // the forced broadcast ships BOTH index tables: the shingle
      // payload measured above AND the ×nBands-exploded band table,
      // whose row width is signature-fixed (ADVICE r13 — without this
      // term the band table was bounded only by the count proxy):
      // 32-long sig (256 B) + dup_of/band/key (24 B) + UnsafeRow
      // overhead ≈ 344 B per band row, nBands rows per doc.
      val bandBytes = n * ShingleBands * (8L * ShingleBands * ShingleRows
        + 24L + 64L)
      n <= bcastDocs && shBytes + bandBytes <= bcastBytes
    }
    val hasTs = incoming.columns.contains("ts")
    val tsCols = if (hasTs) Seq(col("ts")) else Seq.empty
    val inFeat0 = incoming
      .select(Seq(col("doc_id"),
        sort_array(expr(s"array_distinct(${graft.ops.Text.ngramExpr(
          s"filter(split(text, ' ', -1), x -> x != '')", 3)})")).as("sh_a"))
        ++ tsCols: _*)
      .filter(size(col("sh_a")) > 0)
      .withColumn("xs",
        expr(s"transform(sh_a, t -> ${Hashing.h31SparkSql("t")})"))
      .withColumn("sig", expr("graft_minhash(xs)"))
      .withColumn("b", explode(expr(bandStructsExpr(ShingleBands, ShingleRows))))
      .select(Seq(col("doc_id").as("doc_a"), col("sh_a"),
        col("sig").as("sig_a"), col("b.band").as("band"),
        col("b.key").as("key")) ++ tsCols: _*)
    // Past the broadcast gate the q24 scale defect re-appears here
    // UNLESS gated (VERDICT r12 item 2 — the pre-fix 100× probe shape,
    // diag/r12/q24probe_100x.out: AQE sort-merge sorts array-carrying
    // streams per task, 70–75 GiB spilled per sort): the band join
    // probes the delta's shingle-carrying rows against the
    // corpus-sized band index, and the verify join probes candidates
    // against the corpus-sized shingle table. Same cure as
    // [[lshCandidates]]:
    //  - BATCH: the EXACT delta×corpus candidate mass Σ_bucket
    //    n_delta·n_index (one join of two band-count aggregates, both
    //    band-table-sized) gates a shuffle-hash hint on both index
    //    lookups — the index is the per-task build map, the delta
    //    stream PROBES without sorting — and sizes the band-join probe
    //    exchange at cardinality-scaled parallelism. Below the guard
    //    the stock plan stands (mid-scale indexes keep Catalyst's
    //    sort-merge, which is fine when nothing is pair-mass).
    //  - STREAM: the incoming side cannot be counted, but the gate is
    //    decided by the INDEX side alone: re-exchanging and re-sorting
    //    a static corpus-scale index EVERY micro-batch is never right
    //    (measured 1.7–10k rows/s pre-r9 vs 90k+ broadcast), so past
    //    the broadcast gate the index sides always ride shuffle-hash —
    //    built once per batch as the build map, never sorted.
    val (idxSh, idxBands, inFeat) =
      if (small) (broadcast(idxSh0), broadcast(idxBands0), inFeat0)
      else if (incoming.isStreaming)
        (idxSh0.hint("shuffle_hash"), idxBands0.hint("shuffle_hash"),
          inFeat0)
      else {
        val candEst = candEstOverride.getOrElse {
          def est0(): Long = {
            val r = inFeat0.groupBy(col("band"), col("key"))
              .agg(count(lit(1)).as("nd"))
              .join(idxBands0.groupBy(col("band"), col("key"))
                .agg(count(lit(1)).as("ni")), Seq("band", "key"))
              .agg(sum(col("nd") * col("ni")).cast("long")).first()
            if (r.isNullAt(0)) 0L else r.getLong(0)
          }
          estMemoKey match {
            case Some((d, name)) => graft.Memo.scalarOf[java.lang.Long](
              incoming.sparkSession, d, name)(Long.box(est0())).longValue
            case None => est0()
          }
        }
        val floor = math.max(1, incoming.sparkSession
          .sessionState.conf.numShufflePartitions).toLong
        if (candEst / floor <= Recommend.SpillGuardRowsPerTask)
          (idxSh0, idxBands0, inFeat0)
        else (idxSh0.hint("shuffle_hash"), idxBands0.hint("shuffle_hash"),
          Recommend.sizedByCardinality(inFeat0, candEst,
            col("band"), col("key")))
      }
    // a pair whose signatures agree on k bands arrives k times (≤8)
    // from the band join; each copy would pay the eqcount + shingle
    // verify and feed a row into the dedup state. Keep only the copy
    // whose join band is the FIRST band where the two sig slices
    // agree — stateless, map-side, exactly one survivor per genuine
    // pair (join band key equality ⟺ slice equality under the same
    // collision-free-h60 premise the banded join itself rests on).
    val firstAgreeBand = expr(
      s"""try_element_at(filter(sequence(1, $ShingleBands),
         |  b -> forall(sequence((b - 1) * $ShingleRows + 1,
         |              b * $ShingleRows),
         |    j -> element_at(sig_a, j) = element_at(sig_b, j))), 1)"""
        .stripMargin)
    val hits = inFeat.join(idxBands, Seq("band", "key"))
      .filter(col("doc_a") =!= col("dup_of"))
      // native kernel first (cheap, cuts most rows), HOF filter second
      .filter(expr(s"graft_eqcount(sig_a, sig_b) >= $ShingleMinSigMatches"))
      .filter(col("band") === firstAgreeBand)
      .join(idxSh, "dup_of") // static lookup, post-filter row set only
      .withColumn("inter", expr("graft_isize(sh_a, sh_b)"))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("j") >= ShingleTau)
      .select(Seq(col("doc_a"), col("dup_of"),
        (floor(col("j") * 1e4 + 0.5) / 1e4).as("jaccard")) ++ tsCols: _*)
    if (incoming.isStreaming)
      hits.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("doc_a", "dup_of")
    else hits.dropDuplicates("doc_a", "dup_of")
  }

  /** The delta slice q90 screens against the rest of the corpus — one
    * source plays "today's crawl batch", the others the standing
    * corpus. */
  val DeltaSource = "src0"

  /** q90: incremental ingest dedup — [[screenAgainstIndex]] as a
    * registered, oracle-gated batch query. A production pipeline never
    * re-runs the full n² self-join per ingest: it screens only the
    * DELTA batch against the standing corpus index (delta × corpus
    * candidates through the same banded LSH, never delta × delta or
    * corpus × corpus). Here the delta is the [[DeltaSource]] slice of
    * `documents` and the index is everything else, so the asymmetric
    * join, the sig-agreement pre-filter, and the exact verify all run
    * under the driver's hash gate (the streaming form of the same
    * operator is parity-tested in SimilaritySpec). */
  def deltaScreen(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
    screenAgainstIndex(
      docs.filter(col("source") === DeltaSource)
        .select(col("doc_id"), col("text")),
      docs.filter(col("source") =!= DeltaSource)
        .select(col("doc_id"), col("text")),
      "1 hour", Some((d, "screen_cand_est")), None)
      .orderBy(col("doc_a"), col("dup_of"))
  }

  val deltaScreenSql: String = {
    val bandCols = (1 to ShingleRows)
      .map(r => s"CAST(sig[(i - 1) * $ShingleRows + $r] AS VARCHAR)")
      .mkString(", ")
    val keyExpr = Hashing.h60Sql(s"concat_ws(',', $bandCols)")
    s"""WITH t0 AS (SELECT doc_id, source, $toksSqlExpr AS toks
       |            FROM documents),
       |t AS (SELECT * FROM (
       |        SELECT doc_id, source, $shinglesSqlExpr AS ts FROM t0)
       |      WHERE len(ts) > 0),
       |x AS (SELECT doc_id, source,
       |        list_transform(ts, t -> ${Hashing.h31Sql("t")}) AS xs
       |      FROM t),
       |sigs AS (SELECT doc_id, source, $sigListSql AS sig FROM x),
       |bands AS (SELECT doc_id, source, sig, i, $keyExpr AS key
       |          FROM sigs CROSS JOIN
       |            (SELECT unnest(generate_series(1, $ShingleBands)) AS i) g),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS dup_of
       |         FROM bands a JOIN bands b
       |           ON a.i = b.i AND a.key = b.key
       |             AND a.doc_id <> b.doc_id
       |         WHERE a.source = '$DeltaSource'
       |           AND b.source <> '$DeltaSource'
       |           AND len(list_filter(generate_series(1, $NumHashes),
       |             j -> a.sig[j] = b.sig[j])) >= $ShingleMinSigMatches),
       |v AS (SELECT doc_a, dup_of,
       |        len(list_intersect(a.ts, b.ts)) AS inter,
       |        len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
       |          AS uni
       |      FROM cand JOIN t a ON a.doc_id = doc_a
       |                JOIN t b ON b.doc_id = dup_of)
       |SELECT doc_a, dup_of,
       |  floor(CAST(inter AS DOUBLE) / uni * 1e4 + 0.5) / 1e4 AS jaccard
       |FROM v WHERE CAST(inter AS DOUBLE) / uni >= $ShingleTau
       |ORDER BY doc_a, dup_of""".stripMargin
  }

  val shingleNeardupSql: String = {
    val bandCols = (1 to ShingleRows)
      .map(r => s"CAST(sig[(i - 1) * $ShingleRows + $r] AS VARCHAR)")
      .mkString(", ")
    val keyExpr = Hashing.h60Sql(s"concat_ws(',', $bandCols)")
    s"""WITH t0 AS (SELECT doc_id, $toksSqlExpr AS toks FROM documents),
       |t AS (SELECT * FROM (
       |        SELECT doc_id, $shinglesSqlExpr AS ts FROM t0)
       |      WHERE len(ts) > 0),
       |x AS (SELECT doc_id,
       |        list_transform(ts, t -> ${Hashing.h31Sql("t")}) AS xs
       |      FROM t),
       |sigs AS (SELECT doc_id, $sigListSql AS sig FROM x),
       |bands AS (SELECT doc_id, sig, i, $keyExpr AS key
       |          FROM sigs CROSS JOIN
       |            (SELECT unnest(generate_series(1, $ShingleBands)) AS i) g),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.i = y.i AND x.key = y.key AND x.doc_id < y.doc_id
       |         WHERE len(list_filter(generate_series(1, $NumHashes),
       |             j -> x.sig[j] = y.sig[j])) >= $ShingleMinSigMatches),
       |v AS (SELECT doc_a, doc_b,
       |        len(list_intersect(a.ts, b.ts)) AS inter,
       |        len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS uni
       |      FROM cand JOIN t a ON a.doc_id = doc_a
       |                JOIN t b ON b.doc_id = doc_b)
       |SELECT doc_a, doc_b,
       |  floor(CAST(inter AS DOUBLE) / uni * 1e4 + 0.5) / 1e4 AS jaccard
       |FROM v WHERE CAST(inter AS DOUBLE) / uni >= $ShingleTau
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_shingle_neardup" -> (shingleNeardup _),
    "q22_neardup_jaccard" -> (neardupJaccard _),
    "q23_minhash_sig" -> (minhashSig _),
    "q24_neardup_lsh" -> (neardupLsh _),
    "q25_simhash" -> (simhash _),
    "q43_minhash_native" -> (minhashSigNative _),
    "q70_source_overlap" -> (sourceOverlap _),
    "q90_delta_screen" -> (deltaScreen _))

  val oracle: Map[String, String] = Map(
    "q58_shingle_neardup" -> shingleNeardupSql,
    "q70_source_overlap" -> sourceOverlapSql,
    "q22_neardup_jaccard" -> neardupJaccardSql,
    "q23_minhash_sig" -> minhashSigSql,
    "q24_neardup_lsh" -> neardupLshSql,
    "q25_simhash" -> simhashSql,
    "q43_minhash_native" -> minhashSigSql,
    "q90_delta_screen" -> deltaScreenSql)
}

package graft.mining

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.Tables._

/** SON + A-Priori frequent itemsets — the reference's two-phase
  * distributed mining (Assignment2/task1.py:47-172), Spark-first.
  *
  * Baskets are order → distinct part brands (the user→business basket
  * model of Assignment2/task1.py:25-35 transposed to the testdata).
  *
  * Phase 1 (`mapPartitions` A-Priori): each partition mines candidates
  * at the fractional support scaled to its basket count — the one place
  * per-partition imperative code is genuinely the right tool (SURVEY.md
  * A16). If a set is globally frequent (count ≥ s·N) then some partition
  * has count_p ≥ s·n_p, so the candidate union has no false negatives.
  * Phase 2 counts candidates exactly with one shuffle (explode candidate
  * hits map-side → groupBy sum), replacing the reference's
  * closure-captured candidate list + reduceByKey (task1.py:145-168).
  *
  * Scale: phase 1 is embarrassingly parallel; the candidate set crossing
  * the driver is itemsets (small — the SON contract), never data. At
  * 100 TB you'd raise partition count; local A-Priori memory is bounded
  * by the per-partition vocabulary, not by N.
  */
object Son {

  /** Support as a fraction of total baskets — scale-independent. */
  val SupportFrac = 0.005
  /** Cap mined itemset size so the SQL oracle (1..3-way self-joins) is
    * exhaustive. A public API user can raise it (the kernel is
    * unbounded); the registered query pins 3 for oracle parity. */
  val MaxSize = 3

  /** Local levelwise A-Priori over one partition's baskets. */
  private[graft] def aprioriLocal(
      baskets: Seq[Array[String]], supportFrac: Double, maxSize: Int)
  : Iterator[Seq[String]] = {
    val n = baskets.length
    if (n == 0) return Iterator.empty
    val thr = math.max(1L, math.ceil(supportFrac * n).toLong)
    // L1
    val c1 = mutable.Map.empty[String, Long]
    baskets.foreach(_.foreach(i => c1.update(i, c1.getOrElse(i, 0L) + 1)))
    var frequent: Seq[Seq[String]] =
      c1.iterator.filter(_._2 >= thr).map(kv => Seq(kv._1)).toSeq
    val out = mutable.ArrayBuffer[Seq[String]]()
    out ++= frequent
    var k = 2
    while (frequent.nonEmpty && k <= maxSize) {
      // candidate gen: join frequent (k-1)-sets sharing a (k-2)-prefix
      val prev = frequent.map(_.toVector).toSet
      val cands = (for {
        a <- prev.iterator
        b <- prev.iterator
        if a.init == b.init && a.last < b.last
        c = a :+ b.last
        if c.combinations(k - 1).forall(sub => prev.contains(sub.toVector))
      } yield c).toSet
      if (cands.isEmpty) { frequent = Nil }
      else {
        // Count by enumerating each basket's size-k subsets and probing
        // the candidate set — O(Σ C(|basket|, k)) instead of
        // O(baskets × candidates); with small baskets this is orders of
        // magnitude cheaper than the candidate-scan direction. Baskets
        // arrive sorted, so subsets align with candidate vectors.
        val counts = mutable.Map.empty[Vector[String], Long]
        baskets.foreach { b =>
          if (b.length >= k) {
            b.combinations(k).foreach { c =>
              val v = c.toVector
              if (cands.contains(v))
                counts.update(v, counts.getOrElse(v, 0L) + 1)
            }
          }
        }
        frequent = counts.iterator.filter(_._2 >= thr).map(_._1).toSeq
        out ++= frequent
      }
      k += 1
    }
    out.iterator
  }

  /** Order→brand baskets (distinct items, sorted for determinism). */
  def baskets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("basket"))

  /** q28: SON frequent itemsets at 0.5% support, sizes 1..3. Output:
    * comma-joined sorted itemset, size, exact support count. */
  def sonItemsets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // localCheckpoint: the basket build (join + groupBy collect_set) is
    // consumed three times (total count, phase 1, phase 2) — without it
    // each pass recomputes the 600k-row join (this was 60 of q28's 88
    // bench seconds at sf0.1).
    // repartition pins phase-1 parallelism: AQE coalesces the small
    // basket shuffle to ~1 partition, which would serialize the local
    // mining (this, not the mining itself, was q28's bench cost). The
    // fractional local threshold keeps SON's no-false-negative guarantee
    // at any partition count.
    val b = baskets(s, d).select(col("basket")).as[Array[String]]
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint()
    val total = b.count()
    val minsup = math.max(1L, math.ceil(SupportFrac * total).toLong)
    // Phase 1: per-partition candidates.
    // toVector, not toSeq: Iterator.toSeq yields a lazily-memoized
    // LazyList whose repeated traversals (one per A-Priori level)
    // dominate the partition runtime.
    val candidates = b
      .mapPartitions(it => aprioriLocal(it.toVector, SupportFrac, MaxSize))
      .distinct()
      .collect()
      .map(_.toVector)
    val bc = s.sparkContext.broadcast(candidates)
    // Phase 2: exact counting — enumerate each basket's subsets up to
    // MaxSize, probe the broadcast candidate set, emit hits map-side;
    // one shuffle for the global sum.
    val maxK = MaxSize
    b.mapPartitions { it =>
        val candSet = bc.value.toSet // built once per partition
        it.flatMap { basket =>
          (1 to math.min(maxK, basket.length)).iterator
            .flatMap(k => basket.combinations(k))
            .map(_.toVector)
            .filter(candSet.contains)
            .map(_.mkString(","))
        }
      }
      .toDF("itemset")
      .groupBy(col("itemset"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minsup)
      .withColumn("sz", (size(split(col("itemset"), ",")) * lit(1)).cast("long"))
      .select(col("itemset"), col("sz"), col("support"))
      .orderBy(col("sz"), col("itemset"))
  }

  /** Oracle: exhaustive 1/2/3-itemset counting by self-joins. CTEs are
    * MATERIALIZED — DuckDB otherwise re-inlines the unnest pipeline into
    * each self-join arm, which blows past 100× the runtime. */
  val sonItemsetsSql: String =
    s"""WITH b AS MATERIALIZED (SELECT l_orderkey AS ok,
       |             list_distinct(list(p_brand)) AS basket
       |           FROM lineitem JOIN part ON l_partkey = p_partkey
       |           GROUP BY 1),
       |tot AS MATERIALIZED (
       |  SELECT greatest(1, CAST(ceil($SupportFrac * count(*)) AS BIGINT))
       |    AS minsup FROM b),
       |e AS MATERIALIZED (SELECT ok, unnest(basket) AS item FROM b),
       |s1 AS (SELECT item AS itemset, 1 AS sz, count(*) AS support
       |       FROM e GROUP BY 1),
       |s2 AS (SELECT a.item || ',' || b.item AS itemset, 2 AS sz,
       |         count(*) AS support
       |       FROM e a JOIN e b ON a.ok = b.ok AND a.item < b.item
       |       GROUP BY 1),
       |s3 AS (SELECT a.item || ',' || b.item || ',' || c.item AS itemset,
       |         3 AS sz, count(*) AS support
       |       FROM e a JOIN e b ON a.ok = b.ok AND a.item < b.item
       |                JOIN e c ON a.ok = c.ok AND b.item < c.item
       |       GROUP BY 1),
       |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |      UNION ALL SELECT * FROM s3)
       |SELECT itemset, CAST(sz AS BIGINT) AS sz, support
       |FROM u, tot WHERE support >= minsup
       |ORDER BY sz, itemset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_son_itemsets" -> (sonItemsets _))

  val oracle: Map[String, String] = Map(
    "q28_son_itemsets" -> sonItemsetsSql)
}

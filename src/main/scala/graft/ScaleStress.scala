package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** 10× scale stress of the recommender/dedup family (VERDICT r7 item 2):
  * converts the code's WRITTEN scale arguments ("vocabulary-bounded
  * class count", "candidate generation is bucketed, never all-pairs")
  * into MEASUREMENTS, by synthesizing a ~10× sf0.1 dataset and running
  * the heavy queries at both scales in one session.
  *
  * Scaling construction (REPLICAS disjoint copies, ids offset by
  * [[IdOffset]] per replica — preserves every per-entity distribution
  * while multiplying entity counts):
  *  - orders/lineitem/part: keys offset → 10 disjoint interaction
  *    graphs over a 10× catalog. Part ATTRIBUTES are kept verbatim, so
  *    the feature vocabulary — and with it q89's class count — must
  *    stay ~CONSTANT while the catalog grows 10×: exactly the claim
  *    under test (Recommend.contentRecFromUi's scale note).
  *  - documents: doc_id offset; every token suffixed "_r<k>" for
  *    replica k>0, so replicas share no shingles — within-replica
  *    near-dup structure is preserved (dup pairs scale ×10, never
  *    ×100 via cross-replica matches).
  *  - embeddings: vec_id offset, vectors verbatim. SemDeDup's knob is
  *    k ∝ corpus (the paper's own scaling), so the 10× run uses 10×
  *    clusters — Σ(cluster)² = n²/k stays ∝ n.
  *
  * Timing: one untimed warm run of each query at sf0.1, then min-of-2
  * timed runs per scale, interleaved. Reported as SCALE.md. Memoized
  * entry points are bypassed (the *On variants) so both scales pay
  * their full build — this measures the ALGORITHMS, not the cache.
  *
  * Run: sbt "runMain graft.ScaleStress" (writes target/scale10 + SCALE.md).
  */
object ScaleStress {

  val Replicas = 10
  val IdOffset = 10000000L

  /** Replicate a frame `n`× with the given id columns offset per
    * replica (replica 0 is the original rows). */
  private def replicate(df: DataFrame, idCols: Seq[String], n: Int)
  : DataFrame =
    (0 until n).map { k =>
      idCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(k * IdOffset)))
    }.reduce(_ unionByName _)

  private def writeScaled(s: SparkSession, src: String, out: String)
  : Unit = {
    val n = Replicas
    replicate(orders(s, src), Seq("o_orderkey", "o_custkey"), n)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    replicate(lineitem(s, src), Seq("l_orderkey", "l_partkey"), n)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    replicate(part(s, src), Seq("p_partkey"), n)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    // customers keep their nationkey, so the graph family's bounded
    // nation-filtered subgraph grows 10x in nodes/edges — the linear
    // test the iterative graph queries need
    replicate(customer(s, src), Seq("c_custkey"), n)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    // documents: per-replica token suffix — replicas share no vocabulary
    (0 until n).map { k =>
      val d = documents(s, src)
        .withColumn("doc_id", col("doc_id") + lit(k * IdOffset))
      if (k == 0) d
      else d.withColumn("text", expr(
        s"array_join(transform(split(text, ' '), t -> concat(t, '_r$k')), ' ')"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    replicate(embeddings(s, src), Seq("vec_id"), n)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  private def copurchases(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey").as("ok"),
        col("l_partkey").as("i"))
      .join(orders(s, d).select(col("o_orderkey").as("ok"),
        col("o_custkey").as("u")), "ok")
      .select(col("u"), col("i"))

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.err.println(s"[scale] synthesizing ${Replicas}x of $base → $out")
    val tGen = System.nanoTime()
    writeScaled(spark, base, out)
    System.err.println(
      f"[scale] synthesis done in ${(System.nanoTime() - tGen) / 1e9}%.0f s")

    import graft.mining.{Recommend, SetSimilarity, VectorSimilarity}
    import graft.cluster.KMeans
    // memo-free entry points — both scales pay their full build
    val runs: Seq[(String, String => DataFrame)] = Seq(
      "q87_item_cf" -> ((d: String) => Recommend.itemCfOn(
        copurchases(spark, d), Recommend.UserItemCap, Recommend.CoMinUsers,
        Recommend.NeighborTopM, Recommend.RecK)),
      "q89_content_rec" -> ((d: String) => Recommend.contentRecOn(
        copurchases(spark, d), part(spark, d), Recommend.UserItemCap,
        Recommend.ProfileTopF, Recommend.RecK)),
      "q92_hybrid_rec" -> ((d: String) => Recommend.hybridRecOn(
        copurchases(spark, d), part(spark, d), Recommend.UserItemCap,
        Recommend.CoMinUsers, Recommend.NeighborTopM,
        Recommend.ProfileTopF, Recommend.RecK)),
      "q93_cf_eval" -> ((d: String) => Recommend.cfEvalOn(
        copurchases(spark, d), Recommend.UserItemCap, Recommend.CoMinUsers,
        Recommend.NeighborTopM, Recommend.RecK)),
      "q24_neardup_lsh" -> ((d: String) =>
        SetSimilarity.neardupLshOn(documents(spark, d))),
      "q58_shingle_neardup" -> ((d: String) =>
        SetSimilarity.shingleNeardupOn(documents(spark, d))),
      // SemDeDup scales k ∝ corpus (the paper's own knob): 10× data →
      // 10× clusters, keeping Σ(cluster)² = n²/k linear in n.
      "q94_semdedup" -> ((d: String) => VectorSimilarity.semDedupOn(
        KMeans.points(spark, d),
        if (d == out) KMeans.K * Replicas else KMeans.K,
        VectorSimilarity.SemDedupCos)),
      // the iterative graph family on the 10× co-purchase subgraph
      // (edge-sized joins per round — the linearity claim under test)
      "q33_degree_hist" -> ((d: String) =>
        SparkEntry.queries("q33_degree_hist")(spark, d)),
      "q35_lpa" -> ((d: String) =>
        SparkEntry.queries("q35_lpa")(spark, d)),
      "q63_pagerank" -> ((d: String) =>
        SparkEntry.queries("q63_pagerank")(spark, d)),
      "q97_kcore" -> ((d: String) =>
        SparkEntry.queries("q97_kcore")(spark, d)))

    def hygiene(): Unit = {
      val keep = Memo.liveIds(spark)
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !keep(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    def time(fn: String => DataFrame, d: String): (Double, Long) = {
      hygiene()
      val t = System.nanoTime()
      val rows = fn(d).count()
      ((System.nanoTime() - t) / 1e9, rows)
    }

    // warm: one untimed pass at base scale (codegen/JIT)
    runs.foreach { case (n, fn) =>
      try { fn(base).count(); hygiene() } catch { case _: Throwable => () }
      System.err.println(s"[scale] warm $n done")
    }
    // interleaved min-of-2 per scale
    val t1 = scala.collection.mutable.Map[String, (Double, Long)]()
    val t10 = scala.collection.mutable.Map[String, (Double, Long)]()
    for (pass <- 1 to 2; (name, fn) <- runs) {
      val (sBase, rBase) = time(fn, base)
      val (sBig, rBig) = time(fn, out)
      def upd(m: scala.collection.mutable.Map[String, (Double, Long)],
          v: (Double, Long)): Unit =
        m(name) = if (!m.contains(name) || v._1 < m(name)._1) v else m(name)
      upd(t1, (sBase, rBase)); upd(t10, (sBig, rBig))
      System.err.println(
        f"[scale] p$pass $name: base $sBase%.1f s ($rBase rows), " +
          f"${Replicas}x $sBig%.1f s ($rBig rows)")
    }

    // the vocabulary-bounded claim, measured
    val classesBase = Recommend.itemClasses(
      Recommend.contentFeats(part(spark, base)))
      .select(col("ck")).distinct().count()
    val classesBig = Recommend.itemClasses(
      Recommend.contentFeats(part(spark, out)))
      .select(col("ck")).distinct().count()

    val md = new StringBuilder
    md ++= "# SCALE — measured 10× stress of the recommender/dedup family\n\n"
    md ++= s"Synthesized `${Replicas}×` sf0.1 (construction: disjoint\n"
    md ++= "id-offset replicas; part attributes verbatim → constant\n"
    md ++= "feature vocabulary; per-replica token suffix on documents →\n"
    md ++= "no cross-replica near-dups; SemDeDup runs k ∝ corpus).\n"
    md ++= "Times are min-of-2, interleaved, one warmed session,\n"
    md ++= s"local[$cpus]; memo-free entry points (the algorithms, not\n"
    md ++= "the session cache). Regenerate: `sbt \"runMain graft.ScaleStress\"`.\n\n"
    md ++= "| query | sf0.1 sec | 10× sec | time ratio | sf0.1 rows | 10× rows | row ratio |\n"
    md ++= "|---|---|---|---|---|---|---|\n"
    runs.foreach { case (name, _) =>
      val (s1, r1) = t1(name); val (s10, r10) = t10(name)
      md ++= f"| $name | $s1%.1f | $s10%.1f | ${s10 / s1}%.1f× " +
        f"| $r1 | $r10 | ${r10.toDouble / math.max(r1, 1)}%.1f× |\n"
    }
    md ++= f"\n**q89 content classes** (the vocabulary-bounded claim): " +
      f"$classesBase at sf0.1 → $classesBig at 10× catalog " +
      f"(${classesBig.toDouble / classesBase}%.2f×; linear-in-catalog " +
      "would be 10×).\n\n"
    md ++= "Reading: a time ratio ≲ " + s"${Replicas}× is linear-or-better" +
      " (10× data on fixed cores costs ≥10× work if the algorithm is " +
      "linear); super-linear ratios would flag a quadratic candidate " +
      "stage. Row ratios confirm output structure scaled as designed " +
      "(dup pairs ×10, recommendations ×10, one summary row stays 1).\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALE.md"),
      md.toString.getBytes("UTF-8"))
    println(md.toString)
    spark.stop()
  }
}

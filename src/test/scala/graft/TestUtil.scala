package graft

/** Shared test helpers. */
object TestUtil {

  /** Normalized mutual information between two labelings (the
    * reference's grading metric for clustering, Assignment5 PDF §4.3). */
  def nmi(a: Seq[Int], b: Seq[Int]): Double = {
    require(a.length == b.length && a.nonEmpty)
    val n = a.length.toDouble
    def entropy(xs: Seq[Int]): Double =
      xs.groupBy(identity).values.map { g =>
        val p = g.size / n; -p * math.log(p)
      }.sum
    val ha = entropy(a); val hb = entropy(b)
    val pa = a.groupBy(identity).map { case (k, v) => k -> v.size / n }
    val pb = b.groupBy(identity).map { case (k, v) => k -> v.size / n }
    val mi = a.zip(b).distinct.map { case (x, y) =>
      val pxy = a.zip(b).count(_ == (x, y)) / n
      pxy * math.log(pxy / (pa(x) * pb(y)))
    }.sum
    if (ha == 0.0 || hb == 0.0) 0.0 else mi / math.sqrt(ha * hb)
  }

  /** Deterministic pseudo-random double in [0,1) from an integer key. */
  def det01(key: Long): Double = {
    val h = key * 6364136223846793005L + 1442695040888963407L
    ((h >>> 11) % 1000003L).toDouble / 1000003.0
  }
}

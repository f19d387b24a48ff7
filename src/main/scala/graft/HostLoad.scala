package graft

/** Host-load telemetry for measured artifacts (VERDICT r13 item 5):
  * this host shows multi-minute noisy-neighbor windows where identical
  * binaries vary ±50%, and three rounds running spent builder+judge
  * time recompiling old binaries to prove "it was the host". Sampling
  * the 1-minute loadavg before and after each measured pass and
  * writing it INTO the artifact makes most of those A/Bs unnecessary:
  * a moved total whose load column also moved is host drift on its
  * face; one whose load held steady earns the targeted binary A/B
  * (tools/bisect_bench.sh). Loadavg counts runnable tasks HOST-wide
  * (it sees neighbors; JVM-internal counters don't), which is exactly
  * the contended resource here. */
object HostLoad {

  /** 1-minute loadavg, or -1.0 where /proc is unreadable. */
  def loadavg(): Double = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .trim.split("\\s+")(0).toDouble
  } catch { case _: Throwable => -1.0 }

  /** JVM-visible processor count — the denominator that turns loadavg
    * into "fraction of the machine busy". */
  def cpus: Int = Runtime.getRuntime.availableProcessors()

  /** The JSON fields every measured artifact carries, as a fragment
    * ready to splice after a leading comma:
    * `"host_load_1m_before":…,"host_load_1m_after":…,"host_cpus":…`. */
  def jsonFields(before: Double, after: Double): String = {
    // Locale.ROOT (the ADVICE-r6 rule every artifact number follows):
    // the f-interpolator honors the JVM default locale, and a comma-
    // decimal locale would emit invalid JSON
    def f(v: Double) =
      if (v < 0) "null"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    s""""host_load_1m_before":${f(before)},""" +
      s""""host_load_1m_after":${f(after)},"host_cpus":$cpus"""
  }
}

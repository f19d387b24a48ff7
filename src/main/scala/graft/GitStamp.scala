package graft

/** The generating commit for round artifacts (VERDICT r12 item 4):
  * PLANS.md / SCALE.md / STREAMBENCH.json each carry the sha of the
  * HEAD they were generated from, so "is this artifact stale?" is a
  * string compare instead of a timestamp guess. Read from the .git
  * files directly (no subprocess — the artifact mains run from
  * compiled classes via tools/run_java.sh, where spawning git is one
  * more thing that can silently differ from the repo the classes
  * came from). NOTE this stamps HEAD, not the worktree: regenerate
  * artifacts from a clean tree (the round scripts do). */
object GitStamp {

  /** Current HEAD sha (short form), or "unknown". */
  lazy val sha: String = shaOf(java.nio.file.Paths.get(".git"))

  private[graft] def shaOf(gitDir: java.nio.file.Path): String = try {
    val head = new String(java.nio.file.Files.readAllBytes(
      gitDir.resolve("HEAD")), "UTF-8").trim
    val full =
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.stripPrefix("ref: ").trim
        val refPath = gitDir.resolve(ref)
        if (java.nio.file.Files.exists(refPath))
          new String(java.nio.file.Files.readAllBytes(refPath),
            "UTF-8").trim
        else { // packed ref (post-gc)
          val packed = gitDir.resolve("packed-refs")
          scala.io.Source.fromFile(packed.toFile, "UTF-8").getLines()
            .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
            .map(_.split(" ")(0))
            .getOrElse(sys.error(s"ref $ref not found"))
        }
      }
    full.take(12)
  } catch { case _: Throwable => "unknown" }
}

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

  /** Current HEAD sha (short form), or "unknown". Resolution order:
    * the GRAFT_GIT_SHA env override first — a runner executing
    * compiled classes from a scratch cwd (tools/bisect_bench.sh runs
    * each side from target/bisect_run_*) knows which worktree the
    * classes came from while the cwd does not, and walking up parents
    * would mis-stamp an OLD binary with the enclosing repo's current
    * HEAD — then the cwd's `.git`. */
  lazy val sha: String =
    sys.env.get("GRAFT_GIT_SHA").map(_.trim).filter(_.nonEmpty)
      .getOrElse(shaOf(java.nio.file.Paths.get(".git")))

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim

  private[graft] def shaOf(gitPath: java.nio.file.Path): String = try {
    // worktree/submodule indirection: `.git` is a one-line FILE
    // pointing at the real git dir — so a process whose cwd IS a
    // linked-worktree root stamps that worktree's HEAD. (Scratch-cwd
    // runs have no `.git` at all; they stamp via GRAFT_GIT_SHA, see
    // [[sha]].)
    val gitDir =
      if (!java.nio.file.Files.isRegularFile(gitPath)) gitPath
      else {
        val p = java.nio.file.Paths
          .get(read(gitPath).stripPrefix("gitdir:").trim)
        if (p.isAbsolute) p
        else gitPath.toAbsolutePath.getParent.resolve(p).normalize()
      }
    // refs/packed-refs live in the COMMON dir: a linked worktree's
    // git dir holds its own HEAD but shares the ref store
    val common = {
      val c = gitDir.resolve("commondir")
      if (java.nio.file.Files.exists(c))
        gitDir.resolve(read(c)).normalize()
      else gitDir
    }
    val head = read(gitDir.resolve("HEAD"))
    val full =
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.stripPrefix("ref: ").trim
        val refPath = Seq(gitDir.resolve(ref), common.resolve(ref))
          .find(java.nio.file.Files.exists(_))
        refPath.map(read).getOrElse { // packed ref (post-gc)
          val packed = common.resolve("packed-refs")
          scala.io.Source.fromFile(packed.toFile, "UTF-8").getLines()
            .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
            .map(_.split(" ")(0))
            .getOrElse(sys.error(s"ref $ref not found"))
        }
      }
    full.take(12)
  } catch { case _: Throwable => "unknown" }
}

package graft

/** Relocatable resolver for the repo's committed `fixtures/` directory.
  *
  * Every query that reads a committed fixture (golden 1BRC measurements,
  * PNG/WAV binaries, generator expectations) used to hardcode the original
  * checkout path, so a driver running the jar from a relocated checkout got
  * path-not-found on exactly those queries. Resolution order:
  *
  *   1. `-Dgraft.fixtures.dir=<path>` — explicit override;
  *   2. walk up from the working directory looking for a `fixtures` dir
  *      that contains `stations.csv` (the anchor every checkout has);
  *   3. the original absolute checkout path, as a last-resort default.
  *
  * Resolved once per JVM (lazy val): the fixtures dir never moves within a
  * process lifetime, and oracle SQL strings interpolate the SAME resolved
  * path, so Spark and DuckDB always read identical files.
  */
object Fixtures {

  lazy val root: String =
    sys.props.get("graft.fixtures.dir").getOrElse {
      val anchor = "stations.csv"
      var dir = new java.io.File(sys.props.getOrElse("user.dir", ".")).getCanonicalFile
      var found: Option[String] = None
      while (found.isEmpty && dir != null) {
        val cand = new java.io.File(dir, "fixtures")
        if (new java.io.File(cand, anchor).isFile)
          found = Some(cand.getAbsolutePath)
        dir = dir.getParentFile
      }
      found.getOrElse("/root/repo/fixtures")
    }

  /** `fixtures/<rel>` under the resolved root. */
  def path(rel: String): String = s"$root/$rel"
}

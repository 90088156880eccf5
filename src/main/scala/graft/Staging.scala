package graft

/** Shared per-JVM parquet staging: a temp root deleted on JVM exit, a
  * canonical-path-keyed directory per (namespace, corpus), and a
  * single-flight write-once memo. This is the q105 staging discipline
  * (one eager materialization serves every subsequent plan construction;
  * two threads never interleave overwrite-and-read on one dir) factored
  * out so the dedup shingle stage (Dedup.minhashLshStaged) and the ANN
  * index stage (Similarity q150) share one implementation.
  */
object Staging {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-stage-")
    sys.addShutdownHook {
      def del(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(del)); p.delete(); ()
      }
      del(r.toFile)
    }
    r
  }

  private val written =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Stage directory for (`ns`, corpus `d`) — keyed by the md5 of the
    * CANONICAL absolute corpus path, so distinct corpora can never share
    * a stage (a lossy character substitution would map '/a/b' and '/a_b'
    * to one key). */
  def dirFor(ns: String, d: String): String = {
    val canon = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    root.resolve(s"$ns-$key").toString
  }

  /** Run `write` the first time `workDir` is staged in this JVM; no-op
    * after (memoized, single-flight per dir). */
  def once(workDir: String)(write: => Unit): Unit =
    locks.getOrElseUpdate(workDir, new Object).synchronized {
      if (!written.contains(workDir)) {
        write
        written(workDir) = true
      }
    }

  /** Forget a stage so the next [[once]] re-writes it — the in-session
    * corpus-rewrite hook (Dedup.invalidateClusters routes here). */
  def forget(workDir: String): Unit = { written.remove(workDir); () }

  /** Spec probe: has `workDir` been staged in this JVM? */
  def isStaged(workDir: String): Boolean = written.contains(workDir)
}

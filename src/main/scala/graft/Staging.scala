package graft

/** Shared parquet staging: a configurable root, a canonical-path-keyed
  * directory per (namespace, corpus), and a single-flight write-once memo.
  * This is the q105 staging discipline (one eager materialization serves
  * every subsequent plan construction; two threads never interleave
  * overwrite-and-read on one dir) factored out so the dedup shingle stage
  * (Dedup.minhashLshStaged) and the ANN index stages (Similarity
  * q150/q151) share one implementation.
  *
  * Durability: by default the root is a temp dir deleted on JVM exit
  * (tests, one-shot jobs). Setting `-Dgraft.stage.dir=<path>` points the
  * root at real storage and the stages become DURABLE: every completed
  * [[once]] drops a `<key>.staged` marker next to the stage, and a fresh
  * JVM seeing the marker serves the existing files instead of rebuilding —
  * the "materialized once" contract survives restarts. [[forget]] removes
  * the marker with the memo, so corpus-rewrite invalidation works the
  * same in both modes. (Markers are written in both modes; under the temp
  * root they die with the JVM, so they add nothing — and cost nothing.)
  * Single-flight is per-JVM; concurrent DRIVERS racing one durable stage
  * need external coordination, as with any shared output path.
  */
object Staging {

  private lazy val root: java.nio.file.Path =
    sys.props.get("graft.stage.dir") match {
      case Some(p) =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      case None =>
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

  private def marker(key: String) = new java.io.File(key + ".staged")
  private def preManifest(key: String) = new java.io.File(key + ".pre")

  /** Data directory a key describes, by the suite-wide key convention
    * `<dir>` or `<dir>@step` — used to detect a STALE marker (marker
    * present, staged files gone, e.g. a storage wipe that spared the
    * tiny marker): serving such a stage would fail every read, so
    * [[once]] drops the marker and rebuilds instead. */
  private def dataPath(key: String) = new java.io.File(key.split('@').head)

  private def hasData(f: java.io.File): Boolean =
    f.isFile || (f.isDirectory && Option(f.listFiles).exists(_.nonEmpty))

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

  /** Run `write` the first time `key` is staged — in this JVM (memo) or,
    * under a durable root, EVER (marker file); no-op after (memoized,
    * single-flight per key).
    *
    * KEY CONTRACT: `key` must be `<dir>` or `<dir>@step`, where `<dir>`
    * is the directory (or file) `write` leaves its data at — the
    * stale-marker check (marker present, data gone ⇒ rebuild) derives
    * the data path from the key by this convention. A key whose write
    * lands data elsewhere would look permanently stale and rebuild on
    * every new JVM; [[once]] fails loudly on that instead (post-write
    * assert). A stage whose data genuinely lives elsewhere passes the
    * path explicitly via the two-arg overload. */
  def once(key: String)(write: => Unit): Unit =
    once(key, dataPath(key).getPath)(write)

  /** [[once]] with the staged-data location given explicitly (for keys
    * that don't follow the `<dir>`/`<dir>@step` convention). */
  def once(key: String, dataDir: String)(write: => Unit): Unit =
    locks.getOrElseUpdate(key, new Object).synchronized {
      if (!written.contains(key)) {
        // stale marker (data lost after a completed stage): rebuild
        if (marker(key).isFile && !hasData(new java.io.File(dataDir)))
          forget(key)
        if (!marker(key).isFile) {
          write
          if (!hasData(new java.io.File(dataDir)))
            throw new IllegalStateException(
              s"Staging.once('$key'): write left no data at '$dataDir'. " +
                "Keys must be <dir> or <dir>@step pointing at the staged " +
                "data, or pass the data path via once(key, dataDir).")
          val m = marker(key)
          Option(m.getParentFile).foreach(_.mkdirs())
          m.createNewFile()
        }
        written(key) = true
      }
    }

  /** [[once]] for a step that APPENDS into directories that already hold
    * committed files (delta admission: ANN codes, lexical postings).
    * Plain [[once]] is NOT crash-safe for appends: a writer dying between
    * the append and the marker leaves the dead attempt's part files in
    * place, indistinguishable from base files, and the retry appends a
    * second copy — silent double-admission. Protocol: before the first
    * append, snapshot the names of every pre-existing file under `dirs`
    * into a `<key>.pre` manifest (temp-file + atomic rename); a retry
    * that finds the manifest without the marker deletes every file NOT in
    * the snapshot (the dead attempt's output) before re-running `write`.
    * The manifest is removed only after the marker is durable, so every
    * crash point — before the manifest, mid-append, after the append,
    * after the marker — replays to exactly-once admission. */
  def onceAppend(key: String, dirs: Seq[String])(write: => Unit): Unit =
    locks.getOrElseUpdate(key, new Object).synchronized {
      if (!written.contains(key)) {
        if (marker(key).isFile) {
          preManifest(key).delete() // leftover from a crash post-marker
        } else {
          val pre = preManifest(key)
          Option(pre.getParentFile).foreach(_.mkdirs())
          if (pre.isFile) {
            // dead attempt detected: roll back its files, keep the snapshot
            val keep = java.nio.file.Files.readAllLines(pre.toPath)
              .toArray.map(_.toString).toSet
            listFilesUnder(dirs).filterNot(f => keep(f.getPath))
              .foreach(_.delete())
          } else {
            val tmp = new java.io.File(key + ".pre.tmp")
            java.nio.file.Files.writeString(tmp.toPath,
              listFilesUnder(dirs).map(_.getPath).mkString("\n"))
            java.nio.file.Files.move(tmp.toPath, pre.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          write
          val m = marker(key)
          Option(m.getParentFile).foreach(_.mkdirs())
          m.createNewFile()
          pre.delete()
        }
        written(key) = true
      }
    }

  private def listFilesUnder(dirs: Seq[String]): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    dirs.map(new java.io.File(_)).filter(_.exists).flatMap(walk)
  }

  /** Forget a stage so the next [[once]] re-writes it — the in-session
    * corpus-rewrite hook (Dedup.invalidateClusters routes here). Drops
    * the durable marker too, so invalidation survives into the next JVM. */
  def forget(key: String): Unit = {
    written.remove(key); marker(key).delete(); preManifest(key).delete(); ()
  }

  /** Spec probe: the file list [[onceAppend]] would snapshot for `dirs`. */
  private[graft] def listFilesForTest(dirs: Seq[String]): Seq[String] =
    listFilesUnder(dirs).map(_.getPath)

  /** Spec probe: has `key` been staged in this JVM? */
  def isStaged(key: String): Boolean = written.contains(key)

  /** Spec-only hook simulating a JVM restart for one key: drops the
    * in-memory memo but KEEPS the durable marker, so the next [[once]]
    * must decide from disk state alone. */
  private[graft] def dropMemoForTest(key: String): Unit = {
    written.remove(key); ()
  }
}

package graft

/** JVM-wide cache of per-(query, source-dir) scratch directories.
  *
  * Declared queries that stage data under /tmp must not allocate a fresh
  * temp dir — and register a fresh JVM shutdown hook — on every
  * invocation: a bench run invokes each query several times, and the
  * accumulated hooks and dead copies grow until JVM exit (ADVICE r11 on
  * q142/q137). The discipline, shared with SourceFormats' private cache:
  * ONE directory and ONE shutdown hook per key for the life of the JVM;
  * repeated invocations reuse (and may overwrite inside) that directory.
  *
  * Cross-JVM safety comes from `createTempDirectory` uniqueness — two
  * concurrent JVMs never share a WorkDirs path, so there is nothing to
  * coordinate (unlike the SHARED /tmp layouts, which need the staged-
  * generation discipline in ScaleOps.Layouts).
  */
object WorkDirs {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Recursive delete, shared by the cache's shutdown hooks and the ops
    * that retire their own staging/orphan dirs (TimeTravel). */
  private[graft] def deleteTree(p: java.nio.file.Path): Unit =
    deleteRecursively(p)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** The cached scratch root for `key` (created on first use, removed by
    * a single shutdown hook). `prefix` only seeds the temp-dir name. */
  def cached(prefix: String, key: String): String =
    cache.computeIfAbsent(key, { _ =>
      val p = java.nio.file.Files.createTempDirectory(prefix)
      sys.addShutdownHook(deleteRecursively(p))
      p.toString
    })

  /** A per-invocation subdirectory under the cached root that must start
    * EMPTY each time (e.g. a streaming checkpoint the MEMORY sink refuses
    * to recover from): the previous generation is deleted first, so disk
    * stays bounded at one generation regardless of invocation count. */
  def freshSubdir(prefix: String, key: String, sub: String): String = {
    val root = cached(prefix, key)
    val p = java.nio.file.Paths.get(root, sub)
    deleteRecursively(p)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Concurrency-safe publication of a layout SHARED ACROSS JVMs under a
    * fixed /tmp path (r11 verdict #2 — a concurrent Verify JVM tore a
    * live layout mid-scan by rewriting it in place).
    *
    * The layout's identity is the md5 of its manifest — a pure function
    * of the build inputs — so its path is deterministic:
    * `<base>/gen-<md5>`. A JVM that finds that generation PUBLISHED
    * (byte-equal `_graft_layout` manifest inside it) uses it as-is;
    * otherwise it builds into a private `.stage-<uuid>` sibling and
    * publishes with ONE atomic rename. Two JVMs racing both build; the
    * loser's rename fails against the already-published dir and its
    * staging is discarded. A published generation is therefore immutable:
    * never overwritten, never mutated in place — the discipline a table
    * format's commit protocol provides on a shared object store.
    *
    * Sibling generations are NOT collected at publish time (r12 verdict
    * #1): two different manifests under one base are different live
    * VARIANTS, not superseded history — e.g. ScaleOpsSpec's
    * maxRecordsPerFile=2000 layout racing q70's default-50000 build in a
    * concurrent Verify JVM; eager GC let whichever JVM published second
    * delete the other's generation mid-scan. Instead, every resolution
    * refreshes the generation's mtime and each publish sweeps only
    * siblings untouched for [[sweepAgeMs]] — a generation can be
    * reclaimed only after no JVM has resolved it for that window, while
    * scans happen within seconds of resolution. */
  private[graft] val sweepAgeMs: Long = 60L * 60 * 1000

  private def refreshMtime(p: java.nio.file.Path): Unit =
    try java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => } // best effort: sweep is advisory

  def publishedLayout(base: String, manifest: String)
      (build: String => Unit): String = {
    // 12 hex chars (48 bits) of the md5: ample for distinguishing the
    // handful of manifest versions a base ever sees, and short enough
    // that plan strings still show the subpaths under the generation
    // (FileScan locations truncate at spark.sql.maxMetadataStringLength).
    val genPath = s"$base/gen-${md5Hex(manifest).take(12)}"
    // The manifest is written into the staging dir LAST and the dir then
    // renamed atomically, so a visible, byte-equal manifest ⇒ the whole
    // generation is complete — no separate _SUCCESS marker needed (multi-
    // subdir layouts have no single top-level one anyway).
    def published = {
      val mPath = java.nio.file.Paths.get(s"$genPath/_graft_layout")
      java.nio.file.Files.exists(mPath) &&
        new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8") == manifest
    }
    if (published) {
      // keep a live variant out of the age-based sweep's reach
      refreshMtime(java.nio.file.Paths.get(genPath))
    } else {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      // NOT dot-prefixed: Spark refuses to write into a hidden dir ("All
      // paths were ignored"); nothing ever lists `base` for data — readers
      // go straight to their gen path — so visibility is irrelevant.
      val stage =
        java.nio.file.Paths.get(s"$base/stage-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.createDirectories(stage)
      try {
        build(stage.toString)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$stage/_graft_layout"),
          manifest.getBytes("UTF-8"))
        java.nio.file.Files.move(stage,
          java.nio.file.Paths.get(genPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        // Sweep only STALE siblings (untouched for sweepAgeMs) after the
        // new generation is live; recently-resolved variants stay.
        val cutoff = System.currentTimeMillis() - sweepAgeMs
        Option(new java.io.File(base).listFiles()).foreach(_
          .filter(f => f.getName.startsWith("gen-") &&
            f.getAbsolutePath != genPath && f.lastModified() < cutoff)
          .foreach(f => deleteRecursively(f.toPath)))
      } catch {
        // both the lost-race shapes: target appeared between check & move
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException if published =>
      } finally deleteRecursively(stage)
    }
    genPath
  }
}

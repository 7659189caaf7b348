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
}

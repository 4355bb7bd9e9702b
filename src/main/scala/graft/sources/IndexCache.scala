package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-JVM build-once registry for persisted index directories (IVF lists,
  * near-dup cluster assignments). Keyed by a caller-chosen string (include
  * the data directory so different SFs never share an index); the builder
  * runs exactly once per key per JVM, later callers get the same path —
  * so benchmark reps and downstream queries time the LOAD+use, matching
  * the amortized build-once contract, and no temp directories leak (one
  * per key per run, removed by a shutdown hook). */
object IndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }

  /** Return the index directory for `key`, building it first if this JVM
    * has not yet done so. `build` receives the directory path and must
    * write the index there synchronously. */
  def dirFor(key: String)(build: String => Unit): String =
    cache.computeIfAbsent(key, { _ =>
      val d = Files.createTempDirectory("graft_idx_")
      sys.addShutdownHook(deleteRecursively(d))
      build(d.toString)
      d.toString
    })
}

package graft.util

/** Small filesystem helpers shared by the managed-storage paths
  * (bucketed-table hygiene, FactStore retention). */
object Fs {

  /** Recursive delete, children before parents; no-op for a missing
    * path. Both callers delete MANAGED directories this library wrote
    * itself — never user data. */
  def deleteRecursively(path: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
}

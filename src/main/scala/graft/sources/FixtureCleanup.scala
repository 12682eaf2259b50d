package graft.sources

/** Exit-time cleanup for app-id-scoped fixture trees.
  *
  * The attachment / paged-ingest "download" stages write under
  * `/tmp/<family>/<applicationId>/...` so concurrent sessions can't
  * race each other's trees — but that scoping also means no LATER run
  * ever reuses the path, so without cleanup every run leaves its tree
  * behind. Each materializer registers its root here once; a JVM
  * shutdown hook deletes the process's own trees (best-effort — a
  * kill -9 still leaks, which is /tmp's lifecycle to reclaim).
  */
/** Shared protocol for app-id-scoped /tmp artifact trees (attachment
  * fixtures, persisted indexes): one place owns the root naming and the
  * completion-marker convention so the copies cannot drift.
  *
  * The `_`-prefixed marker is hidden to Spark's file index and sits
  * outside every extension glob, so it never appears as data.
  */
private[sources] object ScopedFixture {
  def root(s: org.apache.spark.sql.SparkSession, family: String, dir: String): String =
    s"/tmp/$family/" + s.sparkContext.applicationId + "/" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")

  private def marker(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, "_GRAFT_COMPLETE")

  def isComplete(root: String): Boolean =
    java.nio.file.Files.exists(marker(root))

  def markComplete(root: String): Unit = {
    val m = marker(root)
    java.nio.file.Files.createDirectories(m.getParent)
    java.nio.file.Files.write(m, Array.emptyByteArray)
  }
}

private[sources] object FixtureCleanup {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def onExit(root: String): Unit =
    if (registered.add(root)) {
      val _ = sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(root)
        if (java.nio.file.Files.exists(p)) {
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala
            .foreach(f => try java.nio.file.Files.delete(f)
              catch { case _: Exception => () })
        }
        // the per-app parent is shared by this app's fixture dirs only;
        // remove it once the last child is gone
        try java.nio.file.Files.delete(p.getParent)
        catch { case _: Exception => () }
      }
    }
}

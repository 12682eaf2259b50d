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

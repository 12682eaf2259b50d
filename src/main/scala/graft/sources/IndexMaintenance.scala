package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-atomic maintenance verbs shared by the persisted index
  * lifecycles ([[Bm25Index]], [[PhraseIndex]], [[PqIndex]],
  * [[GraphIndex]]).
  *
  * The compaction swap follows the Snapshots atomic-commit convention
  * (never delete live data before its replacement is in place): the
  * old `delete(cur); rename(tmp, cur)` sequence had a crash window in
  * which the index root held NO data tree at all — the rows survived
  * only in the `*_compacting` temp, invisible to every read path.
  * [[swap]] renames aside instead (`cur`→`cur_old`, `tmp`→`cur`,
  * delete `cur_old`): every crash point leaves at least one COMPLETE
  * copy under a known name, and [[recover]] — invoked by the read and
  * compact paths — rolls an interrupted swap forward (the temp is
  * always fully written before the swap starts, so forward is safe).
  */
private[graft] object IndexMaintenance {

  /** Test seam for the crash-window specs: invoked between swap steps
    * with the step label; a spec injects a thrower to simulate a crash
    * at that exact point. Never set outside tests.
    */
  @volatile private[graft] var crashHook: String => Unit = _ => ()

  private def path(p: String) = new org.apache.hadoop.fs.Path(p)

  private def fs(s: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)

  private def asideName(cur: String) = cur + "_old"

  /** Replace directory `cur` with the fully-written `tmp`, crash-
    * atomically. Requires `tmp` complete (the caller's overwrite write
    * finished — Spark's committer made it appear all-or-nothing).
    */
  def swap(s: SparkSession, cur: String, tmp: String): Unit = {
    val f = fs(s)
    val old = asideName(cur)
    f.delete(path(old), true) // leftover aside from a crash already rolled forward
    crashHook("pre-aside")
    if (f.exists(path(cur))) f.rename(path(cur), path(old))
    crashHook("mid-swap") // the window the delete-then-rename form lost data in
    f.rename(path(tmp), path(cur))
    crashHook("pre-gc")
    f.delete(path(old), true)
  }

  /** Roll an interrupted [[swap]] of `cur` forward. Called before any
    * read plans over `cur` (and by compact itself): if `cur` is
    * missing, the complete temp (preferred — it is newer) or the aside
    * copy is moved back into place; a surviving aside next to a live
    * `cur` is garbage from a crash after the swap landed and is
    * reclaimed. No-op (three existence probes) in the steady state.
    */
  def recover(s: SparkSession, cur: String, tmp: String): Unit = {
    val f = fs(s)
    val old = asideName(cur)
    if (!f.exists(path(cur))) {
      if (f.exists(path(tmp))) f.rename(path(tmp), path(cur))
      else if (f.exists(path(old))) f.rename(path(old), path(cur))
      // the roll-forward changed cur's file set under any listing a
      // pre-crash read left in the session's FileStatusCache
      s.catalog.refreshByPath(cur)
    }
    if (f.exists(path(cur)) && f.exists(path(old))) f.delete(path(old), true)
  }

  /** Does the arriving batch re-add any currently tombstoned id?
    * FAISS `remove_ids` + `add` semantics require the re-added id to
    * resurrect — but merely clearing its tombstone would ALSO
    * resurrect the old physical rows still sitting in the data tree,
    * duplicating the id. The correct sequence is: physically reclaim
    * first (the index's own crash-atomic compact), THEN append fresh
    * rows — so every `append` probes this and compacts on overlap.
    * The probe is one existence check when no delete has run, and a
    * semi-join against the (delete-log-sized, never corpus-sized)
    * sidecar otherwise.
    */
  def tombstonesOverlap(s: SparkSession, root: String, keyCol: String,
                        batchIds: DataFrame): Boolean = {
    if (!fs(s).exists(path(s"$root/tombstones"))) return false
    !s.read.parquet(s"$root/tombstones")
      .join(batchIds.select(keyCol).distinct(), Seq(keyCol), "left_semi")
      .isEmpty
  }
}

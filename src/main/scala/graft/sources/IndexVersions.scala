package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version pinning for the standing INDEX artifacts — an index is a
  * dataset too: a training run that pins corpus version v must also
  * pin the index state that matches it, or a later append/delete
  * silently changes the ranking the run's decontamination and
  * retrieval audits were made against. This composes the
  * [[Snapshots]] manifest machinery with the multi-subtree layout the
  * three standing indexes share ([[Bm25Index]] postings+doclens
  * +tombstones, [[PhraseIndex]] postings+doclens, [[PqIndex]]
  * codes+meta+tombstones): one manifest per version, each line
  * `role<TAB>file`, committed with the same dot-temp + atomic-rename
  * + optimistic-concurrency write as dataset snapshots.
  *
  * A versioned read plans a scan over exactly the manifest's files
  * for a role, with `basePath` set so directory-partition columns
  * (`tshard=`/`cell=`) survive — partition PRUNING therefore still
  * prunes: the probe/shard filter intersects the manifest's file
  * list at planning, and an old version's query reads only that
  * version's pruned files.
  *
  * Commit cost: one recursive listing of the index tree, O(current
  * files) driver-side metadata. At 10⁶-file scale a production
  * committer would fold each batch's written-file list into the
  * manifest incrementally instead (the [[Snapshots.append]] shape —
  * the write path already knows its own files); the listing form
  * keeps the index write paths untouched.
  */
object IndexVersions {

  private def fs(s: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)

  private def walkFiles(f: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Seq[String] =
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) walkFiles(f, st.getPath)
      else if (st.isFile && st.getPath.getName.startsWith("part-"))
        Seq(st.getPath.toString)
      else Seq.empty
    }

  /** Snapshot the current state of `root`'s role subtrees as the next
    * version. Returns the committed version number.
    */
  def commit(s: SparkSession, root: String, roles: Seq[String]): Int = {
    val f = fs(s)
    val lines = roles.flatMap { role =>
      walkFiles(f, new org.apache.hadoop.fs.Path(s"$root/$role"))
        .sorted.map(path => s"$role\t$path")
    }
    var attempts = 0
    while (true) {
      val v = Snapshots.latestVersion(s, root) + 1
      try {
        Snapshots.writeManifest(s, root, v, lines)
        return v
      } catch {
        case e: Snapshots.ConcurrentCommitException =>
          attempts += 1
          if (attempts >= 16) throw e
      }
    }
    -1 // unreachable
  }

  def latest(s: SparkSession, root: String): Int =
    Snapshots.latestVersion(s, root)

  /** The files of `role` as of version v (empty if the role had none —
    * e.g. no tombstones yet at commit time).
    */
  def filesAt(s: SparkSession, root: String, v: Int,
              role: String): Seq[String] =
    Snapshots.readManifest(s, root, v).collect {
      case line if line.startsWith(role + "\t") =>
        line.substring(role.length + 1)
    }

  /** Scan `role` as of version v, with `basePath` preserving the
    * subtree's directory-partition columns (and their pruning). None
    * when the role had no files at v.
    */
  def readAt(s: SparkSession, root: String, v: Int,
             role: String): Option[DataFrame] = {
    val files = filesAt(s, root, v, role)
    if (files.isEmpty) None
    else Some(s.read.option("basePath", s"$root/$role").parquet(files: _*))
  }
}

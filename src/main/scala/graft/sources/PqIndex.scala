package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.{CentroidOps, PqOps}

/** Persisted IVF-PQ index (the FAISS `write_index`/`read_index` analogue,
  * Spark-native): the one-time encode pass materializes the corpus as an
  * encoded, CELL-PARTITIONED parquet table, and queries run against that
  * artifact alone — the raw vectors are touched only by the bounded
  * exact-rerank join. This operationalizes the claim the in-memory PQ
  * operators document ("in production the encoded table is materialized
  * once"): after `materialize`, a search session never re-trains and
  * never re-encodes.
  *
  * Layout under the index root:
  *   codes/          parquet (neighbor_id, codes int[m], rnorm), written
  *                   `partitionBy("cell")` — one directory per IVF cell,
  *                   so a probe set prunes to its cells' FILES at the
  *                   scan (PartitionFilters, no data read outside the
  *                   probed cells; at 100 TB this is the difference
  *                   between reading probe-fraction×corpus and corpus)
  *   meta/           1-row parquet sidecar: PQ codebook + IVF centroid
  *                   set (bounded metadata, ~40 KB)
  *
  * The probed cell list is computed driver-side from the (bounded) query
  * batch and pushed as an `isin` literal — a JOIN on cell would compute
  * the same rows but could not prune partitions at plan time.
  */
object PqIndex {

  /** App-id-scoped root (same rationale as Attachments.fixtureRoot:
    * concurrent sessions must not race on a shared /tmp tree; a real
    * deployment points this at shared storage).
    */
  def indexRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_pqindex", dir)

  /** One-time encode pass: train (memoized), assign cells + encode
    * map-side in the scan projection, write cell-partitioned codes and
    * the metadata sidecar. Marker-skipped on re-invocation.
    */
  def materialize(s: SparkSession, dir: String): String =
    materializeWhere(s, dir, lit(true), indexRoot(s, dir))

  /** [[materialize]] with an explicit corpus predicate and root — the
    * spec's handle for building a base index that a later [[append]]
    * grows (production never has "the whole corpus" on day one).
    */
  private[graft] def materializeWhere(s: SparkSession, dir: String,
                                      pred: org.apache.spark.sql.Column,
                                      root: String): String = {
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    val cb = Similarity.pqCodebook(s, dir)
    val cents = Similarity.seededCentroids(s, dir)
    encodeWith(Similarity.normed(s, dir).filter(pred), cb, cents)
      // cluster by cell before the partitioned write: without it every
      // writer task emits a file into every cell directory (tasks ×
      // cells small files); with it each cell's codes land in one file
      // per owning task — the layout a probe-pruned read wants
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root/codes")
    import s.implicits._
    Seq((cb.toSeq, cents.map(_._1), cents.map(_._2.toSeq), cents.map(_._3)))
      .toDF("cb", "cent_ids", "cent_vecs", "cent_norms")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    ScopedFixture.markComplete(root)
    root
  }

  /** The encode projection shared by [[materializeWhere]] and
    * [[append]]: given frozen codebook + centroids, identical inputs
    * produce identical (cell, codes, rnorm) rows — which is exactly why
    * append + search equals full re-encode search.
    */
  private def encodeWith(normed: DataFrame, cb: Array[Float],
                         cents: Seq[(Int, Array[Float], Double)]): DataFrame =
    normed
      .select(col("vec_id").as("neighbor_id"),
        CentroidOps.cell(col("e"), col("nrm"), cents).as("cell"),
        PqOps.encode(col("e"), cb, Similarity.PqM, Similarity.PqK, Similarity.PqDsub).as("codes"))
      .withColumn("rnorm",
        PqOps.reconNorm(col("codes"), cb, Similarity.PqM, Similarity.PqK, Similarity.PqDsub))

  /** Incremental append — the production index lifecycle (a daily batch
    * must not re-encode the corpus): encode the arriving vectors with
    * the FROZEN codebook and centroid set read back from the sidecar —
    * never retrained, so existing codes stay byte-identical and the
    * appended ones equal what a full re-encode would produce — and
    * append them into the same cell partitions (O(batch) work; the
    * standing corpus is not touched). Pairs with `q_dedup_incremental`
    * as the incremental half of the ANN story. Each append lands one
    * file per touched cell; run [[compact]] when accumulated batch
    * files start to dominate open/footer cost.
    */
  def append(s: SparkSession, root: String, batch: DataFrame): Unit = {
    val (cb, cents) = loadMeta(s, root)
    // roll forward a crash-interrupted compaction FIRST (an append onto
    // a mid-swap-crashed tree would recreate it with batch-only rows)
    IndexMaintenance.recoverAll(s, root, Seq("codes"))
    // re-appending a deleted id resurrects it (FAISS remove_ids + add):
    // on tombstone overlap compact first — physical reclaim — so the
    // fresh encode never coexists with the suppressed old rows
    if (IndexMaintenance.tombstonesOverlap(s, root, "neighbor_id",
        batch.select(col("vec_id").as("neighbor_id"))))
      compact(s, root)
    // an all-tombstoned compact leaves codes/ as ONE root-level empty
    // part file (unpartitioned — see compact); a partitioned append on
    // top would create leaf files at two depths and brick every later
    // read with 'Conflicting directory structures'. The root files
    // hold zero rows by construction, so drop them first.
    clearUnpartitionedEmpty(s, s"$root/codes")
    encodeWith(batch, cb, cents)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$root/codes")
  }

  /** Remove root-level part files from a directory that is otherwise
    * `key=value`-partitioned (the empty-index layout written by
    * [[compact]] when every row is tombstoned — those files are empty
    * by construction, so deleting them loses nothing).
    */
  private[sources] def clearUnpartitionedEmpty(s: SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p))
      fs.listStatus(p)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** Tombstone delete — the index lifecycle's third verb (FAISS
    * `remove_ids`; production indexes take doc takedowns and dedup
    * drops daily). O(batch): the ids append to a `tombstones/` parquet
    * sidecar and NO code file is rewritten — search anti-joins the
    * (deduped) tombstone set after cell pruning, and the next
    * [[compact]] physically reclaims the rows. Deleting an id not in
    * the index is a no-op by construction (anti-join semantics), as is
    * deleting twice.
    */
  def delete(s: SparkSession, root: String, ids: Seq[Long]): Unit =
    IndexMaintenance.deleteIds(s, root, "neighbor_id", ids)

  /** The tombstone sidecar, if any delete has run. */
  private def tombstones(s: SparkSession, root: String): Option[DataFrame] =
    IndexMaintenance.tombstones(s, root)

  /** Drop tombstoned ids from an encoded-codes frame. Applied AFTER
    * cell pruning so the anti-join touches only probed partitions; the
    * tombstone side is aggregated to distinct ids first (takedown logs
    * repeat), and AQE picks a broadcast anti-join while the set stays
    * small — at larger delete fractions the shuffle is O(probed codes),
    * and [[compact]] is the pressure valve that returns the index to
    * tombstone-free scans.
    */
  private def dropTombstoned(s: SparkSession, root: String,
                             codes: DataFrame): DataFrame =
    tombstones(s, root).fold(codes)(t =>
      codes.join(t.select("neighbor_id").distinct(), Seq("neighbor_id"), "left_anti"))

  /** Re-cluster the codes tree after a run of appends (the Export
    * .compact idea, kept partition-aware: a flat rewrite would lose the
    * cell directories and with them the probe-time PartitionFilters
    * pruning). One exchange on cell, atomic-ish directory swap.
    * Tombstoned rows are physically dropped in the rewrite and the
    * sidecar is cleared — after compact the scan carries no anti-join.
    */
  def compact(s: SparkSession, root: String): Unit = {
    IndexMaintenance.compactTree(s, root, "codes", "neighbor_id", Some("cell"))
    IndexMaintenance.clearTombstoneSidecar(s, root)
  }

  /** Read the metadata sidecar back: (codebook, centroid set). */
  private[graft] def loadMeta(s: SparkSession, root: String)
      : (Array[Float], Seq[(Int, Array[Float], Double)]) =
    metaFrom(s.read.parquet(s"$root/meta"))

  private def metaFrom(meta: DataFrame)
      : (Array[Float], Seq[(Int, Array[Float], Double)]) = {
    val r = meta.head()
    val cb = r.getSeq[Float](0).toArray
    val ids = r.getSeq[Int](1)
    val vecs = r.getSeq[Seq[Float]](2)
    val norms = r.getSeq[Double](3)
    (cb, ids.indices.map(i => (ids(i), vecs(i).toArray, norms(i))))
  }

  /** §2 catalog entry (`q_ann_pq_indexed`): materialize the index, then
    * answer the standard query batch FROM the persisted artifact —
    * training and corpus encode are absent from the query path by
    * construction (the sidecar, not the memo, supplies the codebook).
    * Identical output to `q_ann_ivfpq_topk` (shared search tail; the
    * equality is spec-asserted), so its quality is covered by the same
    * recall measurements.
    */
  def annPqIndexed(s: SparkSession, dir: String): DataFrame =
    searchRoot(s, dir, materialize(s, dir))

  // ---- versioned reads ----------------------------------------------------

  /** Snapshot the index's current state (codes + frozen-codebook
    * sidecar + tombstones) as the next version; [[searchAt]]
    * reproduces its ranking through later appends and deletes (both
    * additive on disk) AND through [[compact]] — a rewrite RETAINS the
    * replaced tree while versions pin it ([[IndexMaintenance.retire]]),
    * so only an explicit [[IndexVersions.expire]] bounds time travel.
    */
  def commitVersion(s: SparkSession, root: String): Int =
    IndexVersions.commit(s, root, Seq("codes", "meta", "tombstones"))

  /** Search the index AS OF version v: the codebook/centroids come
    * from v's sidecar manifest, the code scan plans over exactly v's
    * files (cell pruning intact via basePath partition discovery), and
    * v's tombstone set applies — so a pinned training run's neighbor
    * sets never move under it.
    */
  def searchAt(s: SparkSession, dir: String, root: String, v: Int): DataFrame = {
    val meta = IndexVersions.readAt(s, root, v, "meta").getOrElse(
      throw new IllegalStateException(s"version $v of $root has no sidecar"))
    val codes = IndexVersions.readAt(s, root, v, "codes").getOrElse(
      throw new IllegalStateException(s"version $v of $root has no codes"))
    searchFrames(s, dir, metaFrom(meta), codes,
      IndexVersions.readAt(s, root, v, "tombstones"))
  }

  /** Search an arbitrary index root (the spec's handle for querying a
    * base-plus-appends index against a full one).
    */
  private[graft] def searchRoot(s: SparkSession, dir: String, root: String): DataFrame = {
    // roll any crash-interrupted compaction swap forward before planning
    IndexMaintenance.recover(s, s"$root/codes", s"$root/codes_compacting")
    searchFrames(s, dir, loadMeta(s, root),
      s.read.parquet(s"$root/codes"), tombstones(s, root))
  }

  private def searchFrames(s: SparkSession, dir: String,
                           meta: (Array[Float], Seq[(Int, Array[Float], Double)]),
                           codesAll: DataFrame,
                           tomb: Option[DataFrame]): DataFrame = {
    val (cb, cents) = meta
    val probes = math.max(Similarity.IvfNProbe,
      math.ceil(cents.size * Similarity.IvfProbeFraction).toInt)
    val n = Similarity.normed(s, dir)
    // the query batch is bounded by construction: compute the probe
    // rows ONCE, collect them, and re-plan as a local relation — the
    // driver both extracts the probed cell set (for partition pruning)
    // and feeds the broadcast join from the same collected rows, so the
    // embeddings scan + centroid scoring never runs twice
    val qPlan = n.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("e").as("e_q"), col("nrm").as("n_q"),
        explode(CentroidOps.nearest(col("e"), col("nrm"), cents, probes)).as("cell"))
    val probeRows = qPlan.collect()
    val qProbes = s.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), qPlan.schema)
    val probedCells = probeRows.map(_.getAs[Int]("cell")).distinct
    val pruned = codesAll.filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    val encoded = tomb.fold(pruned)(t =>
      pruned.join(t.select("neighbor_id").distinct(), Seq("neighbor_id"), "left_anti"))
    Similarity.ivfPqSearch(encoded, qProbes,
      n.select(col("vec_id").as("neighbor_id"), col("e").as("e_c"), col("nrm").as("n_c")), cb)
  }
}

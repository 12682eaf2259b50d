package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Bpe

/** Persisted BPE tokenizer artifact (the `tokenizer.json` analogue,
  * Spark-native — and the PqIndex lifecycle applied to the tokenizer):
  * training a tokenizer is a corpus-scale job that runs ONCE; every
  * later pipeline stage (encode, fertility, packing, vocab coverage)
  * applies the frozen artifact to whatever data arrives next. The
  * artifact is two bounded parquet sidecars:
  *
  *   merges/   (merge_rank, lhs, rhs, merged, freq) — the ordered merge
  *             list, i.e. the entire inference-time state of a BPE
  *             tokenizer (BpeRounds rows)
  *   vocab/    (subword, freq) — the induced top-K vocabulary, for
  *             consumers that need membership (coverage audits) rather
  *             than segmentation
  *
  * [[encodePersisted]] proves the round trip: reload the merges and
  * encode the corpus through `Bpe.encodeFrameWith` — the SAME map-only
  * encode pass the in-memory operator uses — producing cell-identical
  * output to `q_bpe_encode` (one shared DuckDB oracle covers both).
  * [[encodeCorpusWith]] is the production entry: frozen artifact, NEW
  * documents, no learner anywhere on the path.
  */
object TokenizerArtifact {

  /** App-id-scoped root (the PqIndex rationale: concurrent sessions
    * must not race on a shared /tmp tree; a real deployment points
    * this at shared storage).
    */
  def artifactRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_bpetok", dir)

  /** One-time train-and-save: runs the (memoized) learner and writes
    * both sidecars. Marker-skipped on re-invocation — the artifact is
    * immutable once written, like a shipped tokenizer release.
    */
  def materialize(s: SparkSession, dir: String): String = {
    val root = artifactRoot(s, dir)
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    Bpe.bpeMerges(s, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/merges")
    Bpe.bpeVocab(s, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/vocab")
    ScopedFixture.markComplete(root)
    root
  }

  /** Reload the ordered merge list — the tokenizer's full inference
    * state (BpeRounds rows; bounded driver metadata by construction).
    */
  def loadMerges(s: SparkSession, root: String): Seq[(Int, String, String, String, Long)] =
    s.read.parquet(s"$root/merges")
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  /** Encode ANY documents frame with the frozen artifact at `root` —
    * the production path: the learner never runs, the merge list is
    * driver state, the encode is map-only riding the scan.
    */
  def encodeCorpusWith(s: SparkSession, root: String, docs: DataFrame): DataFrame =
    Bpe.encodeFrameWith(docs, loadMerges(s, root)).drop("lang")

  /** `q_bpe_persisted`: materialize (marker-skipped after the first
    * call), reload, encode — output cell-identical to `q_bpe_encode`,
    * which is exactly the artifact contract: save + load + apply ==
    * the in-memory tokenizer. Rides the session-cached encode frame
    * keyed by the LOADED merge list, so it shares `q_bpe_encode`'s one
    * encode pass exactly when the artifact round-tripped faithfully (a
    * corrupted reload keys a separate frame and hash-fails its oracle).
    */
  def encodePersisted(s: SparkSession, dir: String): DataFrame = {
    val root = materialize(s, dir)
    Bpe.encodeFrameCached(s, dir, loadMerges(s, root))
      .drop("lang")
      .orderBy("doc_id")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents corpus (SURVEY §2.6).
  *
  * All pure `functions._` column arithmetic — single scan, no shuffle
  * except final presentation sort; at 100 TB these are embarrassingly
  * parallel map-only plans that stay inside whole-stage codegen.
  */
object TextAnalysis {

  /** §2.6 #32 — whitespace + BPE-ish regex token counts. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy("doc_id")

  /** §2.6 #33 — composite quality score (length/punct/stopword ratios). */
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** §2.6 #34 — language-ID heuristic (marker-token overlap argmax). */
  def languageId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("declared_lang"),
        langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** §2.6 #35 — portable rolling-hash document fingerprint. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), docFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** PII scrubbing — the redaction pass every training-data pipeline
    * runs before tokenization: emails, URLs, and long digit runs become
    * placeholder tokens. Pure codegen'd regexp chain.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"),
              """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""", "<EMAIL>"),
            """https?://[^\s]+""", "<URL>"),
          "[0-9]{6,}", "<NUM>").as("scrubbed"))
      .orderBy("doc_id")

  val ContaminationEvalDocs = 5
  val ContaminationShingleN = 5

  /** Benchmark-contamination detection: corpus documents sharing any
    * word 5-gram with the held-out eval set (doc_id < 5 stands in for
    * the benchmark). Semi join on shingle hashes — O(matches) shuffle,
    * the decontamination shape that scales to a 100 TB corpus vs a
    * fixed eval set (broadcast the eval shingles).
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), explode(shingleHashes(col("text"), ContaminationShingleN)).as("h"))
    val eval_ = docs.filter(col("doc_id") < ContaminationEvalDocs).select("h").distinct()
    docs.filter(col("doc_id") >= ContaminationEvalDocs)
      .join(broadcast(eval_), "h")
      .select("doc_id").distinct()
      .orderBy("doc_id")
  }

  /** §2.7 #36 — multimodal metadata plumbing: documents as opaque bytes
    * with typed metadata (byte length, content hash, prefix). The decode
    * step for true image/audio payloads lives in graft.multimodal (stubbed
    * codec, real schema/partitioning).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        substring(col("text"), 1, 16).as("prefix16"))
      .orderBy("doc_id")
}

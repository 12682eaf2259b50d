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

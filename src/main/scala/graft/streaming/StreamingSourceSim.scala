package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Streaming per-source MinHash signatures (the streaming twin of
  * `operators.CorpusCuration.sourceSim`'s sketch pass).
  *
  * MinHash is a MERGEABLE sketch: min is associative and commutative,
  * so the signature of a source's full history equals the
  * component-wise min of its per-batch signatures. Per micro-batch the
  * batch signature is built as the SAME distributed groupBy-min the
  * batch operator uses, and only the finished (sources × 16 longs)
  * frame crosses to the driver, where it merges component-wise into
  * running state inside `foreachBatch` — the StreamingHeavyHitters
  * shape with min instead of addition.
  *
  * State is O(|sources| · k) — a catalog dimension times a constant —
  * regardless of stream length; after any prefix of batches the state
  * equals the batch operator's signatures over the documents seen so
  * far (StreamingCurationSpec proves equality over a 3-way split).
  */
class StreamingSourceSim extends Serializable {

  private val sigs =
    scala.collection.mutable.HashMap.empty[String, Array[Long]]

  /** Merge one micro-batch of documents ((source, text) columns). */
  def mergeBatch(docs: DataFrame): Unit = {
    val ex = docs.select(col("source"),
      explode(TextFunctions.shingleHashes(col("text"), Dedup.ShingleN)).as("h"))
    val mins = Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map {
      case ((a, b), i) =>
        min(pmod(lit(a) * col("h") + lit(b), lit(TextFunctions.HashP))).as(s"m$i")
    }
    val batch = ex.groupBy("source").agg(mins.head, mins.tail: _*)
      .collect()
    this.synchronized {
      batch.foreach { r =>
        val src = r.getString(0)
        val bs = Array.tabulate(Dedup.MinhashA.size)(i => r.getLong(i + 1))
        sigs.get(src) match {
          case Some(cur) =>
            var i = 0
            while (i < cur.length) { cur(i) = math.min(cur(i), bs(i)); i += 1 }
          case None => sigs.update(src, bs)
        }
      }
    }
  }

  /** Current per-source signatures (component arrays are copies). */
  def current: Map[String, Seq[Long]] =
    this.synchronized { sigs.map { case (k, v) => k -> v.toSeq }.toMap }
}

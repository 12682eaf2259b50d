package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AudioSim

/** Audio → embedding bridge (`q_audio_sim`): the REAL javax.sound
  * decode must recover the closed-form generator's sample statistics
  * exactly (PCM16 is lossless), and the planted near-dup clip groups
  * must cluster with measured separation.
  */
class AudioSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("decoded stats equal the closed-form reference (decode∘encode == identity)") {
    val root = AudioSim.materialize(spark, sf)
    val got = spark.read.parquet(s"$root/stats")
      .orderBy("doc_id").collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rate"),
        r.getAs[Boolean]("header_match"), r.getAs[Long]("n_samples"),
        r.getSeq[Long](r.fieldIndex("seg_sums")).toSeq, r.getAs[Long]("zc"))
    }
    assert(got.length === AudioSim.AudioDocs)
    for ((id, rate, hm, n, segs, zc) <- got) {
      assert(rate === AudioSim.SampleRate, s"doc $id sample rate")
      assert(hm, s"doc $id: decoder format must match the AudioHeaders parse")
      assert(n === AudioSim.SampleN.toLong, s"doc $id sample count")
      val want = new Array[Long](AudioSim.Segs)
      var wzc = 0L
      var prev = 0
      for (t <- 0 until AudioSim.SampleN) {
        val v = AudioSim.synthSample(id, t)
        want(t * AudioSim.Segs / AudioSim.SampleN) += v
        if (t > 0 && ((prev < 0) != (v < 0))) wzc += 1
        prev = v
      }
      assert(segs === want.toSeq, s"doc $id segment sums")
      assert(zc === wzc, s"doc $id zero crossings")
    }
  }

  test("near-duplicate clips cluster: every planted group yields its pair set") {
    val rows = AudioSim.audioSim(spark, sf).collect()
    assert(rows.forall(_.getAs[Boolean]("same_group")),
      "no cross-group pair clears the threshold at the measured separation")
    val members = AudioSim.AudioDocs / AudioSim.Groups
    val wantPairs = AudioSim.Groups * members * (members - 1) / 2
    assert(rows.length === wantPairs,
      s"every within-group pair (C($members,2) × ${AudioSim.Groups}) must clear CosT")
    assert(rows.forall(_.getAs[Double]("cos_sim") >= AudioSim.CosT))
    // the pair join is the tiled equi-join — no nested loop
    val p = AudioSim.audioSim(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"clip pair join must stay a tile equi-join:\n$p")
    // the query path serves from the stats artifact, never the payloads
    val files = AudioSim.audioSim(spark, sf).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/stats")),
      "query reads only the decoded-stats artifact")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ImageSim

/** Multimodal → embedding bridge (`q_image_sim`): the REAL ImageIO
  * decode must recover the closed-form generator's pixel statistics
  * exactly, and the planted near-dup image groups must cluster.
  */
class ImageSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("decoded stats equal the closed-form reference (decode∘encode == identity)") {
    val root = ImageSim.materialize(spark, sf)
    val got = spark.read.parquet(s"$root/stats")
      .orderBy("doc_id").collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Double]("mean_r"),
        r.getAs[Double]("mean_g"), r.getAs[Double]("mean_b"),
        r.getSeq[Long](r.fieldIndex("hist_luma")).toSeq,
        r.getAs[Boolean]("header_match"))
    }
    assert(got.length === ImageSim.ImageDocs)
    for ((id, mr, mg, mb, hist, hm) <- got) {
      assert(hm, s"doc $id: decoded dims must match the header parse")
      val n = ImageSim.ImgW * ImageSim.ImgH
      var sr = 0L; var sg = 0L; var sb = 0L
      val h = new Array[Long](graft.multimodal.Pixels.HistBins)
      for (idx <- 0 until n) {
        val r = ImageSim.synthChannel(id, idx, 0)
        val g = ImageSim.synthChannel(id, idx, 1)
        val b = ImageSim.synthChannel(id, idx, 2)
        sr += r; sg += g; sb += b
        h(((299 * r + 587 * g + 114 * b) / 1000) * graft.multimodal.Pixels.HistBins / 256) += 1
      }
      assert(mr === sr.toDouble / n, s"doc $id mean_r")
      assert(mg === sg.toDouble / n, s"doc $id mean_g")
      assert(mb === sb.toDouble / n, s"doc $id mean_b")
      assert(hist === h.toSeq, s"doc $id luma histogram")
    }
  }

  test("near-duplicate images cluster: every planted group yields its pair set") {
    val rows = ImageSim.imageSim(spark, sf).collect()
    assert(rows.forall(_.getAs[Boolean]("same_group")),
      "no cross-group pair clears the threshold at the planted separation")
    val members = ImageSim.ImageDocs / ImageSim.Groups
    val wantPairs = ImageSim.Groups * members * (members - 1) / 2
    assert(rows.length === wantPairs,
      s"every within-group pair (C($members,2) × ${ImageSim.Groups}) must clear CosT")
    assert(rows.forall(_.getAs[Double]("cos_sim") >= ImageSim.CosT))
    // the pair join is the tiled equi-join — no nested loop
    val p = ImageSim.imageSim(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"image pair join must stay a tile equi-join:\n$p")
    // the query path serves from the stats artifact, never the raw text
    val files = ImageSim.imageSim(spark, sf).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/stats")),
      "query reads only the decoded-stats artifact")
  }
}

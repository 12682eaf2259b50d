package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{GraphAnn, Similarity}

/** Driver-local recall sweep for the graph-ANN parameter grid at a
  * given dir — everything (assignment, brute baseline, routed-bucket
  * rerank) computed in-process over the collected embeddings, so a
  * parameter point costs seconds, not a full distributed search.
  *
  * `runMain graft.tools.GraphSweep <sfDir>`
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata_sf1")
    val spark = graft.ShuffleDefaults(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = Similarity.normed(spark, dir)
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    spark.stop()
    val nQ = Similarity.NumQueries
    def cosV(a: Array[Float], an: Double, b: Array[Float], bn: Double): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j).toDouble * b(j).toDouble; j += 1 }
      if (an * bn > 0) s / (an * bn) else 0.0
    }
    val queries = all.filter(_._1 < nQ)
    // brute top-5 per query
    val want: Map[Long, Set[Long]] = queries.map { case (qid, qv, qn) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v, n) => (cosV(qv, qn, v, n), id) }
        .sortBy { case (s, id) => (-s, id) }.take(Similarity.TopK)
        .map(_._2).toSet
    }.toMap
    // node sample (same rule as GraphAnn.graph)
    val cap = Similarity.TrainSampleCap
    val sample =
      if (all.length <= cap) all
      else {
        // replicate trainingSample: keep xxhash64(vec_id) % stride == 0,
        // ordered by (hash, id), take cap — approximated here by the
        // distributed call in production; for the sweep use every
        // ceil(n/cap)-th by hash rank
        val stride = math.ceil(all.length.toDouble / cap).toLong
        all.map(t => (org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(t._1, org.apache.spark.sql.types.LongType, 42L), t))
          .filter(_._1 % stride == 0)
          .sortBy { case (h, t) => (h, t._1) }.take(cap.toInt).map(_._2)
          .sortBy(_._1)
      }
    for (m <- Seq(8); efb <- Seq(32)) {
      val g = {
        val saveM = (m, efb)
        // buildGraph reads object constants; emulate via local build
        buildWith(sample.map(_._1), sample.map(_._2), sample.map(_._3), m, efb)
      }
      // SPANN closure assignment: each corpus vector posts to its R
      // nearest nodes (R=1 is plain argmax)
      def topNodes(v: Array[Float], n: Double, r: Int): Seq[Int] =
        g.ids.indices.map(i => (cosV(v, n, g.vecs(i), g.norms(i)), i))
          .sortBy { case (s, i) => (-s, i) }.take(r).map(_._2)
      for (rep <- Seq(1, 2, 4, 8)) {
        val byNode = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]]
        all.foreach { t =>
          topNodes(t._2, t._3, rep).foreach(nd =>
            byNode.getOrElseUpdate(nd, scala.collection.mutable.ArrayBuffer.empty) += t)
        }
        for (ef <- Seq(128, 256); probes <- Seq(32, 64)) {
          var hit = 0; var tot = 0
          queries.foreach { case (qid, qv, qn) =>
            val routed = GraphAnn.beamSearch(g, qv, qn, ef).take(probes)
            val cands = routed.flatMap(byNode.getOrElse(_, Nil))
              .distinctBy(_._1).filter(_._1 != qid)
            val got = cands.map { case (id, v, n) => (cosV(qv, qn, v, n), id) }
              .sortBy { case (s, id) => (-s, id) }.take(Similarity.TopK).map(_._2).toSet
            hit += (want(qid) & got).size
            tot += want(qid).size
          }
          println(f"[sweep] M=$m%2d efBuild=$efb%3d rep=$rep efSearch=$ef%3d probes=$probes%3d recall5=${hit * 100 / math.max(1, tot)}%3d")
        }
      }
    }
  }

  private def buildWith(ids: Array[Long], vecs: Array[Array[Float]],
                        norms: Array[Double], m: Int, efb: Int): GraphAnn.Graph =
    GraphAnn.buildGraphParams(ids, vecs, norms, m, efb)
}

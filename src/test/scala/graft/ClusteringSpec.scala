package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Clustering, Similarity}

/** Round-9 cluster-curation family: per-cell topic profile,
  * SSL-prototypes pruning, and the streaming topic-mix twin — each
  * checked against an independent plain-Scala reference over the
  * collected corpus (sequential-fold dot, the engines' shared
  * arithmetic contract).
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private lazy val corpus: Seq[(Long, Array[Float], Int)] =
    Tables.embeddings(spark, sf).orderBy("vec_id").collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))
    }.toSeq

  /** Independent local replica of the LEARNED centroid training (r10)
    * — the test-shared [[LocalCentroids]] machinery, written from the
    * collected corpus, not by calling the operator's trainer.
    */
  private def localLearnedCents(): Seq[(Int, Array[Float], Double)] =
    LocalCentroids.lloyd(corpus.map(v => (v._1, v._2)), Similarity.KMeansIters)

  private def localAssignedTo(cents0: Seq[(Int, Array[Float], Double)])
      : Seq[(Long, Int, Int, Double)] =
    LocalCentroids.assign(corpus, cents0)

  private def localAssigned(): Seq[(Long, Int, Int, Double)] =
    localAssignedTo(localLearnedCents())

  test("the operator's learned centroid set equals the independent local Lloyd replica") {
    val want = localLearnedCents()
    val got = Clustering.curationCentroids(spark, sf).sortBy(_._1)
    assert(got.map(_._1) === want.map(_._1), "cell ids (and survivors) match")
    for (((wid, wv, wn), (gid, gv, gn)) <- want.zip(got.sortBy(_._1))) {
      assert(wid === gid)
      assert(wv.toSeq === gv.toSeq, s"centroid $wid drifted")
      assert(wn === gn)
    }
  }

  test("learned cells improve mean cohesion over the seeded init") {
    def meanCos(cents: Seq[(Int, Array[Float], Double)]): Double = {
      val asg = localAssignedTo(cents)
      asg.map(_._4).sum / asg.size
    }
    val seeded = meanCos(Similarity.seededCentroids(spark, sf))
    val learned = meanCos(localLearnedCents())
    info(f"mean cosine to own centroid: seeded=$seeded%.4f learned=$learned%.4f")
    assert(learned > seeded,
      "Lloyd rounds should tighten clusters (the ivf2-recall precedent)")
  }

  test("topic clusters match an independent local reference exactly") {
    val asg = localAssigned()
    val byCell = asg.groupBy(_._3).toSeq.sortBy(_._1)
    val want = byCell.map { case (cell, ms) =>
      val n = ms.size.toLong
      val micro = ms.map(m => math.floor(m._4 * 1e6 + 0.5).toLong).sum
      val labCnt = ms.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (topLab, topCnt) = labCnt.minBy { case (l, c) => (-c, l) }
      (cell, n,
        math.floor(micro.toDouble / n + 0.5) / 1e6,
        topLab,
        math.floor(topCnt.toDouble / n * 1e4 + 0.5) / 1e4)
    }
    val got = Clustering.topicClusters(spark, sf).collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getDouble(4))
    }.toSeq
    assert(got === want)
    assert(got.map(_._2).sum === Tables.embeddings(spark, sf).count(),
      "every vector lands in exactly one cell")
  }

  test("prototype prune: per-cell quota, rank order, and verdicts match the reference") {
    val asg = localAssigned()
    val want = asg.groupBy(_._3).toSeq.flatMap { case (cell, ms) =>
      val cut = (ms.size + Clustering.PruneDen - Clustering.PruneNum).toLong /
        Clustering.PruneDen
      ms.sortBy { case (id, _, _, sc) => (-sc, id) }.zipWithIndex.map {
        case ((id, _, _, sc), i) =>
          val cosC = BigDecimal(sc)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, cell, cosC, (i + 1).toLong, (i + 1).toLong <= cut)
      }
    }.sortBy(_._1)
    val got = Clustering.prototypePrune(spark, sf).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))
    }.toSeq
    assert(got === want)
    // quota sanity: each cell prunes exactly ⌈n/4⌉
    val quotas = got.groupBy(_._2).map { case (_, ms) =>
      (ms.count(_._5).toLong, (ms.size + 3).toLong / 4)
    }
    assert(quotas.forall { case (p, q) => p === q })
  }

  test("cluster mix caps every cell at the uniform share, deterministically") {
    val asg = localAssigned()
    val total = asg.size.toLong
    val cells = asg.map(_._3).distinct.size.toLong
    val cap = (total + cells - 1) / cells
    val want = asg.groupBy(_._3).toSeq.flatMap { case (_, ms) =>
      ms.sortBy { case (id, _, _, _) =>
        ((id * Clustering.MixHashA) % graft.functions.TextFunctions.HashP, id)
      }.zipWithIndex.map { case ((id, _, _, _), i) => (id, (i + 1).toLong <= cap) }
    }.toMap
    val got = Clustering.clusterMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got === want)
    // per-cell kept counts: min(cap, cell size); rerun is identical
    val byCell = Clustering.clusterMix(spark, sf).collect()
      .groupBy(_.getInt(1))
    byCell.foreach { case (_, ms) =>
      assert(ms.count(_.getBoolean(2)).toLong ===
        math.min(cap, ms.length.toLong))
    }
    val again = Clustering.clusterMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(again === got, "selection is a property of the data — rerun-stable")
  }

  test("streaming topic mix equals the batch operator over any split, incl. restore") {
    val emb = Tables.embeddings(spark, sf)
    def slice(r: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === r)
    // the twin freezes the same LEARNED artifact the batch family
    // clusters against (the frozen-artifact contract: retraining
    // mid-stream would change cell identities)
    val cents = Clustering.curationCentroids(spark, sf)
    val twin = new graft.streaming.StreamingTopicMix(cents)
    twin.mergeBatch(spark, slice(0)); twin.mergeBatch(spark, slice(1))
    val snap = java.nio.file.Files.createTempDirectory("graft_topicsnap").toString
    twin.snapshot(spark, snap)
    val resumed = graft.streaming.StreamingTopicMix.restore(spark, snap)
    resumed.mergeBatch(spark, slice(2))
    twin.mergeBatch(spark, slice(2))
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getDouble(4))
    val want = Clustering.topicClusters(spark, sf).collect().map(key).toSeq
    assert(twin.current(spark).collect().map(key).toSeq === want,
      "merged grouped stats reproduce the batch profile exactly")
    assert(resumed.current(spark).collect().map(key).toSeq === want,
      "restore + remaining batches == uninterrupted monitor == batch")
  }

  test("streaming cluster mix equals the batch keep-set over any split, incl. restore") {
    val emb = Tables.embeddings(spark, sf)
    def slice(r: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === r)
    val cents = Clustering.curationCentroids(spark, sf)
    val sink = java.nio.file.Files.createTempDirectory("graft_mixsink").toString
    val twin = new graft.streaming.StreamingClusterMix(cents, sink)
    twin.mergeBatch(spark, slice(0)); twin.mergeBatch(spark, slice(1))
    // mid-stream: counters are live O(cells) state, consistent with the
    // accumulated sink without scanning it
    val partial = slice(0).count() + slice(1).count()
    assert(twin.cellCounts.values.sum === partial)
    val snap = java.nio.file.Files.createTempDirectory("graft_mixsnap").toString
    twin.snapshot(spark, snap)
    val resumed = graft.streaming.StreamingClusterMix.restore(spark, snap, sink)
    resumed.mergeBatch(spark, slice(2))
    def keeps(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
    val want = keeps(Clustering.clusterMix(spark, sf))
    assert(keeps(resumed.current(spark)) === want,
      "restore + remaining batches == batch keep-set exactly")
    // counter-derived cap matches the cap the verdict view cut on
    val total = emb.count()
    val cells = want.map(_._2).distinct.size.toLong
    assert(resumed.capFromState === (total + cells - 1) / cells)
    assert(resumed.cellCounts.values.sum === total)
  }

  test("the curation family shares one cell partition and broadcasts the centroid join") {
    // one LEARNED centroid set across the family (SemDeDup stays on the
    // seeded set by design — its oracle freezes that choice); every
    // member must see the identical partition of the corpus
    val mine = Clustering.topicClusters(spark, sf)
      .agg(sum(col("n_vecs"))).collect()(0).getLong(0)
    val cells = Clustering.topicClusters(spark, sf)
      .select("cell").collect().map(_.getInt(0)).toSet
    val pruneCells = Clustering.prototypePrune(spark, sf)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    val mixCells = Clustering.clusterMix(spark, sf)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells === pruneCells && cells === mixCells,
      "the family members see the identical cell partition")
    assert(mine === Tables.embeddings(spark, sf).count())
    val plan = Clustering.prototypePrune(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "centroid score join must broadcast the bounded centroid table")
    assert(!plan.contains("BroadcastNestedLoop"),
      "no cartesian/nested-loop fallback in the scoring join")
    assert(plan.contains("graft_nearest_cents"),
      "cell assignment rides the codegen argmin, not a join+window")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphAnn, Similarity}

/** Graph-routed ANN (`q_ann_hnsw_topk`): the driver-local NSW graph
  * must be deterministic, navigable (connected from the entry point),
  * degree-bounded, and the full two-stage search must hit its gated
  * recall against the exact in-catalog baseline.
  */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def sampleArrays() = {
    import org.apache.spark.sql.functions._
    val rows = Similarity.trainingSample(Similarity.normed(spark, sf))
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .sortBy(_.getLong(0))
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Float](1).toArray),
      rows.map(_.getDouble(2)))
  }

  test("graph build is deterministic, connected from the entry, degree-bounded") {
    val (ids, vecs, norms) = sampleArrays()
    val g1 = GraphAnn.buildGraph(ids, vecs, norms)
    val g2 = GraphAnn.buildGraph(ids, vecs, norms)
    assert(g1.nbrs.map(_.toSeq).toSeq === g2.nbrs.map(_.toSeq).toSeq,
      "same input, same edges — build must not depend on iteration chance")
    assert(g1.nbrs.forall(_.length <= GraphAnn.MaxDegree),
      "every node prunes to the degree cap")
    // BFS from the beam entry (node 0) must reach everything — an
    // unreachable island is silently invisible to every query
    val seen = new java.util.BitSet(ids.length)
    var frontier = List(0)
    seen.set(0)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(g1.nbrs(_)).filter { n =>
        val fresh = !seen.get(n); if (fresh) seen.set(n); fresh
      }
    }
    assert(seen.cardinality() === ids.length,
      s"graph must be connected from the entry: reached ${seen.cardinality()} of ${ids.length}")
    // beam search with ef >= n on a connected graph is exhaustive:
    // its best hit IS the global argmax (the navigability sanity check)
    val q = vecs(ids.length / 2)
    val qn = norms(ids.length / 2)
    val best = GraphAnn.beamSearch(g1, q, qn, ids.length).head
    assert(ids(best) === ids(ids.length / 2), "exhaustive beam finds the self-match")
  }

  test("graph-routed search hits the gated recall vs the exact baseline") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(Similarity.annBruteTopK(spark, sf))
    val got = pairs(GraphAnn.annHnswTopK(spark, sf))
    val recall = (want & got).size * 100 / math.max(1, want.size)
    info(s"graph-ANN recall@5 = $recall (gate 90; measured 100/98/96 at the 3 SFs)")
    assert(recall >= 90, s"recall $recall below the ann_hnsw_recall5 gate")
    // the corpus side is a broadcast equi-join on the routed bucket —
    // never a nested loop over the corpus
    val p = GraphAnn.annHnswTopK(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucket candidate join must stay an equi-join:\n$p")
  }

  test("bucketed regime: multi-vector buckets at shipped SF, gated recall") {
    // regime precondition: the corpus must EXCEED the node count, or
    // the gate silently degrades to pure navigation (the r11 coverage
    // hole this seam closes)
    val g = GraphAnn.bucketedGraph(spark, sf)
    val n = Similarity.normed(spark, sf).count()
    // the stride sample keeps Binomial(n, 1/stride) ≈ cap EXPECTED rows
    // before the strict limit — exact equality is a hash coin-flip of
    // the corpus, so assert the bound plus a regeneration-safe floor
    assert(g.ids.length.toLong <= GraphAnn.BucketedNodeCap &&
      g.ids.length.toLong > GraphAnn.BucketedNodeCap / 2,
      s"the bucketed graph samples ~the lowered node cap (got ${g.ids.length})")
    assert(n > GraphAnn.BucketedNodeCap * 4,
      s"corpus ($n) must dwarf the node cap for real multi-vector buckets")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(Similarity.annBruteTopK(spark, sf))
    val got = pairs(GraphAnn.annHnswBucketedTopK(spark, sf))
    val recall = (want & got).size * 100 / math.max(1, want.size)
    info(s"bucketed recall@5 = $recall (gate 85; measured 96/92/94 at the 3 SFs)")
    assert(recall >= 85, s"recall $recall below the ann_hnsw_bucketed_recall5 gate")
    // closure-regime sanity: buckets hold many vectors (Rep x n / nodes
    // on average), so the probed candidate set is a real rerank pool
    val bucketSizes = GraphAnn.assignedFrame(Similarity.normed(spark, sf), g)
      .groupBy("node").count().collect().map(_.getLong(1))
    assert(bucketSizes.max > 1, "buckets must hold multiple vectors")
    assert(bucketSizes.sum === n * GraphAnn.Rep,
      "every vector posts to exactly Rep buckets (SPANN closure)")
  }
}

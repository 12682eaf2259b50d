package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolve

/** Blocked fuzzy record linkage (`q_entity_resolve`): the planted
  * margins must hold (every within-entity pair verifies, every
  * cross-entity candidate is rejected), and the verify stage must
  * demonstrably filter — not rubber-stamp the blocking.
  */
class EntityResolveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("planted linkage: all within-entity pairs match, zero cross-entity, verify filters") {
    val recs = EntityResolve.records(spark, sf)
    val nEnt = recs.select("entity").distinct().count()
    val rows = EntityResolve.entityResolve(spark, sf).collect()
    assert(rows.length === 3 * nEnt,
      s"C(3,2) pairs per entity: expected ${3 * nEnt}")
    // every matched pair is within one entity (rec_id/3 both sides)
    assert(rows.forall(r => r.getLong(0) / 3 == r.getLong(1) / 3),
      "no cross-entity pair may clear MatchMax at the measured >=8 margin")
    assert(rows.forall(_.getAs[Int]("dist") <= EntityResolve.MatchMax))
    // the verify stage REJECTS real candidates: same-block cross-entity
    // pairs exist (the 2-syllable block is deliberately coarse)
    val a = recs.select(col("rec_id").as("ra"), col("entity").as("ea"), col("block"))
    val b = recs.select(col("rec_id").as("rb"), col("entity").as("eb"), col("block"))
    val crossCandidates = a.join(b, Seq("block"))
      .filter(col("ra") < col("rb") && col("ea") =!= col("eb")).count()
    assert(crossCandidates > 0,
      "blocking must admit cross-entity candidates for the verify to reject")
    // blocking economics: the candidate join is an equi-join on block
    val p = EntityResolve.entityResolve(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation must stay a block equi-join:\n$p")
  }

  test("names are injective and variants stay in their entity's block") {
    val recs = EntityResolve.records(spark, sf).collect()
    val names = recs.map(_.getAs[String]("name"))
    assert(names.distinct.length === names.length, "record names are unique")
    recs.groupBy(_.getAs[Long]("entity")).foreach { case (e, rs) =>
      assert(rs.map(_.getAs[String]("block")).distinct.length === 1,
        s"entity $e: drops past the prefix keep all variants in one block")
    }
  }
}

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

  test("a flooded block refines: pair work bounded, match set preserved") {
    import spark.implicits._
    // planted hot block: every record shares its first 8 chars, so the
    // 2/4/6/8-char blocks each hold ALL records (the flooded-key shape
    // that degrades sigma block^2 toward n^2); entities separate at
    // chars 9-10. Drops sit past position 10 (the fixture contract),
    // so refinement can never split an entity's variants.
    val syl = EntityResolve.Syllables
    val nEnt = 120
    val recs = (0 until nEnt).flatMap { e =>
      val canon = "zzzzzzzz" +
        syl(e % 16) + syl((e / 16) % 16) + syl((e / 256) % 16) + syl(7)
      val p1 = 10 + e % 6
      val p2raw = 10 + (e * 3 + 1) % 6
      val p2 = if (p2raw == p1) 10 + (p2raw - 10 + 1) % 6 else p2raw
      def drop(s: String, p: Int) = s.substring(0, p) + s.substring(p + 1)
      Seq((e.toLong * 3, e.toLong, canon),
        (e.toLong * 3 + 1, e.toLong, drop(canon, p1)),
        (e.toLong * 3 + 2, e.toLong, drop(canon, p2)))
    }.toDF("rec_id", "entity", "name")
    val blocked = EntityResolve.adaptiveBlocks(recs)
    val sizes = blocked.groupBy("block").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // bounded: every refined block is at or under the cap (nothing here
    // stays hot at the safe-max prefix)
    assert(sizes.forall(_._2 <= EntityResolve.HotBlockCap),
      s"refined block sizes must be <= cap: ${sizes.filter(_._2 > EntityResolve.HotBlockCap).mkString(",")}")
    // pair work: sigma block^2 collapses vs the flooded coarse key
    val refinedWork = sizes.map(s => s._2 * s._2).sum
    val floodedWork = recs.count() * recs.count()
    assert(refinedWork * 10 < floodedWork,
      s"refinement must bound candidate work: $refinedWork vs flooded $floodedWork")
    // recall contract: refinement stays inside the first-BlockSafeMax
    // agreement region, so NO within-entity pair is ever lost (the
    // all-pairs reference runs through the same verify tail); refined
    // output never invents pairs either (candidates only shrink)
    val got = EntityResolve.verifyPairs(blocked).collect().toSeq
    val want = EntityResolve.verifyPairs(
      recs.withColumn("block", lit("all"))).collect().toSeq
    assert(got.toSet.subsetOf(want.toSet),
      "refined candidates are a subset of all pairs")
    val withinGot = got.filter(r => r.getLong(0) / 3 == r.getLong(1) / 3)
    val withinWant = want.filter(r => r.getLong(0) / 3 == r.getLong(1) / 3)
    assert(withinGot.length === 3 * nEnt && withinGot === withinWant,
      "every within-entity pair survives refinement (C(3,2) per entity)")
  }

  test("shipped fixture: adaptive blocks return the coarse-block match set") {
    val recs = EntityResolve.records(spark, sf)
    val adaptive = EntityResolve.entityResolve(spark, sf).collect().toSeq
    val coarse = EntityResolve.verifyPairs(recs).collect().toSeq
    assert(adaptive === coarse,
      "refinement inside the agreement region must leave the oracle-checked output unchanged")
  }

  test("incremental linkage: each batch record links to exactly its entity's standing records, batch side broadcasts") {
    val recs = EntityResolve.records(spark, sf)
    val nEnt = recs.select("entity").distinct().count()
    val df = EntityResolve.entityResolveIncremental(spark, sf)
    val rows = df.collect()
    // 2 standing matches per batch record (canonical at dist 1, the
    // sibling drop at dist 2) — and nothing else at the planted margins
    assert(rows.length === 2 * nEnt, s"expected ${2 * nEnt} links")
    assert(rows.forall(r => r.getLong(0) / 3 == r.getLong(1) / 3),
      "every link stays within one entity")
    assert(rows.forall(r => r.getLong(0) % 3 == 2),
      "the left side is always a batch (variant-2) record")
    assert(rows.forall(_.getAs[Int]("dist") <= EntityResolve.MatchMax))
    // O(batch) shape: the bounded batch side broadcasts into the
    // standing store — equi-join on block, no shuffle of the store
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the batch side must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("streaming linkage == batch incremental over any split, incl. restore") {
    val batchRecs = EntityResolve.records(spark, sf)
      .filter(col("variant") === 2).select("rec_id", "name", "entity")
    def slice(r: Int) = batchRecs.filter(pmod(col("entity"), lit(2)) === r)
    val twin = new graft.streaming.StreamingEntityResolve(sf)
    twin.mergeBatch(spark, slice(0))
    val snap = java.nio.file.Files.createTempDirectory("graft_entsnap").toString
    twin.snapshot(spark, snap)
    val resumed = graft.streaming.StreamingEntityResolve.restore(spark, snap, sf)
    resumed.mergeBatch(spark, slice(1))
    val want = EntityResolve.entityResolveIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(resumed.current() === want,
      "stream-linked across a 2-batch split + restore == the batch incremental output")
    // the match-rate view reconciles: 2 links per entity
    assert(resumed.entityLinkCounts.values.forall(_ == 2L))
    // a foreachBatch replay (at-least-once restart) is a no-op: same
    // batchId short-circuits, and even a direct recompute dedups
    resumed.sink(slice(1), 1L)
    resumed.sink(slice(1), 1L)
    resumed.mergeBatch(spark, slice(1))
    assert(resumed.current() === want,
      "replayed batches must not duplicate links")
  }

  test("canonicalization: one cluster per entity, golden record = the undropped canonical") {
    import org.apache.spark.sql.functions.col
    val clusters = EntityResolve.entityClusters(spark, sf).collect()
    val entities = EntityResolve.records(spark, sf)
      .select("entity").distinct().count()
    assert(clusters.length === entities,
      "every entity's triangle collapses to exactly one cluster")
    clusters.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(cid % 3 === 0, "cluster_id = the component min = entity*3")
      assert(r.getAs[Long]("n_records") === 3L, "all three variants cluster")
      assert(r.getAs[Long]("golden_rec_id") === cid,
        "survivorship picks the canonical (longest name = variant 0)")
      assert(r.getAs[String]("golden_name").length === 16,
        "the golden name is the undropped 8-syllable canonical")
    }
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

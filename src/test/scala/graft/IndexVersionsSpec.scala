package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bm25Index, IndexVersions, PhraseIndex, PqIndex}
import graft.operators.Similarity

/** Versioned index reads (SURVEY §2 #198): an index is an artifact
  * too — a training run that pins corpus version v must pin the index
  * state that matches it. `searchAt(v)` must reproduce the ranking as
  * of v through later appends and deletes: the append==rebuild
  * property, time-indexed.
  */
class IndexVersionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def norm(p: String) =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  test("bm25: searchAt(v) == a fresh build of v's corpus state, through append and delete") {
    val root = tmp("graft_bm25v")
    val v1only = tmp("graft_bm25v1")
    val docs = Tables.documents(spark, sf)
    Bm25Index.materializeWhere(spark, sf, pmod(col("doc_id"), lit(3)) =!= 2, root)
    val v1 = Bm25Index.commitVersion(spark, root)
    Bm25Index.append(spark, root, docs.filter(pmod(col("doc_id"), lit(3)) === 2))
    val v2 = Bm25Index.commitVersion(spark, root)
    // the time-indexed append==rebuild property
    Bm25Index.materializeWhere(spark, sf, pmod(col("doc_id"), lit(3)) =!= 2, v1only)
    assert(Bm25Index.searchAt(spark, root, v1).collect().toSeq ===
      Bm25Index.searchRoot(spark, v1only).collect().toSeq,
      "query at v1 after the append == query on the v1-only build")
    val wantV2 = Bm25Index.searchRoot(spark, root).collect().toSeq
    assert(Bm25Index.searchAt(spark, root, v2).collect().toSeq === wantV2,
      "query at v2 == the live view (no tombstones yet)")
    // a later delete lands in v3; v2 stays pinned pre-delete
    val victim = wantV2.head.getLong(0)
    Bm25Index.delete(spark, root, Seq(victim))
    val v3 = Bm25Index.commitVersion(spark, root)
    assert(Bm25Index.searchAt(spark, root, v2).collect().toSeq === wantV2,
      "v2's ranking must not move under the later delete")
    assert(Bm25Index.searchAt(spark, root, v3).collect().toSeq ===
      Bm25Index.searchRoot(spark, root).collect().toSeq,
      "v3 == the live tombstoned view")
    assert(!Bm25Index.searchAt(spark, root, v3).collect()
      .exists(_.getLong(0) == victim), "the delete is visible at v3")
    // artifact-served, version-scoped: the pinned scan reads only v1's
    // manifest files
    val used = Bm25Index.searchAt(spark, root, v1).inputFiles.map(norm).toSet
    val manifest = (IndexVersions.filesAt(spark, root, v1, "postings") ++
      IndexVersions.filesAt(spark, root, v1, "doclens")).map(norm).toSet
    assert(used.nonEmpty && used.subsetOf(manifest),
      "the pinned query must plan over v1's manifest files alone")
    // shard pruning survives the explicit file list: basePath keeps
    // tshard a partition column, so the term filter still plans as
    // PartitionFilters (inputFiles reports the PRE-pruning index, so
    // the proof lives in the executed plan, as in the live-index spec)
    val plan = Bm25Index.searchAt(spark, root, v1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tshard"),
      s"query terms should prune the pinned version's postings shards:\n$plan")
  }

  test("phrase: searchAt(v) == a fresh build of v's corpus state") {
    val root = tmp("graft_phrv")
    val v1only = tmp("graft_phrv1")
    val docs = Tables.documents(spark, sf)
    PhraseIndex.materializeWhere(spark, sf, pmod(col("doc_id"), lit(5)) =!= 0, root)
    val v1 = PhraseIndex.commitVersion(spark, root)
    PhraseIndex.append(spark, root, docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    val v2 = PhraseIndex.commitVersion(spark, root)
    PhraseIndex.materializeWhere(spark, sf, pmod(col("doc_id"), lit(5)) =!= 0, v1only)
    assert(PhraseIndex.searchAt(spark, root, v1).collect().toSeq ===
      PhraseIndex.searchRoot(spark, v1only).collect().toSeq,
      "phrase query at v1 after the append == the v1-only build")
    val wantV2 = PhraseIndex.searchRoot(spark, root).collect().toSeq
    assert(PhraseIndex.searchAt(spark, root, v2).collect().toSeq === wantV2)
    // r12: the phrase index gained the delete verb — a later tombstone
    // lands in v3, v2 stays pinned pre-delete (the Bm25 contract)
    val victim = wantV2.head.getLong(0)
    PhraseIndex.delete(spark, root, Seq(victim))
    val v3 = PhraseIndex.commitVersion(spark, root)
    assert(PhraseIndex.searchAt(spark, root, v2).collect().toSeq === wantV2,
      "v2's phrase ranking must not move under the later delete")
    assert(!PhraseIndex.searchAt(spark, root, v3).collect()
      .exists(_.getLong(0) == victim), "the delete is visible at v3")
    assert(PhraseIndex.searchAt(spark, root, v3).collect().toSeq ===
      PhraseIndex.searchRoot(spark, root).collect().toSeq,
      "v3 == the live tombstoned view")
  }

  test("bm25: pinned versions survive compact (and re-add-after-delete appends); expire bounds them") {
    // The r12-ADVICE medium: append() implicitly compacts when the
    // batch overlaps tombstones, and compact's swap used to DELETE the
    // old tree files that earlier version manifests reference —
    // silently breaking searchAt(v) for every pinned version. The fix
    // retains replaced trees under _retained/ while versions pin them;
    // this spec drives the exact breaking sequence and then proves
    // expire() is the only thing that bounds the pins.
    val root = tmp("graft_bm25ret")
    val docs = Tables.documents(spark, sf)
    Bm25Index.materializeWhere(spark, sf, pmod(col("doc_id"), lit(3)) =!= 2, root)
    val v1 = Bm25Index.commitVersion(spark, root)
    val wantV1 = Bm25Index.searchAt(spark, root, v1).collect().toSeq
    val victim = wantV1.head.getLong(0)
    Bm25Index.delete(spark, root, Seq(victim))
    val v2 = Bm25Index.commitVersion(spark, root)
    val wantV2 = Bm25Index.searchAt(spark, root, v2).collect().toSeq
    assert(!wantV2.exists(_.getLong(0) == victim), "fixture: delete visible at v2")
    // re-add the victim: overlaps the tombstone set -> append compacts
    // implicitly, physically rewriting postings+doclens and clearing
    // the tombstone sidecar
    Bm25Index.append(spark, root, docs.filter(col("doc_id") === victim))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/_retained")),
      "the implicit compact must RETAIN the replaced trees while versions pin them")
    // the pins: v1's ranking (pre-delete) and v2's (post-delete) both
    // reproduce exactly, served partly from retained generations
    assert(Bm25Index.searchAt(spark, root, v1).collect().toSeq === wantV1,
      "v1's pinned ranking must survive the implicit compact")
    assert(Bm25Index.searchAt(spark, root, v2).collect().toSeq === wantV2,
      "v2 must still see its tombstoned view (retained tombstone files)")
    // the live view sees the victim resurrected (FAISS remove+add)
    val v3 = Bm25Index.commitVersion(spark, root)
    val live = Bm25Index.searchRoot(spark, root).collect().toSeq
    assert(Bm25Index.searchAt(spark, root, v3).collect().toSeq === live)
    // expire everything below v3: v1/v2 fail fast, their retained
    // generations are reclaimed, v3 (pure live tree) is untouched
    IndexVersions.expire(spark, root, retainMin = v3)
    intercept[IllegalArgumentException] {
      Bm25Index.searchAt(spark, root, v1)
    }
    val gensLeft =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_retained"))) 0
      else fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_retained")).length
    assert(gensLeft === 0,
      s"expire must reclaim unreferenced retained generations, $gensLeft left")
    assert(Bm25Index.searchAt(spark, root, v3).collect().toSeq === live,
      "the surviving version is untouched by expire")
  }

  test("pq: searchAt(v) pins codes+sidecar+tombstones; deletes stay version-scoped") {
    import spark.implicits._
    val root = tmp("graft_pqv")
    PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(7)) =!= 0, root)
    val v1 = PqIndex.commitVersion(spark, root)
    PqIndex.append(spark, root,
      Similarity.normed(spark, sf).filter(pmod(col("vec_id"), lit(7)) === 0))
    val v2 = PqIndex.commitVersion(spark, root)
    val v1onlyWant = {
      val r = tmp("graft_pqv1")
      PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(7)) =!= 0, r)
      PqIndex.searchRoot(spark, sf, r).collect().toSeq
    }
    assert(PqIndex.searchAt(spark, sf, root, v1).collect().toSeq === v1onlyWant,
      "neighbors at v1 after the append == the v1-only build")
    val wantV2 = PqIndex.searchRoot(spark, sf, root).collect().toSeq
    assert(PqIndex.searchAt(spark, sf, root, v2).collect().toSeq === wantV2)
    // tombstone a returned neighbor; v2 pinned pre-delete, v3 sees it
    val victim = wantV2.map(_.getAs[Long]("neighbor_id")).head
    PqIndex.delete(spark, root, Seq(victim))
    val v3 = PqIndex.commitVersion(spark, root)
    assert(PqIndex.searchAt(spark, sf, root, v2).collect().toSeq === wantV2,
      "a pinned run's neighbor sets must not move under a later delete")
    assert(!PqIndex.searchAt(spark, sf, root, v3).collect()
      .exists(_.getAs[Long]("neighbor_id") == victim),
      "the delete is visible at v3")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.sources.Export

/** §2.7 multimodal plumbing + §2.8 sources/sinks. */
class ExportMultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def tmp(): String =
    Files.createTempDirectory("graft_test").toString

  test("csv round-trip preserves rows with explicit schema") {
    val out = tmp() + "/csv"
    val df = TaskAnalytics_normalize()
    Export.writeCsv(df, out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("status", StringType),
      StructField("prio_score", IntegerType), StructField("order_date", StringType)))
    val back = Export.readCsv(spark, out, schema)
    assert(back.count() === df.count())
    assert(back.exceptAll(df).isEmpty)
  }

  private def TaskAnalytics_normalize() =
    operators.TaskAnalytics.normalizeStatus(spark, sf)

  test("json round-trip preserves rows") {
    val out = tmp() + "/json"
    val df = operators.TaskAnalytics.statusDist(spark, sf)
    Export.writeJson(df, out)
    val schema = StructType(Seq(
      StructField("status", StringType), StructField("n", LongType)))
    val back = Export.readJson(spark, out, schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("upsertKeepLast keeps newest row per key, favouring updates on ties") {
    import spark.implicits._
    val existing = Seq((1L, "old", 10L), (2L, "keep", 20L)).toDF("id", "v", "ver")
    val updates = Seq((1L, "new", 10L), (3L, "ins", 5L)).toDF("id", "v", "ver")
    val merged = Export.upsertKeepLast(existing, updates, Seq("id"), "ver")
      .orderBy("id").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("partitioned write prunes partitions on read") {
    val out = tmp() + "/part"
    val df = operators.TaskAnalytics.normalizeStatus(spark, sf)
    Export.writePartitioned(df, out, Seq("status"))
    val pruned = spark.read.parquet(out).filter(col("status") === "open")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() > 0)
    assert(!scanned.contains("finished"), "partition pruning should drop other statuses")
  }

  test("multimodal decode pipeline: schema, determinism, frame shape") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf))
    val meta = Multimodal.decodeMeta(media)
    assert(meta.count() === 500)
    val m1 = meta.filter(col("id") === 0).head()
    val m2 = Multimodal.decodeMeta(media).filter(col("id") === 0).head()
    assert(m1 === m2, "stub codec must be deterministic")
    val frames = Multimodal.frameSample(media, k = 4, frameBytes = 8)
    assert(frames.count() === 2000)
    assert(frames.filter(col("frame_no") >= 4).isEmpty)
    val emb = Multimodal.embed(media)
    assert(emb.head().embedding.length === Multimodal.EmbedDim)
  }

  test("metadata-only query prunes the payload column at the scan") {
    val out = tmp() + "/media"
    Multimodal.toMedia(Tables.documents(spark, sf)).write.mode("overwrite").parquet(out)
    val plan = Multimodal.metaOnly(spark, out).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload must be pruned from the scan:\n$plan")
  }
}

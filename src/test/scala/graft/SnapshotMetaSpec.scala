package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

/** Round-15 manifest-metadata hardening (the r14 verdict's top asks):
  *   - (root, version)-keyed MEMOIZATION of resolved manifests — one
  *     text parse per version, never one per call, with incremental
  *     delta resolution across range walks;
  *   - COLUMNAR checkpoints: past [[Snapshots.CheckpointParquetAt]]
  *     files a full manifest writes a parquet body (`#cpq:`) and moves
  *     every bloom payload to a lazily-probed parquet SIDECAR
  *     (`#bloomq:`) — the metadata READ side of "O(changed), never
  *     O(standing)";
  *   - new prune shapes: Or, IsNull/IsNotNull (footer null counts),
  *     and LIKE-prefix string ranges, planner-integrated;
  *   - forward-compat `#` lines survive a checkpoint rewrite.
  */
class SnapshotMetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def manifestText(root: String, v: Int): String = {
    val src = scala.io.Source.fromFile(
      new java.io.File(s"$root/manifests/v$v.txt"), "UTF-8")
    try src.mkString finally src.close()
  }

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("manifest memo: repeated reads parse once; range walks resolve incrementally") {
    import spark.implicits._
    val root = tmp("graft_snapmemo")
    Snapshots.create(spark, root, spark.range(0L, 64L)
      .select(col("id").as("doc_id"), (col("id") % 5).cast("string").as("src"))
      .repartition(4))
    (1 to 6).foreach { i =>
      Snapshots.append(spark, root,
        Seq((1000L + i, s"a$i")).toDF("doc_id", "src").coalesce(1))
    }
    val latest = Snapshots.latestVersion(spark, root)
    Snapshots.read(spark, root, latest).count() // prime
    val before = Snapshots.manifestOpens.get()
    // repeated reads of already-resolved versions open NOTHING
    (1 to 5).foreach { _ =>
      assert(Snapshots.read(spark, root, latest).count() === 70)
      Snapshots.readWhere(spark, root, latest,
        Seq(Snapshots.StatsPred.GtEq("doc_id", 1000L))).count()
    }
    assert(Snapshots.manifestOpens.get() === before,
      "a memoized version must not re-open its manifest chain")
    // an incremental range walk (changesBetween) resolves each version
    // from its cached predecessor — opens grow by AT MOST the walked
    // range, never range × chain depth
    val b2 = Snapshots.manifestOpens.get()
    assert(Snapshots.changesBetween(spark, root, 1, latest).count() === 6)
    assert(Snapshots.manifestOpens.get() - b2 <= latest,
      "changesBetween must reuse incremental resolution across its range")
  }

  test("columnar checkpoint: parquet body + bloom sidecar, probed lazily and GC'd with its version") {
    import spark.implicits._
    val prev = Snapshots.CheckpointParquetAt
    Snapshots.CheckpointParquetAt = 4
    try {
      val root = tmp("graft_snapcpq")
      val base = spark.range(0L, 400L).select(col("id").as("doc_id"),
        graft.functions.TextFunctions.docFingerprint(
          concat(lit("cpq"), col("id").cast("string"))).as("fp"),
        (col("id") % 7).cast("string").as("src"))
      Snapshots.create(spark, root, base.repartitionByRange(8, col("doc_id")))
      // v1 is a columnar checkpoint: a tiny text manifest referencing
      // the parquet body, with NO bare file lines or inline stats
      val t1 = manifestText(root, 1)
      assert(t1.contains("#cpq:"), "past the threshold, fulls go columnar")
      assert(!t1.contains("#stats:") &&
        t1.linesIterator.forall(_.startsWith("#")),
        s"checkpoint text must be header-only:\n$t1")
      // resolution, stats pruning, and schema come from the parquet body
      assert(Snapshots.read(spark, root, 1).count() === 400)
      val pruned = Snapshots.readWhere(spark, root, 1,
        Seq(Snapshots.StatsPred.GtEq("doc_id", 350L)))
      assert(pruned.count() === 50)
      assert(pruned.inputFiles.length < 8, "cpq-carried stats still prune")
      // a corpus-scale analyzeBloom (≥ threshold payloads) writes its
      // payloads STRAIGHT to a sidecar and appends the ref to its
      // DELTA — never 10⁵ text overlay lines (the 77 MB analyze-delta
      // trap ManifestBench caught)
      Snapshots.analyzeBloom(spark, root, Seq("fp"))
      val v2 = Snapshots.latestVersion(spark, root)
      val t2 = manifestText(root, v2)
      assert(t2.contains("#base:") && t2.contains("#bloomq:") &&
        !t2.contains("#bloom:part"),
        s"a corpus-scale analyze appends a sidecar ref to its delta:\n$t2")
      // force the next commit FULL (checkpoint cadence would be v16;
      // a rewrite shrinking the file set flips full too — use the
      // threshold: appends keep it delta, so drive to the cadence)
      (v2 + 1 to Snapshots.CheckpointEvery).foreach { i =>
        Snapshots.append(spark, root,
          Seq((10000L + i, 0L, s"x$i")).toDF("doc_id", "fp", "src").coalesce(1))
      }
      val v16 = Snapshots.latestVersion(spark, root)
      assert(v16 === Snapshots.CheckpointEvery)
      val t16 = manifestText(root, v16)
      assert(t16.contains("#cpq:") && t16.contains("#bloomq:") &&
        !t16.contains("#bloom:part"),
        s"the checkpoint consolidates blooms into a sidecar:\n$t16")
      // the sidecar probe still prunes an Eq on the uncorrelated
      // fingerprint — and never wrongly (results match the unpruned).
      // Assert on the BLOOM-COVERED original files: the threshold-era
      // appends carry no blooms yet and rightly stay planned.
      def names(xs: Iterable[String]) =
        xs.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      val origNames = names(Snapshots.read(spark, root, 1).inputFiles.toSeq)
      val target = base.filter(col("doc_id") === 200L)
        .select("fp").head().getLong(0)
      val hit = Snapshots.readWhere(spark, root, v16,
        Seq(Snapshots.StatsPred.Eq("fp", target)))
      assert(ids(hit) === Seq(200L))
      assert(names(hit.inputFiles.toSeq).count(origNames) <= 2,
        "the lazily-loaded sidecar bloom must exclude non-holding files")
      // coverage probe sees sidecar keys: a re-analyze is a no-op on
      // the standing files (returns without a new commit when nothing
      // is missing — here the appends ARE missing, so it commits once
      // and a second run is the no-op)
      val va = Snapshots.analyzeBloom(spark, root, Seq("fp"))
      assert(va === v16 + 1, "append files were missing blooms")
      assert(Snapshots.analyzeBloom(spark, root, Seq("fp")) === va,
        "fully-covered (overlay + sidecar) analyze must be a commit-free no-op")
      // expire: the superseded v1 checkpoint body GC's, the live v16
      // body + sidecar survive, reads keep working
      val mdir = new java.io.File(s"$root/manifests")
      def dirNames() = mdir.listFiles().filter(_.isDirectory).map(_.getName).toSet
      val beforeDirs = dirNames()
      assert(beforeDirs.exists(_.startsWith("cp1-")))
      Snapshots.expire(spark, root, retainMin = v16, orphanGraceMs = 0L)
      Thread.sleep(25)
      Snapshots.expire(spark, root, retainMin = v16, orphanGraceMs = 0L)
      val afterDirs = dirNames()
      assert(!afterDirs.exists(_.startsWith("cp1-")),
        "an expired checkpoint's parquet body is reclaimed")
      assert(afterDirs.exists(_.startsWith(s"cp$v16-")),
        "the live checkpoint body survives the sweep")
      assert(Snapshots.read(spark, root,
        Snapshots.latestVersion(spark, root)).count() === 400 + 14)
      // post-expire, post-re-analyze: every file is bloom-covered
      // (originals via the sidecar, appends via the analyze overlay),
      // so the point lookup plans almost nothing
      val hit2 = Snapshots.readWhere(spark, root,
        Snapshots.latestVersion(spark, root),
        Seq(Snapshots.StatsPred.Eq("fp", target)))
      assert(ids(hit2) === Seq(200L) && hit2.inputFiles.length <= 2)
    } finally Snapshots.CheckpointParquetAt = prev
  }

  test("prune shapes: Or, IsNull/IsNotNull null counts, and LIKE-prefix ranges — planner-integrated") {
    val root = tmp("graft_snappreds")
    // range-clustered by doc_id: low files carry all-null v + 'a'
    // prefixes, high files null-free v + 'b' prefixes
    val df = spark.range(0L, 800L).select(
      col("id").as("doc_id"),
      when(col("id") < 400L, lit(null).cast("long")).otherwise(col("id")).as("v"),
      concat(when(col("id") < 400L, lit("alpha")).otherwise(lit("beta")),
        lpad(col("id").cast("string"), 4, "0")).as("tag"))
    Snapshots.create(spark, root, df.repartitionByRange(8, col("doc_id")))
    val v = Snapshots.latestVersion(spark, root)
    val full = Snapshots.read(spark, root, v).inputFiles.length
    assert(full === 8)
    val (scan, idx) = Snapshots.indexedScan(spark, root, v)
    def planned(q: org.apache.spark.sql.DataFrame): Int = {
      q.collect(); idx.lastPlanned.size
    }
    // IsNull: null-free files prune
    val qNull = scan.filter(col("v").isNull)
    assert(qNull.count() === 400 && planned(qNull) <= full / 2,
      s"IS NULL must skip null-free files (planned ${idx.lastPlanned.size})")
    // IsNotNull: all-null files prune
    val qNotNull = scan.filter(col("v").isNotNull)
    assert(qNotNull.count() === 400 && planned(qNotNull) <= full / 2,
      "IS NOT NULL must skip all-null files")
    // LIKE-prefix: 'beta%' lives only in the high files
    val qPre = scan.filter(col("tag").startsWith("beta"))
    assert(qPre.count() === 400 && planned(qPre) <= full / 2,
      "a string prefix prunes as the range [p, pNext)")
    // Or: two disjoint ranges keep only their edge files
    val qOr = scan.filter(col("doc_id") < 100L || col("doc_id") >= 700L)
    assert(qOr.count() === 200 && planned(qOr) <= full / 2,
      "an Or prunes files excluded by EVERY branch")
    // an Or with an untranslatable branch prunes nothing but stays
    // correct
    val qOrWeird = scan.filter(col("doc_id") < 100L ||
      (col("doc_id") % 97) === 3)
    assert(qOrWeird.count() ===
      df.filter(col("id") < 100L || col("id") % 97 === 3).count())
    // the StatsPred surface agrees (readWhere re-applies predicates)
    import Snapshots.StatsPred._
    assert(Snapshots.readWhere(spark, root, v,
      Seq(OrPred(Seq(Lt("doc_id", 100L)), Seq(GtEq("doc_id", 700L)))))
      .count() === 200)
    assert(Snapshots.readWhere(spark, root, v,
      Seq(Prefix("tag", "alpha"), NotNull("doc_id"))).count() === 400)
    assert(Snapshots.readWhere(spark, root, v, Seq(IsNull("v"))).count() === 400)
  }

  test("update: stats-pruned copy-on-write; the typed feed folds exactly even across a key rewrite") {
    import org.apache.spark.sql.expressions.Window
    import Snapshots.StatsPred._
    val root = tmp("graft_snapupd")
    val df = spark.range(0L, 800L).select(col("id").as("doc_id"),
      concat(lit("s"), col("id").cast("string")).as("s"))
    Snapshots.create(spark, root, df.repartitionByRange(8, col("doc_id")))
    def names(xs: Iterable[String]) =
      xs.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val v1Files = names(Snapshots.read(spark, root, 1).inputFiles.toSeq)
    // v2: a value update over the [200, 300) slice — only the
    // stat-overlapping file(s) rewrite, the rest carry by path
    val v2 = Snapshots.update(spark, root,
      Seq(GtEq("doc_id", 200L), Lt("doc_id", 300L)),
      Map("s" -> concat(col("s"), lit("-upd"))))
    val v2Files = names(Snapshots.read(spark, root, v2).inputFiles.toSeq)
    assert((v1Files -- v2Files).size <= 2,
      s"only stat-overlapping files may rewrite (${(v1Files -- v2Files).size} replaced)")
    assert((v1Files intersect v2Files).size >= 6, "untouched files carry by path")
    val got = Snapshots.read(spark, root, v2)
    assert(got.count() === 800)
    assert(got.filter(col("s").endsWith("-upd")).count() === 100)
    assert(got.filter(col("s").endsWith("-upd") &&
      (col("doc_id") < 200L || col("doc_id") >= 300L)).count() === 0)
    // the typed feed carries the Delta pre+post pair
    val feed12 = Snapshots.changeFeed(spark, root, 1, v2)
    assert(feed12.filter(col("_change_type") === "delete").count() === 100)
    assert(feed12.filter(col("_change_type") === "upsert" &&
      col("s").endsWith("-upd")).count() === 100)
    // v3: a KEY-REWRITING update — the pre-image retracts the old key
    val v3 = Snapshots.update(spark, root,
      Seq(GtEq("doc_id", 700L)),
      Map("doc_id" -> (col("doc_id") + lit(10000L))))
    // fold contract: replay from 0 with the upsert-over-delete
    // tiebreak reproduces read(latest) exactly
    val feed = Snapshots.changeFeed(spark, root, 0, v3)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("_commit_version").desc, col("_change_type").desc)
    val folded = feed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_change_type") =!= "delete")
      .select("doc_id", "s")
    val want = Snapshots.read(spark, root, v3).select("doc_id", "s")
    assert(folded.exceptAll(want).count() === 0 &&
      want.exceptAll(folded).count() === 0,
      "the typed fold must reproduce read(latest) across both updates")
    assert(want.filter(col("doc_id") >= 10000L).count() === 100 &&
      want.count() === 800)
    // a plain row feed cannot represent the retraction — fail fast
    intercept[IllegalArgumentException] {
      Snapshots.changesBetween(spark, root, 1, v3, upserts = true).count()
    }
    // the CDC mirror folds the update pair exactly-once
    val mirror = tmp("graft_snapupdmir")
    Snapshots.mirrorSync(spark, root, mirror, Seq("doc_id"))
    val mgot = Snapshots.read(spark, mirror,
      Snapshots.latestVersion(spark, mirror)).select("doc_id", "s")
    assert(mgot.exceptAll(want).count() === 0 &&
      want.exceptAll(mgot).count() === 0,
      "a mirror crossing an update must equal the source")
    // zero stat-candidates: a provably-no-match update is a no-op
    assert(Snapshots.update(spark, root, Seq(GtEq("doc_id", 999999L)),
      Map("s" -> lit("x"))) === v3)
    // SQL UPDATE semantics: ALL assignments evaluate against the OLD
    // row — a swap must actually swap (a sequential column rewrite
    // would yield b = b)
    val r2 = tmp("graft_snapswap")
    Snapshots.create(spark, r2, spark.range(0L, 10L).select(
      col("id").as("doc_id"), col("id").as("a"), (col("id") * 2).as("b")))
    Snapshots.update(spark, r2, Seq(GtEq("doc_id", 0L)),
      Map("a" -> col("b"), "b" -> col("a")))
    val sw = Snapshots.read(spark, r2, 2)
      .filter(col("doc_id") === 3L).head()
    assert(sw.getAs[Long]("a") === 6L && sw.getAs[Long]("b") === 3L,
      "update assignments must see the OLD row (swap semantics)")
  }

  test("clusterZN with a STRING dimension: dictionary-rank bucketing lets every dim prune") {
    import Snapshots.StatsPred._
    val root = tmp("graft_snapzstr")
    // source+key+length — the routine triple; src is STRING and
    // uncorrelated with doc_id, so only the z-layout can serve it
    val df = spark.range(0L, 800L).select(col("id").as("doc_id"),
      concat(lit("w"), (col("id") % 8).cast("string")).as("src"),
      (col("id") * 37 % 1000).as("len"))
    Snapshots.create(spark, root, df.repartition(8, col("doc_id")))
    Snapshots.clusterZN(spark, root, Seq("doc_id", "src", "len"),
      partitions = 8)
    val v = Snapshots.latestVersion(spark, root)
    val full = Snapshots.read(spark, root, v).inputFiles.length
    def check(preds: Seq[Snapshots.StatsPred], wantRows: Long): Unit = {
      val got = Snapshots.readWhere(spark, root, v, preds)
      assert(got.count() === wantRows)
      assert(got.inputFiles.length < full,
        s"dim ${preds.map(_.col).mkString(",")} must prune " +
          s"(${got.inputFiles.length} of $full)")
    }
    check(Seq(Eq("src", "w5")), 100)             // the STRING dim
    check(Seq(Prefix("src", "w5")), 100)
    check(Seq(Lt("doc_id", 100L)), 100)
    check(Seq(GtEq("len", 900L)),
      df.filter(col("len") >= 900L).count())
    // rows survive the layout exactly
    assert(Snapshots.read(spark, root, v).select("doc_id")
      .exceptAll(df.select("doc_id")).count() === 0)
  }

  test("DSv2 snapshot stream: readStream delivers the typed feed exactly-once across restarts") {
    import org.apache.spark.sql.DataFrame
    val root = tmp("graft_snapstream")
    val ckpt = tmp("graft_snapstream_ck")
    val df = spark.range(0L, 200L).select(col("id").as("doc_id"),
      concat(lit("s"), col("id").cast("string")).as("s"))
    Snapshots.create(spark, root, df.filter(col("doc_id") < 100L).repartition(2))
    Snapshots.append(spark, root, df.filter(col("doc_id") >= 100L).repartition(2))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int)]()
    def startQ() = graft.sources.SnapshotStream.readStream(spark, root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("doc_id", "_change_type", "_commit_version").collect()
          .foreach(r => got.add((r.getLong(0), r.getString(1), r.getInt(2))))
        ()
      }.start()
    def feedTriples(from: Int, to: Int) =
      Snapshots.changeFeed(spark, root, from, to)
        .select("doc_id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSeq.sorted
    import scala.jdk.CollectionConverters._
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    assert(got.asScala.toSeq.sorted === feedTriples(0, 2),
      "the stream's bootstrap batches equal the typed feed from version 0")
    got.clear()
    // new commits while the stream is DOWN: an update (the pre+post
    // pair) and a delete — the restarted query resumes from Spark's
    // own offset log and delivers exactly the pending range, once
    val v3 = Snapshots.update(spark, root,
      Seq(Snapshots.StatsPred.Lt("doc_id", 10L)),
      Map("s" -> concat(col("s"), lit("-u"))))
    Snapshots.delete(spark, root,
      Seq(Snapshots.StatsPred.GtEq("doc_id", 190L)))
    val v4 = Snapshots.latestVersion(spark, root)
    assert(v3 === 3 && v4 === 4)
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    assert(got.asScala.toSeq.sorted === feedTriples(2, 4),
      "a restarted stream delivers exactly the unconsumed versions")
    assert(got.asScala.count(_._2 == "delete") === 10 + 10 &&
      got.asScala.count(_._2 == "upsert") === 10,
      "the update's pre+post pair and the delete's retractions all flow")
    // an idle restart delivers nothing (no phantom batches)
    got.clear()
    val q3 = startQ(); q3.processAllAvailable(); q3.stop()
    assert(got.isEmpty, "no new versions ⇒ no re-delivery")
    // ADMISSION CONTROL: maxVersionsPerBatch=1 splits the 4-version
    // backlog into one micro-batch per version (a stream started
    // against a long history must not fold it into one giant batch)
    val ck2 = tmp("graft_snapstream_ck2")
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val n2 = new java.util.concurrent.atomic.AtomicLong
    val q4 = spark.readStream.format("graft.sources.SnapshotStreamSource")
      .option("root", root).option("maxVersionsPerBatch", 1).load()
      .writeStream.option("checkpointLocation", ck2)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val c = b.count()
        if (c > 0) batches.incrementAndGet()
        n2.addAndGet(c); ()
      }.start()
    q4.processAllAvailable(); q4.stop()
    assert(batches.get() === 4,
      s"one micro-batch per version expected, got ${batches.get()}")
    assert(n2.get() === feedTriples(0, 4).size.toLong,
      "rate-limited batches must still deliver the complete feed")
  }

  test("stream reader: array + struct columns round-trip; stream == batch feed incl. restart") {
    import org.apache.spark.sql.DataFrame
    val root = tmp("graft_snapstream_nested")
    val ckpt = tmp("graft_snapstream_nested_ck")
    // documents-shaped rows: an embedding array (with null elements and
    // a null array) and a typed metadata struct (with a null struct)
    def mk(from: Long, to: Long) = spark.range(from, to).select(
      col("id").as("doc_id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(array(col("id").cast("float"),
          when(col("id") % 5 === 0, lit(null)).otherwise(lit(1.5f))))
        .as("emb"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(struct(concat(lit("n"), col("id")).as("name"),
          (col("id") % 5).cast("int").as("grp"))).as("meta"))
    Snapshots.create(spark, root, mk(0, 40).repartition(2))
    Snapshots.append(spark, root, mk(40, 80).repartition(2))
    def flat(df: DataFrame) = df.select(col("doc_id"),
        concat_ws(",", transform(col("emb"),
          e => coalesce(e.cast("string"), lit("∅")))).as("emb_s"),
        col("emb").isNull.as("emb_null"),
        col("meta.name"), col("meta.grp"),
        col("_change_type"), col("_commit_version"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        Option(r.getString(3)), Option(r.get(4)), r.getString(5), r.getInt(6)))
      .toSeq.sortBy(t => (t._1, t._6))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Boolean, Option[String], Option[Any], String, Int)]()
    def startQ() = graft.sources.SnapshotStream.readStream(spark, root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        flat(b).foreach(got.add); ()
      }.start()
    import scala.jdk.CollectionConverters._
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    assert(got.asScala.toSeq.sortBy(t => (t._1, t._6)) ===
      flat(Snapshots.changeFeed(spark, root, 0, 2)),
      "nested columns must stream exactly as the batch feed reads them")
    // restart across a delete: pre-images carry the nested columns too
    got.clear()
    Snapshots.delete(spark, root, Seq(Snapshots.StatsPred.Lt("doc_id", 5L)))
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    assert(got.asScala.toSeq.sortBy(t => (t._1, t._6)) ===
      flat(Snapshots.changeFeed(spark, root, 2, 3)),
      "restart delivers exactly the delete's nested pre-images")
  }

  test("stream reader: int32/float files upcast under a widened schema; a real mismatch names the column") {
    import org.apache.spark.sql.types._
    import graft.sources.{SnapshotChangePartition, SnapshotChangeReader}
    val dir = tmp("graft_stream_widen")
    spark.range(0, 10).select(col("id").cast("int").as("k"),
        (col("id") * 0.5).cast("float").as("v"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get.getAbsolutePath
    val conf = spark.sparkContext.hadoopConfiguration
    // stream schema WIDENED after the file was written: k long, v double
    val widened = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType),
      StructField("_change_type", StringType),
      StructField("_commit_version", IntegerType)))
    val r = new SnapshotChangeReader(
      SnapshotChangePartition(file, "insert", 3), widened, conf)
    val rows = Iterator.continually(r)
      .takeWhile(_.next()).map(_.get().copy()).toSeq
    r.close()
    assert(rows.map(_.getLong(0)).sorted === (0L until 10L),
      "int32 column must upcast to the widened long schema")
    assert(rows.map(_.getDouble(1)).sorted === (0 until 10).map(_ * 0.5),
      "float column must upcast to the widened double schema")
    // a genuine mismatch (string over int32) fails fast, naming the column
    val bad = StructType(Seq(StructField("k", StringType),
      StructField("_change_type", StringType),
      StructField("_commit_version", IntegerType)))
    val r2 = new SnapshotChangeReader(
      SnapshotChangePartition(file, "insert", 3), bad, conf)
    val e = intercept[IllegalArgumentException] { r2.next(); r2.get() }
    r2.close()
    assert(e.getMessage.contains("'k'") && e.getMessage.contains("INT32"),
      s"mismatch must name column and physical type: ${e.getMessage}")
  }

  test("string z-dim past the rank cap falls back to the prefix fold: no dictionary sort, rows exact, still prunes") {
    import Snapshots.StatsPred._
    val root = tmp("graft_snapzhi")
    // 2× the cap: approx_count_distinct's ~5% rsd cannot estimate
    // 131k distincts below 65,536, so the FALLBACK branch provably
    // runs — asserted below on the guard's own expression
    val n = graft.sources.Layout.RankCap * 2
    val df = spark.range(0L, n).select(col("id").as("doc_id"),
      concat(lit("t"), lpad(col("id").cast("string"), 8, "0")).as("tag"))
    assert(df.agg(approx_count_distinct(col("tag"))).head().getLong(0) >
      graft.sources.Layout.RankCap,
      "fixture must route withZN through the prefix-fold branch")
    Snapshots.create(spark, root, df.repartition(4))
    Snapshots.clusterZN(spark, root, Seq("doc_id", "tag"), partitions = 8)
    val v = Snapshots.latestVersion(spark, root)
    assert(Snapshots.read(spark, root, v).count() === n)
    // zero-padded tags order like doc_id, so the fold clusters them
    // and the REAL footer string stats prune a prefix range
    val got = Snapshots.readWhere(spark, root, v, Seq(Prefix("tag", "t0000")))
    assert(got.count() === 10000)
    assert(got.inputFiles.length < 8,
      s"prefix-fold surrogate must still cluster (${got.inputFiles.length} of 8)")
  }

  test("prune fuzz: random predicates over hostile data never drop a live row (prune ≠ decide)") {
    import Snapshots.StatsPred
    import Snapshots.StatsPred._
    val root = tmp("graft_snapfuzz")
    val rnd = new scala.util.Random(1715) // deterministic
    // hostile fixture: nullable long, NaN-bearing double, nullable
    // ASCII+non-ASCII string, range-clustered so stats are selective;
    // blooms on the point-lookup columns so the bloom path fuzzes too
    val df = spark.range(0L, 600L).select(
      col("id").as("doc_id"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("id") - 300L).as("k"),
      when(col("id") % 11 === 0, lit(Double.NaN))
        .otherwise(col("id").cast("double") / 3.0).as("d"),
      when(col("id") % 13 === 0, lit(null).cast("string"))
        .when(col("id") % 17 === 0, lit("naïve-ünïcode"))
        .otherwise(concat(lit("w"), (col("id") % 37).cast("string"))).as("s"))
    Snapshots.create(spark, root, df.repartitionByRange(6, col("doc_id")))
    Snapshots.analyzeBloom(spark, root, Seq("k", "s"))
    val v = Snapshots.latestVersion(spark, root)
    val full = Snapshots.read(spark, root, v)
    val cols = Seq("doc_id", "k", "d", "s")
    def litFor(c: String): Any = c match {
      case "d" => rnd.nextInt(5) match {
        case 0 => Double.NaN
        case 1 => rnd.nextInt(400) - 200 // int literal vs double stats
        case _ => (rnd.nextInt(1200) - 600) / 3.0
      }
      case "s" => rnd.nextInt(6) match {
        case 0 => "naïve-ünïcode"
        case 1 => ""
        case _ => s"w${rnd.nextInt(50)}"
      }
      case _ => (rnd.nextInt(900) - 450).toLong
    }
    def leaf(): StatsPred = {
      val c = cols(rnd.nextInt(cols.length))
      rnd.nextInt(9) match {
        case 0 => Eq(c, litFor(c))
        case 1 => Lt(c, litFor(c))
        case 2 => LtEq(c, litFor(c))
        case 3 => Gt(c, litFor(c))
        case 4 => GtEq(c, litFor(c))
        case 5 => InSet(c, Seq.fill(rnd.nextInt(4))(litFor(c)))
        case 6 => IsNull(c)
        case 7 => NotNull(c)
        case 8 =>
          val p = Seq("w", "w1", "w23", "naïve", "x", "")(rnd.nextInt(6))
          Prefix("s", p)
      }
    }
    def gen(): StatsPred =
      if (rnd.nextInt(4) == 0)
        OrPred(Seq.fill(1 + rnd.nextInt(2))(leaf()),
          Seq.fill(1 + rnd.nextInt(2))(leaf()))
      else leaf()
    def ids2(q: org.apache.spark.sql.DataFrame) =
      q.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    (1 to 60).foreach { i =>
      val preds = Seq.fill(1 + rnd.nextInt(3))(gen())
      val pruned = Snapshots.readWhere(spark, root, v, preds)
      val unpruned = preds.foldLeft(full)((q, p) =>
        q.filter(Snapshots.predColumn(p)))
      assert(ids2(pruned) === ids2(unpruned),
        s"trial $i: prune changed results for $preds")
    }
  }

  test("forward-compat '#' metadata lines survive the expire checkpoint rewrite") {
    import spark.implicits._
    val root = tmp("graft_snapfwd")
    Snapshots.create(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "src").repartition(2))
    Snapshots.append(spark, root, Seq((3L, "c")).toDF("doc_id", "src"))
    // a future writer's unknown tag lands in v2's own layer (simulated
    // by direct append — the manifest claim is complete, this models a
    // newer format version having written the line)
    val p = java.nio.file.Paths.get(s"$root/manifests/v2.txt")
    java.nio.file.Files.write(p,
      (new String(java.nio.file.Files.readAllBytes(p), "UTF-8") +
        "\n#future:keep-me").getBytes("UTF-8"))
    Snapshots.append(spark, root, Seq((4L, "d")).toDF("doc_id", "src"))
    // expire(retainMin = 2) checkpoints v2 full — the unknown line
    // must be re-emitted, not dropped
    Snapshots.expire(spark, root, retainMin = 2, orphanGraceMs = 0L)
    val t2 = manifestText(root, 2)
    assert(t2.contains("#future:keep-me"),
      s"materializeManifest must carry unknown forward-compat lines:\n$t2")
    assert(Snapshots.read(spark, root, 2).count() === 3)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Operator-level invariants on the sf0.001 testdata (cell-exact oracle
  * parity is covered by the driver gate / tools/parity.py; these specs
  * pin structural properties and cross-variant consistency).
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("status summary counts add up") {
    val r = TaskAnalytics.statusSummary(spark, sf).head()
    assert(r.getLong(0) === r.getLong(1) + r.getLong(2) + r.getLong(3))
  }

  test("keep-last dedup has one row per key") {
    val d = TaskAnalytics.dedupKeepLast(spark, sf)
    assert(d.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
  }

  test("sessionize covers all events exactly once") {
    val total = Tables.events(spark, sf).count()
    val sessions = TaskAnalytics.sessionize(spark, sf)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === total)
  }

  test("top-k queries respect their limits") {
    assert(TaskAnalytics.oldestPending(spark, sf).count() === 5)
    assert(TaskAnalytics.backlogRank(spark, sf).count() === 15)
    assert(TaskAnalytics.q3TopRevenue(spark, sf).count() === 10)
  }

  test("report doc renders contiguous positions, grouped headers, continuous numbering") {
    // window-shape guards live in PlanRegressionSpec ("report doc has no
    // unpartitioned window..."); this spec pins the rendered document
    val wins = ReportDoc.reportDoc(spark, sf).queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.exists(_.partitionSpec.nonEmpty), "section window lost partitioning")
    val lines = ReportDoc.reportDoc(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    val bySection = lines.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // header section + 3 task sections + analysis; §4 empty on this corpus
    assert(bySection.keySet === Set(0, 1, 2, 3, 5))
    for ((sec, rs) <- bySection) {
      val ps = rs.map(_._2).toSeq
      assert(ps === (0 until rs.length),
        s"section $sec positions not contiguous: ${ps.take(10)}")
    }
    for (sec <- Seq(1, 2, 3)) {
      val rs = bySection(sec).map(_._3)
      assert(rs.head.startsWith(s"$sec. "), s"section $sec title: ${rs.head}")
      val items = rs.tail.filter(l => l.headOption.exists(_.isDigit))
      // numbering is the enumerate over the section's items, across groups
      assert(items.zipWithIndex.forall { case (l, i) => l.startsWith(s"${i + 1}. ") },
        s"section $sec numbering broken: ${items.take(3).toSeq}")
      val headers = rs.tail.filterNot(l => l.headOption.exists(_.isDigit))
      assert(headers.nonEmpty && headers.forall(h => h == h.toUpperCase),
        s"section $sec group headers: ${headers.take(3).toSeq}")
      // a group header always directly precedes an item
      val seq = rs.tail
      for (i <- seq.indices if !seq(i).headOption.exists(_.isDigit))
        assert(i + 1 < seq.length && seq(i + 1).headOption.exists(_.isDigit))
    }
    // analysis counts = section item counts
    val itemCount = (sec: Int) =>
      bySection(sec).count(r => r._2 > 0 && r._3.headOption.exists(_.isDigit))
    val analysis = bySection(5).map(_._3).tail.map { l =>
      val Array(k, v) = l.split(": "); k -> v.toLong
    }.toMap
    assert(analysis("finished") === itemCount(1))
    assert(analysis("pending") === itemCount(2))
    assert(analysis("open") === itemCount(3))
  }

  test("minhash candidates verify to a subset of exhaustive jaccard pairs at its threshold") {
    // Every minhash-verified pair (J >= 0.5) that also clears the exhaustive
    // query's higher threshold (J >= 0.6) must appear in the exhaustive result.
    val mh = Dedup.minhashLsh(spark, sf)
      .filter(col("jaccard") >= Dedup.JaccardT)
      .select("doc_a", "doc_b")
    val ex = Dedup.ngramJaccard(spark, sf).select("doc_a", "doc_b")
    assert(mh.exceptAll(ex).isEmpty)
  }

  test("stop-shingle cap drops hot-bucket-only pairs, keeps true near-dups") {
    import spark.implicits._
    // shingle 99 is boilerplate (in every doc → df 5 > cap 2); docs 1/2
    // are true near-dups (share 3 of their 4 distinctive shingles);
    // docs 3/4/5 share ONLY the boilerplate shingle
    val docs = Seq(
      (1L, Seq(99L, 10L, 11L, 12L, 13L)),
      (2L, Seq(99L, 10L, 11L, 12L, 14L)),
      (3L, Seq(99L, 20L, 21L)),
      (4L, Seq(99L, 30L, 31L)),
      (5L, Seq(99L, 40L, 41L))).toDF("doc_id", "sh")
    val capped = Dedup.verifyByCooccurrence(docs, candidatesFromCooc = true,
      threshold = 0.0, maxDf = 2)
    val pairs = capped.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"only the true near-dup pair should survive, got $pairs")
    // with the cap disabled the boilerplate shingle manufactures all 10 pairs
    val uncapped = Dedup.verifyByCooccurrence(docs, candidatesFromCooc = true,
      threshold = 0.0, maxDf = 1000000)
    assert(uncapped.count() === 10)
  }

  test("json normalization handles short/empty documents and missing paths") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jn").toString
    // doc 7: Status-absent branch (7 % 7 == 0); doc 8: single token (no
    // Tags, 1-run title); doc 9: empty text (no title runs at all)
    Seq((7L, "en", "solo word three"), (8L, "de", "single"), (9L, "es", ""))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TaskAnalytics.jsonNormalize(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getString(3), r.getString(4))).toMap
    assert(out(7L) === (("none", 2, "solo", "solo**word**three")))
    assert(out(8L) === (("de", 0, "", "single")))
    assert(out(9L) === (("es", 0, "", "")))
  }

  test("simhash pairs are within the hamming bound and symmetric-free") {
    val sh = Dedup.simhash(spark, sf)
    assert(sh.filter(col("hamming") > Dedup.HammingMax).isEmpty)
    assert(sh.filter(col("doc_a") >= col("doc_b")).isEmpty)
  }

  test("ANN brute top-k is correctly ranked") {
    val b = Similarity.annBruteTopK(spark, sf)
    assert(b.groupBy("q_id").count().filter(col("count") =!= Similarity.TopK).isEmpty)
    // rank 1 similarity >= rank TopK similarity per query
    val firstLast = b.groupBy("q_id").agg(
      max(when(col("rank") === 1, col("cos_sim"))).as("first"),
      max(when(col("rank") === Similarity.TopK, col("cos_sim"))).as("last"))
    assert(firstLast.filter(col("first") < col("last")).isEmpty)
  }

  test("IVF ANN recall@5 vs brute force is reasonable") {
    val b = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val i = Similarity.annIvfTopK(spark, sf).select("q_id", "neighbor_id")
    val hits = b.intersect(i).count()
    assert(hits >= 10, s"IVF recall too low: $hits/50")   // nprobe=2 of ~5 cells
  }

  test("LSH ANN returns only true bucket-mates, ranked correctly") {
    val l = Similarity.annLshTopK(spark, sf)
    assert(l.count() > 0)
    assert(l.filter(col("rank") > Similarity.TopK).isEmpty)
  }
}

class AsOfJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("asof join matches composed range-join + argmax reference") {
    val got = operators.ExtendedAnalytics.purchasesWithLastError(spark, sf)
    // reference: range join then keep latest error per purchase
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("eu"), col("ts").as("ets"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id").orderBy(col("ets").desc, col("error_id").desc)
    val ref = p.join(e, col("user_id") === col("eu") && col("ets") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("error_id"),
        date_format(col("ets"), "yyyy-MM-dd HH:mm:ss").as("error_ts"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("asof physical plan is exchange + sort + streaming merge (no cartesian)") {
    val plan = operators.ExtendedAnalytics.purchasesWithLastError(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin") && plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("asof join skips null timestamps and breaks (key, ts) ties deterministically") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))),
      (2L, 10L, None),  // null left ts → must NOT match as epoch-0
      (3L, 20L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))))
      .toDF("l_id", "k", "t")
    val right = Seq(
      (100L, 10L, Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00"))),
      (101L, 10L, Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00"))), // tie with 100
      (102L, 10L, None),  // null right ts → never a match
      (103L, 20L, None))
      .toDF("r_id", "rk", "rt")
    val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt",
        rightTieBreak = Some("r_id"))
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(101L))  // max r_id among the 09:00:00 tie
    assert(got(2L).isEmpty)         // null left ts matches nothing
    assert(got(3L).isEmpty)         // only a null-ts right row exists for k=20
  }
}

class SkewRecallSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(sum("value").as("value_sum"), count(lit(1)).as("n"))
    val salted = operators.Skew.saltedSumCount(ev, Seq("event_type"), "value")
      .withColumnRenamed("value_sum", "vs")
    val j = direct.join(salted, "event_type").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("value_sum") - r.getAs[Double]("vs")) < 1e-6)
      assert(r.getAs[Long]("n") === r.getAs[Long]("n"))
    }
  }

  test("salted join equals direct join") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("user_n"))
    val direct = ev.join(users, "user_id").count()
    val salted = operators.Skew.saltedJoin(ev, users, "user_id", "user_id").count()
    assert(salted === direct)
  }

  test("under a real hot key the plain exchange straggles and salting spreads it") {
    // synthetic celebrity key: 90% of 400k rows share k=7
    val n = 400000L
    val parts = 16
    val skewed = spark.range(n).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
      (col("id") % 97).cast("double").as("v"))
    // reducer placement: rows landing on each post-exchange partition.
    // This IS the task-straggle mechanism — task time is proportional
    // to partition rows; durations on test-sized data are noise, row
    // placement is exact.
    def partShares(df: org.apache.spark.sql.DataFrame,
                   cols: Seq[org.apache.spark.sql.Column]): (Double, Seq[Long], Long) = {
      val t0 = System.nanoTime()
      val byPart = df.repartition(parts, cols: _*)
        .select(spark_partition_id().as("p")).groupBy("p").count()
        .collect().map(_.getLong(1)).toSeq
      (byPart.max.toDouble / byPart.sum, byPart.sorted.reverse, (System.nanoTime() - t0) / 1000000)
    }
    val (hotShare, hotDist, hotMs) = partShares(skewed, Seq(col("k")))
    val salt = pmod(hash(col("v"), monotonically_increasing_id()), lit(16))
    val (saltShare, saltDist, saltMs) =
      partShares(skewed.withColumn("_s", salt), Seq(col("k"), col("_s")))
    info(s"plain exchange: max reducer share ${(hotShare * 100).round}% " +
      s"(top ${hotDist.take(3)}), ${hotMs} ms")
    info(s"salted exchange: max reducer share ${(saltShare * 100).round}% " +
      s"(top ${saltDist.take(3)}), ${saltMs} ms")
    assert(hotShare > 0.85, s"hot key should dominate one reducer: $hotShare")
    assert(saltShare < 0.25, s"salting should spread the hot key: $saltShare")
    // and the two-phase salted aggregate still equals the plain one
    val direct = skewed.groupBy("k").agg(sum("v").as("vs"), count(lit(1)).as("n0"))
    val salted = operators.Skew.saltedSumCount(skewed, Seq("k"), "v")
    val j = direct.join(salted, "k").collect()
    assert(j.length === 101)
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("vs") - r.getAs[Double]("value_sum")) < 1e-6)
      assert(r.getAs[Long]("n0") === r.getAs[Long]("n"))
    }
  }

  test("AQE skew-join splits the hot partition of a skewed sort-merge join") {
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled to test-sized data (defaults are 256 MB)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val skewed = spark.range(400000L).select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k")
      // execute THIS QueryExecution (count() would plan a new one and
      // leave this plan un-finalized, isFinalPlan=false)
      assert(joined.collect().length === 400000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("Memo.cached registers one cache entry and never re-persists it") {
    import org.apache.spark.storage.StorageLevel
    val build = () => spark.range(100).toDF("id").select(col("id") * 2 as "memo_x")
    val c1 = graft.plans.Memo.cached(build())
    c1.count()
    assert(c1.storageLevel === StorageLevel.MEMORY_AND_DISK)
    // an identically-built plan resolves to the SAME CacheManager entry
    // (plan equality), and Memo must see it as already cached — the
    // no-op that silences the "Asked to cache already cached data"
    // flood the memoization helpers used to emit per call
    val c2 = graft.plans.Memo.cached(build())
    assert(c2.storageLevel === StorageLevel.MEMORY_AND_DISK)
    // one entry, not two: releasing via the twin releases the original
    c2.unpersist()
    assert(c1.storageLevel === StorageLevel.NONE,
      "a second Memo.cached call must not have registered a second entry")
  }

  test("Lloyd training sample is deterministic, bounded, and identity below the cap") {
    import spark.implicits._
    // below the cap: the sample IS the input (shipped-SF recall untouched)
    val small = spark.range(100).select(col("id").as("vec_id"))
    assert(Similarity.trainingSample(small).count() === 100)
    // above the cap: bounded near the cap, deterministic across runs
    // and across partitioning (hash of vec_id, not position)
    val big = spark.range(50000).select(col("id").as("vec_id"))
    val s1 = Similarity.trainingSample(big).as[Long].collect().sorted
    val s2 = Similarity.trainingSample(big.repartition(7)).as[Long].collect().sorted
    assert(s1 sameElements s2, "sample depends on partitioning")
    assert(s1.length <= Similarity.TrainSampleCap,
      s"sample exceeds cap: ${s1.length}")
    assert(s1.length >= Similarity.TrainSampleCap / 2,
      s"sample far below cap: ${s1.length}")
  }

  test("ANN recall@5: LSH and IVF vs brute force") {
    val brute = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val nQ = brute.select("q_id").distinct().count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      brute.intersect(df.select("q_id", "neighbor_id")).count().toDouble / (nQ * Similarity.TopK)
    val rLsh = recall(Similarity.annLshTopK(spark, sf))
    val rIvf = recall(Similarity.annIvfTopK(spark, sf))
    val rIvf2 = recall(Similarity.annIvfLearnedTopK(spark, sf))
    info(f"recall@5 lsh=$rLsh%.2f ivf=$rIvf%.2f ivf-learned=$rIvf2%.2f")
    // nProbe=3 measures ivf 0.82 / ivf-learned 0.86 at sf0.001 (was
    // 0.52/0.64 at nProbe=2)
    assert(rIvf >= 0.6, s"IVF recall too low: $rIvf")
    assert(rIvf2 >= rIvf - 0.1, s"learned IVF should not regress: $rIvf2 vs $rIvf")
    // 6-table OR-amplified LSH with 1-bit multiprobe measures 0.76 at
    // sf0.001 and 0.74 at sf0.1 (was 0.26 single-table)
    assert(rLsh >= 0.5, s"LSH recall too low: $rLsh")
  }

  test("SQ8 ANN: recall vs brute; encode matches a local reference incl. clamp and zero-scale") {
    val brute = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val nQ = brute.select("q_id").distinct().count()
    val rSq = brute.intersect(Similarity.annSqTopK(spark, sf)
      .select("q_id", "neighbor_id")).count().toDouble / (nQ * Similarity.TopK)
    info(f"recall@5 sq8=$rSq%.2f (rerank pool ${Similarity.SqRerank})")
    assert(rSq >= 0.9, s"SQ8 recall too low: $rSq")

    // codegen'd encode vs a driver-side reference loop over the same
    // scales (catches codegen/eval divergence, not just formula echo)
    val (scales, w) = Similarity.sqTrained(spark, sf)
    assert(scales.length === Similarity.Dim && w.length === Similarity.Dim)
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.plans.SqOps.encode(col("embedding"), scales).as("codes"))
      .orderBy("vec_id").limit(50).collect()
    rows.foreach { r =>
      val e = r.getSeq[Float](1)
      val got = r.getSeq[Byte](2)
      val want = e.indices.map { d =>
        val s = scales(d)
        if (s == 0.0) 0.toByte
        else {
          val v = math.floor(e(d).toDouble / s + 0.5)
          (if (v > 127) 127 else if (v < -127) -127 else v.toInt).toByte
        }
      }
      assert(got === want, s"encode mismatch for vec ${r.getLong(0)}")
    }

    // clamp + zero-scale edges on constructed inputs: out-of-range
    // values saturate at ±127 (corpus rows beyond the sample max at
    // >cap scale), a zero scale encodes to 0
    import spark.implicits._
    val edge = Seq(Seq(10f, -10f, 0.5f)).toDF("v")
      .select(graft.plans.SqOps.encode(col("v"), Array(0.01, 0.01, 0.0)).as("c"))
      .head().getSeq[Byte](0)
    assert(edge === Seq(127.toByte, (-127).toByte, 0.toByte))
  }

  test("BQ ANN: recall vs brute; sign-bit words match a local reference") {
    val brute = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val nQ = brute.select("q_id").distinct().count()
    val rBq = brute.intersect(Similarity.annBqTopK(spark, sf)
      .select("q_id", "neighbor_id")).count().toDouble / (nQ * Similarity.TopK)
    // measured 100/98/82 at sf0.001/0.01/0.1 with the 256 pool
    info(f"recall@5 bq=$rBq%.2f (rerank pool ${Similarity.BqRerank})")
    assert(rBq >= 0.7, s"BQ recall too low: $rBq")

    // the two 32-bit sign words vs a driver-side reference fold
    // (catches codegen/fold-order divergence, not just formula echo)
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(50).collect()
    val enc = Similarity.annBqTopKEncoded(spark, sf)
      .orderBy("neighbor_id").limit(50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val e = r.getSeq[Float](1)
      def word(lo: Int): Long =
        (lo until lo + 32).foldLeft(0L)((acc, d) =>
          acc * 2 + (if (e(d).toDouble > 0) 1L else 0L))
      assert(enc(r.getLong(0)) === ((word(0), word(32))),
        s"sign words mismatch for vec ${r.getLong(0)}")
    }
  }

  test("MMR rerank: matches a local greedy reference; first pick is the relevance argmax") {
    val got = Retrieval.mmrRerank(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === Retrieval.MmrTopK)
    assert(got.map(_._2).distinct.length === got.length, "picks must be distinct")

    // local reference: exact pool + greedy over collected embeddings
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def micro(a: Array[Float], b: Array[Float]): Long =
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        * 1e6 + 0.5).toLong
    val qe = embs(Retrieval.RrfQueryVec)
    val pool = embs.toSeq.filter(_._1 != Retrieval.RrfQueryVec)
      .map { case (d, e) => (d, micro(qe, e)) }
      .sortBy { case (d, rel) => (-rel, d) }.take(Retrieval.MmrPool)
    val lam = Retrieval.MmrLamNum.toLong
    var remaining = pool
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (rank <- 1 to Retrieval.MmrTopK) {
      val (pick, rel, mmr) = remaining.map { case (d, r) =>
        val maxSim = if (sel.isEmpty) 0L
          else sel.map(s => micro(embs(d), embs(s._2))).max
        (d, r, lam * r - (10L - lam) * maxSim)
      }.minBy { case (d, _, m) => (-m, d) }
      sel += ((rank, pick, rel, mmr))
      remaining = remaining.filterNot(_._1 == pick)
    }
    assert(got.toSeq === sel.toSeq, "greedy selection diverges from the local reference")
    // rank 1 is pure relevance (empty selected set)
    assert(got.head._2 === pool.head._1)
  }

  test("filtered ANN: brute respects the label filter; filtered IVF recall vs filtered brute") {
    val brute = Similarity.annFilteredTopK(spark, sf)
    // every neighbor shares its query's label — the filter semantics
    val lab = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    brute.collect().foreach { r =>
      assert(lab(r.getLong(3)) === r.getInt(1),
        s"neighbor ${r.getLong(3)} breaks query ${r.getLong(0)}'s label filter")
      assert(r.getLong(0) !== r.getLong(3), "self excluded")
    }
    // and it IS the brute ranking restricted to the label: local check
    // on one query (full cross-check is the DuckDB oracle's job)
    val bSet = brute.select("q_id", "neighbor_id")
    val nQ = bSet.select("q_id").distinct().count()
    val rIvf = bSet.intersect(Similarity.annIvfFilteredTopK(spark, sf)
      .select("q_id", "neighbor_id")).count().toDouble / (nQ * Similarity.TopK)
    info(f"recall@5 filtered-ivf=$rIvf%.2f (post-filtered probes)")
    // post-filtering pays the filter's selectivity (~10% per label)
    // on top of the probe miss; measured 0.76 on the shipped corpus
    assert(rIvf >= 0.4, s"filtered-IVF recall too low: $rIvf")
    // determinism
    assert(Similarity.annIvfFilteredTopK(spark, sf).collect().toSeq ===
      Similarity.annIvfFilteredTopK(spark, sf).collect().toSeq)
  }

  test("hard negatives: nearest cross-label neighbors match a local reference") {
    val rows = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos6(a: Array[Float], b: Array[Float]): BigDecimal = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // Spark round() is BigDecimal HALF_UP (away from zero on
      // negatives — NOT the floor-shift, builder-notes r8 trap)
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = rows.filter(_._1 < Similarity.NumQueries).flatMap {
      case (qid, qe, qlab) =>
        rows.filter(_._3 != qlab)
          .map { case (cid, ce, clab) => (cid, clab, cos6(qe, ce)) }
          .sortBy { case (cid, _, c) => (-c, cid) }
          .take(Similarity.TopK)
          .zipWithIndex
          .map { case ((cid, clab, c), i) => (qid, qlab, i + 1, cid, clab, c.toDouble) }
    }.toSeq
    val got = Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getDouble(5))).toSeq
    assert(got === expected, "cross-label top-k differs from the local reference")
    // every mined negative crosses the label boundary
    assert(got.forall { case (_, ql, _, _, nl, _) => ql != nl })
  }

  test("PQ ANN recall@5 vs brute force, and codes stay in range") {
    val brute = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val nQ = brute.select("q_id").distinct().count()
    val pq = Similarity.annPqTopK(spark, sf)
    val r = brute.intersect(pq.select("q_id", "neighbor_id")).count().toDouble /
      (nQ * Similarity.TopK)
    info(f"recall@5 pq=$r%.2f (rerank pool ${Similarity.PqRerank})")
    // the asymmetric-distance candidate stage must surface most true
    // neighbors into the exact rerank
    assert(r >= 0.5, s"PQ recall too low: $r")
    // IVF-PQ prunes to probed cells on top of the code compression —
    // recall pays the probe-fraction miss on top of quantization error
    val rIvfPq = brute.intersect(Similarity.annIvfPqTopK(spark, sf)
      .select("q_id", "neighbor_id")).count().toDouble / (nQ * Similarity.TopK)
    info(f"recall@5 ivfpq=$rIvfPq%.2f")
    assert(rIvfPq >= 0.4, s"IVF-PQ recall too low: $rIvfPq")
    // deterministic: learned codebooks + argmin ties to lower code
    assert(pq.collect().toSeq === Similarity.annPqTopK(spark, sf).collect().toSeq)
    val cb = Similarity.pqCodebook(spark, sf)
    assert(cb.length === Similarity.PqM * Similarity.PqK * Similarity.PqDsub)
    val enc = Tables.embeddings(spark, sf)
      .select(graft.plans.PqOps.encode(col("embedding"), cb,
        Similarity.PqM, Similarity.PqK, Similarity.PqDsub).as("codes"))
    val mm = enc.select(array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .agg(min("lo"), max("hi")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < Similarity.PqK)
  }

  test("OPQ: rotation is orthogonal and cuts quantization error on an anisotropic sample") {
    import graft.operators.Opq
    val d = Similarity.Dim
    val m = Similarity.PqM; val k = Similarity.PqK; val dsub = Similarity.PqDsub
    // deterministic anisotropic sample: decaying axis-aligned spectrum
    // (the real-text-embedding shape plain PQ handles worst — subspace 0
    // hoards the variance, so its k centroids saturate while the other
    // seven quantize noise)
    val rnd = new java.util.Random(42)
    val scale = Array.tabulate(d)(i => math.exp(-i / 8.0))
    val sample = Array.fill(2048) {
      val v = new Array[Double](d)
      var ss = 0.0
      for (i <- 0 until d) { val x = rnd.nextGaussian() * scale(i); v(i) = x; ss += x * x }
      val nm = math.sqrt(ss)
      Array.tabulate(d)(i => (v(i) / nm).toFloat)
    }
    val (rot, cbR) = Opq.train(sample, m, k, dsub, Similarity.trainPqLocal, Similarity.OpqNpIters)
    // R orthogonal: RᵀR = I (the rerank-needs-no-rotation argument and
    // the error-metric equivalence both rest on exactly this)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      for (r <- 0 until d) s += rot(r * d + i) * rot(r * d + j)
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RtR[$i][$j] = $s not orthogonal")
    }
    val cbPlain = Similarity.trainPqLocal(sample)
    val msePlain = Opq.mse(sample, cbPlain, m, k, dsub)
    // orthogonality ⇒ rotated-space MSE is the original-space MSE of
    // the OPQ quantizer
    val mseOpq = Opq.mse(sample.map(Opq.rotate(rot, _)), cbR, m, k, dsub)
    info(f"quantization MSE plain=$msePlain%.6f opq=$mseOpq%.6f")
    assert(mseOpq < msePlain * 0.7,
      s"OPQ should cut anisotropic quantization error: $mseOpq vs $msePlain")
  }

  test("OPQ ANN: shipped-corpus recall matches PQ, output deterministic") {
    val brute = Similarity.annBruteTopK(spark, sf).select("q_id", "neighbor_id")
    val nQ = brute.select("q_id").distinct().count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      brute.intersect(df.select("q_id", "neighbor_id")).count().toDouble /
        (nQ * Similarity.TopK)
    val opq = Similarity.annOpqTopK(spark, sf)
    val rOpq = recall(opq)
    val rPq = recall(Similarity.annPqTopK(spark, sf))
    info(f"recall@5 opq=$rOpq%.2f pq=$rPq%.2f (shipped near-isotropic corpus)")
    // the shipped corpus is near-isotropic — nothing for the rotation to
    // balance, so OPQ must neither regress nor (materially) improve
    assert(rOpq >= rPq - 0.02, s"OPQ regressed on isotropic data: $rOpq vs $rPq")
    assert(opq.columns.toSeq === Seq("q_id", "rank", "neighbor_id", "cos_sim"))
    assert(opq.count() === nQ * Similarity.TopK)
    assert(opq.collect().toSeq === Similarity.annOpqTopK(spark, sf).collect().toSeq)
  }
}

class TopKPerKeySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("bounded-heap top-k equals window row_number top-k") {
    val got = operators.ExtendedAnalytics.topOrdersPerCustomer(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("total_price"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("top-k plan has one exchange and no sort before the operator") {
    val df = graft.plans.TopK.perKey(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"no partition sort expected:\n$plan")
  }
}

class WindowTopKRewriteSpec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import org.apache.spark.sql.functions._

  // runtime installation on the shared session (getOrCreate would reuse
  // the existing non-extended session, silently dropping withExtensions;
  // the withExtensions path itself is exercised by SampleApp in a fresh
  // JVM). The rewrite is semantics-preserving so leaking it to other
  // suites would be harmless, but restore state anyway.
  lazy val spark = SparkTestSession.spark
  private var savedOpts: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Nil

  override def beforeAll(): Unit = {
    savedOpts = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = savedOpts :+ graft.plans.WindowTopKRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
  }
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = savedOpts
  }

  test("window row_number top-k plans rewrite to TopKPerKey and agree with the window result") {
    val sf = SparkTestSession.Sf
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window should be gone:\n$plan")
    // cross-check against an un-extended session running the same query
    val ref = TaskSparkRef.run(sf)
    assert(df.count() === ref)
  }

  test("rn === 1 keep-last dedup pattern also rewrites") {
    val sf = SparkTestSession.Sf
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts").desc, col("event_id").desc)
    val df = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
  }

  test("rank column referenced downstream rewrites too (operator emits row_number)") {
    val sf = SparkTestSession.Sf
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // total ordering (tie-broken by o_orderkey) so the window reference
    // result is deterministic and comparable cell-for-cell
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def q(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "rn")
    val df = q(orders)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rank-projecting top-k did not rewrite:\n$plan")
    assert(!plan.contains("Window"), s"window should be gone:\n$plan")
    // reference: same query in a no-rewrite session state
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ eq graft.plans.WindowTopKRewrite)
    try {
      val ref = q(spark.read.parquet(s"$sf/orders.parquet"))
      assert(!ref.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty,
        "operator-emitted row_number drifts from the window's")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("catalog queries execute TopKPerKeyExec under the extensions (verdict r3 #3)") {
    val sf = SparkTestSession.Sf
    for (q <- Seq("q_tfidf_top_terms", "q_clean_pipeline")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"$q did not hit the heap operator:\n$plan")
    }
  }

  test("entry-point sessions install GraftExtensions (source guard)") {
    // the rewrite only matters if the measured sessions load it; the
    // extensions path itself is proven by SampleApp in a fresh JVM
    // (getOrCreate would drop withExtensions under an existing session,
    // so this cannot be asserted in-JVM from the shared test session)
    for (f <- Seq("src/main/scala/graft/Verify.scala", "src/main/scala/graft/Bench.scala")) {
      val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(src.contains("\"spark.sql.extensions\", \"graft.plans.GraftExtensions\""),
        s"$f lost the spark.sql.extensions config")
    }
  }
}

/** Reference count from the ordinary (un-extended) session. */
object TaskSparkRef {
  def run(sf: String): Long = {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey").count()
  }
}

/** Plan-shape regression guards: the scale properties SURVEY §5 promises,
  * pinned so future rounds can't silently regress them.
  */
class PlanRegressionSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("filters reach the parquet scans (predicate pushdown)") {
    for (q <- Seq("q1_pricing_summary", "q_overdue", "q3_top_revenue", "q5_region_volume")) {
      val p = plan(q)
      assert(p.contains("PushedFilters: [I") || p.contains("PushedFilters: [Less") ||
        p.contains("PushedFilters: [Greater") || p.contains("PushedFilters: [Equal"),
        s"$q lost pushdown")
    }
  }

  test("bounded dims are broadcast in the join queries") {
    for (q <- Seq("q3_top_revenue", "q5_region_volume", "q_parent_join", "q_hierarchy_rollup"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast join")
  }

  test("q3 hints broadcast only for the customer dim, never a fact-derived side") {
    // an explicit broadcast() on the orders⋈customer side is O(orders) —
    // fact-scale — and forces an OOM at 100 TB where AQE would have
    // picked sort-merge; only bounded dims may carry the hint
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val df = SparkEntry.queries("q3_top_revenue")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val hinted = joins.flatMap { j =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).collect {
        case (Some(h), side) if h.strategy.contains(BROADCAST) => side
      }
    }
    assert(hinted.nonEmpty, "the customer dim should still carry its broadcast hint")
    for (side <- hinted) {
      val leaves = side.collectLeaves().mkString("\n")
      assert(!leaves.contains("orders") && !leaves.contains("lineitem"),
        s"fact-derived side carries an explicit broadcast hint:\n$leaves")
    }
  }

  test("no accidental cartesian products anywhere") {
    // brute/IVF queries broadcast the bounded query/centroid set; the
    // others broadcast a SINGLE scalar/boundary row (count gate,
    // corpus-size N, decile bounds) — O(1) build sides, not cartesians
    val allowedBnlj = Set("q_ann_brute_topk", "q_ann_ivf_topk", "q_ann_ivf2_topk",
      // bounded query set × encoded corpus (q_id <> neighbor — no hash key)
      "q_ann_sq_topk", "q_ann_bq_topk",
      // dense-list half broadcasts the single RRF query vector
      "q_hybrid_rrf",
      // single query row × corpus for the pool; pool×pool (≤20 rows
      // cached) for the pairwise sims — both keyless by nature
      "q_mmr_rerank",
      // bounded query set × corpus on a label INEQUALITY (no hash key)
      "q_hard_negatives",
      "q_ann_pq_topk", "q_ann_opq_topk", "q_ann_ivfpq_topk", "q_report_goals", "q_report_doc",
      "q_tfidf_top_terms", "q_value_deciles", "q_lm_score",
      // per-doc tf/dl × the single (N, avgdl, df) corpus-stats scalar row
      "q_bm25_rank",
      // same scalar stats row, served from the postings artifact
      "q_bm25_indexed",
      // same scalar stats row, served from the PINNED version's files
      "q_bm25_versioned",
      // phrase scorer and its positional-index twin: same scalar row
      "q_phrase_search", "q_phrase_indexed",
      // inherit q_lm_score's scalar vocab-size cross join
      "q_ppl_buckets", "q_quality_calibration",
      // pair/unigram counts × the single corpus-token-total scalar row
      "q_cooccur",
      // lang-cardinality counts × the single feasible-size scalar row
      "q_domain_mix", "q_domain_mix_up", "q_domain_mix_alpha",
      // vocab counts × the single corpus-total scalar row
      "q_kl_drift",
      // the same KL corpus-total scalar row, over version slices
      "q_snapshot_drift",
      // ≤64 bucket rows × the single doc-total scalar row
      "q_length_histogram",
      // shard-count rows × the single doc-total scalar row
      "q_shard_balance",
      // assigned corpus × the single (total, cells) scalar row
      "q_cluster_mix",
      // source-catalog (dim-sized) signature self-join on an inequality
      "q_source_sim")
    for ((q, _) <- SparkEntry.queries) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      if (!allowedBnlj(q))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has an unexpected nested-loop join")
    }
  }

  test("queries/oracleSql source literals define each key exactly once") {
    // Map(...) construction silently keeps only the LAST duplicate key —
    // an edit to the shadowed literal would no-op (happened in round 1
    // with q_session_window), so check the SOURCE text, not the Map
    val src = scala.io.Source.fromFile("src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    val qStart = text.indexOf("def queries")
    val oStart = text.indexOf("def oracleSql")
    val keyRe = """"(q[0-9]*_?[a-z0-9_]+)"\s*->""".r
    def keysIn(s: String) = keyRe.findAllMatchIn(s).map(_.group(1)).toSeq
    val qKeys = keysIn(text.substring(qStart, oStart))
    val oKeys = keysIn(text.substring(oStart))
    assert(qKeys.size === qKeys.distinct.size,
      s"duplicate queries keys: ${qKeys.diff(qKeys.distinct).distinct}")
    assert(oKeys.size === oKeys.distinct.size,
      s"duplicate oracleSql keys: ${oKeys.diff(oKeys.distinct).distinct}")
    assert(qKeys.toSet === SparkEntry.queries.keySet)
    assert(oKeys.toSet === SparkEntry.oracleSql.keySet)
    assert(oKeys.toSet.subsetOf(qKeys.toSet), "every oracle needs a query")
  }

  test("report doc has no unpartitioned window and no fact-scale low-cardinality window") {
    // the round-5 weakness: a Window.partitionBy(section_no) —
    // cardinality 3 — serialized each section's full fact-derived frame
    // through one task, and the §4 catch-all ranked with NO partition
    // at all. The round-6 rule this spec pins: every Window must either
    // (a) partition by something finer than section_no (the per-group
    // local rank, the §4 bucket rank), or (b) run over a post-aggregate
    // frame (group counts, bucket counts, the ≤3-row legend) — bounded
    // metadata scale, where a coarse partition spec is harmless. And no
    // Window may have an EMPTY partition spec (that is what emits
    // `WindowExec: No Partition Defined` and single-tasks the sort).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = operators.ReportDoc.reportDoc(spark, sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "report doc lost its rank windows entirely")
    for (w <- wins) {
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      assert(parts.nonEmpty, s"unpartitioned window in report doc plan:\n$w")
      val postAggregate = w.child.collectFirst { case a: Aggregate => a }.nonEmpty
      if (!postAggregate)
        assert(parts.exists(_ != "section_no"),
          s"fact-derived window partitioned only by $parts (single-digit cardinality):\n$w")
    }
  }

  test("catch-all numbering: bucketed two-phase equals a sequential enumerate") {
    // §4 is empty on the shipped corpus, so exercise the operator on
    // planted dirty statuses: sparse, unordered okeys across the full
    // bucket range, including a bucket-boundary cluster
    import spark.implicits._
    val okeys = Seq(9000000L, 3L, 4097L, 4096L, 4095L, 777L, 12L, 500000L, 1L, 8191L)
    val unc = okeys.map(k => (s"Order $k (x)", k)).toDF("item_name", "okey")
    val got = operators.ReportDoc.catchAllItems(unc)
      .orderBy("r").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = okeys.sorted.zipWithIndex
      .map { case (k, i) => (s"Order $k (x)", (i + 1).toLong) }
    assert(got.toSeq === want, s"two-phase numbering drifted: ${got.toSeq}")
    // and the rank window is bucket-partitioned, not global
    val wins = operators.ReportDoc.catchAllItems(unc)
      .queryExecution.optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "catch-all rank must partition by the okey range bucket")
  }

  test("no query in the catalog runs an unpartitioned window at all") {
    // every empty window partition spec single-tasks its input and
    // prints `WindowExec: No Partition Defined`. Round 8 two-phased the
    // last three calendar windows (q_wow_change year-lag, q_moving_avg
    // and q_rate_anomaly helper-copy buckets), so the catalog-wide rule
    // is now absolute: no Window may have an empty partition spec —
    // post-aggregate frames included (a decades-long history makes
    // even the calendar series unbounded).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for ((q, fn) <- SparkEntry.queries) {
      val wins = fn(spark, sf).queryExecution.optimizedPlan
        .collect { case w: LWindow => w }
      for (w <- wins)
        assert(w.partitionSpec.nonEmpty, s"$q: unpartitioned window:\n$w")
    }
  }

  test("custom-operator plans keep their shapes") {
    val asof = plan("q_asof_join")
    assert(asof.contains("AsOfJoin") && asof.contains("Exchange hashpartitioning"))
    val topk = plan("q_topk_per_key")
    assert(topk.contains("TopKPerKey") && !topk.contains("Sort ("))
  }

  test("single-scan rewrites stay single-scan (schema health, set ops)") {
    def scans(q: String): Int = "Scan parquet".r.findAllIn(plan(q)).length
    assert(scans("q_schema_health") === 1,
      "schema health must compute every column's stats in ONE scan")
    assert(scans("q_set_ops") === 1,
      "set-ops overlap must be one membership-flag scan, not per-set scans")
  }

  test("bloom prefilter equals the plain join and probes before the join") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= lit(BloomPrune.CutoffDate).cast("timestamp"))
      .select("o_orderkey", "o_orderpriority")
    val plain = Tables.lineitem(spark, sf)
      .join(keys, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
    // exactness: the fpp false positives must all die in the equi-join
    // (and bloom false negatives are impossible, so no row is lost)
    assert(BloomPrune.prefilterRevenue(spark, sf).collect().toSeq ===
      plain.collect().toSeq)
    assert(plan("q_bloom_prefilter").contains("graft_bloom_might_contain"),
      "bloom probe missing from the physical plan")
  }

  test("keyed sample is bounded per key, deterministic, and heap-rewritten") {
    val ks = ExtendedAnalytics.keyedSample(spark, sf)
    val counts = ks.groupBy("lang").count().collect()
    assert(counts.nonEmpty &&
      counts.forall(_.getLong(1) <= ExtendedAnalytics.KeyedSampleK))
    assert(ks.collect().toSeq === ExtendedAnalytics.keyedSample(spark, sf).collect().toSeq,
      "hash-ordered sample must replay identically")
    assert(plan("q_keyed_sample").contains("TopKPerKey"),
      "keyed sample must run on the bounded-heap operator, not a window sort")
  }

  test("containment is asymmetric and bounds jaccard from above") {
    val cont = Dedup.containment(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.nonEmpty)
    assert(cont.values.forall(_ >= Dedup.ContainT))
    assert(cont.keys.forall { case (i, o) => i != o })
    // for any pair, containment (inter/|inner|) ≥ jaccard (inter/|union|)
    val jac = Dedup.ngramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (((a, b), j) <- jac) {
      val c = math.max(cont.getOrElse((a, b), 0.0), cont.getOrElse((b, a), 0.0))
      if (c > 0) assert(c >= j - 1e-9, s"containment $c < jaccard $j for ($a,$b)")
    }
  }

  test("incremental dedup equals the batch-vs-corpus slice of the full minhash pairs") {
    val mod = Dedup.IncrementalBatchMod
    val full = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % mod == 0) != (b % mod == 0) }
      .map { case (a, b, j) => // orient as (batch, corpus)
        if (a % mod == 0) (a, b, j) else (b, a, j) }.toSet
    val inc = Dedup.incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === full,
      "incremental must find exactly the full run's batch×corpus pairs")
  }

  test("cleaning pipeline composes its gates correctly in one scan + one shuffle") {
    val out = TextAnalysis.cleanPipeline(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) >= TextAnalysis.PipelineQualityMin))
    assert(out.forall(_.getString(1) != "unknown"))
    // exact-dedup gate: one survivor per content hash (the testdata's
    // texts are all distinct, so this checks the no-op direction — the
    // duplicate direction is covered by the keep-last dedup specs)
    assert(out.map(_.getLong(0)).toSet.size === out.length)
    val exactScans = "Scan parquet".r.findAllIn(plan("q_clean_pipeline")).length
    assert(exactScans === 1, "pipeline gates must ride ONE documents scan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan("q_clean_pipeline")).length
    assert(exchanges === 1, "only the content-hash dedup may shuffle")
  }

  test("gopher filter is map-only; repetition rides one scan and two combined aggs") {
    val gp = plan("q_gopher_filter")
    assert("Scan parquet".r.findAllIn(gp).length === 1)
    assert(!gp.contains("Exchange hashpartitioning"),
      s"gopher rules must ride the scan map-side:\n$gp")
    val rp = plan("q_repetition")
    assert("Scan parquet".r.findAllIn(rp).length === 1,
      "both gram sizes must ride ONE scan")
    assert("Exchange hashpartitioning".r.findAllIn(rp).length === 2,
      s"(doc,n,gram) then (doc) — both map-side-combined:\n$rp")
  }

  test("IVF cell assignment is a zero-shuffle map (no exchange, no window)") {
    val cents = Similarity.seededCentroids(spark, sf)
    val assigned = Similarity.ivfAssigned(spark, sf, cents)
    val p = assigned.queryExecution.executedPlan.toString
    assert(p.contains("graft_nearest_cents"), s"argmin expression missing:\n$p")
    // the shipped single-row-group corpus triggers Tables' conditional
    // narrow-layout spread (one ROUND-ROBIN exchange — r16); the scale
    // claim is that assignment never pays a KEYED shuffle, and on a
    // real multi-row-group corpus the spread is identity too
    assert(!p.contains("Exchange hashpartitioning"),
      s"assignment must not key-shuffle:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"assignment must not sort-shuffle:\n$p")
    assert(!p.contains("Window"), s"assignment must not rank via a window:\n$p")
  }

  test("expression cell assignment equals the broadcast-join + window argmin") {
    val cents = Similarity.seededCentroids(spark, sf)
    val centDf = spark.createDataFrame(cents.map(c => (c._1, c._2, c._3)))
      .toDF("cent_id", "e_cent", "n_cent")
    val n = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(graft.plans.ArrayOps.dotF(col("e"), col("e"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cdist").desc, col("cent_id"))
    val ref = n.join(broadcast(centDf), lit(true))
      .withColumn("cdist",
        graft.plans.ArrayOps.dotF(col("e"), col("e_cent")) / (col("nrm") * col("n_cent")))
      .withColumn("crank", row_number().over(w)).filter(col("crank") === 1)
      .select(col("vec_id"), col("cent_id").as("cell_ref"))
    val got = Similarity.ivfAssigned(spark, sf, cents)
      .select(col("neighbor_id").as("vec_id"), col("cell"))
    val diff = got.join(ref, "vec_id").filter(col("cell") =!= col("cell_ref"))
    assert(diff.isEmpty, s"assignment drift:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("funnel enforces stage ORDER; retention buckets by first-seen cohort") {
    import spark.implicits._
    // the shipped corpus is dense enough that every user completes every
    // stage — the order gating needs planted counterexamples
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val day = 86400L * 1000000000L // ns (events.parquet carries ns longs)
    // u1 full ordered funnel (+ an event two weeks later for retention);
    // u2 clicks only BEFORE signup -> must stop at stage 1;
    // u3 signup->click, no purchase; u4 never signs up -> reaches nothing
    val rows = Seq(
      (1L, 1 * day, 1L, "signup", 1.0), (2L, 2 * day, 1L, "click", 1.0),
      (3L, 3 * day, 1L, "purchase", 1.0), (4L, 15 * day, 1L, "view", 1.0),
      (5L, 1 * day, 2L, "click", 1.0), (6L, 2 * day, 2L, "signup", 1.0),
      (7L, 1 * day, 3L, "signup", 1.0), (8L, 2 * day, 3L, "click", 1.0),
      (9L, 1 * day, 4L, "click", 1.0), (10L, 2 * day, 4L, "purchase", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val f = ExtendedAnalytics.funnel(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f === Map("signup" -> 3L, "click" -> 2L, "purchase" -> 1L))
    val ret = ExtendedAnalytics.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val wk = ret.keys.map(_._1).min
    assert(ret === Map((wk, 0) -> 4L, (wk, 2) -> 1L), s"got $ret")
  }

  test("scd2 intervals are contiguous per user with one open-ended current state") {
    val iv = graft.operators.ExtendedAnalytics.scd2Intervals(spark, sf)
    val n = Tables.events(spark, sf).count()
    assert(iv.count() === n, "one interval per change-log event")
    // exactly one open-ended (current) interval per user
    val open = iv.filter(col("valid_to").isNull).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).isEmpty)
    // contiguity: each closed interval's valid_to is the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val gaps = iv.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
    assert(gaps.isEmpty, s"non-contiguous intervals:\n${gaps.limit(3).collect().mkString("\n")}")
  }

  test("bucketized interval join equals brute-force lookback, no nested loop") {
    val out = graft.operators.ExtendedAnalytics.errorContext(spark, sf)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$p")
    // brute-force reference computed driver-side on the small corpus
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val W = graft.operators.ExtendedAnalytics.IntervalUs
    val expected = ev.filter(_._3 == "error").map { case (id, u, _, us, _) =>
      val prior = ev.filter(e => e._2 == u && e._4 >= us - W && e._4 < us)
      (id, u, prior.length.toLong,
        BigDecimal(prior.map(_._5).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("persisted PQ index reproduces the in-memory ranking and prunes probed cells") {
    val fromIndex = graft.sources.PqIndex.annPqIndexed(spark, sf)
    val inMemory = Similarity.annIvfPqTopK(spark, sf)
    assert(fromIndex.collect().toSeq === inMemory.collect().toSeq)
    // the codes scan must carry the probe set as PartitionFilters (file
    // pruning at plan time), not re-read the whole encoded corpus
    val scans = fromIndex.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("codes"))
    assert(scans.exists(_.contains("PartitionFilters: [cell#")) ||
      scans.exists(s => s.contains("PartitionFilters") && s.contains("cell")),
      s"probe set should prune index partitions:\n${scans.mkString("\n")}")
  }

  test("bucketed fact join: zero exchanges, one file per bucket, results == plain join") {
    import graft.sources.Bucketed
    val df = Bucketed.bucketedJoin(spark, sf)
    df.collect()   // finalize the adaptive plan before inspecting it
    // AQE wraps the tree, so assert on the printed FINAL plan: the
    // join's children print AFTER the SortMergeJoin line (top-down
    // tree), and bucket co-location means nothing below it shuffles —
    // the only exchanges are the post-join priority agg + orderBy
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans must read buckets:\n$plan")
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange"),
      s"bucket co-location must remove the join shuffles:\n$plan")
    // one file per bucket per table (multi-file buckets force a re-sort)
    val (rootDir) = Bucketed.root(spark, sf)
    for (t <- Seq("orders", "lineitem")) {
      val files = new java.io.File(s"$rootDir/$t").listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(files.length === Bucketed.Buckets,
        s"$t: expected one file per bucket, got ${files.length}")
    }
    // layout must not change answers
    val want = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), round(sum(col("rev")), 2).as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(df.collect().toSeq === want, "bucketed layout changed the answer")
  }

  test("streaming vector indexer == batch index over any split, counters == artifact cells, incl. restore") {
    import graft.sources.PqIndex
    val nrm = Similarity.normed(spark, sf)
    def slice(r: Int) = nrm.filter(pmod(col("vec_id"), lit(3)) === r)
    val root = java.nio.file.Files.createTempDirectory("graft_pqstream").toString
    val full = java.nio.file.Files.createTempDirectory("graft_pqfull2").toString
    // base index over slice 0 (the sidecar freezes codebook+centroids),
    // then the twin ingests the remaining slices as micro-batches
    PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(3)) === 0, root)
    val twin = new graft.streaming.StreamingPqIndex(sf, root)
    twin.mergeBatch(spark, slice(1))
    // mid-stream counters cover the STREAMED vectors only (the base
    // build is the batch half); snapshot + restore continues them
    assert(twin.cellCounts.values.sum === slice(1).count())
    val snap = java.nio.file.Files.createTempDirectory("graft_pqsnap").toString
    twin.snapshot(spark, snap)
    val resumed = graft.streaming.StreamingPqIndex.restore(spark, snap, sf, root)
    resumed.mergeBatch(spark, slice(2))
    PqIndex.materializeWhere(spark, sf, lit(true), full)
    assert(resumed.current(spark).collect().toSeq ===
      PqIndex.searchRoot(spark, sf, full).collect().toSeq,
      "stream-built index answers the standing query == a batch full build")
    // streamed counters + base-build cells == the artifact's per-cell counts
    val artifact = spark.read.parquet(s"$root/codes")
      .groupBy("cell").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$full/codes")
      .join(slice(0).select(col("vec_id").as("neighbor_id")), "neighbor_id")
      .groupBy("cell").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val streamed = resumed.cellCounts
    artifact.foreach { case (c, n) =>
      assert(streamed.getOrElse(c, 0L) + base.getOrElse(c, 0L) === n,
        s"cell $c: streamed + base counters must equal the artifact")
    }
  }

  test("PQ index append with a frozen codebook equals a full re-encode; compact keeps it") {
    import graft.sources.PqIndex
    val base = java.nio.file.Files.createTempDirectory("graft_pqbase").toString
    val full = java.nio.file.Files.createTempDirectory("graft_pqfull").toString
    // base index over ~6/7 of the corpus, then append the held-out
    // seventh encoded with the SIDECAR codebook (never retrained)
    PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(7)) =!= 0, base)
    PqIndex.materializeWhere(spark, sf, lit(true), full)
    PqIndex.append(spark, base,
      Similarity.normed(spark, sf).filter(pmod(col("vec_id"), lit(7)) === 0))
    def run(root: String) = PqIndex.searchRoot(spark, sf, root).collect().toSeq
    val wantFull = run(full)
    assert(run(base) === wantFull,
      "append + search == full re-encode search (frozen codebook)")
    // compaction merges the append's per-cell files without changing
    // results or losing the cell directories that probe pruning needs
    def cellFiles(root: String) = {
      val d = new java.io.File(s"$root/codes")
      d.listFiles().filter(_.getName.startsWith("cell=")).map(c =>
        c.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val before = cellFiles(base)
    PqIndex.compact(spark, base)
    assert(cellFiles(base) < before,
      s"compaction should shrink the file count (was $before)")
    assert(run(base) === wantFull, "search identical after compaction")
  }

  test("PQ index delete tombstones at search time; compact physically reclaims") {
    import spark.implicits._
    import graft.sources.PqIndex
    val base = java.nio.file.Files.createTempDirectory("graft_pqdel").toString
    val rest = java.nio.file.Files.createTempDirectory("graft_pqrest").toString
    // full index, then tombstone every 7th vector; the reference is an
    // index materialized WITHOUT those ids from the start
    PqIndex.materializeWhere(spark, sf, lit(true), base)
    PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(7)) =!= 0, rest)
    val delIds = Similarity.normed(spark, sf)
      .filter(pmod(col("vec_id"), lit(7)) === 0)
      .select("vec_id").as[Long].collect().toSeq
    PqIndex.delete(spark, base, delIds)
    def run(root: String) = PqIndex.searchRoot(spark, sf, root).collect().toSeq
    val want = run(rest)
    assert(run(base) === want,
      "delete + search == full re-encode search without the deleted ids")
    // deleting again (and ids already gone) is a no-op — anti-join
    PqIndex.delete(spark, base, delIds.take(3))
    assert(run(base) === want, "re-delete is idempotent")
    // compact physically drops tombstoned codes and clears the sidecar
    PqIndex.compact(spark, base)
    assert(!new java.io.File(s"$base/tombstones").exists,
      "compaction clears the tombstone sidecar")
    val live = spark.read.parquet(s"$base/codes")
      .select("neighbor_id").as[Long].collect().toSet
    assert(delIds.forall(id => !live.contains(id)),
      "compaction physically drops tombstoned codes")
    assert(run(base) === want, "search identical after the reclaim")
  }

  test("PQ index compact with EVERY row tombstoned stays readable (empty index)") {
    import spark.implicits._
    import graft.sources.PqIndex
    val base = java.nio.file.Files.createTempDirectory("graft_pqall").toString
    PqIndex.materializeWhere(spark, sf, lit(true), base)
    val allIds = Similarity.normed(spark, sf)
      .select("vec_id").as[Long].collect().toSeq
    PqIndex.delete(spark, base, allIds)
    // compact of an all-tombstoned index used to write a part-less
    // codes/ directory, and the next read died on 'Unable to infer
    // schema'; now it writes one schema-bearing empty part file
    PqIndex.compact(spark, base)
    assert(PqIndex.searchRoot(spark, sf, base).collect().isEmpty,
      "searching the fully reclaimed index returns zero candidates")
    assert(spark.read.parquet(s"$base/codes").isEmpty)
    // the reclaimed-empty index must ACCEPT a new partitioned append —
    // the unpartitioned empty marker file is cleared first, or
    // partition discovery dies on conflicting directory depths
    val refill = Similarity.normed(spark, sf)
      .filter(pmod(col("vec_id"), lit(7)) === 0)
    PqIndex.append(spark, base, refill)
    val ref = java.nio.file.Files.createTempDirectory("graft_pqref").toString
    PqIndex.materializeWhere(spark, sf, pmod(col("vec_id"), lit(7)) === 0, ref)
    assert(PqIndex.searchRoot(spark, sf, base).collect().toSeq ===
      PqIndex.searchRoot(spark, sf, ref).collect().toSeq,
      "empty-compact then append == fresh build over the appended batch")
  }

  test("gopher filter: each rule gates independently, keep is the conjunction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gopher").toString
    val good = (Seq("the", "a") ++ (1 to 38).map(i => s"word$i")).mkString(" ")
    val short_ = (Seq("the", "a") ++ (1 to 8).map(i => s"word$i")).mkString(" ")
    val noStop = (1 to 35).map(i => s"word$i").mkString(" ")
    val longWords = (Seq("the", "a") ++ (1 to 33).map(i => "x" * 15 + i)).mkString(" ")
    val symbols = good + " " + ("#" * 30)
    // doc 5 tokenizes to ZERO tokens: must gate out (keep=false), not
    // crash on the ratio divisions (Spark 4 ANSI /0 throws)
    val noTokens = "!!! ### ..."
    Seq((0L, good), (1L, short_), (2L, noStop), (3L, longWords), (4L, symbols),
        (5L, noTokens))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.gopherFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false))
  }

  test("repetition: repeated n-grams raise both fractions, distinct text zeroes dup5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    val spammy = Seq.fill(20)("spam ham").mkString(" ")       // 40 tokens
    val distinct_ = (1 to 35).map(i => s"w$i").mkString(" ")  // 35 distinct
    Seq((0L, spammy), (1L, distinct_)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // spammy: 39 2-grams ("spam ham" x20 / "ham spam" x19), 36 5-grams of 2 kinds
    assert(out(0L) === ((39L, 0.5128, 0.9444)))
    // distinct: every gram unique -> top2 = 1/34, dup5 = 0
    assert(out(1L) === ((34L, 0.0294, 0.0)))
  }

  test("star contraction: long chain collapses in O(log) rounds with exact labels") {
    import spark.implicits._
    // a 256-hop chain: min-label propagation would need ~256 rounds
    // (one hop per round); large-star/small-star must finish in a
    // handful — the round count IS the 100×-diameter scale claim
    val chain = (0L until 256L).map(i => (i, i + 1)).toDF("a", "b")
    // force the distributed contraction (the r16 local union-find fast
    // path would satisfy the labels without exercising the rounds bound)
    val cap = operators.Components.LocalEdgeCap
    operators.Components.LocalEdgeCap = 0L
    try {
      val (labels, rounds) = operators.Components.run(chain, "a", "b")
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 257 && got.values.forall(_ == 0L),
        "every chain node labels to the component minimum")
      assert(rounds <= 10, s"diameter-256 chain took $rounds rounds (propagation: ~256)")
    } finally operators.Components.LocalEdgeCap = cap
    // the local fast path (default cap) must label identically
    val (local, lr) = operators.Components.run(chain, "a", "b")
    assert(lr === -1, "256 edges must take the bounded local path")
    val gotL = local.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotL.size === 257 && gotL.values.forall(_ == 0L))
  }

  test("star contraction equals local union-find on a mixed random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // several planted shapes: chains, a star, cliques, isolated pairs,
    // plus random noise edges — union-find is the ground truth
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++            // chain 0..40
      (100L until 120L).map(i => (150L, i)) ++                     // star@150
      (for (i <- 200L until 210L; j <- i + 1 until 210L) yield (i, j)) ++ // clique
      (0 until 60).map(_ => { val a = rnd.nextInt(400).toLong
        val b = rnd.nextInt(400).toLong; (a, b) })).filter(p => p._1 != p._2)
    // distributed contraction AND the r16 local fast path must both
    // match the union-find ground truth below
    val capMx = operators.Components.LocalEdgeCap
    operators.Components.LocalEdgeCap = 0L
    val got = try {
      val (labels, _) = operators.Components.run(edges.toDF("a", "b"), "a", "b")
      labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally operators.Components.LocalEdgeCap = capMx
    val (labelsLocal, _) = operators.Components.run(edges.toDF("a", "b"), "a", "b")
    val gotLocal = labelsLocal.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === gotLocal, "local fast path == distributed contraction")
    // local union-find reference
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val comp = nodes.groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m) }.toMap
    assert(got === comp, "contraction labels == union-find component minima")
  }

  test("CC loop lineage stays bounded (localCheckpoint truncation)") {
    // after convergence the labels frame must sit on a checkpointed RDD
    // (no stacked per-iteration joins left in the plan)
    val clusters = operators.TextAnalysis.dedupClusters(spark, sf)
    val p = clusters.queryExecution.optimizedPlan
    val joins = p.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"expected checkpoint-truncated lineage, got:\n$p")
    // distributed path: checkpointed RDD; r16 local fast path: a
    // driver-built LocalRelation — either way no per-round lineage
    assert(p.toString.contains("LogicalRDD") || p.toString.contains("ExistingRDD") ||
      p.toString.contains("LocalRelation"),
      s"labels should derive from a checkpointed RDD or local relation:\n$p")
  }
}

/** The bench stdout line must survive the driver's ~2000-char
  * tail-capture window (rounds 1–4 lost bench visibility to exactly
  * this). Pins the ShortKey map's integrity and a worst-case length
  * bound with ≥25% headroom.
  */
class BenchLineSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("short keys are unique, non-stale, and cover every query") {
    val live = SparkEntry.queries.keySet ++ Bench.SharedBuilds.map(_._1)
    val stale = Bench.ShortKey.keySet -- live
    assert(stale.isEmpty, s"ShortKey maps entries that no longer exist: $stale")
    val emitted = live.toSeq.map(Bench.shortKey)
    assert(emitted.size === emitted.distinct.size,
      s"short-key collision: ${emitted.diff(emitted.distinct).distinct}")
  }

  test("worst-case bench line stays under 1500 chars (driver window is ~2000)") {
    // the line carries LineTopK slowest successes + the first
    // LineFailCap failures; the TRUE worst case — the whole catalog
    // failing (bad testdata dir) — is therefore LineFailCap failure
    // entries ("-9.9", 5 chars each) + LineTopK successes at "99.9",
    // catalog-size-independent by construction
    val widest = (SparkEntry.queries.keySet.toSeq ++ Bench.SharedBuilds.map(_._1))
      .sorted.take(Bench.LineTopK + Bench.LineFailCap)
    val qs = widest.map(k => "\"" + Bench.shortKey(k) + "\":-9.9")
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.99,"unit":"sec","queries":$qs,""" +
      s""""nq":${SparkEntry.queries.size},"nfail":${SparkEntry.queries.size},""" +
      s""""cpu":99999.9,"ld":[99.99,99.99],"ctm":1,"wt":999,"sf":"sf0.1"}"""
    assert(line.length < 1500,
      s"bench line worst case ${line.length} chars — the driver tail window is ~2000")
    // and the budget no longer grows with the catalog: the headroom at
    // +100 queries is identical by construction (LineTopK and
    // LineFailCap are both fixed)
  }
}

/** N-stage funnel generalization (`funnelStaged`) on planted users —
  * the 3-stage oracle instance is driver-checked; this pins the
  * order-gating fold at 5 stages plus the one-user-exchange shape.
  */
class FunnelSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("5-stage funnel gates each stage on the previous stage's first time") {
    import spark.implicits._
    val stages = Seq("s1", "s2", "s3", "s4", "s5")
    def ev(u: Long, et: String, sec: Int) = (u, et, new java.sql.Timestamp(sec * 1000L))
    val events = Seq(
      // user 1: all five stages in order
      ev(1, "s1", 1), ev(1, "s2", 2), ev(1, "s3", 3), ev(1, "s4", 4), ev(1, "s5", 5),
      // user 2: s3 arrives BEFORE its s2 — conversion stops after s2
      // (the later s4 can't qualify against a null t3)
      ev(2, "s1", 1), ev(2, "s3", 2), ev(2, "s2", 3), ev(2, "s4", 4),
      // user 3: enters mid-funnel — never counted anywhere
      ev(3, "s2", 1), ev(3, "s3", 2),
      // user 4: first four stages with repeated noise, no s5
      ev(4, "s1", 10), ev(4, "s2", 11), ev(4, "s2", 12), ev(4, "s3", 13), ev(4, "s4", 14),
      // user 5: skips s2 then backfills — s3 sits before the first
      // valid s2, so the chain ends at s2 (s5 can't rescue it)
      ev(5, "s1", 1), ev(5, "s3", 2), ev(5, "s2", 3), ev(5, "s5", 4)
    ).toDF("user_id", "event_type", "ts")
    val out = operators.ExtendedAnalytics.funnelStaged(events, stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "s1", 4L), (2, "s2", 4L), (3, "s3", 2L),
      (4, "s4", 2L), (5, "s5", 1L)))
    // all five chained minimums + the per-user reduction ride ONE
    // user-keyed exchange
    val p = operators.ExtendedAnalytics.funnelStaged(events, stages)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"expected one user exchange:\n$p")
  }
}

/** Interval-join hot-entity salting (SURVEY §5): a celebrity user
  * whose per-window event rate concentrates one (user, bucket) key
  * must not serialize the range join through one reducer. Same
  * row-placement methodology as SkewRecallSpec (task time is
  * proportional to partition rows; durations at test scale are noise),
  * same salting family as operators/Skew.scala.
  */
class IntervalSkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  // 45k celebrity events inside ONE hour bucket (user 7) + 55k events
  // spread over 100 users and ~14 hourly buckets; every 100th event is
  // an error so the lookback aggregation has real work on both sides
  private def planted = {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime
    spark.range(100000).select(
      col("id").as("event_id"),
      when(col("id") < 45000, lit(7L)).otherwise(col("id") % 100 + 100).as("user_id"),
      when(col("id") < 45000,
        timestamp_millis(lit(base) + (col("id") % 3500) * 1000))
        .otherwise(timestamp_millis(lit(base) + (col("id") % 50000) * 1000)).as("ts"),
      when(col("id") % 100 === 0, "error").otherwise("view").as("event_type"),
      (col("id") % 97).cast("double").as("value"))
  }

  test("salted interval join equals the plain one and caps the max reducer share") {
    val ev = planted
    val plain = operators.ExtendedAnalytics.errorContextOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val salted = operators.ExtendedAnalytics.errorContextOn(ev, salts = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(plain.nonEmpty && plain.exists(_._3 > 0))
    assert(salted.toSeq === plain.toSeq,
      "salting must not change the interval-join result")

    // reducer placement of the PRIOR (build) side under the join keys
    val us = unix_micros(col("ts"))
    val bkt = (us / operators.ExtendedAnalytics.IntervalUs).cast("long")
    val prior = ev.select(col("user_id"), us.as("p_us"), col("value"), bkt.as("bkt"))
    def share(df: org.apache.spark.sql.DataFrame,
              keys: Seq[org.apache.spark.sql.Column]): Double = {
      val byPart = df.repartition(16, keys: _*)
        .select(spark_partition_id().as("p")).groupBy("p").count()
        .collect().map(_.getLong(1))
      byPart.max.toDouble / byPart.sum
    }
    val hot = share(prior, Seq(col("user_id"), col("bkt")))
    val salt = pmod(hash(col("p_us"), col("value")), lit(16))
    val spread = share(prior.withColumn("_salt", salt),
      Seq(col("user_id"), col("bkt"), col("_salt")))
    info(f"plain keys: max reducer share ${hot * 100}%.0f%%; salted: ${spread * 100}%.0f%%")
    assert(hot > 0.40, s"celebrity bucket should dominate a reducer: $hot")
    assert(spread < 0.15, s"salting should spread the hot (user,bucket): $spread")
  }
}

/** The terminal orderBy is the oracle contract, not a plan
  * requirement (README "Determinism vs scale"): the unsorted form of
  * the corpus-sized operators must plan WITHOUT a global sort /
  * range exchange, and differ from the sorted form only in order.
  */
class UnorderedFormSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def check(sorted: org.apache.spark.sql.DataFrame,
                    unsorted: org.apache.spark.sql.DataFrame): Unit = {
    val p = unsorted.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"unsorted form still pays a global range exchange:\n$p")
    val a = sorted.collect().map(_.toString).toSeq
    val b = unsorted.collect().map(_.toString).toSeq
    assert(a.sorted === b.sorted, "unsorted form changed the result set")
  }

  test("gopher filter exposes a sort-free corpus-scale form") {
    check(operators.TextAnalysis.gopherFilter(spark, sf),
      operators.TextAnalysis.gopherFilter(spark, sf, ordered = false))
  }

  test("repetition exposes a sort-free corpus-scale form") {
    check(operators.TextAnalysis.repetition(spark, sf),
      operators.TextAnalysis.repetition(spark, sf, ordered = false))
  }

  test("span dedup exposes a sort-free corpus-scale form") {
    check(operators.Dedup.spanDedup(spark, sf),
      operators.Dedup.spanDedup(spark, sf, ordered = false))
  }

  test("sequence packing exposes a sort-free corpus-scale form") {
    check(operators.ExtendedAnalytics.packSequences(spark, sf),
      operators.ExtendedAnalytics.packSequences(spark, sf, ordered = false))
  }

  test("quality sampling exposes a sort-free corpus-scale form") {
    check(operators.TextAnalysis.qualitySample(spark, sf),
      operators.TextAnalysis.qualitySample(spark, sf, ordered = false))
  }

  test("bpe encode exposes a sort-free corpus-scale form") {
    check(operators.Bpe.bpeEncode(spark, sf),
      operators.Bpe.bpeEncode(spark, sf, ordered = false))
  }

  test("corpus pipeline exposes a sort-free corpus-scale form") {
    check(operators.TextAnalysis.corpusPipeline(spark, sf),
      operators.TextAnalysis.corpusPipeline(spark, sf, ordered = false))
  }

  /** Every query whose output grows linearly with the corpus (measured
    * row ratios sf0.001→sf0.01, plus the documents-table family that is
    * flat only because the shipped doc count is): the generic
    * `SparkEntry.unordered` form must carry NO global Sort anywhere —
    * the presentation sort was the only one, and stripping it must not
    * leave a range exchange behind.
    */
  val CorpusScaleQueries: Seq[String] = Seq(
    "q_active_projects", "q_argmax", "q_asof_join", "q_date_funcs",
    "q_dedup_keep_last", "q_event_window_agg", "q_interval_join",
    "q_normalize_status", "q_overdue", "q_paged_ingest", "q_parent_join",
    "q_project_flags", "q_report_doc", "q_report_goals", "q_running_total",
    "q_scd2", "q_semi_join", "q_session_window", "q_sessionize",
    "q_topk_per_key", "q_uncategorized", "q_token_count", "q_quality_score",
    "q_lang_id", "q_doc_fingerprint", "q_pii_scrub", "q_clean_text",
    "q_clean_pipeline", "q_corpus_pipeline", "q_dedup_exact",
    "q_dedup_semantic", "q_tfidf_top_terms", "q_lm_score",
    "q_multimodal_meta", "q_markdown_runs", "q_json_normalize",
    "q_block_tree", "q_epoch_shuffle", "q_term_search", "q_filter_tags",
    "q_string_funcs", "q_gopher_filter", "q_repetition", "q_novelty",
    "q_ppl_buckets", "q_chunk_docs", "q_data_split", "q_pack_sequences",
    "q_quality_sample", "q_bpe_encode", "q_span_scrub", "q_dedup_span",
    "q_stratified_sample", "q_moving_avg", "q_wow_change",
    "q_nb_train", "q_nb_score", "q_dsir_weights", "q_dsir_select",
    "q_filter_cascade", "q_char_entropy",
    // r9 cluster curation: per-vector verdict outputs are corpus-sized
    "q_prototype_prune", "q_cluster_mix")

  test("every corpus-scale query's unordered form has no global sort at all") {
    import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort}
    val missing = CorpusScaleQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale catalog keys in CorpusScaleQueries: $missing")
    for (q <- CorpusScaleQueries) {
      val df = SparkEntry.unordered(q)(spark, sf)
      val sorts = df.queryExecution.optimizedPlan.collect {
        case s: LSort if s.global => s
      }
      assert(sorts.isEmpty, s"$q: unordered form still globally sorts:\n${sorts.headOption}")
    }
  }

  test("the unordered form never strips a semantic (top-k) sort") {
    // q3's ORDER BY feeds a LIMIT — top-k semantics, not presentation;
    // the strip must leave it (and therefore the result) untouched
    val ordered = SparkEntry.queries("q3_top_revenue")(spark, sf)
    val un = SparkEntry.unordered("q3_top_revenue")(spark, sf)
    assert(un.collect().toSeq === ordered.collect().toSeq)
  }

  test("unordered forms return the identical result set (spot check)") {
    for (q <- Seq("q_sessionize", "q_report_goals", "q_epoch_shuffle")) {
      val a = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.unordered(q)(spark, sf).collect().map(_.toString).sorted
      assert(a.toSeq === b.toSeq, s"$q: unordered form changed the result set")
    }
  }
}

/** ADC split correctness: the per-query table + per-candidate lookup
  * must reproduce the direct asymmetric dot (association order is the
  * only difference — bounded at 1e-9), and the PQ plans must actually
  * score via the lookup form.
  */
class PqAdcSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._
  import graft.plans.PqOps
  import graft.operators.Similarity._

  test("table+lookup equals the direct ADC dot on the real corpus") {
    val cb = graft.operators.Similarity.pqCodebook(spark, sf)
    val n = graft.operators.Similarity.normed(spark, sf)
    val enc = n.select(col("vec_id").as("nid"),
      PqOps.encode(col("e"), cb, PqM, PqK, PqDsub).as("codes"))
    val q = n.limit(20).select(col("vec_id").as("qid"), col("e").as("eq"),
      PqOps.adcTable(col("e"), cb, PqM, PqK, PqDsub).as("adct"))
    val maxDiff = broadcast(q).join(enc, col("qid") =!= col("nid"))
      .select(abs(
        PqOps.adcDot(col("eq"), col("codes"), cb, PqM, PqK, PqDsub) -
        PqOps.adcLookup(col("adct"), col("codes"), PqM, PqK)).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(maxDiff <= 1e-9, s"ADC split drifted: $maxDiff")
  }

  test("PQ and IVF-PQ plans score via the lookup expression") {
    for (q <- Seq("q_ann_pq_topk", "q_ann_ivfpq_topk", "q_ann_pq_indexed")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("graft_pq_adc_lookup"), s"$q lost the ADC lookup:\n${p.take(600)}")
      assert(!p.contains("graft_pq_adc_dot"), s"$q still pays the per-candidate dot")
    }
  }
}

/** Domain mixing: the resampled corpus must hit the target language
  * shares (within per-mille threshold granularity on a finite corpus),
  * drop non-target languages, and keep the corpus pass shuffle-free.
  */
class DomainMixSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("output shares track the target mixture and non-targets are dropped") {
    val out = operators.ExtendedAnalytics.domainMix(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = operators.ExtendedAnalytics.MixTargets.toMap
    assert(out.keySet.subsetOf(targets.keySet), s"non-target lang kept: $out")
    val total = out.values.sum.toDouble
    assert(total > 0)
    for ((l, f) <- targets) {
      val share = out.getOrElse(l, 0L) / total
      // hash-bucket granularity on a few hundred docs/stratum: ±8pp
      assert(math.abs(share - f) < 0.08, s"$l share $share vs target $f ($out)")
    }
  }

  test("upsample mix: shares hit targets at corpus size via whole+fractional epochs") {
    val out = operators.ExtendedAnalytics.domainMixUpsample(spark, sf)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = operators.ExtendedAnalytics.MixTargets.toMap
    val total = byLang.values.sum.toDouble
    for ((l, f) <- targets)
      assert(math.abs(byLang.getOrElse(l, 0L) / total - f) < 0.08,
        s"$l share off target: $byLang")
    // per-doc copies differ by at most one within a language (whole
    // epochs + at most one hash-gated fractional epoch)
    val spread = out.groupBy("lang", "doc_id").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"))
      .collect()
    assert(spread.nonEmpty)
    assert(spread.forall(r => r.getLong(1) - r.getLong(2) <= 1),
      s"copy spread exceeds one epoch: ${spread.mkString(", ")}")
    // the scarce language actually upsamples (some doc has >= 2 copies)
    assert(out.groupBy("doc_id", "lang").count().filter(col("count") >= 2).count() > 0,
      "expected at least one upsampled document")
  }

  test("alpha mix: smoothing pulls shares toward n^0.5 at corpus size") {
    val d = Tables.documents(spark, sf)
    val raw = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = raw.values.sum.toDouble
    val out = operators.ExtendedAnalytics.domainMixAlpha(spark, sf)
    val mixed = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = mixed.values.sum.toDouble
    // with-replacement at corpus size: totals match within threshold granularity
    assert(math.abs(m - n) / n < 0.01, s"corpus size drifted: $n -> $m")
    // shares land on the sqrt-smoothed targets
    val wsum = raw.values.map(v => math.sqrt(v.toDouble)).sum
    for ((l, ng) <- raw) {
      val target = math.sqrt(ng.toDouble) / wsum
      assert(math.abs(mixed.getOrElse(l, 0L) / m - target) < 0.02,
        s"$l share off sqrt target $target: $mixed")
    }
    // the dominant language moved DOWN, the scarcest moved UP
    val dom = raw.maxBy(_._2)._1
    val sc = raw.minBy(_._2)._1
    assert(mixed(dom) / m < raw(dom) / n, "dominant language did not downsample")
    assert(mixed(sc) / m > raw(sc) / n, "scarce language did not upsample")
    // whole + at-most-one fractional epoch per doc
    val spread = out.groupBy("lang", "doc_id").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"))
      .collect()
    assert(spread.forall(r => r.getLong(1) - r.getLong(2) <= 1),
      s"copy spread exceeds one epoch: ${spread.mkString(", ")}")
  }

  test("the corpus pass is a map-side broadcast filter, no corpus shuffle") {
    val p = operators.ExtendedAnalytics.domainMix(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"thresholds must broadcast:\n$p")
    // the only hash exchanges feed the lang-cardinality count frame,
    // upstream of an aggregate — the documents join side must not
    // repartition (rangepartitioning at the end is the parity sort)
    val hashEx = "Exchange hashpartitioning\\(([a-z_#0-9L, ]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(hashEx.forall(_.contains("lang")),
      s"unexpected corpus exchange on $hashEx:\n$p")
  }
}

/** Span-level dedup (Dedup.spanDedup) and SemDeDup
  * (Similarity.semanticDedup) invariants on sf0.001 — oracle parity
  * covers cell-exactness; these pin the structural semantics against
  * the corpus' planted duplicates.
  */
class SpanSemanticDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("spans are maximal: disjoint, gap-separated, gram counts bounded") {
    val n = operators.Dedup.SpanGramN
    val rows = operators.Dedup.spanDedup(spark, sf).collect()
    assert(rows.nonEmpty, "no duplicated spans found on planted corpus")
    for ((_, docRows) <- rows.groupBy(_.getLong(0))) {
      val sorted = docRows.sortBy(_.getInt(1)).toSeq
      for (r <- sorted) {
        val (st, en, g) = (r.getInt(1), r.getInt(2), r.getLong(3))
        assert(en - st >= n, s"span shorter than one gram: [$st,$en)")
        assert(g >= 1 && g <= en - st - n + 1, s"gram count $g impossible for [$st,$en)")
      }
      // maximality: had two islands overlapped or touched, the merge
      // pass would have fused them — consecutive spans must leave a gap
      for (w <- sorted.sliding(2) if w.size == 2)
        assert(w(1).getInt(1) > w(0).getInt(2),
          s"unmerged adjacent islands: ${w(0)} / ${w(1)}")
    }
  }

  test("planted spans: cross-doc shared region, within-doc repeat, unique doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spandedup").toString
    Seq(
      // docs 1/2 share the 5-grams "a b c d e" and "b c d e f" at
      // offsets 0/3 — each reports exactly that shared region
      (1L, "a b c d e f g h", "en", "t", 15L),
      (2L, "x y z a b c d e f q w", "en", "t", 21L),
      // doc 3: verbatim WITHIN-DOC repetition — islands at 0 and 5
      // touch (5 <= 0+5) and must merge to one full span
      (3L, "p q r s t p q r s t", "en", "t", 19L),
      // doc 4: all grams unique — no span
      (4L, "one two three four five six seven", "en", "t", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = operators.Dedup.spanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(out === Set((1L, 0, 6, 2L), (2L, 3, 9, 2L), (3L, 0, 10, 2L)))
  }

  test("scrub cuts exactly the located spans, in order") {
    // plain-Scala cut driven by the TEXTS plus the span frame: kept
    // tokens = positions outside every [start, end) — checks the
    // indexed-filter HOF wiring, ordering, and the affected-doc set
    val spans = operators.Dedup.spanDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSeq).toMap
    assert(spans.nonEmpty, "no spans on the corpus — scrub test vacuous")
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokRe = "[a-z0-9]+".r
    val expect = spans.map { case (id, sp) =>
      val toks = tokRe.findAllIn(texts(id).toLowerCase).toVector
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !sp.exists(s => i >= s._1 && i < s._2) => t
      }
      id -> ((toks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }
    val got = operators.Dedup.spanScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === expect)
  }

  test("planted scrub: shared region cut, full-repeat doc empties, unique doc absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanscrub").toString
    Seq(
      (1L, "a b c d e f g h", "en", "t", 15L),
      (2L, "x y z a b c d e f q w", "en", "t", 21L),
      (3L, "p q r s t p q r s t", "en", "t", 19L),
      (4L, "one two three four five six seven", "en", "t", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.spanScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got === Set(
      (1L, 8L, 2L, "g h"),
      (2L, 11L, 5L, "x y z q w"),
      (3L, 10L, 0L, "")))
  }

  test("semantic drop set == embedding-dup pairs restricted to one cell") {
    val sem = operators.Similarity.semanticDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val pairs = operators.Similarity.embeddingDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the exact pair graph restricted to same-cell endpoints defines
    // the drop set: vec_b dropped iff SOME smaller same-cell tau-dup
    val expectedDrops = pairs.collect {
      case (a, b, _) if sem(a)._1 == sem(b)._1 => b
    }.toSet
    val actualDrops = sem.collect { case (v, (_, keep)) if !keep => v }.toSet
    assert(actualDrops === expectedDrops)
    assert(actualDrops.nonEmpty, "planted near-dups produced zero drops")
    // the clustering is a real approximation on this corpus: some
    // tau-pairs must straddle cells (otherwise the test is vacuous —
    // equality would hold for ANY assignment)
    assert(pairs.exists { case (a, b, _) => sem(a)._1 != sem(b)._1 },
      "every pair landed in one cell; cross-cell approximation untested")
  }
}

/** Sequence-packing invariants (ExtendedAnalytics.packSequences):
  * oracle parity pins cell-exactness; these pin that the chunk map is
  * actually a packing — docs tile completely, sequences fill to the
  * token budget, nothing overlaps.
  */
class PackSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("chunks tile every doc and every non-final sequence is full") {
    val L = operators.ExtendedAnalytics.PackSeqLen
    val rows = operators.ExtendedAnalytics.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // per doc: chunks in seq order cover [0, ntok) contiguously
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .filter(col("n") > 0).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((doc, chunks) <- rows.groupBy(_._1)) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._4 === 0, s"doc $doc first chunk starts at ${sorted.head._4}")
      assert(sorted.last._5 === ntok(doc), s"doc $doc last chunk ends early")
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1) {
        assert(b._4 === a._5, s"doc $doc gap between chunks $a / $b")
        assert(b._2 === a._2 + 1, s"doc $doc skips a sequence between $a / $b")
      }
    }
    // per sequence: pieces are disjoint in [0, L) and fill all
    // sequences but the last completely
    val lastSeq = rows.map(_._2).max
    for ((seq, pieces) <- rows.groupBy(_._2)) {
      val spans = pieces.map(p => (p._3, p._3 + (p._5 - p._4))).sortBy(_._1)
      for (Array(a, b) <- spans.sliding(2).map(_.toArray) if spans.length > 1)
        assert(b._1 === a._2, s"seq $seq pieces overlap or gap: $a / $b")
      assert(spans.head._1 === 0, s"seq $seq starts at ${spans.head._1}")
      val filled = spans.last._2
      if (seq < lastSeq) assert(filled === L, s"seq $seq only $filled/$L tokens")
      else assert(filled <= L)
    }
    // conservation: chunk lengths sum to the corpus token count
    assert(rows.map(r => (r._5 - r._4).toLong).sum === ntok.values.map(_.toLong).sum)
  }

  test("corpus pipeline == clean gates composed with packing") {
    // the one-query composition must equal running cleanPipeline and
    // packing its survivors' scrubbed-token counts independently
    val composed = operators.TextAnalysis.corpusPipeline(spark, sf).collect()
      .map(_.toString).sorted
    val survivors = operators.TextAnalysis.cleanPipeline(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("scrubbed"))).cast("long").as("ntok"))
    val twoStep = operators.ExtendedAnalytics.packOnForTest(spark, survivors)
      .collect().map(_.toString).sorted
    assert(composed.nonEmpty)
    assert(composed === twoStep, "composition diverged from two-step run")
    // the gates must actually gate: fewer docs packed than exist
    val packedDocs = operators.TextAnalysis.corpusPipeline(spark, sf)
      .select("doc_id").distinct().count()
    assert(packedDocs < Tables.documents(spark, sf).count())
  }

  test("span dedup and packing keep their shuffle budgets") {
    // span dedup: the frequency gate must stay a partial-combined
    // count AGGREGATE + SEMI-JOIN (skew-free counts exchange, AQE can
    // split a hot stream-side join partition) — never a count-over-
    // hash window, which pins a boilerplate gram's whole postings list
    // to one unsplittable window partition
    val span = operators.Dedup.spanDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(span.contains("LeftSemi"), s"frequency gate must be a semi-join:\n$span")
    assert(span.contains("partial_count"), s"gram counts must map-side combine:\n$span")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(span).size
    assert(hashEx <= 3, s"span dedup hash exchanges $hashEx > 3:\n$span")
    // packing: ONE hash exchange (the bucket cumsum window) + the
    // broadcast of driver-bounded bucket offsets; the chunk fan-out is
    // map-side
    val pack = operators.ExtendedAnalytics.packSequences(spark, sf)
      .queryExecution.executedPlan.toString
    val packEx = "Exchange hashpartitioning".r.findAllIn(pack).size
    assert(packEx === 1, s"packing hash exchanges $packEx != 1:\n$pack")
    assert(pack.contains("BroadcastExchange"), s"bucket offsets must broadcast:\n$pack")
  }
}

/** Quality-weighted sampling (TextAnalysis.qualitySample): keep-prob
  * equals the score, deterministically.
  */
class QualitySampleSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("kept fraction tracks mean quality; gate is map-only") {
    val all = operators.TextAnalysis.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kept = operators.TextAnalysis.qualitySample(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept.nonEmpty && kept.size < all.size,
      s"sampling kept ${kept.size}/${all.size} — gate is pass-through or empty")
    // importance-sampling contract: P(keep) == quality, so the kept
    // fraction concentrates on the mean score (hash buckets are
    // uniform; tolerance covers the finite-corpus variance)
    val meanQ = all.values.sum / all.size
    val frac = kept.size.toDouble / all.size
    assert(math.abs(frac - meanQ) < 0.05, s"kept $frac vs mean quality $meanQ")
    // kept docs carry their original score, and a zero-score doc can
    // never survive (bucket < 0 is impossible)
    for ((id, q) <- kept) { assert(all(id) === q); assert(q > 0.0) }
    // map-only: no hash exchange anywhere — the only exchange is the
    // terminal parity sort
    val p = operators.TextAnalysis.qualitySample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"gate must ride the scan:\n$p")
  }
}

/** Hot-gram skew for span dedup (the IntervalSkewSpec methodology):
  * a boilerplate gram shared by every doc must not concentrate the
  * postings frame — the counts exchange carries combined counts
  * (vocabulary-sized, one row per gram per map side), and the
  * positions side rides a semi-join that AQE can split, not a window.
  */
class SpanSkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  test("a gram in every doc yields correct spans and a skew-free count path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanskew").toString
    // 2000 docs, each ending in the SAME boilerplate sentence (one hot
    // gram chain) after a unique prefix
    val docs = spark.range(2000).select(
      col("id").as("doc_id"),
      concat(
        format_string("u%d v%d w%d x%d y%d z%d ", col("id"), col("id"),
          col("id"), col("id"), col("id"), col("id")),
        lit("all rights reserved by the corporation")).as("text"),
      lit("en").as("lang"), lit("t").as("source"),
      lit(0L).as("n_chars"))
    docs.write.parquet(s"$dir/documents.parquet")
    val out = operators.Dedup.spanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // every doc: 6 unique-prefix tokens + the 6-token boilerplate =
    // 12 tokens; duplicated grams are exactly the two fully-boilerplate
    // 5-grams at positions 6 and 7 -> one span [6, 12) with 2 grams
    assert(out.length === 2000)
    assert(out.forall { case (_, st, en, g) => st === 6 && en === 12 && g === 2L },
      s"unexpected spans: ${out.take(5).mkString(",")}")
    // the count exchange is skew-free by construction: map-side combine
    // means the hot gram contributes ONE row per map partition, not its
    // full postings list — pin the partial/final aggregate pair
    val p = operators.Dedup.spanDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), s"counts must combine map-side:\n$p")
    assert(p.contains("LeftSemi"), s"positions must ride a splittable join:\n$p")
    assert(!p.contains("Window [count"), s"no count window allowed:\n$p")
  }
}

/** WordShingleHashesPos vs a plain-Scala reference fold and vs the
  * deduped set form — guards the codegen path (seeded-random token
  * streams, incl. empty and shorter-than-gram docs).
  */
class ShinglePosFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private val P = graft.functions.TextFunctions.HashP
  private def ref(tokens: Seq[String], n: Int): Seq[Long] =
    (0 to tokens.length - n).map { i =>
      var h = 0L
      for (k <- 0 until n) {
        tokens(i + k).getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % P)
        if (k < n - 1) h = (h * 31 + 32) % P
      }
      h
    }

  test("positional hashes equal the reference fold; set form is their dedup") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val cases = (0L until 60L).map { i =>
      val n = rng.nextInt(12) // includes 0- and sub-gram-length docs
      (i, (0 until n).map(_ => "tok" + rng.nextInt(5)).mkString(" "))
    }
    val out = cases.toDF("id", "text")
      .select(col("id"),
        graft.plans.ArrayOps.wordShingleHashesPos(
          graft.functions.TextFunctions.tokens(col("text")), 3, P).as("hs"),
        graft.plans.ArrayOps.wordShingleHashes(
          graft.functions.TextFunctions.tokens(col("text")), 3, P).as("set"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    for ((id, text) <- cases) {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val expect = ref(toks, 3)
      val (pos, set) = out(id)
      assert(pos === expect, s"doc $id positional mismatch")
      assert(set === pos.distinct, s"doc $id set form != dedup of positions")
    }
  }
}

/** q_chunk_docs / q_cooccur — sliding-window chunk geometry and the
  * windowed co-occurrence counts against hand-computed plants.
  */
class ChunkCoocSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("chunks tile every doc at stride spacing and hash like the fingerprint") {
    val L = operators.TextAnalysis.ChunkLen
    val S = operators.TextAnalysis.ChunkStride
    val rows = operators.TextAnalysis.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .filter(col("n") > 0).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(_._1).toSet === ntok.keySet, "every tokenized doc chunks")
    for ((doc, chunks) <- rows.groupBy(_._1)) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices, s"doc $doc chunk_idx not dense")
      for ((_, idx, from, to, _) <- sorted) {
        assert(from === idx * S, s"doc $doc chunk $idx start off-stride")
        assert(to === math.min(from + L, ntok(doc)), s"doc $doc chunk $idx bad end")
        assert(from < ntok(doc), s"doc $doc emits a start past its tokens")
      }
      assert(sorted.length === (ntok(doc) + S - 1) / S, s"doc $doc chunk count")
    }
    // a single-chunk doc's rolling hash IS its document fingerprint
    val fp = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFunctions.docFingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = rows.groupBy(_._1).filter(_._2.length == 1)
    assert(single.nonEmpty || ntok.values.forall(_ > L))
    for ((doc, Array(c)) <- single) assert(c._5 === fp(doc), s"doc $doc hash != fingerprint")
  }

  test("chunking is map-only: the unordered form plans zero exchanges") {
    val p = operators.TextAnalysis.chunkDocs(spark, sf, ordered = false)
      .queryExecution.executedPlan.toString
    // the shipped single-row-group corpus triggers the conditional
    // narrow-layout spread (round-robin, r16); map-only = no KEYED
    // shuffle, and a real multi-row-group corpus spreads nothing
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"chunking should not key-shuffle:\n$p")
  }

  test("co-occurrence counts and PMI match a hand-computed plant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cooc").toString
    Seq((1L, "a b a c"), (2L, "b b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.TextAnalysis.cooccur(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // pairs within window 3 of "a b a c": (a,b)x2 (a,a) (a,c)x2 (b,c);
    // "b b": (b,b). unigrams a:2 b:3 c:1, N=6.
    def pmi(cab: Long, na: Long, nb: Long) =
      math.floor(math.log(cab.toDouble * 6 / (na * nb)) * 1e4 + 0.5) / 1e4
    val expect = Seq(
      ("a", "b", 2L, pmi(2, 2, 3)),
      ("a", "c", 2L, pmi(2, 2, 1)),
      ("a", "a", 1L, pmi(1, 2, 2)),
      ("b", "b", 1L, pmi(1, 3, 3)),
      ("b", "c", 1L, pmi(1, 3, 1)))
    assert(out.toSeq === expect)
  }
}

/** q_bpe_merges — the distributed BPE learner against an INDEPENDENT
  * plain-Scala reference (symbol lists, no string-replace trick) on
  * the real corpus, plus a hand-computed run/exhaustion plant.
  */
class BpeSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  /** Reference BPE on symbol LISTS: greedy left-to-right merge,
    * (count desc, lhs, rhs) tie-break — shares nothing with the
    * operator's wrapped-string representation.
    */
  private def refBpe(wordCounts: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var words: Map[List[String], Long] =
      wordCounts.map { case (w, n) => w.map(_.toString).toList -> n }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- words if syms.length >= 2; Seq(x, y) <- syms.sliding(2))
        pc((x, y)) += n
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), m) => (-m, x, y) }
        def merge(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (a + b) :: merge(rest)
          case x :: rest                          => x :: merge(rest)
          case Nil                                => Nil
        }
        words = words.map { case (s, n) => merge(s) -> n }
        k += 1
        out += ((k, a, b, a + b, c))
      }
    }
    out.result()
  }

  test("learned merges equal the symbol-list reference on the corpus") {
    val wc = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refBpe(wc, operators.Bpe.BpeRounds)
    assert(expect.length === operators.Bpe.BpeRounds, "corpus exhausts too early")
    val got = operators.Bpe.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === expect)
  }

  test("distributed learner rounds equal the local fast path (r16)") {
    // the local path covers the default cap; force the distributed
    // rounds on the same corpus and compare both learner outputs
    val cap = operators.Bpe.LocalVocabCap
    operators.Bpe.releaseLearnedCache(spark, sf)
    operators.Bpe.LocalVocabCap = 0L
    val (mDist, vDist) = try {
      (operators.Bpe.bpeMerges(spark, sf).collect().map(_.toSeq).toSeq,
        operators.Bpe.bpeVocab(spark, sf).collect().map(_.toSeq).toSeq)
    } finally {
      operators.Bpe.LocalVocabCap = cap
      operators.Bpe.releaseLearnedCache(spark, sf)
    }
    val mLocal = operators.Bpe.bpeMerges(spark, sf).collect().map(_.toSeq).toSeq
    val vLocal = operators.Bpe.bpeVocab(spark, sf).collect().map(_.toSeq).toSeq
    assert(mDist === mLocal, "merge list: distributed != local")
    assert(vDist === vLocal, "vocab: distributed != local")
  }

  test("induced vocabulary equals the reference segmentation") {
    val wc = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def mergeWith(a: String, b: String)(l: List[String]): List[String] = l match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeWith(a, b)(rest)
      case x :: rest                          => x :: mergeWith(a, b)(rest)
      case Nil                                => Nil
    }
    var words: Map[List[String], Long] =
      wc.map { case (w, n) => w.map(_.toString).toList -> n }
    for ((_, a, b, _, _) <- refBpe(wc, operators.Bpe.BpeRounds))
      words = words.map { case (s, n) => mergeWith(a, b)(s) -> n }
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((syms, n) <- words; s <- syms) freq(s) += n
    val expect = freq.toSeq.sortBy { case (s, f) => (-f, s) }
      .take(operators.Bpe.VocabTopK)
    val got = operators.Bpe.bpeVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === expect)
  }

  test("encoded per-doc counts equal the reference segmentation") {
    val wc = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def mergeWith(a: String, b: String)(l: List[String]): List[String] = l match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeWith(a, b)(rest)
      case x :: rest                          => x :: mergeWith(a, b)(rest)
      case Nil                                => Nil
    }
    var segs: Map[String, List[String]] =
      wc.keysIterator.map(w => w -> w.map(_.toString).toList).toMap
    for ((_, a, b, _, _) <- refBpe(wc, operators.Bpe.BpeRounds))
      segs = segs.map { case (w, s) => w -> mergeWith(a, b)(s) }
    val tokRe = "[a-z0-9]+".r
    val expect = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = tokRe.findAllIn(r.getString(1).toLowerCase).toList
        r.get(0).toString ->
          ((toks.length.toLong, toks.map(_.length.toLong).sum,
            toks.map(w => segs(w).length.toLong).sum))
      }.toMap
    val got = operators.Bpe.bpeEncode(spark, sf).collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
  }

  test("encode pass is map-only once the merges are learned") {
    // a WELL-PARTITIONED corpus (≥ cores scan partitions — the real
    // multi-file shape) must encode with NO added exchange: the chain
    // rides the scan. The shipped single-row-group test files trigger
    // the conditional spread (one round-robin exchange), so assert on
    // a pre-spread input through the same seam.
    val par = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, sf).repartition(par)
    val merges = operators.Bpe.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val df = operators.Bpe.encodeFrameWith(docs, merges)
    df.collect() // settle AQE so the printed final plan is the real one
    // AQE's toString prints the plan twice (final + initial) — count
    // exchanges in the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "(?i)exchange".r.findAllIn(p).size
    assert(exchanges <= 1, // the input's own repartition, nothing more
      s"encode over a well-partitioned corpus must add no exchange:\n$p")
  }

  test("runs merge greedily left-to-right and exhaustion stops early") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Bpe.bpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // "aaaa"×2: pairs (a,a)×3 per word → c=6, greedy merge → [aa,aa];
    // then (aa,aa) c=2 → [aaaa]; then no pairs → stop at 2 < BpeRounds.
    assert(got.toSeq === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L)))
  }

  test("persisted tokenizer artifact round-trips: save + load + apply == in-memory") {
    val root = sources.TokenizerArtifact.materialize(spark, sf)
    // the saved merge list IS the learner's, in rank order
    val loaded = sources.TokenizerArtifact.loadMerges(spark, root)
    val learnt = operators.Bpe.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(loaded === learnt, "merges sidecar is the ordered learner output")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(sources.TokenizerArtifact.encodePersisted(spark, sf)
        .collect().map(key).toSeq ===
      operators.Bpe.bpeEncode(spark, sf).collect().map(key).toSeq,
      "reloaded artifact encodes the corpus cell-identically")
    // the production path: FROZEN artifact applied to documents the
    // learner never saw — no retraining, merge patterns unchanged
    import spark.implicits._
    val fresh = Seq((900001L, "the fast table scan beats the slow row scan", "en"))
      .toDF("doc_id", "text", "lang")
    val out = sources.TokenizerArtifact.encodeCorpusWith(spark, root, fresh)
      .collect()
    assert(out.length === 1 && out.head.getLong(3) >= 1L,
      "frozen tokenizer encodes unseen documents")
  }

  test("fertility aggregates the per-doc encode exactly, per language") {
    val enc = operators.Bpe.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = enc.groupBy { case (id, _) => langs(id) }
      .map { case (l, m) =>
        val w = m.values.map(_._1).sum
        val b = m.values.map(_._2).sum
        l -> (m.size.toLong, w, b,
          math.floor(b.toDouble / math.max(w, 1L) * 1e4 + 0.5) / 1e4)
      }
    val got = operators.Bpe.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got === want)
  }
}

class DataSplitSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  test("splits are disjoint-exhaustive, near 98/1/1, and map-only") {
    import spark.implicits._
    // 20k synthetic docs: the shipped test SF is too small to resolve
    // a 1% split, so the fraction check needs its own corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    (0L until 20000L).map(i => (i, "en", "t")).toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.ExtendedAnalytics.dataSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size === 20000, "every doc gets exactly one split")
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") / 20000.0 - 0.98) < 0.01, s"train ${n("train")}")
    assert(math.abs(n("val") / 20000.0 - 0.01) < 0.005, s"val ${n.get("val")}")
    assert(math.abs(n("test") / 20000.0 - 0.01) < 0.005, s"test ${n.get("test")}")
    // membership is a pure doc_id hash: a document's split is
    // identical when computed over any subset of the corpus
    val sub = operators.ExtendedAnalytics.dataSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    val bucket = (id: Long) => ((id * operators.ExtendedAnalytics.SplitHashA)
      % 2147483648L) % 1000L
    for ((id, sp) <- sub) {
      val b = bucket(id)
      val want = if (b < operators.ExtendedAnalytics.SplitTrainPermille) "train"
        else if (b < operators.ExtendedAnalytics.SplitValPermille) "val" else "test"
      assert(sp === want)
    }
    val p = operators.ExtendedAnalytics.dataSplit(spark, sf, ordered = false)
      .queryExecution.executedPlan.toString
    // narrow-layout spread (round-robin) is the only tolerated exchange
    // on the shipped single-row-group corpus (r16)
    assert(!p.toLowerCase.contains("exchange hashpartitioning") &&
      !p.toLowerCase.contains("exchange rangepartitioning"),
      s"split must ride the scan:\n$p")
  }
}

class ContaminationScoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._

  /** Plain-Scala distinct shingle-hash set — shares nothing with the
    * codegen'd WordShingleHashes expression.
    */
  private def refShingles(text: String): Set[Long] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      .sliding(operators.TextAnalysis.ContaminationShingleN)
      .filter(_.length == operators.TextAnalysis.ContaminationShingleN)
      .map(_.mkString(" ").foldLeft(0L)((a, ch) => (a * 31 + ch.toInt) % 1000000007L))
      .toSet

  test("scores equal the reference shingle-set arithmetic") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalSet = docs.collect {
      case (id, t) if id < operators.TextAnalysis.ContaminationEvalDocs => refShingles(t)
    }.foldLeft(Set.empty[Long])(_ ++ _)
    val expect = docs.toSeq.collect {
      case (id, t) if id >= operators.TextAnalysis.ContaminationEvalDocs =>
        val sh = refShingles(t)
        val nh = (sh & evalSet).size
        (id, sh.size.toLong, nh.toLong,
          math.floor(nh * 10000.0 / sh.size + 0.5) / 10000.0)
    }.filter(_._3 > 0).sortBy(_._1)
    assert(expect.nonEmpty, "corpus plants no contaminated docs — vacuous")
    val got = operators.TextAnalysis.contaminationScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === expect)
    // the flagged doc set must agree with the membership-only operator
    val member = operators.TextAnalysis.contamination(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet === member)
  }

  test("streaming monitor == batch contamination over any split, incl. restore") {
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") >= operators.TextAnalysis.ContaminationEvalDocs)
    def slice(r: Int) = corpus.filter(pmod(col("doc_id"), lit(3)) === r)
    val sink = java.nio.file.Files.createTempDirectory("graft_contamsink").toString
    val twin = graft.streaming.StreamingContamination.forDir(spark, sf, sink)
    twin.mergeBatch(spark, slice(0)); twin.mergeBatch(spark, slice(1))
    // mid-stream: counters track the accumulated stream exactly
    assert(twin.counts._1 === slice(0).count() + slice(1).count())
    val snap = java.nio.file.Files.createTempDirectory("graft_contamsnap").toString
    twin.snapshot(spark, snap)
    val resumed = graft.streaming.StreamingContamination.restore(spark, snap, sink)
    resumed.mergeBatch(spark, slice(2))
    val wantFlags = operators.TextAnalysis.contamination(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(resumed.currentFlags(spark).collect().map(_.getLong(0)).toSeq
      === wantFlags, "restore + remaining batches == batch flag set")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val wantScores = operators.TextAnalysis.contaminationScore(spark, sf)
      .collect().map(key).toSeq
    assert(resumed.currentScores(spark).collect().map(key).toSeq
      === wantScores, "score view == batch scorer cell-for-cell")
    assert(resumed.counts === ((corpus.count(), wantFlags.length.toLong)),
      "leak-rate counters: every corpus doc seen, every flagged doc counted")
  }

  test("above the literal gate the broadcast-join path gives identical scores, no plan literal") {
    // force the gate: literalMax = 0 makes ANY eval set "too large"
    val gated = operators.TextAnalysis.contaminationScore(spark, sf, literalMax = 0L)
    val lit_ = operators.TextAnalysis.contaminationScore(spark, sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(gated.collect().map(key).toSeq === lit_.collect().map(key).toSeq,
      "both paths score identically")
    // the gated plan must carry the eval set as a join side, not as an
    // embedded array literal in every task closure
    val litSizes = gated.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
          l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements()
      })
    }.flatten
    assert(litSizes.forall(_ <= 16), s"gated plan embeds array literals: $litSizes")
    assert(gated.queryExecution.optimizedPlan.toString.contains("Join"),
      "gated path scores via the broadcast join")
  }
}

/** ANN path advisor (SURVEY §2): the chooser must reproduce the
  * measured recall-curve policy — OPQ on the anisotropic corpus where
  * plain PQ collapses, PQ (or IVF-PQ at scale) on the shipped
  * near-isotropic one — from corpus statistics alone.
  */
class AnnAdvisorSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import org.apache.spark.sql.functions._
  import graft.operators.AnnAdvisor

  test("advisor picks pq on the shipped corpus, opq on the anisotropic one") {
    val shipped = AnnAdvisor.recommend(spark, sf).head()
    info(s"shipped: variant=${shipped.getAs[String]("variant")} " +
      s"pr=${shipped.getAs[Double]("aniso_pr")} n=${shipped.getAs[Long]("n_vectors")}")
    assert(shipped.getAs[String]("variant") === "pq",
      "shipped corpus: near-isotropic, below the IVF size bar -> flat PQ")
    assert(shipped.getAs[Double]("aniso_pr") >= AnnAdvisor.AnisoPrMax)
    assert(shipped.getAs[String]("rationale").contains("0.98"),
      "the measured recall rides the rationale")
    // the generated anisotropic corpus: the OPQ spec's decaying
    // axis-aligned spectrum (exp(-i/8) scale per axis), unit-normalized
    import spark.implicits._
    val d = operators.Similarity.Dim
    val rnd = new java.util.Random(42)
    val scale = Array.tabulate(d)(i => math.exp(-i / 8.0))
    val rows = (0L until 2048L).map { id =>
      val v = new Array[Double](d)
      var ss = 0.0
      var i = 0
      while (i < d) { val x = rnd.nextGaussian() * scale(i); v(i) = x; ss += x * x; i += 1 }
      val nm = math.sqrt(ss)
      (id, Array.tabulate(d)(i => (v(i) / nm).toFloat), (id % 3).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_annadv").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val aniso = AnnAdvisor.recommend(spark, dir).head()
    info(s"aniso: variant=${aniso.getAs[String]("variant")} " +
      s"pr=${aniso.getAs[Double]("aniso_pr")}")
    assert(aniso.getAs[String]("variant") === "opq",
      "anisotropic spectrum -> the rotation-first variant")
    assert(aniso.getAs[Double]("aniso_pr") < AnnAdvisor.AnisoPrMax)
  }

  test("decision table: brute below the index bar, ivf-pq at scale") {
    assert(AnnAdvisor.recommendFromStats(100L, 0.9)._1 === "brute")
    assert(AnnAdvisor.recommendFromStats(1000000L, 0.9)._1 === "ivf-pq")
    assert(AnnAdvisor.recommendFromStats(1000000L, 0.1)._1 === "opq",
      "anisotropy outranks size: rotate before celling")
    assert(AnnAdvisor.recommendFromStats(50000L, 0.8)._1 === "pq")
  }

  test("filtered advisor: brute at 1% selectivity, post-filtered IVF at 50%") {
    val n = AnnAdvisor.IvfMin // comfortably above BruteMax
    assert(AnnAdvisor.recommendFilteredFromStats(n, 1.0)._1 === "filtered-brute",
      "a rare label starves the probed cells — pre-filter and go exact")
    assert(AnnAdvisor.recommendFilteredFromStats(n, 50.0)._1 === "ivf-postfilter",
      "a common label keeps the probed candidate pool dense")
    assert(AnnAdvisor.recommendFilteredFromStats(100L, 50.0)._1 === "filtered-brute",
      "size still gates first")
    // probe budget scales with inverse selectivity ACROSS THE LIVE
    // ivf-postfilter range [10%, 100%], hitting the cap at its edge
    assert(AnnAdvisor.nprobeScale(100.0) === 1)
    assert(AnnAdvisor.nprobeScale(50.0) === 2)
    assert(AnnAdvisor.nprobeScale(25.0) === 4)
    assert(AnnAdvisor.nprobeScale(10.0) === 8, "cap engages at the brute boundary")
    // the frame: one row per sampled label, selectivities sum to ~100%
    val rows = AnnAdvisor.recommendFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalPct = rows.map(_.getAs[Double]("sel_pct")).sum
    assert(math.abs(totalPct - 100.0) < 1.0, s"shares sum to ~100, got $totalPct")
    info(rows.map(r => s"${r.getAs[Int]("label")}: " +
      s"${r.getAs[Double]("sel_pct")}% -> ${r.getAs[String]("variant")}").mkString("; "))
  }

  test("advisor on an EMPTY embeddings table returns the brute row, no crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_annadv_empty").toString
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val row = AnnAdvisor.recommend(spark, dir).head()
    assert(row.getAs[Long]("n_vectors") === 0L)
    assert(row.getAs[String]("variant") === "brute",
      "n <= BruteMax holds trivially at n = 0; the spectrum is irrelevant")
  }
}

/** The driver-checked recall/error gate (`q_recall_report`) — the
  * round-9 verdict's top ask: the 11 rows-only approximate entries must
  * not be able to regress invisibly between rounds. Margins printed
  * here; the per-round enforcement is the VALUES-oracle hash compare.
  */
class RecallGateSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf
  import graft.operators.{RecallReport, Similarity}

  test("every gate passes on the shipped corpus (margins printed)") {
    val vs = RecallReport.verdicts(spark, sf)
    assert(vs.map(_._1).sorted === RecallReport.GateThresholds.map(_._1).sorted,
      "verdicts must cover exactly the declared gate list")
    for ((g, m, t, ok) <- vs) {
      info(f"$g%-28s measured=$m%3d threshold=$t%3d pass=$ok")
      assert(ok, s"$g: measured $m vs threshold $t")
    }
  }

  test("the gate actually trips: an unmeetable threshold flips pass to false") {
    // recall gates fail when the bar exceeds 100; error gates when the
    // bar goes below 0 — the doctored verdicts must flip while the
    // VALUES oracle keeps expecting true, i.e. the round would
    // hash-fail (the whole point of the driver-checked artifact)
    val doctored = RecallReport.GateThresholds.toMap.map {
      case (g @ ("approx_users_relerr" | "approx_median_relerr"), _) => g -> -1
      case (g, _) => g -> 101
    }
    val vs = RecallReport.verdictsWith(spark, sf, doctored)
    assert(vs.nonEmpty && vs.forall(!_._4),
      "every gate must fail against an unmeetable threshold")
    // and the production verdicts (same cached measurements) still pass
    assert(RecallReport.verdicts(spark, sf).forall(_._4))
  }

  test("the VALUES oracle mirrors the gate list one-to-one") {
    val sql = RecallReport.oracleSql
    for ((g, t) <- RecallReport.GateThresholds)
      assert(sql.contains(s"('$g', $t, true)"), s"oracle row missing for $g")
    // one '(' per VALUES row plus the one in "AS t(gate, ...)"
    assert(sql.split("VALUES")(1).count(_ == '(') ===
      RecallReport.GateThresholds.size + 1,
      "no stray rows beyond the gate list")
  }

  test("IVF-probed hard negatives: cell equi-join (no nested loop), recall floor vs brute") {
    val df = Similarity.hardNegativesIvf(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the probed path must join on the cell id, not nested-loop the corpus")
    assert(p.contains("BroadcastHashJoin"), "probe set should broadcast")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs(Similarity.hardNegatives(spark, sf))
    val got = pairs(df)
    val rec = (want & got).size.toDouble / want.size
    info(f"hard-negatives IVF recall@${Similarity.TopK} = $rec%.2f")
    assert(rec >= 0.4, f"recall collapsed: $rec%.2f")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded random fixtures for the round-8 distribution/event family,
  * checked against INDEPENDENT local Scala references (a third
  * implementation besides the Spark plan and the DuckDB oracle — the
  * ShinglePosFuzzSpec pattern). Seeds are fixed so failures reproduce.
  */
class DistributionFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dfuzz_$tag").toString

  // ---- random events vs local references ------------------------------

  private def randomEvents(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val types = Array("A", "B", "C", "D")
    (1 to n).map { i =>
      // coarse minute grid FORCES timestamp collisions inside a user,
      // so the (ts, event_id) tiebreak actually decides pairings
      val minute = rnd.nextInt(20)
      (i.toLong, new java.sql.Timestamp(1700000000000L + minute * 60000L),
        (rnd.nextInt(5) + 1).toLong, types(rnd.nextInt(types.length)),
        1.0, "{}")
    }
  }

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)],
                          dir: String): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("event transitions match a local reference on random streams") {
    for (seed <- Seq(11L, 42L, 99L)) {
      val rows = randomEvents(seed, 120)
      val dir = tmp(s"tr$seed")
      writeEvents(rows, dir)
      // local reference: per user sort by (ts, event_id), pair, count
      val pairs = rows.groupBy(_._3).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
        sorted.zip(sorted.drop(1))
      }
      val totals = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val want = pairs.groupBy(identity).map { case ((a, b), v) =>
        (a, b, v.size.toLong, totals(a),
          math.floor(v.size.toDouble / totals(a) * 1e4 + 0.5) / 1e4)
      }.toSet
      val got = operators.ExtendedAnalytics.eventTransitions(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("event paths match a local reference on random streams") {
    for (seed <- Seq(7L, 123L)) {
      val rows = randomEvents(seed, 120)
      val dir = tmp(s"pa$seed")
      writeEvents(rows, dir)
      val trigrams = rows.groupBy(_._3).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
        sorted.sliding(3).filter(_.size == 3).map(_.mkString(">"))
      }
      val want = trigrams.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
        .toSeq.sortBy { case (p, n) => (-n, p) }
        .take(operators.ExtendedAnalytics.PathTopK)
        .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
      val got = operators.ExtendedAnalytics.eventPaths(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === want, s"seed $seed")
    }
  }

  // ---- random corpus vs local OLS -------------------------------------

  test("zipf slope matches a local OLS on random frequency profiles") {
    import spark.implicits._
    for (seed <- Seq(5L, 77L)) {
      val rnd = new scala.util.Random(seed)
      // ~30 distinct tokens with random counts 1..40 in one source
      val counts = (0 until 30).map(i => f"tok$i%02d" -> (rnd.nextInt(40) + 1))
      val text = rnd.shuffle(counts.flatMap { case (t, c) => Seq.fill(c)(t) })
        .mkString(" ")
      val dir = tmp(s"zf$seed")
      Seq((1L, text, "en", "srcR", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // local reference: rank by (count desc, token), OLS on (ln r, ln c)
      val ranked = counts.sortBy { case (t, c) => (-c, t) }.map(_._2)
        .zipWithIndex.map { case (c, i) => (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = ranked.length.toDouble
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxy = ranked.map(p => p._1 * p._2).sum
      val sxx = ranked.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val want = math.floor(slope * 1e6 + 0.5) / 1e6
      val got = operators.CorpusCuration.zipfFit(spark, dir).collect()
      assert(got.length === 1 && got.head.getLong(1) === 30L)
      assert(math.abs(got.head.getDouble(2) - want) < 2e-6,
        s"seed $seed: got ${got.head.getDouble(2)}, local $want")
    }
  }

  // ---- random embeddings vs local brute force -------------------------

  test("1-NN label accuracy matches a local brute force on random embeddings") {
    import spark.implicits._
    for (seed <- Seq(3L, 31L)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(8)((rnd.nextInt(2000) - 1000) / 1000.0f), rnd.nextInt(3))
      }
      val dir = tmp(s"knn$seed")
      vecs.map { case (id, e, l) => (id, e.toSeq, l) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      // Spark `round(x, 6)` is BigDecimal HALF_UP — away from zero for
      // negatives, so a floor-shift local twin would diverge on the
      // negative cosines random vectors produce
      def cos(a: Array[Float], b: Array[Float]): Double =
        BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val nnLab = vecs.map { case (id, e, _) =>
        val best = vecs.filter(_._1 != id)
          .map { case (jid, f, jl) => (cos(e, f), -jid, jl) }.max
        (id, best._3)
      }.toMap
      val want = vecs.groupBy(_._3).map { case (l, vs) =>
        val correct = vs.count { case (id, _, lab) => nnLab(id) == lab }
        (l, vs.size.toLong, correct.toLong,
          math.floor(correct.toDouble / vs.size * 1e4 + 0.5) / 1e4)
      }.toSet
      val got = operators.Similarity.knnLabelAcc(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === want, s"seed $seed")
    }
  }

  // ---- planted-cluster corpus vs local cluster-curation reference -----

  test("bm25 (map-only AND indexed) matches a local reference on random corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = graft.operators.Retrieval.Bm25Terms ++
      Seq("alpha", "beta", "gamma", "delta", "noise", "filler")
    for (seed <- Seq(11L, 41L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 120).map { i =>
        val len = 3 + rnd.nextInt(25)
        val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text, "en", "s", text.length.toLong)
      }
      val dir = tmp(s"bm25$seed")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // local reference (the RetrievalSpec double mirror)
      val toks = docs.map { case (id, t, _, _, _) => id -> t.split(" ").toSeq }.toMap
      val n = docs.size.toLong
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val terms = graft.operators.Retrieval.Bm25Terms
      val dfs = terms.map(t =>
        t -> toks.count { case (_, ts) => ts.contains(t) }.toLong).toMap
      def micro(tf: Long, df: Long, dl: Long): Long =
        if (tf == 0L) 0L
        else {
          val idf = math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
          val tfn = tf.toDouble * (graft.operators.Retrieval.Bm25K1 + 1.0) /
            (tf.toDouble + graft.operators.Retrieval.Bm25K1 *
              (1.0 - graft.operators.Retrieval.Bm25B +
                graft.operators.Retrieval.Bm25B * dl.toDouble / avgdl))
          math.floor(idf * tfn * 1e6 + 0.5).toLong
        }
      val want = toks.keys.map { id =>
        id -> terms.map(t =>
          micro(toks(id).count(_ == t).toLong, dfs(t), toks(id).size.toLong)).sum
      }.filter(_._2 > 0).toSeq.sortBy { case (id, m) => (-m, id) }
        .take(graft.operators.Retrieval.Bm25TopK)
      def got(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toSeq
      assert(got(graft.operators.Retrieval.bm25Rank(spark, dir)) === want,
        s"seed $seed map-only ranking")
      assert(got(graft.sources.Bm25Index.bm25Indexed(spark, dir)) === want,
        s"seed $seed indexed ranking")
    }
  }

  test("phrase search (map-only AND positional index) matches a local reference on random corpora") {
    import spark.implicits._
    val vocab = graft.operators.Retrieval.PhraseTerms ++
      Seq("alpha", "beta", "noise")   // small vocab => dense adjacencies
    for (seed <- Seq(13L, 47L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 100).map { i =>
        val len = 1 + rnd.nextInt(20)   // includes docs SHORTER than the phrase
        val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text, "en", "s", text.length.toLong)
      }
      val dir = tmp(s"phrase$seed")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val phrase = graft.operators.Retrieval.PhraseTerms
      val toks = docs.map { case (id, t, _, _, _) => id -> t.split(" ").toSeq }.toMap
      val tfs = toks.map { case (id, ts) =>
        id -> (0 to ts.length - phrase.length).count(i =>
          phrase.indices.forall(k => ts(i + k) == phrase(k))).toLong
      }
      val n = docs.size.toLong
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val dfP = tfs.count(_._2 > 0).toLong
      def micro(tf: Long, dl: Long): Long =
        if (tf == 0L) 0L
        else {
          val idf = math.log(1.0 + (n.toDouble - dfP.toDouble + 0.5) / (dfP.toDouble + 0.5))
          val tfn = tf.toDouble * (graft.operators.Retrieval.Bm25K1 + 1.0) /
            (tf.toDouble + graft.operators.Retrieval.Bm25K1 *
              (1.0 - graft.operators.Retrieval.Bm25B +
                graft.operators.Retrieval.Bm25B * dl.toDouble / avgdl))
          math.floor(idf * tfn * 1e6 + 0.5).toLong
        }
      val want = tfs.map { case (id, tf) => (id, tf, micro(tf, toks(id).size.toLong)) }
        .filter(_._3 > 0).toSeq.sortBy { case (id, _, m) => (-m, id) }
        .take(graft.operators.Retrieval.PhraseTopK)
      def got(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("tf_phrase"), r.getAs[Long]("score_micro"))).toSeq
      assert(got(graft.operators.Retrieval.phraseSearch(spark, dir)) === want,
        s"seed $seed map-only phrase ranking")
      assert(got(graft.sources.PhraseIndex.phraseIndexed(spark, dir)) === want,
        s"seed $seed positional-index phrase ranking")
    }
  }

  test("topic clusters and prototype pruning match a local reference on planted clusters") {
    import spark.implicits._
    for (seed <- Seq(7L, 23L)) {
      val rnd = new scala.util.Random(seed)
      val n = 400; val dim = 8; val groups = 4
      // four near-orthogonal planted directions + bounded noise; ids
      // arranged so the stride-100 centroid seeds (3, 103, 203, 303)
      // land one per planted group; labels match the group except a
      // deterministic 10% flip — planted purity exactly 0.9
      val vecs = (0 until n).map { i =>
        val g = i / 100
        val e = Array.tabulate(dim) { j =>
          val base = if (j == g * 2) 1.0f else 0.0f
          base + (rnd.nextInt(200) - 100) / 1000.0f
        }
        val lab = if (i % 100 < 90) g else (g + 1) % groups
        (i.toLong, e, lab)
      }
      val dir = tmp(s"topic$seed")
      vecs.map { case (id, e, l) => (id, e.toSeq, l) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // local reference (r10 — the operator clusters against LEARNED
      // centroids): stride = max(100, round(√400)) = 100 → seeds
      // 3/103/203/303 land one per planted group, then the shared
      // Lloyd replica refines them; brute cosine argmax assignment
      // (score desc, cid asc)
      val learned = LocalCentroids.lloyd(
        vecs.map(v => (v._1, v._2)), operators.Similarity.KMeansIters)
      val asg = LocalCentroids.assign(vecs, learned)
      val wantProfile = asg.groupBy(_._3).toSeq.map { case (cell, ms) =>
        val sz = ms.size.toLong
        val micro = ms.map(m => math.floor(m._4 * 1e6 + 0.5).toLong).sum
        val (topLab, topCnt) = ms.groupBy(_._2).view.mapValues(_.size.toLong)
          .toSeq.minBy { case (l, c) => (-c, l) }
        (cell, sz, math.floor(micro.toDouble / sz + 0.5) / 1e6,
          topLab, math.floor(topCnt.toDouble / sz * 1e4 + 0.5) / 1e4)
      }.sortBy(_._1)
      val gotProfile = operators.Clustering.topicClusters(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3),
          r.getDouble(4))).toSeq
      assert(gotProfile === wantProfile, s"seed $seed profile")
      // planted structure recovered: 4 cells × 100, purity exactly 0.9
      assert(gotProfile.map(_._2) === Seq(100L, 100L, 100L, 100L), s"seed $seed sizes")
      assert(gotProfile.forall(_._5 === 0.9), s"seed $seed purity")
      val wantPrune = asg.groupBy(_._3).toSeq.flatMap { case (_, ms) =>
        val cut = (ms.size + 3).toLong / 4
        ms.sortBy { case (id, _, _, sc) => (-sc, id) }.zipWithIndex.map {
          case ((id, _, _, _), i) => (id, (i + 1).toLong <= cut)
        }
      }.toMap
      val gotPrune = operators.Clustering.prototypePrune(spark, dir).collect()
        .map(r => (r.getLong(0), r.getBoolean(4))).toMap
      assert(gotPrune === wantPrune, s"seed $seed prune verdicts")
    }
  }
}

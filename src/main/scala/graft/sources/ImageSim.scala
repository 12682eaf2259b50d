package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal, Pixels}

/** Multimodal → embedding bridge (`q_image_sim`): REAL pixel decode
  * feeding the similarity family — near-duplicate IMAGE detection over
  * a deterministic pixel-statistic embedding (channel means + the
  * integer-luma histogram, the engine-reproducible signature — no
  * model weights), closing the round-9 gap "decoded pixels don't feed
  * the ANN/embedding family".
  *
  * Fixture + artifact lifecycle (the `q_shard_balance` contract):
  *  1. `images/` — one lossless PNG per document with doc_id <
  *     [[ImageDocs]], synthesized from the CLOSED-FORM pixel function
  *     [[synthChannel]] (generator-planted near-dup groups: docs
  *     sharing doc_id % [[Groups]] differ only in a few noise pixels).
  *  2. `stats/` — the decoded per-image statistics, produced by the
  *     REAL JDK ImageIO decode path ([[Multimodal.decodePixels]]) over
  *     the PNG payloads and persisted to parquet.
  *  3. The query reads ONLY the stats artifact: stats vector → cosine
  *     all-pairs (tiled block equi-join, the [[graft.operators
  *     .Similarity]] shape — no nested loop) → pairs ≥ [[CosT]].
  *
  * The DuckDB oracle recomputes the statistics from the closed form
  * (generate_series over the 256 pixel indices — DuckDB cannot decode
  * PNG) and mirrors the pair logic — so a PASS proves the real
  * decode∘encode round-trip recovers the generated ground truth
  * bit-exactly AND that near-duplicate images cluster (`same_group`
  * rides the output as the planted label).
  *
  * Scale shape: synthesis/decode are map-side (mapPartitions, fixed
  * ~200 B stats row per image out); the pair join is the tiled
  * all-pairs — the declared-exact baseline, same economics as
  * `q_dedup_embedding` (a production corpus would bucket by a cheap
  * signature first; the LSH/IVF family shows that path).
  */
object ImageSim {

  /** Documents that carry an image (doc_id < this) — SF-independent
    * workload bound, same class as Similarity.NumQueries.
    */
  val ImageDocs = 200L
  val ImgW = 16
  val ImgH = 16
  /** Near-dup group = doc_id % Groups (5 members per group at 200). */
  val Groups = 40
  /** Noise: pixel idx is overridden iff (idx + 13·doc_id) % NoiseMod == 0. */
  val NoiseMod = 101
  /** Rounded-cosine threshold for the near-dup verdict (set from the
    * measured separation: within-group pairs differ only in ≤ 3 noise
    * pixels; cross-group colors are group-constant and far apart).
    */
  val CosT = 0.999

  /** The closed-form pixel function, shared by the PNG generator, the
    * spec's local reference, and (as SQL) the oracle. Channel base
    * colors are GROUP-constant; noise pixels are doc-specific.
    */
  private[graft] def synthChannel(docId: Long, idx: Int, ch: Int): Int = {
    if ((idx + 13L * docId) % NoiseMod == 0) ((docId * 77 + idx) % 256).toInt
    else {
      val base = docId % Groups
      ch match {
        case 0 => ((97 * base + 31) % 256).toInt
        case 1 => ((57 * base + 11) % 256).toInt
        case _ => ((23 * base + 7) % 256).toInt
      }
    }
  }

  private[graft] def synthPng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(ImgW, ImgH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var idx = 0
    while (idx < ImgW * ImgH) {
      val x = idx % ImgW
      val y = idx / ImgW
      val rgb = (synthChannel(docId, idx, 0) << 16) |
        (synthChannel(docId, idx, 1) << 8) | synthChannel(docId, idx, 2)
      img.setRGB(x, y, rgb)
      idx += 1
    }
    Pixels.encodePng(img)
  }

  def imageRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_imagesim", dir)

  /** Build the PNG fixture tree and the DECODED-stats artifact (real
    * ImageIO decode — [[Multimodal.decodePixels]]). Marker-skipped.
    */
  def materialize(s: SparkSession, dir: String): String = {
    val root = imageRoot(s, dir)
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    import s.implicits._
    val media = graft.Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < ImageDocs)
      .as[Long]
      .mapPartitions(_.map(id => Multimodal.MediaRow(id, "media/raw", synthPng(id))))
    media.toDF().write.mode("overwrite").parquet(s"$root/images")
    val decoded = Multimodal.decodePixels(
      s.read.parquet(s"$root/images").as[Multimodal.MediaRow])
    decoded.toDF()
      .select(col("id").as("doc_id"), col("format"), col("width"), col("height"),
        col("header_match"), col("mean_r"), col("mean_g"), col("mean_b"),
        col("hist_luma"))
      .write.mode("overwrite").parquet(s"$root/stats")
    ScopedFixture.markComplete(root)
    root
  }

  /** Stats row → the pixel-statistic embedding: DOUBLE array
    * [mean_r, mean_g, mean_b, hist_0 … hist_15] (means are exact —
    * integer sums over 256 pixels; histogram counts are integers), and
    * its L2 norm by the engine-portable sequential HOF fold.
    */
  private def emb: Column =
    concat(array(col("mean_r"), col("mean_g"), col("mean_b")),
      transform(col("hist_luma"), h => h.cast("double")))

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  val DupBlocks = 8

  /** §2.7 bridge query: near-duplicate image pairs from the persisted
    * decoded-stats artifact. Output: (doc_a, doc_b, same_group,
    * cos_sim) for every unordered pair with rounded cosine ≥ [[CosT]].
    */
  def imageSim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = materialize(s, dir)
    val base = s.read.parquet(s"$root/stats")
      .select(col("doc_id"), emb.as("e"))
      .withColumn("nrm", sqrt(dotD(col("e"), col("e"))))
    val B = DupBlocks
    val tiles = (for { i <- 0 until B; j <- i until B } yield (i * B + j, i, j))
      .toDF("tile", "t_blk_a", "t_blk_b")
    def side(sfx: String, blkCol: String) =
      base.select(col("doc_id").as(s"doc_$sfx"), col("e").as(s"e_$sfx"),
          col("nrm").as(s"n_$sfx"),
          pmod(col("doc_id"), lit(B)).cast("int").as(blkCol))
        .join(broadcast(tiles), blkCol)
        .drop("t_blk_a", "t_blk_b")
    side("a", "t_blk_a").join(side("b", "t_blk_b"), Seq("tile"))
      .filter(pmod(col("doc_a"), lit(B)) < pmod(col("doc_b"), lit(B)) ||
        col("doc_a") < col("doc_b"))
      .withColumn("cos_sim",
        round(dotD(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cos_sim") >= CosT)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("cos_sim"))
      .withColumn("same_group",
        pmod(col("doc_a"), lit(Groups.toLong)) === pmod(col("doc_b"), lit(Groups.toLong)))
      .select("doc_a", "doc_b", "same_group", "cos_sim")
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB twin: the closed-form [[synthChannel]] statistics (DuckDB
    * cannot decode PNG — recomputing the generator's ground truth IS
    * the check that the real decode recovered it) and the identical
    * pair logic over the identical sequential-fold doubles.
    */
  def oracleSql: String = {
    def chan(c: Int): String = {
      val (m, a) = c match {
        case 0 => (97, 31); case 1 => (57, 11); case _ => (23, 7)
      }
      s"""CASE WHEN (u.idx + 13 * doc_id) % $NoiseMod = 0
         | THEN (doc_id * 77 + u.idx) % 256
         | ELSE ($m * (doc_id % $Groups) + $a) % 256 END""".stripMargin
    }
    val dim = 3 + Pixels.HistBins
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(generate_series(1, $dim), " +
        s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    val histCols = (0 until Pixels.HistBins).map(i =>
      s"CAST(sum(CASE WHEN lbin = $i THEN 1 ELSE 0 END) AS DOUBLE) AS h$i")
      .mkString(",\n         ")
    val embList = "list_value(mean_r, mean_g, mean_b, " +
      (0 until Pixels.HistBins).map(i => s"h$i").mkString(", ") + ")"
    s"""WITH img AS (
       |  SELECT doc_id FROM documents WHERE doc_id < $ImageDocs),
       |px AS (
       |  SELECT doc_id,
       |    ${chan(0)} AS r, ${chan(1)} AS g, ${chan(2)} AS b
       |  FROM img CROSS JOIN unnest(generate_series(0, ${ImgW * ImgH - 1})) AS u(idx)),
       |lb AS (
       |  SELECT doc_id, r, g, b,
       |    ((299 * r + 587 * g + 114 * b) // 1000 * ${Pixels.HistBins}) // 256 AS lbin
       |  FROM px),
       |st AS (
       |  SELECT doc_id,
       |    CAST(sum(r) AS DOUBLE) / ${ImgW * ImgH} AS mean_r,
       |    CAST(sum(g) AS DOUBLE) / ${ImgW * ImgH} AS mean_g,
       |    CAST(sum(b) AS DOUBLE) / ${ImgW * ImgH} AS mean_b,
       |         $histCols
       |  FROM lb GROUP BY doc_id),
       |v AS (
       |  SELECT doc_id, $embList AS e,
       |    sqrt(${dot(embList, embList)}) AS nrm
       |  FROM st)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.doc_id % $Groups = b.doc_id % $Groups AS same_group,
       |  round(${dot("a.e", "b.e")} / (a.nrm * b.nrm), 6) AS cos_sim
       |FROM v a JOIN v b ON a.doc_id < b.doc_id
       |WHERE round(${dot("a.e", "b.e")} / (a.nrm * b.nrm), 6) >= $CosT
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Audio → embedding bridge (`q_audio_sim`): REAL sample decode
  * feeding the similarity family — near-duplicate AUDIO detection over
  * a deterministic sample-statistic embedding (the per-segment
  * amplitude envelope + the zero-crossing count, all integer-derived —
  * no model weights), the audio mirror of [[ImageSim]] (the r10
  * verdict's remaining multimodal asymmetry: audio had headers but no
  * stats→embedding bridge).
  *
  * Fixture + artifact lifecycle (the `q_image_sim` contract):
  *  1. `audio/` — one PCM16 mono WAV per document with doc_id <
  *     [[AudioDocs]], synthesized from the CLOSED-FORM sample function
  *     [[synthSample]] (docs sharing doc_id % [[Groups]] carry the
  *     same group waveform and differ only in a few doc-specific
  *     click samples — the planted near-dup structure).
  *  2. `stats/` — the decoded per-clip statistics, produced by the
  *     REAL JDK javax.sound decode path
  *     ([[Multimodal.decodeAudioStats]]) over the WAV payloads,
  *     persisted to parquet.
  *  3. The query reads ONLY the stats artifact: envelope embedding →
  *     cosine all-pairs (tiled block equi-join — no nested loop) →
  *     pairs ≥ [[CosT]].
  *
  * The DuckDB oracle recomputes the statistics from the closed form
  * (generate_series over the [[SampleN]] sample indices — DuckDB
  * cannot decode WAV) and mirrors the pair logic — a PASS proves the
  * real decode∘encode round-trip recovers the generated ground truth
  * bit-exactly (PCM16 is lossless, like the image fixture's PNG).
  *
  * Separation is measured, not assumed: within-group cosine ≥ 0.9984
  * vs cross-group ≤ 0.8460 on the shipped fixture shape (the
  * group×segment cross term in the level hash is what decorrelates
  * groups — a linear-in-segment level made cross-group envelopes
  * differ by a near-constant offset and cosine-collide at 0.9998).
  */
object AudioSim {

  /** Documents that carry a clip (doc_id < this) — SF-independent
    * workload bound, same class as [[ImageSim.ImageDocs]].
    */
  val AudioDocs = 200L
  val SampleN = 1024
  val SampleRate = 8000
  /** Near-dup group = doc_id % Groups (5 members per group at 200). */
  val Groups = 40
  /** Click noise: sample t is overridden iff (t + 13·doc_id) % NoiseMod == 0. */
  val NoiseMod = 101
  /** Envelope segments (the embedding's band axis). */
  val Segs = 16
  /** Rounded-cosine near-dup threshold — between the measured
    * within-group min (0.9984) and cross-group max (0.8460).
    */
  val CosT = 0.99

  /** The closed-form sample function, shared by the WAV generator, the
    * spec's local reference, and (as SQL) the oracle. Segment levels
    * are GROUP-constant with a group×segment cross term; click samples
    * are doc-specific. All arithmetic is nonnegative-integer until the
    * final shift, so Scala `/`/`%` and DuckDB `//`/`%` agree exactly.
    */
  private[graft] def synthSample(docId: Long, t: Int): Int =
    if ((t + 13L * docId) % NoiseMod == 0)
      ((((docId * 77 + t) % 4096L) * 16) - 32768).toInt
    else {
      val g = (docId % Groups).toInt
      val k = t * Segs / SampleN
      ((97 * g + 31 * k + 13 * g * k + 17) % 256) * 256 - 32768
    }

  /** Canonical 44-byte-header PCM16LE mono WAV around the synthesized
    * samples — the lossless fixture [[Multimodal.decodeAudioStats]]
    * decodes back exactly.
    */
  private[graft] def synthWav(docId: Long): Array[Byte] = {
    val data = new Array[Byte](SampleN * 2)
    var t = 0
    while (t < SampleN) {
      val v = synthSample(docId, t)
      data(2 * t) = (v & 0xff).toByte
      data(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(SampleRate); le32(SampleRate * 2); le16(2); le16(16)
    out.write("data".getBytes("US-ASCII")); le32(data.length)
    out.write(data)
    out.toByteArray
  }

  def audioRoot(s: SparkSession, dir: String): String =
    ScopedFixture.root(s, "graft_audiosim", dir)

  /** Build the WAV fixture tree and the DECODED-stats artifact (real
    * javax.sound decode). Marker-skipped.
    */
  def materialize(s: SparkSession, dir: String): String = {
    val root = audioRoot(s, dir)
    FixtureCleanup.onExit(root)
    if (ScopedFixture.isComplete(root)) return root
    import s.implicits._
    val media = graft.Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < AudioDocs)
      .as[Long]
      .mapPartitions(_.map(id => Multimodal.MediaRow(id, "media/raw", synthWav(id))))
    media.toDF().write.mode("overwrite").parquet(s"$root/audio")
    Multimodal.decodeAudioStats(
        s.read.parquet(s"$root/audio").as[Multimodal.MediaRow], Segs)
      .toDF()
      .select(col("id").as("doc_id"), col("format"), col("sample_rate"),
        col("channels"), col("header_match"), col("n_samples"),
        col("seg_sums"), col("zc"))
      .write.mode("overwrite").parquet(s"$root/stats")
    ScopedFixture.markComplete(root)
    root
  }

  /** Stats row → the envelope embedding: DOUBLE array [seg_mean_0 …
    * seg_mean_{15}, zc] — segment means are exact (integer sums over
    * [[SampleN]]/[[Segs]] samples divided once), the crossing count an
    * integer.
    */
  private def emb: Column =
    concat(
      transform(col("seg_sums"),
        v => v.cast("double") / lit((SampleN / Segs).toDouble)),
      array(col("zc").cast("double")))

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  val DupBlocks = 8

  /** §2.7 bridge query: near-duplicate clip pairs from the persisted
    * decoded-stats artifact. Output: (doc_a, doc_b, same_group,
    * cos_sim) for every unordered pair with rounded cosine ≥ [[CosT]].
    */
  def audioSim(s: SparkSession, dir: String): DataFrame = {
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

  /** DuckDB twin: the closed-form [[synthSample]] statistics (DuckDB
    * cannot decode WAV — recomputing the generator's ground truth IS
    * the check that the real decode recovered it) and the identical
    * pair logic over identical sequential-fold doubles.
    */
  def oracleSql: String = {
    val per = SampleN / Segs
    val dim = Segs + 1
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(generate_series(1, $dim), " +
        s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    val segCols = (0 until Segs).map(i =>
      s"CAST(sum(CASE WHEN k = $i THEN smp ELSE 0 END) AS DOUBLE) / $per AS m$i")
      .mkString(",\n         ")
    val embList = "list_value(" +
      (0 until Segs).map(i => s"m$i").mkString(", ") + ", zc)"
    s"""WITH aud AS (
       |  SELECT doc_id FROM documents WHERE doc_id < $AudioDocs),
       |smp AS (
       |  SELECT doc_id, u.t AS t,
       |    CASE WHEN (u.t + 13 * doc_id) % $NoiseMod = 0
       |      THEN ((doc_id * 77 + u.t) % 4096) * 16 - 32768
       |      ELSE ((97 * (doc_id % $Groups) + 31 * (u.t * $Segs // $SampleN)
       |             + 13 * (doc_id % $Groups) * (u.t * $Segs // $SampleN) + 17)
       |            % 256) * 256 - 32768 END AS smp,
       |    u.t * $Segs // $SampleN AS k
       |  FROM aud CROSS JOIN unnest(generate_series(0, ${SampleN - 1})) AS u(t)),
       |zx AS (
       |  SELECT doc_id, t, smp, k,
       |    lag(smp) OVER (PARTITION BY doc_id ORDER BY t) AS prev
       |  FROM smp),
       |st AS (
       |  SELECT doc_id,
       |         $segCols,
       |    CAST(sum(CASE WHEN prev IS NOT NULL
       |                   AND ((prev < 0) <> (smp < 0)) THEN 1 ELSE 0 END)
       |         AS DOUBLE) AS zc
       |  FROM zx GROUP BY doc_id),
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

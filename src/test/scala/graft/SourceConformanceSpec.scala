package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Export

/** Source-conformance matrix (the r15 verdict's item 5): CSV quirks
  * and JSON-lines schema evolution proven against HAND-WRITTEN
  * fixtures, not Spark-written round-trips — a Spark→Spark round-trip
  * proves self-consistency only, and the RFC-4180 escape landmine
  * (CLAUDE/SURVEY r2: Spark's default backslash escaping round-trips
  * only through Spark) shows this class bites exactly at the boundary
  * with OTHER writers. Every fixture here is written byte-by-byte the
  * way an external producer would write it.
  */
class SourceConformanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def put(dir: String, name: String, text: String,
                  cs: String = "UTF-8"): Unit =
    Files.write(Paths.get(dir, name), text.getBytes(Charset.forName(cs)))

  private val abSchema = StructType(Seq(
    StructField("id", LongType), StructField("note", StringType)))

  test("CSV quirk matrix: RFC-4180 doubled quotes, embedded seps, multiline, CRLF") {
    val dir = tmp("graft_csvq")
    // external-writer file: CRLF line endings, "" quote escaping,
    // an embedded delimiter, an embedded newline, an empty field
    put(dir, "ext.csv",
      "id,note\r\n" +
        "1,\"say \"\"hi\"\", ok\"\r\n" +         // doubled quote + comma
        "2,\"line one\nline two\"\r\n" +          // embedded newline
        "3,plain\r\n" +
        "4,\r\n")                                 // empty trailing field
    val got = Export.readCsv(spark, dir, abSchema)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("say \"hi\", ok"))
    assert(got(2L) === Some("line one\nline two"))
    assert(got(3L) === Some("plain"))
    assert(got(4L).forall(_.isEmpty), s"empty field read as ${got(4L)}")
  }

  test("CSV encoding: latin-1 and UTF-16 files read exactly with the encoding option") {
    val d1 = tmp("graft_csv_l1")
    put(d1, "l1.csv", "id,note\n5,café naïve\n", "ISO-8859-1")
    val l1 = Export.readCsv(spark, d1, abSchema,
      Map("encoding" -> "ISO-8859-1")).collect()
    assert(l1.map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((5L, "café naïve")))

    val d2 = tmp("graft_csv_u16")
    put(d2, "u16.csv", "id,note\n6,日本語\n", "UTF-16LE")
    val u16 = Export.readCsv(spark, d2, abSchema,
      Map("encoding" -> "UTF-16LE")).collect()
    assert(u16.map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((6L, "日本語")))
  }

  test("CSV custom separator + explicit null token via the options seam") {
    val dir = tmp("graft_csv_sep")
    put(dir, "t.tsv", "id\tnote\n7\tseven\n8\t\\N\n")
    val got = Export.readCsv(spark, dir, abSchema,
      Map("sep" -> "\t", "nullValue" -> "\\N"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(7L) === Some("seven"))
    assert(got(8L) === None, "the declared null token must read as NULL, not the literal")
  }

  test("CSV malformed row lands in _corrupt_record; the rest of the file survives") {
    val dir = tmp("graft_csv_bad")
    put(dir, "bad.csv", "id,note\n9,fine\nnot-a-number,also fine\n10,good\n")
    val schema = StructType(abSchema.fields :+ StructField("_corrupt_record", StringType))
    val rows = Export.readCsv(spark, dir, schema, Map("multiLine" -> "false"))
      .collect()
    val good = rows.filter(_.isNullAt(2)).map(r => (r.getLong(0), r.getString(1))).toSet
    val bad = rows.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(good === Set((9L, "fine"), (10L, "good")))
    assert(bad.toSeq === Seq("not-a-number,also fine"),
      "the malformed row must surface verbatim, not kill the read")
  }

  test("JSON-lines schema evolution: three producer generations read under the newest schema") {
    val dir = tmp("graft_jsonl")
    // gen-1: flat (id, name); gen-2 adds score + tags; gen-3 adds a
    // nested meta struct — additive evolution across a directory
    put(dir, "gen1.jsonl",
      """{"id": 1, "name": "a"}""" + "\n" + """{"id": 2, "name": "b"}""" + "\n")
    put(dir, "gen2.jsonl",
      """{"id": 3, "name": "c", "score": 0.5, "tags": ["x", "y"]}""" + "\n")
    put(dir, "gen3.jsonl",
      """{"id": 4, "name": "d", "score": 1.5, "tags": [], "meta": {"lang": "en", "rev": 7}}""" + "\n")
    val v3 = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("rev", LongType))))))
    val rows = Export.readJson(spark, dir, v3).orderBy("id").collect()
    assert(rows.length === 4)
    // gen-1 rows: every post-gen-1 field is null
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3) && rows(0).isNullAt(4))
    assert(rows(1).getString(1) === "b")
    // gen-2 row: score + tags present, meta still null
    assert(rows(2).getDouble(2) === 0.5)
    assert(rows(2).getSeq[String](3) === Seq("x", "y"))
    assert(rows(2).isNullAt(4))
    // gen-3 row: full schema incl. the nested struct
    val meta = rows(3).getStruct(4)
    assert(meta.getString(0) === "en" && meta.getLong(1) === 7L)
  }

  test("JSON-lines: corrupt line surfaces without dropping its neighbours; int widens to long") {
    val dir = tmp("graft_jsonl_bad")
    put(dir, "mixed.jsonl",
      """{"id": 1, "name": "ok"}""" + "\n" +
        """{"id": oops not json""" + "\n" +
        """{"id": 2147483648, "name": "wide"}""" + "\n") // > Int.MaxValue
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val rows = Export.readJson(spark, dir, schema).collect()
    val good = rows.filter(_.isNullAt(2)).map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "ok"), (2147483648L, "wide")),
      "JSON numbers must widen to the declared long; neighbours of a corrupt line survive")
    assert(rows.count(!_.isNullAt(2)) === 1, "exactly the corrupt line is captured")
  }

  test("JSON-lines writer output is readable line-by-line by a plain parser") {
    import spark.implicits._
    val dir = tmp("graft_jsonl_w") + "/out"
    Seq((1L, "with \"quotes\" and \n newline"), (2L, "plain"))
      .toDF("id", "note").transform(d => { Export.writeJson(d, dir); d })
    // every line of every part file must parse standalone (JSONL
    // contract: no multi-line records, no trailing commas)
    val lines = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p, "UTF-8").getLines())
    assert(lines.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val parsed = lines.map(mapper.readTree)
    assert(parsed.map(_.get("id").asLong).toSet === Set(1L, 2L))
    assert(parsed.find(_.get("id").asLong == 1L).get.get("note").asText ===
      "with \"quotes\" and \n newline")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

/** Golden tests for the engine-portable hashes: the constants below are
  * computed independently (plain python arithmetic) — if these break,
  * DuckDB oracle parity breaks with them.
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("dummy").select(c).head().get(0)

  test("charFoldHash matches independent computation") {
    assert(one(charFoldHash(lit("hello"))) === 99162322L)
    assert(one(charFoldHash(lit("spark join"))) === 317826698L)
    assert(one(charFoldHash(lit(""))) === 0L)
  }

  test("docFingerprint folds token hashes") {
    assert(one(docFingerprint(lit("Hello, World 42!"))) === 569360554L)
    assert(one(docFingerprint(lit(""))) === 0L)
  }

  test("tokens / shingles") {
    assert(one(tokens(lit("A b-c 12!"))) === Seq("a", "b", "c", "12"))
    assert(one(wordShingles(lit("a b c d"), 3)) === Seq("a b c", "b c d"))
    assert(one(wordShingles(lit("a b"), 3)) === Seq())
  }

  test("codegen'd WordShingleStrings equals the HOF reference on the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val diff = docs.select(
        wordShingles(col("text"), 3).as("hof"),
        graft.plans.ArrayOps.wordShingleStrings(tokens(col("text")), 3).as("gen"))
      .filter(col("hof") =!= col("gen"))
    assert(diff.isEmpty, s"mismatch rows: ${diff.count()}")
    assert(one(graft.plans.ArrayOps.wordShingleStrings(tokens(lit("a b a b a")), 2))
      === Seq("a b", "b a"))  // first-occurrence distinct order
  }

  test("truncate and clean") {
    assert(one(truncateText(lit("x" * 100), 60)) === "x" * 57 + "...")
    assert(one(truncateText(lit("short"), 60)) === "short")
    assert(one(cleanText(lit("a’b — c…"))) === "a'b - c...")
  }

  test("langId precedence") {
    assert(one(langId(lit("the cat and the hat"))) === "en")
    assert(one(langId(lit("der hund ist nicht da"))) === "de")
    assert(one(langId(lit("xyzzy qwerty"))) === "unknown")
  }
}

class FilenameEncodeSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.functions.TextFunctions._
  import org.apache.spark.sql.functions._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("dummy").select(c).head().get(0)

  test("sanitizeFilename scrubs the nine invalid chars and caps at 255") {
    assert(one(sanitizeFilename(lit("a<b>c:d\"e/f\\g|h?i*.txt"))) === "a_b_c_d_e_f_g_h_i_.txt")
    assert(one(length(sanitizeFilename(lit("x" * 300)))) === 255)
    assert(one(sanitizeFilename(lit("clean-name_01.png"))) === "clean-name_01.png")
  }

  test("safeEncode maps each non-latin-1 codepoint to exactly one '?'") {
    // latin-1 chars survive; BMP and astral non-latin-1 each become ONE '?'
    assert(one(safeEncode(lit("naïve café 🚀 – ok"))) === "naïve café ? ? ok")
    assert(one(safeEncode(lit("plain ascii"))) === "plain ascii")
    assert(one(safeEncode(lit("𝔘𝔫𝔦"))) === "???")
  }
}

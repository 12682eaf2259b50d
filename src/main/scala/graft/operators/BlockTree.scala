package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Block-tree + comments normalization (reference `fetch_page_blocks` /
  * `extract_page_blocks` / `fetch_comments`, backend/fetch_pages.py:
  * 117-310): a page is a recursive tree of typed blocks (paragraphs,
  * headings, list items, to-dos with checked state, code, equations,
  * dividers, child-page/bookmark stubs) whose rich-text runs carry
  * bold/italic/href annotations; extraction flattens the tree to
  * ordered markdown-ish lines (pre-order: a block's line, then its
  * children's), and page comments contribute their first rich-text
  * run, appended after the body.
  *
  * Note: the reference lists `to_do` in its rich-text branch
  * (fetch_pages.py:205-214), which shadows the dedicated checkbox
  * branch below it (fetch_pages.py:237-245) — dead code in the
  * original. We implement the evidently-intended checkbox semantics
  * (`[x] ` / `[ ] ` prefix).
  *
  * Spark-first shape: a reference-shaped page JSON is synthesized per
  * document (deterministic from doc_id/tokens/lang — shared fixture
  * derivation with the DuckDB oracle), serialized with `to_json`, and
  * parsed back through `from_json` with the full nested schema. The
  * RENDERER is generic over the parsed tree — typed higher-order
  * `transform`/`flatten` running entirely map-side inside one scan
  * projection; `posexplode` assigns positions. No shuffle anywhere: at
  * 100 TB this is the per-row ingest-normalization shape, and the
  * oracle walks the same JSON with `json_extract` paths.
  */
object BlockTree {

  val ChildrenMinTokens = 50
  /** Fixture guard: blocks reference t[1..6], and Spark's concat_ws /
    * array_join SKIP null elements while DuckDB's `||` null-propagates
    * the whole line — a <6-token document would render differently per
    * engine. Both fixture derivations filter on this shared bound so
    * the divergence cannot fire regardless of corpus.
    */
  val MinFixtureTokens = 6

  private val PageSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "blocks ARRAY<STRUCT<type: STRING, checked: BOOLEAN, language: STRING, " +
      "code: STRING, expression: STRING, title: STRING, url: STRING, " +
      "rich_text: ARRAY<STRUCT<plain_text: STRING, bold: BOOLEAN, italic: BOOLEAN, href: STRING>>, " +
      "children: ARRAY<STRUCT<type: STRING, " +
      "rich_text: ARRAY<STRUCT<plain_text: STRING, bold: BOOLEAN, italic: BOOLEAN, href: STRING>>>>>>, " +
      "comments ARRAY<STRUCT<rich_text: ARRAY<STRUCT<plain_text: STRING>>>>")

  /** One styled rich-text run → markdown, annotation order as the
    * reference applies it: bold, italic, then link wrap.
    */
  private def styleRun(r: Column): Column = {
    val b = when(r.getField("bold") === true,
      concat(lit("**"), r.getField("plain_text"), lit("**")))
      .otherwise(r.getField("plain_text"))
    val i = when(r.getField("italic") === true, concat(lit("*"), b, lit("*"))).otherwise(b)
    when(r.getField("href").isNotNull,
      concat(lit("["), i, lit("]("), r.getField("href"), lit(")"))).otherwise(i)
  }

  private def renderRich(runs: Column): Column =
    array_join(transform(runs, styleRun(_)), "")

  private def plainConcat(runs: Column): Column =
    array_join(transform(runs, r => r.getField("plain_text")), "")

  /** One parsed block → its extracted line (extract_page_blocks'
    * type dispatch).
    */
  private def renderBlock(b: Column): Column = {
    val t = b.getField("type")
    when(t === "to_do",
      concat(when(b.getField("checked") === true, lit("[x] ")).otherwise(lit("[ ] ")),
        plainConcat(b.getField("rich_text"))))
      .when(t === "code",
        concat(lit("[Code: "), b.getField("language"), lit("]\n"), b.getField("code")))
      .when(t === "equation",
        concat(lit("[Equation: "), b.getField("expression"), lit("]")))
      .when(t === "divider", lit("---"))
      .when(t === "child_page", concat(lit("[Child Page] "), b.getField("title")))
      .when(t === "bookmark", concat(lit("[Bookmark] "), b.getField("url")))
      .otherwise(renderRich(b.getField("rich_text")))
  }

  /** Deterministic reference-shaped page JSON per document. */
  private def pageJson(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= MinFixtureTokens)
    def tk(i: Int) = element_at(col("t"), i)
    def run(pt: Column, bold: Boolean = false, italic: Boolean = false,
            href: Column = lit(null).cast("string")) =
      struct(pt.as("plain_text"), lit(bold).as("bold"), lit(italic).as("italic"),
        href.as("href"))
    val blocks = array(
      struct(lit("heading_1").as("type"), lit(null).cast("boolean").as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        lit(null).cast("string").as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        array(run(tk(1), bold = true),
          run(tk(2), italic = true, href = concat(lit("https://x/"), col("doc_id"))))
          .as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")),
      struct(lit("to_do").as("type"), (col("doc_id") % 2 === 0).as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        lit(null).cast("string").as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        array(run(tk(3))).as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")),
      struct(lit("bulleted_list_item").as("type"), lit(null).cast("boolean").as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        lit(null).cast("string").as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        array(run(tk(4))).as("rich_text"),
        when(col("n") >= ChildrenMinTokens, array(
          struct(lit("paragraph").as("type"), array(run(tk(5))).as("rich_text")),
          struct(lit("paragraph").as("type"), array(run(tk(6))).as("rich_text"))))
          .as("children")),
      struct(lit("code").as("type"), lit(null).cast("boolean").as("checked"),
        col("lang").as("language"),
        concat_ws(" ", tk(1), tk(2), tk(3)).as("code"),
        lit(null).cast("string").as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        lit(null).cast("array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>")
          .as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")),
      struct(lit("equation").as("type"), lit(null).cast("boolean").as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        concat(lit("E="), col("n")).as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        lit(null).cast("array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>")
          .as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")),
      struct(lit("divider").as("type"), lit(null).cast("boolean").as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        lit(null).cast("string").as("expression"), lit(null).cast("string").as("title"),
        lit(null).cast("string").as("url"),
        lit(null).cast("array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>")
          .as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")),
      struct(
        when(col("doc_id") % 5 === 0, lit("child_page")).otherwise(lit("bookmark")).as("type"),
        lit(null).cast("boolean").as("checked"),
        lit(null).cast("string").as("language"), lit(null).cast("string").as("code"),
        lit(null).cast("string").as("expression"),
        when(col("doc_id") % 5 === 0, tk(1)).as("title"),
        when(col("doc_id") % 5 =!= 0, concat(lit("https://b/"), col("doc_id"))).as("url"),
        lit(null).cast("array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>")
          .as("rich_text"),
        lit(null).cast(
          "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")
          .as("children")))
    val comments = array(
      struct(array(struct(tk(2).as("plain_text"))).as("rich_text")),
      struct(array(struct(tk(1).as("plain_text"))).as("rich_text")))
    d.select(col("doc_id"),
      to_json(struct(blocks.as("blocks"), comments.as("comments"))).as("page_json"))
  }

  /** §2 catalog entry: (doc_id, pos, kind, line) — body lines in
    * pre-order, then comment lines; `pos` is the 0-based position
    * within the page.
    */
  def blockTree(s: SparkSession, dir: String): DataFrame = {
    val parsed = pageJson(s, dir)
      .select(col("doc_id"), from_json(col("page_json"), PageSchema).as("p"))
    val bodyLines = flatten(transform(col("p.blocks"), b =>
      concat(array(struct(lit("block").as("kind"), renderBlock(b).as("line"))),
        transform(coalesce(b.getField("children"),
          array().cast(
            "array<struct<type: string, rich_text: array<struct<plain_text: string, bold: boolean, italic: boolean, href: string>>>>")),
          // child blocks in this tree are rich-text paragraphs; a
          // deeper type union would reuse renderBlock over the same
          // widened struct
          c => struct(lit("block").as("kind"),
            renderRich(c.getField("rich_text")).as("line"))))))
    val commentLines = transform(col("p.comments"), c =>
      struct(lit("comment").as("kind"),
        c.getField("rich_text").getItem(0).getField("plain_text").as("line")))
    parsed
      .select(col("doc_id"),
        posexplode(concat(bodyLines, commentLines)).as(Seq("pos", "entry")))
      .select(col("doc_id"), col("pos"),
        col("entry.kind").as("kind"), col("entry.line").as("line"))
      .orderBy("doc_id", "pos")
  }

  /** DuckDB oracle: same fixture JSON built with DuckDB struct/to_json,
    * every value read back through `json_extract` paths, lines zipped
    * with their ordinal. Shared derivation constants with the Spark
    * side (tokens regex, children threshold, block-7 modulus).
    */
  val oracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
       |         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
       |  FROM documents
       |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= $MinFixtureTokens),
       |page AS (
       |  -- every list element carries the FULL field set (DuckDB lists
       |  -- need one unified struct type; to_json keeps the nulls, which
       |  -- json_extract reads identically to absent fields)
       |  SELECT doc_id, to_json({
       |    blocks: [
       |      {type: 'heading_1', checked: NULL, language: NULL, code: NULL,
       |       expression: NULL, title: NULL, url: NULL,
       |       rich_text: [{plain_text: t[1], bold: true, italic: false, href: NULL},
       |                   {plain_text: t[2], bold: false, italic: true,
       |                    href: 'https://x/' || doc_id}],
       |       children: NULL},
       |      {type: 'to_do', checked: doc_id % 2 = 0, language: NULL, code: NULL,
       |       expression: NULL, title: NULL, url: NULL,
       |       rich_text: [{plain_text: t[3], bold: false, italic: false, href: NULL}],
       |       children: NULL},
       |      {type: 'bulleted_list_item', checked: NULL, language: NULL, code: NULL,
       |       expression: NULL, title: NULL, url: NULL,
       |       rich_text: [{plain_text: t[4], bold: false, italic: false, href: NULL}],
       |       children: CASE WHEN n >= $ChildrenMinTokens THEN
       |         [{type: 'paragraph',
       |           rich_text: [{plain_text: t[5], bold: false, italic: false, href: NULL}]},
       |          {type: 'paragraph',
       |           rich_text: [{plain_text: t[6], bold: false, italic: false, href: NULL}]}]
       |         ELSE NULL END},
       |      {type: 'code', checked: NULL, language: lang,
       |       code: t[1] || ' ' || t[2] || ' ' || t[3],
       |       expression: NULL, title: NULL, url: NULL, rich_text: NULL, children: NULL},
       |      {type: 'equation', checked: NULL, language: NULL, code: NULL,
       |       expression: 'E=' || n, title: NULL, url: NULL, rich_text: NULL,
       |       children: NULL},
       |      {type: 'divider', checked: NULL, language: NULL, code: NULL,
       |       expression: NULL, title: NULL, url: NULL, rich_text: NULL, children: NULL},
       |      {type: CASE WHEN doc_id % 5 = 0 THEN 'child_page' ELSE 'bookmark' END,
       |       checked: NULL, language: NULL, code: NULL, expression: NULL,
       |       title: CASE WHEN doc_id % 5 = 0 THEN t[1] ELSE NULL END,
       |       url: CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'https://b/' || doc_id END,
       |       rich_text: NULL, children: NULL}
       |    ],
       |    comments: [{rich_text: [{plain_text: t[2]}]},
       |               {rich_text: [{plain_text: t[1]}]}]}) AS j
       |  FROM toks),
       |lines AS (
       |  SELECT doc_id,
       |      [struct_pack(kind := 'block', line :=
       |         '**' || json_extract_string(j, '$$.blocks[0].rich_text[0].plain_text') || '**'
       |         || '[*' || json_extract_string(j, '$$.blocks[0].rich_text[1].plain_text')
       |         || '*](' || json_extract_string(j, '$$.blocks[0].rich_text[1].href') || ')'),
       |       struct_pack(kind := 'block', line :=
       |         CASE WHEN json_extract(j, '$$.blocks[1].checked') = 'true'
       |              THEN '[x] ' ELSE '[ ] ' END
       |         || json_extract_string(j, '$$.blocks[1].rich_text[0].plain_text')),
       |       struct_pack(kind := 'block', line :=
       |         json_extract_string(j, '$$.blocks[2].rich_text[0].plain_text'))]
       |      || CASE WHEN json_array_length(j, '$$.blocks[2].children') IS NOT NULL
       |                AND json_array_length(j, '$$.blocks[2].children') > 0 THEN
       |        [struct_pack(kind := 'block', line :=
       |           json_extract_string(j, '$$.blocks[2].children[0].rich_text[0].plain_text')),
       |         struct_pack(kind := 'block', line :=
       |           json_extract_string(j, '$$.blocks[2].children[1].rich_text[0].plain_text'))]
       |      ELSE [] END
       |      || [struct_pack(kind := 'block', line :=
       |         '[Code: ' || json_extract_string(j, '$$.blocks[3].language') || ']' || chr(10)
       |         || json_extract_string(j, '$$.blocks[3].code')),
       |       struct_pack(kind := 'block', line :=
       |         '[Equation: ' || json_extract_string(j, '$$.blocks[4].expression') || ']'),
       |       struct_pack(kind := 'block', line := '---'),
       |       struct_pack(kind := 'block', line :=
       |         CASE WHEN json_extract_string(j, '$$.blocks[6].type') = 'child_page'
       |              THEN '[Child Page] ' || json_extract_string(j, '$$.blocks[6].title')
       |              ELSE '[Bookmark] ' || json_extract_string(j, '$$.blocks[6].url') END),
       |       struct_pack(kind := 'comment', line :=
       |         json_extract_string(j, '$$.comments[0].rich_text[0].plain_text')),
       |       struct_pack(kind := 'comment', line :=
       |         json_extract_string(j, '$$.comments[1].rich_text[0].plain_text'))] AS ls
       |  FROM page)
       |SELECT doc_id, CAST(pos AS INTEGER) AS pos, e.kind AS kind, e.line AS line
       |FROM (SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS e
       |      FROM lines) u
       |ORDER BY doc_id, pos""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Reference-derived relational operators (SURVEY §2.1–§2.3).
  *
  * The reference (alsyefs/notion) runs these semantics in single-node
  * pandas over a task table; here each is a declarative DataFrame plan
  * bound to the driver testdata (orders = tasks, customer = parents,
  * events = change log — SURVEY §3).
  *
  * Scale notes (SURVEY §5): dims are always `broadcast()`; top-k uses
  * `orderBy.limit` (TakeOrderedAndProject — per-partition heaps, no
  * global sort); keep-last dedup is one shuffle on the entity key.
  */
object TaskAnalytics {

  /** Status normalization map — analyze_pages.py:154-166's
    * status_mapping, re-keyed to o_orderstatus.
    */
  def statusNorm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "O", "open").when(c === "F", "finished").when(c === "P", "pending")
      .otherwise("unknown")

  /** Priority→score map — analyze_pages.py:173-180's priority_map. */
  def prioScore(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "1-URGENT", 0).when(c === "2-HIGH", 1).when(c === "3-MEDIUM", 2)
      .when(c === "4-NOT SPECIFIED", 3).when(c === "5-LOW", 4).otherwise(5)

  private val dstr = (c: org.apache.spark.sql.Column) => date_format(c, "yyyy-MM-dd")

  /** §2.1 #1 — normalize statuses + priority scores (analyze_pages.py:154-180). */
  def normalizeStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        statusNorm(col("o_orderstatus")).as("status"),
        prioScore(col("o_orderpriority")).as("prio_score"),
        dstr(col("o_orderdate")).as("order_date"))
      .orderBy("o_orderkey")

  /** §2.1 #2 — keep-last dedup by entity key on event time
    * (fetch_pages.py:590-604's drop_duplicates(subset=UID, keep=last)).
    * One shuffle on (user_id, event_type); window row_number keeps whole
    * rows without struct packing.
    */
  def dedupKeepLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy("user_id", "event_type")
  }

  val FilterTags: Seq[String] = Seq("spark", "shuffle", "partition")

  /** §2.1 #3 — FILTER_TAGS set-intersection (analyze_pages.py:94-108):
    * keep documents whose token set overlaps the configured tag set.
    */
  def filterTags(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .filter(arrays_overlap(split(col("text"), " "), lit(FilterTags.toArray)))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** §2.1 #4 — summary counts (analyze_pages.py:358-379): one pass,
    * conditional counts (map-side partial agg, single row out).
    */
  def statusSummary(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      count(lit(1)).as("total"),
      count(when(col("o_orderstatus") === "F", 1)).as("finished"),
      count(when(col("o_orderstatus") === "O", 1)).as("open"),
      count(when(col("o_orderstatus") === "P", 1)).as("pending"))

  /** §2.1 #5 — status distribution (analyze_pages.py:466 value_counts). */
  def statusDist(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(statusNorm(col("o_orderstatus")).as("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy("status")

  /** §2.1 #6 — priority distribution with scores (analyze_pages.py:482). */
  def priorityDist(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        prioScore(col("o_orderpriority")).as("prio_score"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("prio_score")

  val OverdueCutoff = "1998-01-01"

  /** §2.1 #7 — overdue = active ∧ due < cutoff (analyze_pages.py:382-393).
    * Filter + projection reach the parquet scan (pushdown).
    */
  def overdue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderdate") < lit(OverdueCutoff).cast("timestamp"))
      .select(col("o_orderkey"), dstr(col("o_orderdate")).as("order_date"),
        col("o_orderpriority").as("priority"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy("order_date", "o_orderkey")

  /** §2.1 #8 — oldest stagnant top-5 (analyze_pages.py:407-419 nsmallest):
    * TakeOrderedAndProject, never a global sort.
    */
  def oldestPending(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), dstr(col("o_orderdate")).as("order_date"),
        col("o_orderpriority").as("priority"))
      .orderBy(col("order_date"), col("o_orderkey"))
      .limit(5)

  /** §2.1 #9 — ranked backlog top-15 by (priority, date)
    * (analyze_pages.py:323-341).
    */
  def backlogRank(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        prioScore(col("o_orderpriority")).as("prio_score"),
        dstr(col("o_orderdate")).as("order_date"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy(col("prio_score"), col("order_date"), col("o_orderkey"))
      .limit(15)

  /** §2.1 #10 — weekly completion velocity (analyze_pages.py:438
    * resample("W-MON")): date_trunc('week') groupBy count; one shuffle on
    * the (low-cardinality) week key.
    */
  def weeklyVelocity(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(dstr(date_trunc("week", col("o_orderdate"))).as("week"))
      .agg(count(lit(1)).as("n_completed"))
      .orderBy("week")

  val PeriodStart = "1997-01-01"
  val PeriodEnd = "1997-06-30"

  /** §2.1 #11 — period-window report (generate_reports.py:353-412):
    * completed-in-[start,end] per priority.
    */
  def periodReport(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= lit(PeriodStart).cast("timestamp") &&
        col("o_orderdate") <= lit(PeriodEnd).cast("timestamp"))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("priority")

  /** §2.1 #12 — parent-name lookup + group-by-parent sections
    * (generate_reports.py:320 nid_to_name + :469 groupings). The parent
    * table is bounded → broadcast join, fact table never shuffles for the
    * join (only for the final agg).
    */
  def parentJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("c_custkey")

  /** §2.1 #13 — container hierarchy rollup (analyze_pages.py:183-190's
    * parent/child containers): region→nation→customer→orders, dims
    * broadcast, single fact shuffle for the agg.
    */
  def hierarchyRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(countDistinct(col("c_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("r_name", "n_name")

  val ProjectMinOrders = 12

  /** §2.1 #14 — Is_Project flag = has-children (analyze_pages.py:183-190):
    * customers flagged by order count ≥ threshold; left join keeps
    * childless parents (pandas `has_children` false case).
    */
  def projectFlags(s: SparkSession, dir: String): DataFrame = {
    // counts is customer-cardinality (bounded) → broadcast as the build
    // side; left-outer joins can only build the right side.
    val counts = Tables.orders(s, dir).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, dir).select("c_custkey", "c_name")
      .join(broadcast(counts), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        (coalesce(col("n_orders"), lit(0L)) >= ProjectMinOrders).as("is_project"))
      .orderBy("c_custkey")
  }

  /** §2.1 #15 — clean_text + truncate_text (text_style.py:103-149). */
  def cleanTruncate(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .select(col("doc_id"), truncateText(cleanText(col("text")), 60).as("clean_text"))
      .orderBy("doc_id")

  /** §2.1 #16 — uncategorized = status ∉ known set (analyze_pages.py:224-262). */
  def uncategorized(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(!col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderkey"), col("o_orderstatus").as("status"))
      .orderBy("o_orderkey")

  val FocusToday = "1998-01-01"

  /** §2.1 #16b — weekly focus (analyze_pages.py:281-341): classify open
    * items into IMMEDIATE (overdue), DUE_WEEK (next 7 days), BACKLOG
    * (rest), ranked within section by (priority, date). Single scan,
    * one case-map — the reference's three filtered passes fused.
    */
  def weeklyFocus(s: SparkSession, dir: String): DataFrame = {
    val today = lit(FocusToday).cast("timestamp")
    val nextWeek = lit("1998-01-08").cast("timestamp")
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        when(col("o_orderdate") < today, "1_IMMEDIATE")
          .when(col("o_orderdate") < nextWeek, "2_DUE_WEEK")
          .otherwise("3_BACKLOG").as("section"),
        prioScore(col("o_orderpriority")).as("prio_score"),
        dstr(col("o_orderdate")).as("order_date"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("section").orderBy(
          col("prio_score"), col("order_date"), col("o_orderkey"))))
      .filter(col("rank") <= 15)
      .select("section", "rank", "o_orderkey", "prio_score", "order_date")
      .orderBy("section", "rank")
  }

  // ---- §2.2 headline analytics ------------------------------------------

  val Q1Cutoff = "1998-09-02"

  /** §2.2 #17 — TPC-H Q1-style pricing summary: the whole-stage-codegen
    * workhorse; single scan, map-side partial agg, 2-key shuffle.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit(Q1Cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val Q3Segment = "BUILDING"
  val Q3Date = "1997-06-01"

  /** §2.2 #18 — top-revenue orders (TPC-H Q3 shape): only the customer
    * DIM is broadcast-hinted; the filtered orders side is fact-derived
    * (O(orders), unbounded at scale), so its join with lineitem is left
    * to the planner — AQE picks broadcast when the runtime size allows
    * and sort-merge when it doesn't, instead of an explicit hint forcing
    * a driver OOM at 100 TB. One fact shuffle for the orderkey agg,
    * top-10 via TakeOrdered.
    */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === Q3Segment)
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit(Q3Date).cast("timestamp"))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit(Q3Date).cast("timestamp"))
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), dstr(col("o_orderdate")).as("order_date"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val Q5Year = 1997

  /** §2.2 #19 — per-nation order volume rollup (TPC-H Q5 shape):
    * region→nation→customer broadcast chain over the fact join.
    */
  def q5RegionVolume(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      // range predicate (not year()) so it pushes down to the parquet scan
      .join(Tables.orders(s, dir).filter(
          col("o_orderdate") >= lit(s"$Q5Year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${Q5Year + 1}-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("r_name", "n_name")

  // ---- §2.3 events (batch variants; streaming in graft.streaming) -------

  val SessionGapMin = 30

  /** §2.3 #20 — gap-based sessionization: session starts when the gap to
    * the previous event exceeds 30 min; session id = running sum of
    * boundary flags. One shuffle on user_id; both window functions reuse
    * the same partitioning.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapMin * 60 * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("boundary").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        round(sum("value"), 2).as("value_sum"))
      .orderBy("user_id", "session_id")
  }

  /** §2.3 #20b — gap sessionization via Spark's native session_window
    * (the streaming-capable built-in; same semantics as the lag+cumsum
    * form, state-store-backed when run on a stream).
    */
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), s"$SessionGapMin minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("value_sum"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("value_sum"))
      .orderBy("user_id", "session_start")

  /** §2.3 #21 — tumbling-window per-type aggregation (batch twin of the
    * streaming watermark+window query).
    */
  def eventWindowAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .orderBy("hour", "event_type")

  /** §2.3 #22 — nested-JSON property extraction (fetch_pages.py:311-324
    * safe_get paths): get_json_object stays codegen'd.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        // schema-driven from_json: one parse per row (get_json_object
        // re-parses per path and is regex-driven — measurably slower)
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")

  /** §2.3 #22b — DEEP nested-JSON normalization, the reference's actual
    * ingest shape (fetch_pages.py:311-324 `safe_get` multi-level paths,
    * the property-parsing loops ~:330-460: select name, multi_select
    * tag list, rich-text title array → styled-run markdown). A
    * reference-shaped page object is synthesized per document (Status
    * absent for every 7th doc, Tags absent for short docs — exercising
    * null-safe extraction), serialized with `to_json`, then parsed back
    * through `from_json` with the full nested struct/array schema:
    *   $.properties.Status.select.name        (missing-path safe_get)
    *   $.properties.Tags.multi_select[].name  (array-of-struct tags)
    *   $.properties.Name.title[]              (posexplode of rich-text
    *     runs, bold runs wrapped **…**, reassembled in position order)
    * Everything is per-row map-side work except one groupBy(doc_id) to
    * reassemble the exploded runs — the shape of a 100 TB ingest.
    */
  def jsonNormalize(s: SparkSession, dir: String): DataFrame = {
    val pageSchema =
      "id BIGINT, properties STRUCT<" +
        "Status: STRUCT<select: STRUCT<name: STRING>>, " +
        "Tags: STRUCT<multi_select: ARRAY<STRUCT<name: STRING>>>, " +
        "Name: STRUCT<title: ARRAY<STRUCT<plain_text: STRING, bold: BOOLEAN>>>>"
    val d = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
    val page = d.select(col("doc_id"),
      to_json(struct(
        col("doc_id").as("id"),
        struct(
          when(col("doc_id") % 7 =!= 0,
            struct(struct(col("lang").as("name")).as("select"))).as("Status"),
          when(size(col("toks")) >= 2,
            struct(transform(slice(col("toks"), 1, 2),
              t => struct(t.as("name"))).as("multi_select"))).as("Tags"),
          struct(transform(slice(col("toks"), 1, 3),
            (t, i) => struct(t.as("plain_text"), (i % 2 === 1).as("bold")))
            .as("title")).as("Name")
        ).as("properties"))).as("page_json"))
    val parsed = page.select(col("doc_id"),
      from_json(col("page_json"), org.apache.spark.sql.types.StructType.fromDDL(pageSchema)).as("p"))
    val runs = parsed.select(col("doc_id"),
        coalesce(col("p.properties.Status.select.name"), lit("none")).as("status"),
        when(col("p.properties.Tags.multi_select").isNull, lit(0))
          .otherwise(size(col("p.properties.Tags.multi_select"))).cast("int").as("n_tags"),
        coalesce(col("p.properties.Tags.multi_select").getItem(0).getField("name"), lit(""))
          .as("first_tag"),
        posexplode_outer(col("p.properties.Name.title")).as(Seq("pos", "seg")))
      .withColumn("md",
        when(col("seg.bold"), concat(lit("**"), col("seg.plain_text"), lit("**")))
          .otherwise(col("seg.plain_text")))
    runs.groupBy("doc_id", "status", "n_tags", "first_tag")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("md")))),
        x => x.getField("md")), "").as("title_md"))
      .orderBy("doc_id")
  }

  /** Markdown → styled runs (generate_reports.py:106-124
    * `render_markdown`: split on `**`, alternate regular/bold by
    * segment parity). A bold-marked line is synthesized from each
    * document's tokens (every 2nd of the first 5 tokens bolded), then
    * `split` + `posexplode` turns it into (run_idx, run_text, is_bold)
    * rows — pure map-side string work, the renderer-feeding shape.
    */
  def markdownRuns(s: SparkSession, dir: String): DataFrame = {
    val md = Tables.documentsSpread(s, dir)
      .select(col("doc_id"),
        array_join(transform(slice(tokens(col("text")), 1, 5),
          (t, i) => when(i % 2 === 1, concat(lit("**"), t, lit("**"))).otherwise(t)),
          " ").as("md"))
    md.select(col("doc_id"), posexplode(split(col("md"), "\\*\\*")).as(Seq("run_idx", "run_text")))
      .filter(col("run_text") =!= "")
      .select(col("doc_id"), col("run_idx"), col("run_text"),
        (col("run_idx") % 2 === 1).as("is_bold"))
      .orderBy("doc_id", "run_idx")
  }

  /** Active-projects view (analyze_pages.py:344-355: the project flag ∧
    * active status, with the distinct attribute list per parent):
    * customers qualifying as projects (≥ 12 orders) that still have
    * open orders, with the sorted distinct open-order priorities. One
    * aggregation over the fact table, then a broadcast-sized join to
    * names.
    */
  def activeProjects(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        array_join(array_sort(collect_set(
          when(col("o_orderstatus") === "O", col("o_orderpriority")))), ",")
          .as("open_prios"))
      .filter(col("n_orders") >= ProjectMinOrders && col("n_open") > 0)
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "n_orders", "n_open", "open_prios")
      .orderBy("c_custkey")
}

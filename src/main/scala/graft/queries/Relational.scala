package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ColSyntax._
import Tables.t

/** The reference's relational operator inventory (SURVEY.md §2) re-expressed
  * as declarative Spark plans over the driver test tables.
  *
  * Each method cites the reference pattern it reproduces. All are pure
  * DataFrame plans: Catalyst pushes filters/projections to the parquet scan,
  * picks broadcast vs shuffle joins, and AQE handles skew — nothing here
  * collects to the driver, so every plan scales with partition count.
  */
object Relational {

  /** Flagship pricing-summary aggregation (shape of the per-language result
    * summary A3 / frequency aggregations A1; reference
    * test_wikipedia_page_images.py:133-137). Map-side partial aggregation
    * makes the single shuffle carry only (group, partials). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** J1/J2 — exclusion anti-join: frontier rows not present in any
    * earlier-precedence table (wikipedia_crawler.py:71-79, NOT IN chain).
    * left_anti ≡ NOT IN only when BOTH sides are null-filtered (one NULL in
    * the subquery makes SQL NOT IN return zero rows), so the subquery side
    * carries its own isNotNull — the equivalence holds by construction,
    * exactly like the reference's exclusion subqueries
    * (wikipedia_crawler.py:76-79: `WHERE ID_WIKIDATA IS NOT NULL`). */
  def antiJoinExclusion(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders   = t(spark, dir, "orders")
    customer
      .filter($"c_custkey".isNotNull)
      .join(
        orders.filter($"o_totalprice" > 400000 && $"o_custkey".isNotNull)
          .select($"o_custkey".as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
  }

  /** J2 window rewrite — the 20-family precedence chain collapsed to ONE
    * shuffle: keep-first per key in precedence order, replacing 19 chained
    * NOT IN anti-joins (SURVEY.md §2.3 J2).
    *
    * r6 optimization (guide §2.3 "aggregate before you shuffle"): the
    * row_number window (Sort → WindowGroupLimit → Exchange → Sort → Window)
    * becomes ONE aggregation — min over struct(ts, event_id, event_type)
    * is the lexicographically-first row under EXACTLY the old window order
    * (ts asc, event_id asc; event_id is unique in the events table —
    * RelationalSpec pins it — so the event_type field is never reached as
    * a comparator). The partial map-side min collapses each partition to
    * ≤ |users| rows BEFORE the exchange and the Window machinery is gone;
    * struct buffers plan as SortAggregate, so the remaining local sort is
    * on the group key alone instead of the full window order. Result is
    * row-identical (same DuckDB oracle). */
  def precedenceDedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy($"user_id")
      .agg(min(struct($"ts", $"event_id", $"event_type")).as("__first"))
      .select($"user_id", $"__first.event_id".as("event_id"),
        $"__first.event_type".as("event_type"))

  /** J6/W3 — keep-newest-per-key dedup
    * (migrations/add_unique_section_image_keys.py:115-141): keep-newest
    * replaces the reference's self-join against MAX(ID_ROW).
    *
    * r6 optimization (guide §2.3): the row_number-desc window becomes ONE
    * aggregation — max over struct(l_linenumber, l_partkey, l_suppkey)
    * selects the lexicographic max, which is exactly the rn=1 row of the
    * old (desc, desc, desc) window; the projection only reads the sort
    * columns, so even a full three-way tie projects identically. The old
    * plan sorted all 600k rows by the 4-key window order, shuffled the
    * per-partition survivors, and sorted again; the agg shuffles only
    * map-side partial maxima (≤ |keys| rows per map task) and its
    * SortAggregate sorts by the group key alone. */
  def keepLatest(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(max(struct($"l_linenumber", $"l_partkey", $"l_suppkey")).as("__last"))
      .select($"l_orderkey", $"__last.l_linenumber".as("l_linenumber"),
        $"__last.l_partkey".as("l_partkey"))

  /** A1 — shared-image frequency aggregation
    * (migrations/clear_shared_main_images.py:78-93):
    * GROUP BY url, COUNT(DISTINCT id) HAVING cnt >= min ORDER BY cnt DESC. */
  def freqAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(countDistinct($"l_orderkey").as("cnt"))
      .filter($"cnt" >= 3)

  /** A2 — duplicate-group count, nested aggregation
    * (migrations/add_unique_section_image_keys.py:89-112). */
  def dupGroupCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("c"))
      .filter($"c" > 1)
      .agg(count(lit(1)).as("dup_groups"), sum($"c" - 1).as("excess_rows"))

  /** A3 — per-language result summary (test_wikipedia_page_images.py:133-137). */
  def groupCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))

  /** A4 — staleness ordering aggregation (README.md:422,
    * wikipedia_crawler.py:45-69): MAX(updated) per item type, never-crawled
    * (null) first — drives quick-mode crawl order. */
  def stalenessOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Never-crawled item types = two literal dimension rows with no
    // crawl-log rows at all (the reference's LEFT-JOIN-shaped NULL max,
    // wikipedia_crawler.py:45-47: "Tables never crawled first"); they must
    // sort FIRST, stalest next. The ORDER is the operator's point (it
    // drives quick-mode crawl order), so the output carries an explicit
    // crawl_rank column — the order-insensitive driver compare still pins it.
    val crawled = t(spark, dir, "events")
      .groupBy($"event_type")
      .agg(max($"ts").as("max_ts_raw"))
    val neverCrawled = Seq("backfill", "migration").toDF("event_type")
      .withColumn("max_ts_raw", lit(null).cast("timestamp"))
    // 7 rows total: a global window is a deliberate single partition here
    val w = Window.orderBy($"max_ts_raw".asc_nulls_first, $"event_type".asc)
    crawled.unionByName(neverCrawled)
      .withColumn("crawl_rank", row_number().over(w))
      .select($"crawl_rank", $"event_type",
        date_format($"max_ts_raw", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ts"))
  }

  /** W4 — top-N reporting (clear_shared_main_images.py:129-132): Spark plans
    * this as TakeOrderedAndProject — no full sort, no full shuffle. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", round($"o_totalprice", 2).as("o_totalprice"))

  /** S1+P1+P2+P3+W1 — the frontier scan pattern: projection+rename, DISTINCT,
    * validity filter, resume range predicate (wikipedia_crawler.py:86-95).
    * The range predicate prunes row groups at the parquet scan. */
  def rangeResume(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter($"o_orderkey".isNotNull && $"o_orderkey" >= 1000)
      .select($"o_orderkey".as("id"), $"o_custkey")
      .distinct()

  /** J5 — backfill join (migrations/add_main_image_url_to_page_lang.py:185-195):
    * aggregate + equi-join + conditional update. The aggregated side is tiny →
    * broadcast-hash join, zero shuffle of the big side. */
  def backfillJoin(spark: SparkSession, dir: String): DataFrame = {
    val minPrice = t(spark, dir, "orders")
      .groupBy($"o_custkey".as("c_custkey"))
      .agg(round(min($"o_totalprice"), 2).as("min_price"))
    t(spark, dir, "customer")
      .join(broadcast(minPrice), Seq("c_custkey"), "left")
      .select(
        $"c_custkey",
        round(when($"c_acctbal" < 0, $"min_price").otherwise($"c_acctbal"), 2)
          .as("backfilled_bal"))
  }

  /** W2 — display-order assignment (wikipedia_images.py:684-693): dense
    * 1-based order within each document via row_number. */
  def displayOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber".asc)
    t(spark, dir, "lineitem")
      .withColumn("display_order", row_number().over(w))
      .select($"l_orderkey", $"l_linenumber", $"display_order")
  }

  /** P1+F regex battery — Qid-validity shape (ID_WIKIDATA REGEXP '^Q[0-9]+$',
    * wikipedia_crawler.py:90-91) + extraction, over the events JSON props. */
  def regexFilterExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter($"props".isNotNull && $"props".rlike("^\\{\"k\": [0-9]+\\}$"))
      .select($"event_id", regexp_extract($"props", "([0-9]+)", 1).cast("int").as("k"))
      .filter($"k" >= 50)

  /** F1-F6 — URL/string canonicalization built-ins: space→underscore
    * (translate), query-string strip (substring_index), namespace strip,
    * lowercase (wikipedia_images.py:84-88,192-205). */
  def strCanon(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        $"p_partkey",
        translate($"p_name", " ", "_").as("name_us"),
        substring_index($"p_type", " ", 1).as("type_head"),
        lower($"p_brand").as("brand_lc"))

  /** Semi-structured extraction: the engine's JSON path (API payloads in
    * flight are JSON, SURVEY.md §1.2) — get_json_object + typed cast +
    * aggregation over the extracted value. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        round(avg($"k"), 6).as("avg_k"))

  /** Hourly windowed aggregation over the events table — the batch twin of
    * the Structured Streaming tumbling-window aggregation in
    * graft.streaming (same grouping keys and aggregates). */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))

  /** Batch twin of the streaming sessionization
    * (graft.streaming.StreamingOps.sessionize — flatMapGroupsWithState):
    * a session closes after >30 min of event-time inactivity, events
    * ordered by (ts, event_id), gap compared in integer milliseconds
    * exactly as the stateful op does. Declarative form: lag + running sum
    * of session starts, then one aggregate — the lag window, the running
    * sum, AND the groupBy(user_id, session_id) all cluster by user_id, so
    * the whole plan rides ONE exchange. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val gapMs = 30L * 60L * 1000L
    t(spark, dir, "events")
      // parquet infers TIMESTAMP_NTZ; unix_millis needs TIMESTAMP (the
      // session zone is pinned UTC, so the cast is a pure reinterpret)
      .withColumn("ts_ms", unix_millis($"ts".cast("timestamp")))
      .withColumn("new_sess",
        when(lag($"ts_ms", 1).over(w).isNull ||
          $"ts_ms" - lag($"ts_ms", 1).over(w) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("total_value"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("started"),
        date_format(max($"ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ended"))
  }

  /** W5 — chunking (paging): the reference batches every write path into
    * fixed-size sequential chunks (frontier chunks of 50
    * `wikipedia_crawler.py:808-810`, upsert chunks of 500
    * `citizenphil.py:344-345`, delete chunks of 5000
    * `add_unique_section_image_keys.py:69,147-158`). Distributed twin: a
    * single process chunks ONE global sequence; a cluster chunks one
    * sequence PER writer bucket — chunk identity = (bucket, ⌊(rank-1)/N⌋)
    * with rank over the in-bucket upsert order, a bucket-partitioned
    * window (one shuffle, no global sort; the physical file-batching half
    * of W5 is the crawl writer's maxRecordsPerFile). Every chunk except a
    * bucket's last has exactly N rows, chunks are contiguous in key order
    * — the per-chunk fingerprint over the ordered member keys pins both,
    * recomputed independently by the DuckDB twin. */
  def chunkUpsert(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"bucket").orderBy($"o_orderkey".asc)
    t(spark, dir, "orders")
      .select($"o_orderkey", pmod($"o_orderkey", lit(8)).as("bucket"))
      .withColumn("chunk_id", floor((row_number().over(w) - 1) / 500))
      .groupBy($"bucket", $"chunk_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"),
        md5(concat_ws("\u0001",
          transform(sort_array(collect_list($"o_orderkey")), _.cast("string"))))
          .as("keys_fp"))
  }

  /** U1 — union by precedence: the reference's multi-family run processes
    * family frontiers sequentially, earlier families shadowing later ones
    * (the EXCEPT-by-precedence chain, SURVEY.md §2 U1/J2). Distributed
    * twin: `unionByName` over per-family legs tagged with their precedence
    * rank — by NAME, so each leg's column order is irrelevant (the legs
    * below deliberately differ) — then ONE precedence window keeps the
    * best-ranked row per key, exactly the J2 rewrite applied to the
    * unioned set. */
  def unionPrecedence(spark: SparkSession, dir: String): DataFrame = {
    def leg(status: String, rank: Int): DataFrame = {
      val o = t(spark, dir, "orders").filter($"o_orderstatus" === status)
      // distinct column orders per leg: unionByName must align by name
      if (rank == 0)
        o.select($"o_custkey", $"o_orderkey", lit(rank).as("family_rank"))
      else
        o.select(lit(rank).as("family_rank"), $"o_orderkey", $"o_custkey")
    }
    val unioned = leg("F", 0).unionByName(leg("O", 1)).unionByName(leg("P", 2))
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"family_rank".asc, $"o_orderkey".asc)
    unioned
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"family_rank", $"o_orderkey")
  }

  /** S2 — constant-row source: the reference's `other` family frontier is a
    * one-row literal relation (`SELECT 'Q1204187' ... FROM DUAL`,
    * wikipedia_crawler.py:316-325). Here the literal row is a real source
    * in a plan — a local relation Catalyst broadcasts into the join (the
    * crawl engine's own instance is the robots rules dimension,
    * Crawl.robotsDim). */
  def constSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val const = Seq(("Q1204187", 400000.0)).toDF("qid", "threshold")
    t(spark, dir, "orders")
      .join(broadcast(const), $"o_totalprice" > $"threshold")
      .groupBy($"qid")
      .agg(count(lit(1)).as("n_above"),
        round(max($"o_totalprice"), 2).as("max_price"))
  }

  /** F5 — thumb-prefix strip (wikipedia_images.py:239-242) under the
    * driver signal: deterministic filename variants derived from the
    * documents table — a width prefix, a language-variant width prefix,
    * the bare name, and two prefix LOOKALIKES that must NOT strip (no
    * trailing dash; `px-` with no digits) — stripped with the SAME
    * pattern the chrome predicate compiles ([[graft.parse.UiChrome
    * .ThumbPrefixRegex]]); the DuckDB twin re-applies the rule with its
    * own regex engine. */
  def thumbStrip(spark: SparkSession, dir: String): DataFrame = {
    val name = concat(lit("File_"), $"doc_id", lit(".png"))
    t(spark, dir, "documents")
      .select($"doc_id", explode(array(
        concat(lit("320px-"), name),
        concat(lit("langfr-240px-"), name),
        name,
        concat(lit("320px"), name),
        concat(lit("px-"), name))).as("variant"))
      .withColumn("stripped",
        regexp_replace($"variant", graft.parse.UiChrome.ThumbPrefixRegex, ""))
      .withColumn("was_prefixed", $"variant" =!= $"stripped")
  }

  /** DuckDB oracle SQL — one entry per query above, same column names. */
  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_anti_join_exclusion" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IS NOT NULL
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |    WHERE o_totalprice > 400000 AND o_custkey IS NOT NULL)""".stripMargin,
    "q_precedence_dedup" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_keep_latest" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,
    "q_freq_agg" ->
      """SELECT l_partkey, count(DISTINCT l_orderkey) AS cnt
        |FROM lineitem GROUP BY l_partkey HAVING count(DISTINCT l_orderkey) >= 3""".stripMargin,
    // CAST the integer sums: DuckDB's sum(int) is HUGEINT (int128) while
    // Spark's is BIGINT — same values, hash-mismatching representations
    "q_dup_group_count" ->
      """SELECT count(*) AS dup_groups, CAST(sum(c - 1) AS BIGINT) AS excess_rows FROM (
        |  SELECT o_custkey, count(*) AS c FROM orders GROUP BY o_custkey HAVING count(*) > 1)""".stripMargin,
    "q_group_count" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_staleness_order" ->
      """SELECT row_number() OVER (ORDER BY max_ts_raw ASC NULLS FIRST, event_type ASC)
        |    AS crawl_rank,
        |  event_type, strftime(max_ts_raw, '%Y-%m-%d %H:%M:%S.%f') AS max_ts
        |FROM (
        |  SELECT event_type, max(ts) AS max_ts_raw FROM events GROUP BY event_type
        |  UNION ALL
        |  SELECT * FROM (VALUES ('backfill', NULL::TIMESTAMP),
        |                        ('migration', NULL::TIMESTAMP)))""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_range_resume" ->
      """SELECT DISTINCT o_orderkey AS id, o_custkey FROM orders
        |WHERE o_orderkey IS NOT NULL AND o_orderkey >= 1000""".stripMargin,
    "q_backfill_join" ->
      """SELECT c.c_custkey,
        |  round(CASE WHEN c.c_acctbal < 0 THEN g.min_price ELSE c.c_acctbal END, 2)
        |    AS backfilled_bal
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey AS c_custkey, round(min(o_totalprice), 2) AS min_price
        |  FROM orders GROUP BY o_custkey) g ON c.c_custkey = g.c_custkey""".stripMargin,
    "q_display_order" ->
      """SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC)
        |    AS display_order
        |FROM lineitem""".stripMargin,
    "q_regex_filter_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
        |FROM events
        |WHERE props IS NOT NULL AND regexp_full_match(props, '\{"k": [0-9]+\}')
        |  AND CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) >= 50""".stripMargin,
    "q_str_canon" ->
      """SELECT p_partkey, replace(p_name, ' ', '_') AS name_us,
        |  split_part(p_type, ' ', 1) AS type_head, lower(p_brand) AS brand_lc
        |FROM part""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  round(avg(k), 6) AS avg_k
        |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
        |      FROM events)
        |WHERE k IS NOT NULL GROUP BY event_type""".stripMargin,
    "q_hourly_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_chunk_upsert" ->
      """SELECT bucket, chunk_id, count(*) AS n_rows,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  md5(string_agg(CAST(o_orderkey AS VARCHAR), chr(1) ORDER BY o_orderkey))
        |    AS keys_fp
        |FROM (
        |  SELECT o_orderkey, o_orderkey % 8 AS bucket,
        |    CAST((row_number() OVER (PARTITION BY o_orderkey % 8
        |        ORDER BY o_orderkey ASC) - 1) // 500 AS BIGINT) AS chunk_id
        |  FROM orders)
        |GROUP BY bucket, chunk_id""".stripMargin,
    "q_union_precedence" ->
      """SELECT o_custkey, family_rank, o_orderkey FROM (
        |  SELECT o_custkey, family_rank, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY family_rank ASC, o_orderkey ASC) AS rn
        |  FROM (
        |    SELECT o_custkey, o_orderkey, 0 AS family_rank FROM orders
        |      WHERE o_orderstatus = 'F'
        |    UNION ALL
        |    SELECT o_custkey, o_orderkey, 1 FROM orders WHERE o_orderstatus = 'O'
        |    UNION ALL
        |    SELECT o_custkey, o_orderkey, 2 FROM orders WHERE o_orderstatus = 'P'))
        |WHERE rn = 1""".stripMargin,
    "q_const_source" ->
      """SELECT c.qid, count(*) AS n_above, round(max(o.o_totalprice), 2) AS max_price
        |FROM (SELECT 'Q1204187' AS qid, 400000 AS threshold) c
        |JOIN orders o ON o.o_totalprice > c.threshold
        |GROUP BY c.qid""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS started,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS ended
        |FROM (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts, value,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) IS NULL
        |        OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id)) > 1800000
        |      THEN 1 ELSE 0 END AS new_sess
        |    FROM events))
        |GROUP BY user_id, session_id""".stripMargin,
    "q_thumb_strip" ->
      """SELECT doc_id, variant,
        |  regexp_replace(variant, '^(lang[a-z-]+-)?\d+px-', '') AS stripped,
        |  variant <> regexp_replace(variant, '^(lang[a-z-]+-)?\d+px-', '')
        |    AS was_prefixed
        |FROM (
        |  SELECT doc_id, unnest([
        |    '320px-' || name, 'langfr-240px-' || name, name,
        |    '320px' || name, 'px-' || name]) AS variant
        |  FROM (SELECT doc_id, 'File_' || doc_id || '.png' AS name
        |        FROM documents))""".stripMargin
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_anti_join_exclusion" -> (antiJoinExclusion _),
    "q_precedence_dedup" -> (precedenceDedup _),
    "q_keep_latest" -> (keepLatest _),
    "q_freq_agg" -> (freqAgg _),
    "q_dup_group_count" -> (dupGroupCount _),
    "q_group_count" -> (groupCount _),
    "q_staleness_order" -> (stalenessOrder _),
    "q_topk" -> (topK _),
    "q_range_resume" -> (rangeResume _),
    "q_backfill_join" -> (backfillJoin _),
    "q_display_order" -> (displayOrder _),
    "q_regex_filter_extract" -> (regexFilterExtract _),
    "q_str_canon" -> (strCanon _),
    "q_json_extract" -> (jsonExtract _),
    "q_hourly_agg" -> (hourlyAgg _),
    "q_chunk_upsert" -> (chunkUpsert _),
    "q_union_precedence" -> (unionPrecedence _),
    "q_const_source" -> (constSource _),
    "q_sessionize" -> (sessionize _),
    "q_thumb_strip" -> (thumbStrip _)
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CleanFns._

/** The reference-surface query inventory (SURVEY.md §2 / §7.4),
  * re-expressed over the driver testdata tables. Each query is the
  * Spark-first form of a reference operator; citations are to
  * /root/reference/main.py. Everything is declarative DataFrame code —
  * Catalyst handles pushdown/pruning/broadcast selection; no UDFs, no
  * driver-side row loops, so every query scales by partitions alone.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  import Query.dsum

  val all: Seq[Query] = Seq(

    // S1 — CSV/parquet scan with projection (main.py:199-202).
    Query("q01_scan", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")),

    // S8/O2 — deterministic limit (sample sink, main.py:636-641).
    Query("q02_limit", Some(
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 1000"))(
      (s, dir) =>
        t(s, dir, "orders").select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey").limit(1000)),

    // S9/A1 — per-column distinct values, dropna (main.py:458-473).
    Query("q03_distinct", Some(
      """SELECT DISTINCT l_returnflag FROM lineitem
        |WHERE l_returnflag IS NOT NULL ORDER BY l_returnflag""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem").select("l_returnflag").na.drop().distinct()
          .orderBy("l_returnflag")),

    // O1 — sort by derived length key, desc (main.py:339-340).
    Query("q04_sort_by_length", Some(
      """SELECT p_partkey, p_name, LENGTH(p_name) AS name_len
        |FROM part ORDER BY name_len DESC, p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), col("p_name"),
            length(col("p_name")).as("name_len"))
          .orderBy(col("name_len").desc, col("p_partkey"))),

    // P1 — metadata-driven projection (main.py:254-270): column list is
    // data (comes from the STM at runtime), not code.
    Query("q05_project", Some(
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey"))(
      (s, dir) => {
        val inScope = Seq("c_custkey", "c_name", "c_mktsegment")
        t(s, dir, "customer").select(inScope.map(col): _*).orderBy("c_custkey")
      }),

    // P2 — populated filter (main.py:324, 495).
    Query("q06_filter_notnull", Some(
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> ''
        |ORDER BY c_custkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer").filter(isPopulated(col("c_mktsegment")))
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")),

    // P3 — any-column case-insensitive substring match + exemption
    // (main.py:281-285): native exists(array(...)), no UDF.
    Query("q07_row_contains", Some(
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE (contains(lower(CAST(p_name AS VARCHAR)), 'old')
        |    OR contains(lower(CAST(p_type AS VARCHAR)), 'old'))
        |  AND p_name <> 'cold rod'
        |ORDER BY p_partkey""".stripMargin))(
      (s, dir) => {
        val p = t(s, dir, "part")
        p.filter(anyColContains(Seq(col("p_name"), col("p_type")), "old")
            && col("p_name") =!= "cold rod")
          .select("p_partkey", "p_name", "p_type").orderBy("p_partkey")
      }),

    // P4/F3 — isin fix-up list → blank (main.py:404-406, 447-448).
    Query("q08_isin", Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN ''
        |       ELSE o_orderpriority END AS prio_clean
        |FROM orders ORDER BY o_orderkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            blankIfIn(col("o_orderpriority"), Seq("1-URGENT", "2-HIGH"))
              .as("prio_clean"))
          .orderBy("o_orderkey")),

    // P5 — anchored regex match (main.py:390).
    Query("q09_rlike", Some(
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '^.*t$') ORDER BY p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part").filter(col("p_name").rlike("^.*t$"))
          .select("p_partkey", "p_name").orderBy("p_partkey")),

    // P6 — contains + single-value exemption (main.py:381-382).
    Query("q10_contains", Some(
      """SELECT p_partkey, p_name FROM part
        |WHERE contains(p_name, 'id') AND p_name <> 'small widget'
        |ORDER BY p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_name").contains("id") && col("p_name") =!= "small widget")
          .select("p_partkey", "p_name").orderBy("p_partkey")),

    // J1 — broadcast left equi join against a mapping table, unmatched
    // → '' (religion cleanup, main.py:426-433).
    Query("q11_left_join_map", Some(
      """SELECT c_custkey, c_name, COALESCE(n_name, '') AS nation_clean
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin))(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            fillEmpty(col("n_name")).as("nation_clean"))
          .orderBy("c_custkey")
      }),

    // J2 — per-column mapping join where unmatched keys get BLANKED
    // (reference semantics, main.py:436-451: replacement, not default).
    Query("q12_left_join_email", Some(
      """SELECT c_custkey, COALESCE(m.n_name, '') AS mapped
        |FROM customer c
        |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 10) m
        |  ON c.c_nationkey = m.n_nationkey
        |ORDER BY c_custkey""".stripMargin))(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val m = t(s, dir, "nation").filter(col("n_nationkey") < 10)
        c.join(broadcast(m), c("c_nationkey") === m("n_nationkey"), "left")
          .select(col("c_custkey"), fillEmpty(m("n_name")).as("mapped"))
          .orderBy("c_custkey")
      }),

    // J3 — anti join / test-row removal (main.py:287-288): customers
    // with no urgent order (the filter keeps the result non-empty, so
    // the oracle check is non-vacuous).
    Query("q13_anti_join", Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin))(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    // Large-large shuffle join + aggregation — not in the reference
    // (all its joins broadcast); declared to prove the non-broadcast
    // path (SURVEY.md §2.3).
    Query("q14_join_large", Some(
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))(
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("rev"))
          .orderBy("o_orderpriority")
      }),

    // A2 — count (main.py:213, 290).
    Query("q15_count", Some("SELECT COUNT(*) AS cnt FROM lineitem"))(
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // Grouped aggregation (TPC-H Q1 shape) — the scale form of the
    // reference's distinct-value extraction (SURVEY.md §2.4). Averages
    // via exact decimal sum / count so partial-agg order can't drift.
    Query("q16_groupby", Some(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))(
      (s, dir) =>
        t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            round(sum(col("l_discount").cast("decimal(18,4)")).cast("double")
              / count(lit(1)), 6).as("avg_disc"))
          .orderBy("l_returnflag", "l_linestatus")),

    // Keep-latest dedup via row_number window (SURVEY.md §2.5). events.ts
    // is read as an ns-epoch long (Tables.scala); DuckDB truncates the
    // same parquet column to µs, so both sides order/compare on the µs
    // value with event_id as the total-order tiebreak.
    Query("q17_window_rownum", Some(
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin))(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts_us"))
          .orderBy("user_id")
      }),

    // O3 — top-k (Spark plans TakeOrderedAndProject: per-partition heap,
    // no global sort — the 100 TB-safe form).
    Query("q18_topk", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))(
      (s, dir) =>
        t(s, dir, "orders").select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)),

    // U1 — EXCEPT (schema-reconciliation analogue, main.py:226-247).
    Query("q19_except", Some(
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10
        |ORDER BY k""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("k"))
          .except(t(s, dir, "nation").filter(col("n_nationkey") < 10)
            .select(col("n_nationkey").as("k")))
          .orderBy("k")),

    // U — INTERSECT (distinct semantics both engines).
    Query("q46_intersect", Some(
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("k"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .orderBy("k")),

    // UNION ALL + grouped rollup (multi-file ingest shape).
    Query("q20_union", Some(
      """SELECT k, COUNT(*) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey AS k FROM supplier)
        |GROUP BY k ORDER BY k""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("k"))
          .unionAll(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
          .groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k")),

    // F1 — fillna (main.py:373): nulls manufactured then filled.
    Query("q21_fillna", Some(
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
        |                ELSE c_mktsegment END, '') AS seg_filled
        |FROM customer ORDER BY c_custkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            fillEmpty(when(col("c_mktsegment") === "BUILDING", lit(null))
              .otherwise(col("c_mktsegment"))).as("seg_filled"))
          .orderBy("c_custkey")),

    // F2 — regex replace on every row (main.py:376-378 shape).
    Query("q22_regex_replace", Some(
      """SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part ORDER BY p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
          .orderBy("p_partkey")),

    // F4 — initcap (main.py:390-391; divergence from pandas title()
    // documented at CleanFns.titleCase).
    Query("q23_initcap", Some(
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(p_name, ' '),
        |    x -> upper(substr(x,1,1)) || lower(substr(x,2))), ' ') AS name_tc
        |FROM part ORDER BY p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), titleCase(col("p_name")).as("name_tc"))
          .orderBy("p_partkey")),

    // F6/F7 — substring date reformat, exact string semantics
    // (main.py:412-418): slicing, not date parsing.
    Query("q24_date_reformat", Some(
      """SELECT o_orderkey,
        |  substr(CAST(o_orderdate AS VARCHAR), 6, 2) || '/' ||
        |  substr(CAST(o_orderdate AS VARCHAR), 9, 2) || '/' ||
        |  substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS date_us
        |FROM orders ORDER BY o_orderkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            dateReformat(col("o_orderdate")).as("date_us"))
          .orderBy("o_orderkey")),

    // C3 — merge-with-conditional-concat, the signature operator
    // (main.py:563-623). All four branches exercised via p_size residues.
    Query("q25_merge_cols", Some(
      """WITH t AS (
        |  SELECT p_partkey, p_size, p_type,
        |    CASE WHEN p_size % 4 = 0 THEN '' ELSE p_brand END AS t0
        |  FROM part),
        |u AS (
        |  SELECT p_partkey, t0,
        |    CASE WHEN p_size % 3 = 0 THEN ''
        |         WHEN p_size % 3 = 1 THEN t0
        |         ELSE p_type END AS f0
        |  FROM t)
        |SELECT p_partkey,
        |  CASE WHEN f0 = t0 OR f0 = '' THEN t0
        |       WHEN t0 = '' THEN f0
        |       ELSE t0 || ', ' || f0 END AS merged
        |FROM u ORDER BY p_partkey""".stripMargin))(
      (s, dir) => {
        val to = when(col("p_size") % 4 === 0, lit("")).otherwise(col("p_brand"))
        val from = when(col("p_size") % 3 === 0, lit(""))
          .when(col("p_size") % 3 === 1, to)
          .otherwise(col("p_type"))
        t(s, dir, "part")
          .select(col("p_partkey"), mergeConcat(to, from).as("merged"))
          .orderBy("p_partkey")
      }),

    // F11 — tag derivation as one expression chain (main.py:491-507).
    Query("q26_tags", Some(
      """SELECT c_custkey, COALESCE(array_to_string(list_filter(
        |  [CASE WHEN c_acctbal > 1000 THEN 'highbal' END,
        |   CASE WHEN c_mktsegment = 'BUILDING' THEN 'building' END,
        |   CASE WHEN c_nationkey < 5 THEN 'lownation' END],
        |  x -> x IS NOT NULL), ','), '') AS tags
        |FROM customer ORDER BY c_custkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            tags(Seq(
              (col("c_acctbal") > 1000, "highbal"),
              (col("c_mktsegment") === "BUILDING", "building"),
              (col("c_nationkey") < 5, " lownation "))).as("tags"))
          .orderBy("c_custkey")),

    // F13 — JSON field extraction (main.py:133-134 shape).
    Query("q27_json", Some(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy("event_id")),

    // Time-bucketed aggregation over the event log (batch form of the
    // streaming windowed agg, SURVEY.md §7.5.6). Integer ns math both
    // sides — no float bucket boundaries.
    Query("q28_window_time", Some(
      """SELECT epoch_ns(ts) // 3600000000000 AS hb, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY hb ORDER BY hb""".stripMargin))(
      (s, dir) =>
        t(s, dir, "events")
          .select(expr("ts div 3600000000000").as("hb"), col("value"))
          .groupBy("hb")
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_val"))
          .orderBy("hb")),

    // F4 exact — pandas str.title() semantics via the codegen'd
    // PandasTitleExpr: capitalization restarts after ANY non-letter
    // (hyphens here), where initcap/q23 restarts only at whitespace.
    // Oracle: the per-run regexp equivalent (identical on ASCII; the
    // engine side is additionally Unicode-cased like CPython).
    Query("q48_title_pandas", Some(
      """SELECT p_partkey,
        |  array_to_string(list_transform(
        |    regexp_extract_all(replace(p_name, ' ', '-'), '[A-Za-z]+|[^A-Za-z]+'),
        |    t -> CASE WHEN regexp_matches(t, '^[A-Za-z]')
        |         THEN upper(substring(t,1,1)) || lower(substring(t,2))
        |         ELSE t END), '') AS name_tc
        |FROM part ORDER BY p_partkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            graft.functions.StringExprs.pandasTitle(
              regexp_replace(col("p_name"), " ", "-")).as("name_tc"))
          .orderBy("p_partkey")),

    // q14's raw-volume join over BUCKETED twins of both fact tables —
    // the storage-layout answer to the one genuinely large shuffle in
    // the inventory. The bucketed build is a one-time cached job (the
    // ANN-index pattern; Bench times it in the prebuild metric); after
    // it, the join reads co-located buckets and shuffles NOTHING on the
    // join key (PlanSpec pins this with broadcast disabled). Same
    // result as the plain join, so the oracle is the plain SQL.
    Query("q66_bucketed_join", Some(
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))(
      (s, dir) => {
        val li = s.table(graft.sources.Layout.bucketedTable(
          s, dir, "lineitem", Seq("l_orderkey"), numBuckets = 8))
        val or = s.table(graft.sources.Layout.bucketedTable(
          s, dir, "orders", Seq("o_orderkey"), numBuckets = 8))
        li.join(or, li("l_orderkey") === or("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("rev"))
          .orderBy("o_orderstatus")
      }),

    // The q14 join through the SALTED path (Skew.saltedJoin): big side
    // salted on a non-key column, small side replicated per salt, join
    // key becomes (key, salt) so a hot order key's rows spread over 16
    // reducers. Row-identical to the plain join — the oracle IS the
    // plain join, making the equivalence a per-round hash check, not
    // just a spec.
    Query("q76_salted_join", Some(
      """SELECT l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_extendedprice", "l_linestatus")
        val or = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"))
        graft.operators.Skew.saltedJoin(li, or, "l_orderkey",
            saltFrom = col("l_partkey"), buckets = 8)
          .groupBy("l_linestatus")
          .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("rev"))
          .orderBy("l_linestatus")
      }),

    // LEFT SEMI join declared first-class (the EXISTS shape): probe
    // rows pass once regardless of match multiplicity — Spark never
    // materializes the matches, so the build side ships only its join
    // key. Completes the join family (inner q14, left q11/q12, anti
    // q13, full outer q103).
    Query("q102_semi_join", Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin))(
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")),

    // FULL OUTER join — both unmatched sides survive with nulls: the
    // reconciliation shape (which nations have customers but no
    // suppliers, and vice versa). Aggregate-then-join keeps the outer
    // join on two pre-shrunk sides.
    Query("q103_full_outer", Some(
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin))(
      (s, dir) => {
        val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sp, col("nk") === col("snk"), "full_outer")
          .select(coalesce(col("nk"), col("snk")).as("nk"),
            col("n_cust"), col("n_supp"))
          .orderBy("nk")
      })
  )
}

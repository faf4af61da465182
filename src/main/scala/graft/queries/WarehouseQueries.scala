package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Linkage, Profiling, Selection}

/** Warehouse-layer operators (extended surface, SURVEY.md §2.10
  * continuation): probabilistic record linkage (Fellegi–Sunter),
  * Z-order multi-dimensional file layout with a min/max pruning
  * audit, and Bloom-filter join pruning economics — the
  * integration / storage-layout / scan-pruning decisions that sit
  * under every 100 TB curation pipeline. All three have FULL DuckDB
  * oracles: linkage weights are integer micros, the Z-curve is
  * integer bit arithmetic, and the Bloom bit set is md5-derived —
  * nothing engine-private anywhere.
  */
object WarehouseQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---- q236: Fellegi–Sunter record linkage --------------------------

  /** The declared comparator model — m = P[agree | match] follows the
    * planted corruption rates of [[Linkage.dirtyCustomerCopy]] (a
    * matched pair disagrees on name iff the copy was case-mangled,
    * etc.), u = P[agree | non-match] the background agreement chance.
    * Shared by the Spark program and the oracle generator, so the
    * quantized weights are inlined identically in both.
    */
  private val fsFields = Seq(
    Linkage.FsField("name", (x, y) => x === y, 0.5, 0.001),
    Linkage.FsField("nat", (x, y) => x === y, 6.0 / 7.0, 0.04),
    Linkage.FsField("seg", (x, y) => x === y, 10.0 / 11.0, 0.2),
    Linkage.FsField("bal", (x, y) => abs(x - y) <= 0.5, 0.8, 0.001))

  private val FsCap = 200
  private val FsThreshold = 5000000L

  /** Shared oracle CTE chain for the linkage family (q236/q241):
    * dirty-copy derivation, blocking, per-side rn<=cap keep set,
    * agreement bits, and the inlined integer-micro score. `recursive`
    * prepends the RECURSIVE keyword for consumers that close the
    * match graph.
    */
  private def linkageCtes(recursive: Boolean): String = {
    val Seq(name, nat, seg, bal) = fsFields
    def w(f: Linkage.FsField, ag: String) =
      s"CASE WHEN $ag = 1 THEN ${f.agreeMicro} ELSE ${f.disagreeMicro} END"
    s"""WITH ${if (recursive) "RECURSIVE " else ""}a AS (
       |  SELECT c_custkey AS id, c_name AS name,
       |    CAST(c_nationkey AS INT) AS nat, c_acctbal AS bal,
       |    c_mktsegment AS seg,
       |    CAST(substr(c_name, 10, 9) AS BIGINT) % 500 AS block
       |  FROM customer),
       |b0 AS (
       |  SELECT c_custkey + ${Linkage.DirtySourceOffset} AS id,
       |    CASE WHEN c_custkey % 2 = 0 THEN upper(c_name)
       |         ELSE c_name END AS name,
       |    CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
       |         ELSE c_nationkey END AS INT) AS nat,
       |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
       |         ELSE c_acctbal END AS bal,
       |    CASE WHEN c_custkey % 11 = 0 THEN 'UNKNOWN'
       |         ELSE c_mktsegment END AS seg
       |  FROM customer WHERE c_custkey % 3 = 0),
       |b AS (SELECT *, CAST(substr(name, 10, 9) AS BIGINT) % 500 AS block
       |  FROM b0),
       |ar AS (SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY block ORDER BY id) AS rn FROM a),
       |br AS (SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY block ORDER BY id) AS rn FROM b),
       |census AS (SELECT CAST(
       |    (SELECT COUNT(*) FROM (SELECT block FROM a GROUP BY block
       |       HAVING COUNT(*) > $FsCap))
       |  + (SELECT COUNT(*) FROM (SELECT block FROM b GROUP BY block
       |       HAVING COUNT(*) > $FsCap)) AS BIGINT) AS n_capped_blocks),
       |p AS (
       |  SELECT ar.block AS block, ar.id AS a_id, br.id AS b_id,
       |    CAST(ar.name = br.name AS INT) AS ag_name,
       |    CAST(ar.nat = br.nat AS INT) AS ag_nat,
       |    CAST(ar.seg = br.seg AS INT) AS ag_seg,
       |    CAST(abs(ar.bal - br.bal) <= 0.5 AS INT) AS ag_bal
       |  FROM ar JOIN br ON ar.block = br.block
       |  WHERE ar.rn <= $FsCap AND br.rn <= $FsCap),
       |s AS (SELECT *, CAST(${w(name, "ag_name")} + ${w(nat, "ag_nat")}
       |    + ${w(seg, "ag_seg")} + ${w(bal, "ag_bal")} AS BIGINT)
       |    AS score_micro FROM p)""".stripMargin
  }

  private def linkageOracleSql: String =
    linkageCtes(recursive = false) +
      s"""
       |SELECT block, a_id, b_id, ag_name, ag_nat, ag_seg, ag_bal,
       |  score_micro,
       |  CAST(score_micro >= $FsThreshold AS INT) AS is_match,
       |  census.n_capped_blocks
       |FROM s CROSS JOIN census
       |ORDER BY a_id, b_id""".stripMargin

  /** q241 oracle: close the match graph with a recursive min-label
    * reach (the q67 convention) over ALL records from both sources,
    * then census each entity cluster.
    */
  private def entityClustersOracleSql: String =
    linkageCtes(recursive = true) +
      s""",
       |m AS (SELECT a_id, b_id FROM s WHERE score_micro >= $FsThreshold),
       |edges AS (SELECT a_id AS ea, b_id AS eb FROM m
       |          UNION ALL SELECT b_id, a_id FROM m),
       |nodes AS (SELECT id FROM a UNION ALL SELECT id FROM b),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.id, e.eb FROM reach JOIN edges e ON e.ea = reach.r),
       |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
       |SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  CAST(SUM(CASE WHEN id < ${Linkage.DirtySourceOffset} THEN 1
       |    ELSE 0 END) AS BIGINT) AS n_clean,
       |  CAST(SUM(CASE WHEN id >= ${Linkage.DirtySourceOffset} THEN 1
       |    ELSE 0 END) AS BIGINT) AS n_dirty
       |FROM comp GROUP BY comp ORDER BY comp""".stripMargin

  // ---- q237: Z-order layout plan -------------------------------------

  private val ZBits = 5 // buckets in [0, 32)
  private val ZShift = 4 // 2*5-4 = 6 file bits -> 64 files
  private val (zxLo, zxHi, zyLo, zyHi) = (3L, 9L, 10L, 20L)

  private def zorderOracleSql: String = {
    val terms = (0 until ZBits).flatMap { i =>
      Seq(s"(((xb >> $i) & 1) << ${2 * i})",
        s"(((yb >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
    s"""WITH pts AS (SELECT
       |    CAST(l_partkey % 32 AS BIGINT) AS xb,
       |    CAST(l_suppkey % 32 AS BIGINT) AS yb
       |  FROM lineitem),
       |z AS (SELECT xb, yb, ($terms) >> $ZShift AS file_id FROM pts),
       |f AS (SELECT file_id, COUNT(*) AS n_rows,
       |    MIN(xb) AS min_x, MAX(xb) AS max_x,
       |    MIN(yb) AS min_y, MAX(yb) AS max_y
       |  FROM z GROUP BY file_id)
       |SELECT file_id, n_rows, min_x, max_x, min_y, max_y,
       |  CAST(max_x < $zxLo OR min_x > $zxHi AS INT) AS prune_x,
       |  CAST(max_y < $zyLo OR min_y > $zyHi AS INT) AS prune_y
       |FROM f ORDER BY file_id""".stripMargin
  }

  // ---- q238: Bloom join-pruning census --------------------------------

  private val BloomM = 65536
  private val BloomK = 4

  /** The k hash-position indices as a DuckDB unnest list, DERIVED from
    * [[BloomK]] (r14 advice: a hardcoded [0, 1, 2, 3] would silently
    * desynchronize engine and oracle if BloomK changed).
    */
  private def bloomKUnnest: String =
    s"unnest([${(0 until BloomK).mkString(", ")}])"

  private def bloomOracleSql: String = {
    def h(col: String, salt: String) =
      s"('0x' || substring(md5($col || ':$salt'), 1, 8))::BIGINT"
    s"""WITH bk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
       |  FROM orders WHERE o_orderpriority = '1-URGENT'),
       |bh AS (SELECT key, ${h("key", "A")} AS a, ${h("key", "B")} AS b
       |  FROM bk),
       |bits AS (SELECT DISTINCT (a + t.i * b) % $BloomM AS pos
       |  FROM bh CROSS JOIN (SELECT $bloomKUnnest AS i) t),
       |pk AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
       |    COUNT(*) AS nrows FROM lineitem GROUP BY 1),
       |ph AS (SELECT key, nrows, ${h("key", "A")} AS a,
       |    ${h("key", "B")} AS b FROM pk),
       |ppos AS (SELECT key, nrows, (a + t.i * b) % $BloomM AS pos
       |  FROM ph CROSS JOIN (SELECT $bloomKUnnest AS i) t),
       |pflag AS (SELECT key, MAX(nrows) AS nrows,
       |    MIN(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)
       |      AS pass
       |  FROM ppos GROUP BY key),
       |pt AS (SELECT pflag.*,
       |    CASE WHEN key IN (SELECT key FROM bk) THEN 1 ELSE 0 END
       |      AS is_true FROM pflag)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bk) AS n_build_keys,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
       |  CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
       |  CAST(SUM(pass) AS BIGINT) AS pass_keys,
       |  CAST(SUM(is_true) AS BIGINT) AS true_keys,
       |  CAST(SUM(CASE WHEN pass = 1 AND is_true = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS false_pos_keys,
       |  CAST(SUM(nrows) AS BIGINT) AS n_probe_rows,
       |  CAST(SUM(CASE WHEN pass = 1 THEN nrows ELSE 0 END) AS BIGINT)
       |    AS pass_rows,
       |  CASE WHEN COUNT(*) = SUM(is_true) THEN NULL
       |    ELSE ROUND(CAST(SUM(CASE WHEN pass = 1 AND is_true = 0 THEN 1
       |      ELSE 0 END) AS DOUBLE)
       |      / CAST(COUNT(*) - SUM(is_true) AS DOUBLE), 6) END AS fp_rate
       |FROM pt""".stripMargin
  }

  private def bloomDeltaOracleSql: String = {
    def h(col: String, salt: String) =
      s"('0x' || substring(md5($col || ':$salt'), 1, 8))::BIGINT"
    def bitsOf(src: String) =
      s"""SELECT DISTINCT (a + t.i * b) % $BloomM AS pos
         |  FROM $src CROSS JOIN (SELECT $bloomKUnnest AS i) t"""
        .stripMargin
    s"""WITH bk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
       |  FROM orders WHERE o_orderpriority = '1-URGENT'
       |    AND o_orderkey % 10 <> 0),
       |dk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
       |  FROM orders WHERE o_orderpriority = '1-URGENT'
       |    AND o_orderkey % 10 = 0),
       |bh AS (SELECT key, ${h("key", "A")} AS a, ${h("key", "B")} AS b
       |  FROM bk),
       |dh AS (SELECT key, ${h("key", "A")} AS a, ${h("key", "B")} AS b
       |  FROM dk),
       |bbits AS (${bitsOf("bh")}),
       |dbits AS (${bitsOf("dh")}),
       |ubits AS (SELECT DISTINCT pos FROM
       |  (SELECT pos FROM bbits UNION ALL SELECT pos FROM dbits))
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bk) AS n_base_keys,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dk) AS n_delta_keys,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bbits) AS bits_base,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dbits) AS bits_delta,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ubits) AS bits_merged,
       |  CAST(1 AS INT) AS merged_equals_recompute""".stripMargin
  }

  private def prunedJoinOracleSql: String =
    s"""SELECT o_orderpriority,
       |  CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
       |    AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  val all: Seq[Query] = Seq(

    // Fellegi–Sunter record linkage over a planted dirty second
    // source: blocked candidate pairs (name-digit-suffix blocking that
    // survives the case corruption), integer-micro log-likelihood
    // weights from the declared m/u model, capped block sides with a
    // non-silent census. The oracle replays blocking, cap (rn <= cap
    // by id — exactly the bounded top-k's keep set), agreement bits,
    // and the same inlined integer weights.
    Query("q236_record_linkage", Some(linkageOracleSql))(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        Linkage.fellegiSunter(
          Linkage.cleanCustomerSide(cust),
          Linkage.dirtyCustomerCopy(cust),
          fsFields, maxPerSide = FsCap,
          matchThresholdMicro = FsThreshold)
          .orderBy("a_id", "b_id")
      }),

    // Z-order layout plan + pruning audit: Morton-interleave the
    // (l_partkey, l_suppkey) bucket pair, split the curve into 64
    // target files, and report per-file min/max stats with the
    // skip-scan verdict of a declared two-dimensional predicate —
    // the layout decision that makes BOTH dimensions prunable at
    // 100 TB (a single-column sort prunes one). One codegen'd
    // projection + one 64-row aggregate; the oracle rebuilds the
    // identical 10-term bit interleave.
    Query("q237_zorder_layout", Some(zorderOracleSql))(
      (s, dir) =>
        Selection.zorderLayout(
          t(s, dir, "lineitem"),
          col("l_partkey") % 32, col("l_suppkey") % 32,
          bits = ZBits, fileShift = ZShift,
          predXLo = zxLo, predXHi = zxHi,
          predYLo = zyLo, predYHi = zyHi)),

    // Bloom-filter join pruning economics: build the md5-derived
    // 64 Kbit sketch over urgent order keys (mergeable word-OR
    // aggregate), probe every lineitem key against the literal bitmap
    // (whole-stage codegen, no shuffle of the fact side), and report
    // keys built / bits set / pass / true / false-positive counts and
    // the measured fp rate — the runtime-filter decision that prunes
    // a fact scan before its join shuffle. The oracle rebuilds the
    // exact bit set and replays every verdict.
    Query("q238_bloom_prune", Some(bloomOracleSql))(
      (s, dir) =>
        Profiling.bloomJoinPrune(
          t(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("o_orderkey"),
          t(s, dir, "lineitem"), col("l_orderkey"),
          mBits = BloomM, k = BloomK)),

    // Bloom sketch DELTA maintenance — the sketch member of the
    // maintenance matrix (TENTH family): the persisted urgent-key
    // bitmap absorbs an appended key batch by word-OR of the delta's
    // own sketch, no base rescan, and the census PROVES merge ==
    // recompute word for word (OR is a commutative idempotent
    // monoid). The oracle rebuilds base/delta/union bit sets from
    // the md5 positions and asserts the ideal verdict.
    Query("q239_bloom_delta", Some(bloomDeltaOracleSql))(
      (s, dir) => {
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        Profiling.bloomDeltaMerge(
          urgent.filter(col("o_orderkey") % 10 =!= 0), col("o_orderkey"),
          urgent.filter(col("o_orderkey") % 10 === 0), col("o_orderkey"),
          mBits = BloomM, k = BloomK)
      }),

    // Bloom-pruned join, END-TO-END SEMANTICS PROOF: the fact side is
    // pre-filtered by the literal bitmap (inside whole-stage codegen,
    // BEFORE the join shuffle) and then joined — and the oracle is
    // the PLAIN join with no Bloom anywhere: no false negatives means
    // the filter can only drop rows the join would drop anyway, so
    // the runtime filter is a pure execution-strategy change. At
    // 100 TB this is the difference between shuffling all of lineitem
    // and shuffling the matching fraction.
    Query("q240_bloom_pruned_join", Some(prunedJoinOracleSql))(
      (s, dir) => {
        import graft.functions.{BitExprs, BloomAgg}
        val orders = t(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        val packed = shiftleft(
          BitExprs.md5Uint32(col("key"), "A"), 32)
          .bitwiseOR(BitExprs.md5Uint32(col("key"), "B"))
        val words = orders
          .select(col("o_orderkey").cast("string").as("key"))
          .agg(BloomAgg.bloomSketch(BloomM, BloomK)(packed))
          .head().getSeq[Long](0).toArray
        val lk = col("l_orderkey").cast("string")
        val pass = graft.functions.BloomProbe
          .probe(words, lk, BloomM, BloomK)
        t(s, dir, "lineitem").filter(pass)
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            Query.dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("o_orderpriority"))
      }),

    // Entity clusters — the linkage family's end product: q236's
    // match edges closed into connected components over ALL records
    // from both sources ([[Dedup.connectedComponents]]: the iterative
    // min-label pass over the once-partitioned persisted edge frame),
    // then a per-entity census (members, clean-source vs
    // dirty-source counts). Unmatched records stay singleton
    // entities. The oracle recomputes the same match graph and closes
    // it with a recursive min-label CTE — exact at any scale.
    Query("q241_entity_clusters", Some(entityClustersOracleSql))(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val aSide = Linkage.cleanCustomerSide(cust)
        val bSide = Linkage.dirtyCustomerCopy(cust)
        val edges = Linkage.fellegiSunter(aSide, bSide, fsFields,
            maxPerSide = FsCap, matchThresholdMicro = FsThreshold)
          .filter(col("is_match") === 1)
          .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
        val nodes = aSide.select(col("id"))
          .unionAll(bSide.select(col("id")))
        Dedup.connectedComponents(nodes, "id", edges)
          .groupBy(col("comp"))
          .agg(count(lit(1)).as("n_members"),
            sum(when(col("id") < Linkage.DirtySourceOffset, 1L)
              .otherwise(0L)).cast("long").as("n_clean"),
            sum(when(col("id") >= Linkage.DirtySourceOffset, 1L)
              .otherwise(0L)).cast("long").as("n_dirty"))
          .orderBy(col("comp"))
      })
  )
}

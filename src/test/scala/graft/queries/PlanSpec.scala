package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Locks in the physical-plan properties SCALE.md claims — a
  * regression here means a scan stopped pruning, a broadcast turned
  * into a shuffle, or a top-k became a global sort, silently costing
  * orders of magnitude at 100 TB even though results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("filters are pushed into the parquet scan (q06)") {
    val p = plan("q06_filter_notnull")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment)"), p.take(500))
  }

  test("scans prune to referenced columns only (q01 reads 4 of 11)") {
    val p = plan("q01_scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string>"), p.take(500))
  }

  test("mapping joins broadcast the small side (q11)") {
    val p = plan("q11_left_join_map")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("grouped aggregation is partial+final (q16)") {
    val p = plan("q16_groupby")
    assert(p.contains("partial_count"), p.take(800))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort (q18, q34)") {
    assert(plan("q18_topk").contains("TakeOrderedAndProject"))
    assert(plan("q34_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("pipeline e2e keeps the mapping join broadcast (q44)") {
    val p = plan("q44_pipeline_e2e")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("indexed ANN probes are partition-pruned scans (q47, q49)") {
    val lsh = plan("q47_ann_indexed")
    assert("PartitionFilters: \\[.*band".r.findFirstIn(lsh).isDefined,
      lsh.take(1200))
    val ivf = plan("q49_ann_ivf_indexed")
    assert("PartitionFilters: \\[.*cell".r.findFirstIn(ivf).isDefined,
      ivf.take(1200))
  }

  test("repetition stats aggregate partially before shuffling (q50)") {
    val p = plan("q50_repetition")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(800))
  }

  test("split/mixture/scrub are narrow — no hash shuffle (q51, q52, q55)") {
    // only the deterministic-output sort (range partitioning) may
    // exchange; a hashpartitioning exchange would mean the md5/regex
    // work stopped being per-row
    Seq("q51_split", "q52_mixture", "q55_pii_scrub").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n${p.take(800)}")
    }
  }

  test("packing shuffles once, on the window partition key (q53)") {
    val p = plan("q53_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1000))
  }

  test("decontamination broadcasts the eval gram set (q54)") {
    val p = plan("q54_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"), p.take(1000))
  }

  test("stream enrichment broadcasts the dimension (q57)") {
    val p = plan("q57_stream_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("domain extraction aggregates partially before its one shuffle (q59)") {
    val p = plan("q59_domains")
    assert(p.contains("partial_count"), p.take(800))
  }

  test("as-of join is one union-window shuffle, no join explosion (q60)") {
    val p = plan("q60_asof_join")
    // the only hash exchange is the window partitioning on the key;
    // a second one would mean the union form regressed to a join
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(1500))
  }

  test("fuzzy decontamination broadcasts the eval side (q71)") {
    val p = plan("q71_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"), p.take(1000))
  }

  test("column profiling reads the table once (q72)") {
    val p = plan("q72_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("bucketed-twin join shuffles nothing on the join key (q66)") {
    // broadcast disabled so the small verify-scale tables can't dodge
    // the SortMergeJoin the layout exists for; only the downstream
    // status aggregation may exchange
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q66_bucketed_join")
      assert(p.contains("SortMergeJoin"), p.take(1200))
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"), p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("grouping sets expand once and aggregate partially (q80)") {
    val p = plan("q80_grouping_sets")
    assert(p.contains("Expand"), p.take(800))
    assert(p.contains("partial_count"), p.take(800))
    // one Expand feeds the aggregate — not one scan per grouping set
    assert("Expand".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("unpivot is a narrow Expand — no shuffle before the output sort (q81)") {
    val p = plan("q81_melt")
    assert(p.contains("Expand"), p.take(800))
    // the only exchange is the final orderBy's range partitioning
    assert(!p.contains("hashpartitioning"), p.take(1200))
  }

  test("semantic dedup assigns centroids scan-side — no join for assignment (q84)") {
    val p = plan("q84_semantic_dedup")
    // assignment is an expression over broadcast literals: the plan's
    // joins are the pairing self-join + keep anti-flag only
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p.take(1200))
  }

  test("group top-k aggregates with map-side partial heaps (q88)") {
    val p = plan("q88_group_topk")
    assert(p.contains("partial_topk") ||
      p.toLowerCase.contains("objecthashaggregate"), p.take(1200))
    // NOT the window form: no per-row rank shuffle
    assert(!p.contains("row_number"), p.take(1200))
  }

  test("vocab build is a bounded top-k; encode broadcasts the vocab (q90)") {
    val p = plan("q90_vocab_encode")
    // top-256 vocabulary via per-partition heaps, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    // 256-row id table broadcasts to the exploded token stream
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("quantized top-k keeps bounded heaps over the code scan (q92)") {
    assert(plan("q92_quantized_topk").contains("TakeOrderedAndProject"))
  }

  test("NFC normalization is a narrow codegen'd projection (q94)") {
    val p = plan("q94_nfc_normalize")
    assert(p.contains("nfc_normalize"), p.take(800))
    // one pruned scan + projection; the only exchange is the output sort
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(1200))
  }

  test("span dedup is two keyed shuffles with map-side election (q95)") {
    val p = plan("q95_span_dedup")
    // election on span text + reassembly on doc id — nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p.take(2000))
    // the first-occurrence window pre-filters to 1 row per span text
    // BEFORE the shuffle (partial WindowGroupLimit) — the map-side-
    // combine equivalent for window elections
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      p.take(2000))
  }

  test("stratified sample shares one stratum shuffle across windows (q96)") {
    val p = plan("q96_stratified_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(2000))
  }

  test("URL canonicalization aggregates partially under one shuffle (q97)") {
    val p = plan("q97_url_canonical")
    assert(p.contains("partial_count"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(2000))
  }

  test("rolling RANGE frame computes both aggs in one Window pass (q99)") {
    val p = plan("q99_rolling_window")
    assert(p.contains("RangeFrame"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(2000))
    // count + sum share one Window operator, not one pass each
    assert("\\bWindow\\b".r.findAllIn(p).length == 1, p.take(2000))
  }

  test("retention dedups users map-side before the distinct shuffle (q100)") {
    val p = plan("q100_retention")
    // the pre-shuffle HashAggregate keyed on (cohort, age, user) is
    // the map-side dedup of count(DISTINCT user) — without it every
    // event row rides the second exchange
    assert(p.contains("partial_count(distinct"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p.take(2000))
  }

  test("exact percentile aggregates partially map-side (q101)") {
    val p = plan("q101_exact_percentile")
    assert(p.contains("partial_percentile"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(2000))
  }

  test("semi join broadcasts and ships only the build key (q102)") {
    val p = plan("q102_semi_join")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"), p.take(1500))
  }

  test("full outer joins two pre-aggregated sides (q103)") {
    val p = plan("q103_full_outer")
    assert(p.contains("FullOuter"), p.take(1500))
    // aggregation happens below the join — the join sees group counts,
    // not raw customer/supplier rows
    assert(p.indexOf("partial_count") > p.indexOf("FullOuter"), p.take(2000))
  }

  test("star join broadcasts every dimension — one fact-side shuffle " +
      "at most (q116)") {
    val p = plan("q116_star_join")
    // region/nation/supplier/customer all broadcast; the orders date
    // filter reaches its scan
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "a dimension fell back to a shuffled join:\n" + p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      "o_orderdate filter not pushed:\n" + p.take(2000))
  }

  test("fuzzy matching pairs via a STREAMED bucket join over one " +
      "persisted keyed frame (q113)") {
    val p = plan("q113_fuzzy_names")
    // the pairing must stream (join), not materialize bucket² arrays
    // in a row — and both join sides must read the same cached frame
    assert(p.contains("InMemoryTableScan"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("inverted index shares the term shuffle between df and postings " +
      "(q115)") {
    val p = plan("q115_inverted_index")
    // the posting-list cap is a rank window BEFORE collect_list
    assert(p.contains("row_number"), p.take(2000))
  }

  test("weighted sampling plans as TakeOrderedAndProject, not a " +
      "corpus sort (q146)") {
    val p = plan("q146_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("basket pair counts aggregate partially before the pair " +
      "shuffle (q145)") {
    val p = plan("q145_basket_pairs")
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("PSI timeline scans the fact table once — every consumer of " +
      "the (bucket, bin) frame reads the cache (q151)") {
    val p = plan("q151_psi_timeline")
    // the spine, the join side, the reference rollup and n_ref all hit
    // InMemoryTableScan (the printed FileScan under each InMemoryRelation
    // is the cached frame's plan, materialized once)
    val cached = "InMemoryTableScan".r.findAllIn(p).size
    assert(cached >= 3, s"expected >= 3 cached reads, got $cached\n" +
      p.take(1200))
    val uncachedScan = p.linesIterator.exists(l =>
      l.contains("Scan parquet") && !p.contains("InMemoryRelation"))
    assert(!uncachedScan, p.take(1200))
  }

  test("set-similarity join reuses the persisted token-set frame " +
      "across prefix and verify (q153)") {
    val p = plan("q153_set_similarity")
    assert(p.contains("InMemoryTableScan"), p.take(1200))
  }

  test("phrase search shuffles only candidate rows — two keyed " +
      "exchanges, none corpus-wide (q195)") {
    val p = plan("q195_phrase_search")
    // (doc_id, anchor) then doc_id; the posting cut happens inside the
    // projection (explode of a null map lookup), never as a join
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(1200))
  }

  test("skyline recovers ties via a broadcast semi join, never a " +
      "dominance self-join (q196)") {
    val p = plan("q196_skyline")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("hard negatives score via broadcast nested loop, then bounded " +
      "per-anchor heaps (q197)") {
    val p = plan("q197_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("partial_topk") || p.contains("objectagg") ||
      p.contains("TopKAgg") || p.contains("SortAggregate") ||
      p.contains("ObjectHashAggregate"), p.take(1200))
  }

  test("random projection is one narrow lambda-free projection — no " +
      "exchange before the output sort (q200)") {
    val p = plan("q200_randproj")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    // a lambda here means the array-cast collapsed into the ± terms
    // (O(dims²) per row) instead of per-element casts
    assert(!p.contains("lambdafunction"), p.take(1200))
  }

  test("ivf-pq probe prunes cell partitions and reads codes, not " +
      "vectors (q204)") {
    val p = plan("q204_ann_ivfpq")
    assert("PartitionFilters: \\[cell.* IN ".r.findFirstIn(p).isDefined,
      p.take(1200))
    // the pruned compressed scan projects only (id, codes) — the
    // 32x-smaller read is the index's whole point
    assert(p.contains("ReadSchema: struct<vec_id:bigint,codes:array<int>>"),
      p.take(1200))
  }

  test("impact retrieval prunes term buckets AND pushes the term " +
      "IN-filter into the postings scan (q205)") {
    val p = plan("q205_retrieval_topk")
    assert("PartitionFilters: \\[tb.* IN ".r.findFirstIn(p).isDefined,
      p.take(1200))
    assert(p.contains("PushedFilters: [In(term"), p.take(1200))
  }

  test("shard plan's corpus cumsum rides per-partition windows, " +
      "never a corpus-sized single-partition window (q209)") {
    val p = plan("q209_shard_plan")
    // the corpus-side running sum is partitioned on __pid...
    assert(p.contains("windowspecdefinition(__pid"), p.take(1500))
    // ...and the one SinglePartition window ranks only the bounded
    // per-partition offsets aggregate, whose input is the hash agg
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      p.take(1500))
  }

  test("interval merge computes both windows in one per-key pass and " +
      "shuffles the corpus once (q210)") {
    val p = plan("q210_interval_merge")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(1500))
    assert(!p.contains("Exchange SinglePartition"), p.take(1500))
  }

  test("no declared query windows raw events partitioned by the " +
      "low-cardinality event_type alone (q139/q140/q152 regression pin)") {
    // a Window partitioned ONLY by event_type puts ~corpus/|types| rows
    // in ONE task's sort — the scale trap the Ranking rank-frame
    // rewrite removed. Plans print such a spec as
    // `windowspecdefinition(event_type#N, <order> ASC|DESC ...` or,
    // for orderless frames, `windowspecdefinition(event_type#N,
    // specifiedwindowframe(...`. Composite partition keys (event_type
    // plus a scaling column) print additional non-ordered columns
    // first and don't match.
    val solo = ("windowspecdefinition\\(event_type#\\d+, " +
      "(\\S+#\\d+L? (ASC|DESC)|specifiedwindowframe)").r
    SparkEntry.allQueries.foreach { q =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(solo.findFirstIn(p).isEmpty,
        s"${q.name} windows a whole event_type group on one task:\n" +
          solo.findFirstIn(p).getOrElse(""))
    }
  }

  test("bloom runtime filter sits on the fact side BELOW the join " +
      "(q240)") {
    val p = plan("q240_bloom_pruned_join")
    // the single-pass membership expression must filter lineitem
    // before any join: in the plan string a parent prints before its
    // children, so join < filter < fact scan
    val iJoin = p.indexOf("Join")
    val iFilter = p.indexOf("probe(")
    val iScan = p.indexOf("lineitem.parquet")
    assert(iJoin >= 0 && iFilter >= 0 && iScan >= 0, p.take(1500))
    assert(iJoin < iFilter && iFilter < iScan,
      s"bloom filter not below the join on the fact side " +
        s"(join@$iJoin filter@$iFilter scan@$iScan):\n${p.take(1500)}")
  }

  test("no declared query plans a CartesianProduct") {
    SparkEntry.allQueries.foreach { q =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n${p.take(600)}")
    }
  }
}

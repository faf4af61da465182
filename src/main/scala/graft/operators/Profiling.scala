package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.KmvAgg

/** Column-level profiling — the "analyze table" shape every curation
  * dashboard starts from: null counts, distinct cardinality, and
  * min/max per column, one output row per column.
  *
  * All metrics for all columns ride ONE aggregation over ONE scan (the
  * multi-distinct plan expands rows per distinct column internally —
  * still a single pass over the data, no per-column jobs), then the
  * single result row explodes into per-column rows. min/max surface as
  * strings so heterogeneous column types share one schema; callers
  * pass a pre-cast Column per name to control formatting (e.g. double
  * → decimal(18,2) for engine-portable rendering).
  */
object Profiling {

  /** Poisson(1) CDF thresholds as exact uint32 cut points — the ONE
    * source of truth for [[poissonBootstrapCI]]'s weight ladder and
    * its generated oracle SQL (both engines compare the same integer
    * to the same literals; no float CDF at query time).
    */
  val poissonThresholds32: Seq[Long] = {
    val e1 = math.exp(-1.0)
    // cdf_k = e^-1 · Σ_{i≤k} 1/i!, the partial sums accumulated in
    // sequence so the doubles are reproducible
    var term = 1.0
    var acc = 0.0
    (0 to 7).map { k =>
      if (k > 0) term /= k
      acc += term
      math.floor(acc * e1 * 4294967296.0).toLong
    }
  }

  /** POISSON BOOTSTRAP confidence intervals for the per-group mean —
    * the resampling form that survives 100 TB (Chamandy et al. 2012,
    * "Estimating Uncertainty for Massive Data Streams"): classic
    * bootstrap draws n rows WITH replacement per replicate (un-
    * shardable — a resample needs global coordination); the Poisson
    * form gives every (row, replicate) an independent Poisson(1)
    * weight, so all `reps` replicates ride ONE pass as a weighted
    * partial-agg — embarrassingly parallel, mergeable, deterministic
    * here via md5(row:replicate) uint32 draws against integer CDF cut
    * points (engine-portable; no RNG state).
    *
    * Replicate means use exact decimal weighted sums (float partial-
    * agg order can't move them); the CI is rank-based over the
    * BOUNDED (group × reps) frame — 2nd smallest / 2nd largest
    * replicate mean (≈ the 2.5/97.5 band at reps=64) with the
    * replicate id as tie-break, portable where interpolating
    * percentile definitions differ per engine.
    */
  def poissonBootstrapCI(df: DataFrame, groupCol: Column, keyCol: Column,
      vCol: Column, reps: Int = 64): DataFrame = {
    require(reps >= 4, s"need at least 4 replicates, got $reps")
    import org.apache.spark.sql.expressions.Window
    val u32 = conv(substring(
      md5(concat(col("__k").cast("string"), lit(":"), col("__b"))), 1, 8),
      16, 10).cast("long")
    val w = poissonThresholds32.zipWithIndex.foldRight(
      lit(poissonThresholds32.size): Column) { case ((t, k), rest) =>
      when(u32 < lit(t), lit(k)).otherwise(rest)
    }
    val perRep = df
      .select(groupCol.as("group"), keyCol.as("__k"), vCol.as("__v"))
      .withColumn("__b", explode(typedlit((0 until reps).toList)))
      .groupBy(col("group"), col("__b"))
      .agg(sum(col("__v").cast("decimal(18,2)") * w).as("__num"),
        sum(w).as("__den"))
      .withColumn("__mean",
        col("__num").cast("double") / col("__den"))
    val rk = Window.partitionBy("group").orderBy(col("__mean"), col("__b"))
    val stats = df.select(groupCol.as("group"), vCol.as("__v"))
      .groupBy("group")
      .agg((sum(col("__v").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("mean"))
    perRep
      .withColumn("__rn", row_number().over(rk))
      .groupBy("group")
      .agg(round(min(when(col("__rn") === 2, col("__mean"))), 6)
          .as("ci_lo"),
        round(min(when(col("__rn") === reps - 1, col("__mean"))), 6)
          .as("ci_hi"))
      .join(stats, "group")
      .select(col("group"), round(col("mean"), 6).as("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // positional aliases, NOT the user-supplied names: a display name
    // with a dot/backtick would otherwise break the col() resolution
    // of the generated struct columns
    val structs = cols.zipWithIndex.map { case ((name, v), i) =>
      struct(
        lit(name).as("col"),
        (count(lit(1)) - count(v)).as("n_nulls"),
        count_distinct(v).as("n_distinct"),
        min(v).cast("string").as("min_v"),
        max(v).cast("string").as("max_v")).as(s"__p_$i")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.indices.map(i => col(s"__p_$i")): _*))
        .as("p"))
      .select(col("p.col"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_v"), col("p.max_v"))
  }

  /** Fixed-width histogram of `v` over [lo, hi): `nBins` equal bins,
    * out-of-range values clamped into the edge bins (so every non-null
    * value is counted exactly once and the bin totals reconcile with
    * the row count — dropped tails silently skew distribution reads).
    * Empty bins are present with cnt 0: the output is the full spine
    * 0..nBins−1 with exact edges, ready for a chart or a drift diff.
    *
    * One partial-aggregated shuffle on the (at most nBins-ary) bin key;
    * the spine is a driver-side `nBins`-row range, broadcast into the
    * join. Bin arithmetic is plain IEEE floor((v−lo)/w) — portable
    * bit-for-bit across engines.
    */
  def histogram(df: DataFrame, v: Column, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(hi > lo, s"empty range: [$lo, $hi)")
    val w = (hi - lo) / nBins
    val bin = least(greatest(floor((v - lo) / w), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val counts = df.filter(v.isNotNull).groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(nBins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * w).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * w).as("hi_edge"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Join/partition-key skew profile — the diagnostic to run BEFORE
    * choosing between a plain shuffle and `Skew.saltedJoin`: key
    * cardinality, the heaviest key's share, the max/mean skew ratio,
    * and the Gini coefficient of the key distribution (0 = uniform,
    * →1 = one key owns everything). One partial-aggregated shuffle
    * builds the per-key counts; the Gini rank comes from a DISTRIBUTED
    * sort of the count frame + zipWithIndex (per-partition offsets via
    * one lightweight count job) — never a single-partition global
    * window, because high-cardinality join keys are exactly the case
    * this diagnostic targets. Single-row output.
    */
  def keySkew(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(key.isNotNull)
      .groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
    // Gini over ascending counts: (2·Σ rank·c) / (n·Σc) − (n+1)/n.
    // Ranks are 1-based positions in the range-partitioned (c, k)
    // sort; Σ rank·c is permutation-invariant among equal counts, so
    // the result is deterministic regardless of tie placement.
    val ranked = counts.sort(col("__c"), col("__k"))
      .select(col("__c").cast("long")).rdd
      .zipWithIndex()
      .map { case (row, i) => (row.getLong(0), i + 1L) }
      .toDF("__c", "__r")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_cnt"),
        sum(col("__r") * col("__c")).as("__rc"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        round(col("max_cnt") /
          (col("n_rows").cast("double") / col("n_keys")), 6)
          .as("skew_ratio"),
        round(lit(2.0) * col("__rc") /
          (col("n_keys").cast("double") * col("n_rows"))
          - (col("n_keys") + 1).cast("double") / col("n_keys"), 6)
          .as("gini"))
  }

  /** Tukey-fence outlier summary per group: exact quartiles
    * (`percentile`, the quantile_cont interpolation), fences at
    * q1 − k·IQR / q3 + k·IQR, and the count of rows outside each
    * fence. Fences are rounded to 6 decimals BEFORE comparing — the
    * two engines' interpolations agree to well under 1e-6 but not to
    * the last ulp, and an unrounded fence would let a knife-edge value
    * flip sides between them.
    *
    * Two passes sharing one scan shape: the quartile aggregation
    * shuffles on the group key (exact percentile state is bounded by
    * distinct values per group), then the tiny fence frame broadcasts
    * back onto the rows — a 100 TB fact side never shuffles for the
    * flagging pass.
    */
  /** KMV distinct-cardinality census: per-group bottom-k sketches
    * (see [[graft.functions.KmvAgg]]) plus an `ALL` row whose sketch
    * is MERGED from the per-group sketches — the union algebra that
    * makes the estimator a rollup-able cube measure (the k smallest
    * of the groups' k-smallest sets IS the union's k smallest, so
    * merge loses nothing). `hashCol` must be a uint32 draw (longs in
    * [0, 2³²), e.g. the repo's md5-prefix convention); the estimate
    * is exact-by-size below k and (k−1)·2³²/u_k above it, both
    * engine-portable arithmetic. The exact distinct count rides along
    * for the error column the census reader wants.
    */
  /** The KMV estimate off a sketch column: exact-by-size below k,
    * (k−1)·2³²/u_k at capacity — the numerator is an exact-integer
    * double, so the one division is engine-portable.
    */
  def kmvEstimate(sk: Column, k: Int): Column =
    round(kmvRawEstimate(sk, k), 4)

  def kmvDistinct(df: DataFrame, groupCol: Column, hashCol: Column,
      k: Int, allLabel: String = "ALL"): DataFrame = {
    val est = kmvEstimate(col("__sk"), k).as("est")
    val base = df.select(groupCol.cast("string").as("group"),
      hashCol.as("__h"))
    val per = base.groupBy("group")
      .agg(KmvAgg.kmvSketch(k)(col("__h")).as("__sk"),
        count_distinct(col("__h")).as("exact"))
    val merged = per.select(explode(col("__sk")).as("__h"))
      .agg(KmvAgg.kmvSketch(k)(col("__h")).as("__sk"))
    val exactAll = base.agg(count_distinct(col("__h")).as("exact"))
    val allRow = merged.crossJoin(exactAll)
      .select(lit(allLabel).as("group"), col("__sk"), col("exact"))
    per.select(col("group"), col("__sk"), col("exact"))
      .unionAll(allRow)
      .select(col("group"), col("exact"),
        size(col("__sk")).as("sketch_size"), est)
  }

  /** KMV SKETCH DELTA MAINTENANCE: merge a delta batch into persisted
    * per-group sketches without touching the base corpus — the sketch
    * half of the index-maintenance matrix (a distinct-count registry
    * that refreshes at cost ∝ |delta|). Only the delta pays an
    * aggregation; the base contributes k longs per group, and the
    * merge itself is pure codegen'd array algebra
    * (concat → array_distinct → array_sort → slice) — set-union
    * truncation, which equals a full recompute EXACTLY (bottom-k of a
    * union is the union of bottom-ks, truncated). Groups new in the
    * delta (or absent from it) survive via the full-outer empty-array
    * coalesce.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def kmvDeltaMerge(baseSketches: DataFrame, delta: DataFrame,
      groupCol: Column, hashCol: Column, k: Int): DataFrame = {
    val empty = typedlit(Seq.empty[Long])
    val d = delta.select(groupCol.cast("string").as("group"),
        hashCol.as("__h"))
      .groupBy("group").agg(KmvAgg.kmvSketch(k)(col("__h")).as("__dsk"))
    baseSketches.select(col("group"), col("sk"))
      .join(d, Seq("group"), "full_outer")
      .select(col("group"),
        slice(array_sort(array_distinct(concat(
          coalesce(col("sk"), empty), coalesce(col("__dsk"), empty)))),
          1, k).as("sk"))
  }

  /** Mergeable HISTOGRAM-QUANTILE registry — the QUANTILE member of
    * the index/sketch maintenance matrix (minhash q104, winnow q182,
    * graph q188, IVF q203, IVF-PQ q211, components q218, KMV q220):
    * per-group fixed-width bin counts are the persisted state, and
    * quantiles read off cumulative bin mass with linear interpolation
    * inside the target bin. Bin counts are integers, so MERGE is
    * bin-wise addition — EXACTLY equal to a recompute over the union
    * (unlike rank sketches with probabilistic merge error), which
    * makes the registry both rollup-able (group sketches sum into an
    * ALL sketch) and delta-maintainable at cost ∝ |delta|: only the
    * delta batch pays a scan+agg; the base contributes its bounded
    * (group, bin, cnt) rows. Estimation error is bounded by binWidth
    * — a declared, VISIBLE discretization (the bin is in the state),
    * not a data-dependent one.
    *
    * The state is (group, bin, cnt) with bin = floor(value/binWidth)
    * — one double division + floor, the identical IEEE op in any
    * engine, so sketch AND estimate replay bit for bit.
    */
  def histSketch(df: DataFrame, groupCol: Column, vCol: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.filter(vCol.isNotNull)
      .select(groupCol.cast("string").as("group"),
        floor(vCol.cast("double") / binWidth).cast("long").as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Bin-wise merge of two histogram registries — the delta-refresh
    * op (state ∪ deltaSketch), exact by integer addition.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select("group", "bin", "cnt")
      .unionByName(b.select("group", "bin", "cnt"))
      .groupBy("group", "bin").agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a histogram registry: for each declared
    * q, target mass t = q·N; the estimate lives in the first bin whose
    * cumulative count reaches t, linearly interpolated —
    * lo + (t − cum_before)/cnt · width. One window pass over the
    * bounded sketch frame (never the facts), one fixed IEEE chain,
    * 6-decimal presentation rounding.
    */
  def histQuantiles(sketch: DataFrame, qs: Seq[Double],
      binWidth: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val w = Window.partitionBy("group").orderBy("bin")
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("group")))
    qs.map { q =>
      val t = col("n").cast("double") * q
      cum.filter(col("cum").cast("double") >= t)
        .groupBy(col("group"))
        .agg(min_by(struct(col("bin"), col("cum"), col("cnt"), col("n")),
          col("bin")).as("b"))
        .select(col("group"), lit(q).as("q"), col("b.n").as("n"),
          round(col("b.bin").cast("double") * binWidth +
            (col("b.n").cast("double") * q -
              (col("b.cum") - col("b.cnt")).cast("double")) /
              col("b.cnt").cast("double") * binWidth, 6).as("est"))
    }.reduce(_ unionAll _)
  }

  /** SKETCH-BASED JOIN-CARDINALITY estimation over declared key pairs
    * — the join-planning census: estimate |A ⋈ B| BEFORE paying the
    * shuffle, from two KMV sketches and two row counts. Per pair each
    * side pays one scan shipping ≤ k longs plus one count; the
    * estimator itself is codegen'd array algebra on a 1-row frame.
    * At 100 TB this is the "should we even run this join / which side
    * broadcasts" advisor — the fact tables never co-shuffle.
    *
    * Estimator (Beyer et al. 2007 KMV set algebra): the union sketch
    * is the truncated set-union of the two sketches; any union-sketch
    * member drawn from side A is necessarily in A's own bottom-k
    * (it is among the k smallest of a superset), so membership
    * against the SKETCHES equals membership against the full distinct
    * sets — K∩ = |SU ∩ SA ∩ SB| is well-defined and engine-portable.
    * d̂∩ = (K∩/k)·d̂∪ (exact when the union sketch is under capacity),
    * and under per-key uniform frequency
    * ĵoin = d̂∩ · (n_a/d̂_a) · (n_b/d̂_b).
    *
    * NULL keys are excluded on both sides (they never join). Every
    * number is either an exact integer or one fixed IEEE chain from
    * exact integers, so a SQL oracle replays sketches AND estimates
    * bit for bit — the same portability argument as [[kmvDistinct]].
    */
  def kmvJoinCardinality(pairs: Seq[(String, DataFrame, Column,
      DataFrame, Column)], k: Int): DataFrame = {
    require(pairs.nonEmpty, "declare at least one key pair")
    require(k > 1, s"k must exceed 1, got $k")
    def side(df: DataFrame, key: Column, tag: String): DataFrame =
      df.filter(key.isNotNull)
        .select(kmvHash32(key).as("__h"))
        .agg(KmvAgg.kmvSketch(k)(col("__h")).as(s"s$tag"),
          count(lit(1)).as(s"n$tag"))
    pairs.map { case (name, dfA, ka, dfB, kb) =>
      val su = slice(array_sort(array_distinct(
        concat(col("sa"), col("sb")))), 1, k)
      val kint = size(array_intersect(array_intersect(col("__su"),
        col("sa")), col("sb")))
      side(dfA, ka, "a").crossJoin(side(dfB, kb, "b"))
        .withColumn("__su", su)
        .withColumn("__ea", kmvRawEstimate(col("sa"), k))
        .withColumn("__eb", kmvRawEstimate(col("sb"), k))
        .withColumn("__eu", kmvRawEstimate(col("__su"), k))
        .withColumn("__ov", when(size(col("__su")) < k,
            kint.cast("double"))
          .otherwise(kint.cast("double") / lit(k.toDouble) * col("__eu")))
        .select(lit(name).as("pair"), col("na").as("n_a"),
          col("nb").as("n_b"),
          round(col("__ea"), 4).as("est_distinct_a"),
          round(col("__eb"), 4).as("est_distinct_b"),
          round(col("__ov"), 4).as("est_overlap"),
          round(col("__ov") * (col("na") / col("__ea")) *
            (col("nb") / col("__eb")), 4).as("est_join_rows"))
    }.reduce(_.unionAll(_))
  }

  /** The shared md5-uint32 key draw for sketch estimators: first 8 hex
    * chars of md5(key as string) as a long in [0, 2³²) — the q213/q215
    * convention, replayed verbatim by the oracles.
    */
  def kmvHash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** [[kmvEstimate]] without the presentation rounding — for
    * estimators that keep computing with the raw value.
    */
  private def kmvRawEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * 4294967296.0) /
        element_at(sk, k).cast("double"))

  /** WELCH two-sample t census over every pair of groups — the A/B
    * inference number beside [[poissonBootstrapCI]]'s rank band: t
    * statistic and Welch–Satterthwaite degrees of freedom for the
    * difference of group means under unequal variances (Welch 1947).
    * One partial-agg scan collects (n, Σv, Σv²) per group as EXACT
    * decimal sums; every pair statistic then derives on the bounded
    * |groups|² frame through one fixed IEEE chain from those exact
    * inputs — identical in any engine, so the oracle replays it bit
    * for bit. p-values are deliberately out of scope (the t CDF is an
    * engine-private special function); t and df are the portable
    * census numbers.
    */
  def welchTTest(df: DataFrame, groupCol: Column, vCol: Column)
      : DataFrame = {
    val d = vCol.cast("decimal(18,2)")
    val g = df.groupBy(groupCol.cast("string").as("g"))
      .agg(count(d).as("n"), sum(d).as("sv"), sum(d * d).as("svv"))
      .filter(col("n") >= 2)
      .select(col("g"), col("n"), col("sv").cast("double").as("sv"),
        col("svv").cast("double").as("svv"))
    val a = g.select(col("g").as("ga"), col("n").as("na"),
      col("sv").as("sva"), col("svv").as("svva"))
    val b = g.select(col("g").as("gb"), col("n").as("nb"),
      col("sv").as("svb"), col("svv").as("svvb"))
    val paired = a.crossJoin(b).filter(col("ga") < col("gb"))
      .withColumn("ma", col("sva") / col("na"))
      .withColumn("mb", col("svb") / col("nb"))
      .withColumn("sea", (col("svva") - col("sva") * col("sva") /
        col("na")) / (col("na") - 1) / col("na"))
      .withColumn("seb", (col("svvb") - col("svb") * col("svb") /
        col("nb")) / (col("nb") - 1) / col("nb"))
    // Degenerate pairs (both groups constant → sea+seb = 0) get NULL
    // t/df rather than a divide-by-zero: Spark doubles yield ±Infinity
    // there while SQL engines disagree (NULL vs inf), so the NULL
    // branch is the only engine-portable answer — same policy as the
    // n>=2 degenerate-group filter above.
    val degenerate = col("sea") + col("seb") === 0.0
    paired.select(
      concat(col("ga"), lit("|"), col("gb")).as("pair"),
      col("na").as("n_a"), col("nb").as("n_b"),
      round(col("ma"), 6).as("mean_a"),
      round(col("mb"), 6).as("mean_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((col("ma") - col("mb")) /
          sqrt(col("sea") + col("seb")), 6)).as("t"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((col("sea") + col("seb")) *
          (col("sea") + col("seb")) /
          (col("sea") * col("sea") / (col("na") - 1) +
            col("seb") * col("seb") / (col("nb") - 1)), 6)).as("df"))
  }

  /** REFERENTIAL-INTEGRITY census over declared FK candidates — the
    * cross-table sibling of q121's single-table expectations and
    * q217's FD discovery: per candidate, child rows, null FKs (exempt,
    * per SQL FK semantics), orphan rows, and distinct missing keys.
    * Each pair costs one left join of the child's key column against
    * the parent's distinct keys (broadcast when the parent is a dim,
    * a key shuffle otherwise) feeding one partial-agg census row.
    */
  def fkOrphans(pairs: Seq[(String, DataFrame, Column, DataFrame,
      Column)]): DataFrame = {
    require(pairs.nonEmpty, "declare at least one candidate FK")
    pairs.map { case (name, child, fk, parent, pk) =>
      val miss = col("__k").isNotNull && col("__hit").isNull
      child.select(fk.as("__k"))
        .join(parent.select(pk.as("__k")).distinct()
          .withColumn("__hit", lit(1)), Seq("__k"), "left")
        .agg(count(lit(1)).as("n_child"),
          count(when(col("__k").isNull, 1)).as("n_null"),
          count(when(miss, 1)).as("orphans"),
          count_distinct(when(miss, col("__k"))).as("missing_keys"))
        .select(lit(name).as("fk"), col("n_child"), col("n_null"),
          col("orphans"), col("missing_keys"),
          (col("orphans") === 0L).as("ok"))
    }.reduce(_.unionAll(_))
  }

  /** MUTUAL INFORMATION census between two categorical columns — the
    * dependence number behind feature selection and leakage triage
    * (chi-square q125 answers "independent?"; MI answers "how many
    * nats does knowing X buy about Y"). One corpus shuffle builds the
    * joint contingency counts; margins, entropies, and the MI sum all
    * derive from that BOUNDED cell frame (|X|·|Y| rows), so corpus
    * size touches exactly one aggregation. All terms are BIGINT-count
    * ratios pushed through the same `ln` chain in both engines;
    * normalized MI = MI/√(H(x)·H(y)) from the unrounded parts.
    */
  def mutualInformation(df: DataFrame, xCol: Column,
      yCol: Column): DataFrame = {
    val joint = df.groupBy(xCol.as("x"), yCol.as("y"))
      .agg(count(lit(1)).as("c"))
    val xm = joint.groupBy("x").agg(sum("c").as("rx"))
    val ym = joint.groupBy("y").agg(sum("c").as("cy"))
    val n = joint.agg(sum("c").as("n"))
    val mi = joint.join(broadcast(xm), "x").join(broadcast(ym), "y")
      .crossJoin(broadcast(n))
      .agg(sum((col("c") / col("n")) *
          log((col("c") * col("n")).cast("double") /
            (col("rx") * col("cy")))).as("mi"),
        count(lit(1)).as("cells"), first(col("n")).as("n"))
    val hx = xm.crossJoin(broadcast(n))
      .agg((-sum((col("rx") / col("n")) * log(col("rx") / col("n"))))
        .as("hx"))
    val hy = ym.crossJoin(broadcast(n))
      .agg((-sum((col("cy") / col("n")) * log(col("cy") / col("n"))))
        .as("hy"))
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("n"), col("cells"), round(col("mi"), 6).as("mi"),
        round(col("hx"), 6).as("hx"), round(col("hy"), 6).as("hy"),
        round(col("mi") / sqrt(col("hx") * col("hy")), 6).as("nmi"))
  }

  /** APPROXIMATE FUNCTIONAL DEPENDENCY discovery over declared
    * candidate pairs — the data-profiling primitive behind key
    * detection and schema-drift triage (Kivinen & Mannila's g3: the
    * fraction of rows that must be removed for lhs → rhs to hold;
    * confidence = 1 − g3/n = Σ_lhs max_rhs cnt / n). Each pair costs
    * ONE (lhs, rhs) count shuffle; the per-lhs argmax and the global
    * ratio ride the partial-agg output, and the census rows union
    * into one bounded frame.
    */
  def fdConfidence(pairs: Seq[(String, DataFrame, Column, Column)])
      : DataFrame = {
    require(pairs.nonEmpty, "declare at least one candidate FD")
    pairs.map { case (name, df, lhs, rhs) =>
      df.groupBy(lhs.as("__l"), rhs.as("__r"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("__l")
        .agg(max("__c").as("__mx"), sum("__c").as("__tot"))
        .agg(sum("__tot").as("n"), count(lit(1)).as("distinct_lhs"),
          (sum("__tot") - sum("__mx")).as("violations"),
          round(sum("__mx") / sum("__tot"), 6).as("conf"))
        .select(lit(name).as("fd"), col("n"), col("distinct_lhs"),
          col("violations"), col("conf"),
          (col("violations") === 0L).as("holds"))
    }.reduce(_.unionAll(_))
  }

  def iqrOutliers(df: DataFrame, groupCols: Seq[String], v: Column,
      k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.25)).as("__q1"),
        percentile(v, lit(0.75)).as("__q3"))
      .select(groupCols.map(col) ++ Seq(
        round(col("__q1") - lit(k) * (col("__q3") - col("__q1")), 6)
          .as("lo_fence"),
        round(col("__q3") + lit(k) * (col("__q3") - col("__q1")), 6)
          .as("hi_fence")): _*)
    df.join(broadcast(fences), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"),
        count(v).as("n"),
        count(when(v < col("lo_fence"), 1)).as("n_low"),
        count(when(v > col("hi_fence"), 1)).as("n_high"))
  }

  /** BLOOM-FILTER JOIN-PRUNING census: build an m-bit Bloom sketch
    * over the (filtered) build-side keys ([[graft.functions.BloomAgg]]
    * — word-wise-OR mergeable, partial/final like a sum), probe the
    * fact side against it as a LITERAL bitmap (m = 2¹⁶ → 8 KB, the
    * classic runtime-filter broadcast: the fact table is filtered
    * BEFORE its join shuffle, which at 100 TB is the difference
    * between shuffling 2% of lineitem and all of it), and report the
    * full economics: keys built, bits set, probe keys/rows passing,
    * true semi-join membership, false-positive count and rate.
    *
    * The one driver-side `.head` collects the finished 8 KB sketch —
    * bounded codebook-class state (the centroid/threshold convention),
    * re-emitted into the plan as an array literal so the membership
    * test stays inside whole-stage codegen. Every set bit and every
    * verdict is md5-derived and engine-portable: the oracle rebuilds
    * the identical bit set and reproduces pass/fail per key exactly.
    */
  def bloomJoinPrune(build: DataFrame, buildKey: Column,
      probe: DataFrame, probeKey: Column,
      mBits: Int = 65536, k: Int = 4): DataFrame = {
    import graft.functions.{BitExprs, BloomAgg}
    val bk = build.select(buildKey.cast("string").as("key"))
    val packed = shiftleft(BitExprs.md5Uint32(col("key"), "A"), 32)
      .bitwiseOR(BitExprs.md5Uint32(col("key"), "B"))
    val built = bk.agg(
      BloomAgg.bloomSketch(mBits, k)(packed).as("w"),
      countDistinct(col("key")).as("nb")).head()
    val words = built.getSeq[Long](0).toArray
    val nBuildKeys = built.getLong(1)
    val bitsSet = words.map(java.lang.Long.bitCount).sum.toLong

    // probe at KEY grain (one membership test per distinct key), with
    // per-key row counts so the row-grain scan savings fall out of the
    // same frame
    val pk = probe.select(probeKey.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("nrows"))
    // single-pass probe expression (spec-pinned equivalent to the
    // declarative bloomPos/bloomTest chain the oracle replays — see
    // BloomProbe's scaladoc for why the declarative form is 10× here)
    val pass = graft.functions.BloomProbe.probe(words, col("key"), mBits, k)
    val truth = bk.distinct().withColumn("is_true", lit(1))
    pk.withColumn("pass", pass.cast("int"))
      .join(truth, Seq("key"), "left")
      .withColumn("is_true", coalesce(col("is_true"), lit(0)))
      .agg(
        count(lit(1)).as("n_probe_keys"),
        sum(col("pass")).cast("long").as("pass_keys"),
        sum(col("is_true")).cast("long").as("true_keys"),
        sum(when(col("pass") === 1 && col("is_true") === 0, 1L)
          .otherwise(0L)).cast("long").as("false_pos_keys"),
        sum(col("nrows")).cast("long").as("n_probe_rows"),
        sum(when(col("pass") === 1, col("nrows")).otherwise(0L))
          .cast("long").as("pass_rows"))
      .withColumn("n_build_keys", lit(nBuildKeys))
      .withColumn("bits_set", lit(bitsSet))
      // NULL when every probe key is a true member: the 0/0 division
      // would yield IEEE NaN here but engine-dependent results in an
      // oracle (r14 advice) — "no non-member was probed" has no
      // measured fp rate, and NULL says so portably
      .withColumn("fp_rate",
        when(col("n_probe_keys") === col("true_keys"),
          lit(null).cast("double"))
          .otherwise(round(
            col("false_pos_keys").cast("double") /
              (col("n_probe_keys") - col("true_keys")).cast("double"), 6)))
      .select(col("n_build_keys"), col("bits_set"), col("n_probe_keys"),
        col("pass_keys"), col("true_keys"), col("false_pos_keys"),
        col("n_probe_rows"), col("pass_rows"), col("fp_rate"))
  }

  /** One-row (bitmap, distinct-key-count) Bloom sketch frame over a
    * single `key` string column — the shared build for
    * [[bloomJoinPrune]]/[[bloomDeltaMerge]].
    */
  private[graft] def bloomSketchFrame(keys: DataFrame, mBits: Int,
      k: Int): DataFrame = {
    import graft.functions.{BitExprs, BloomAgg}
    val packed = shiftleft(BitExprs.md5Uint32(col("key"), "A"), 32)
      .bitwiseOR(BitExprs.md5Uint32(col("key"), "B"))
    keys.agg(BloomAgg.bloomSketch(mBits, k)(packed).as("w"),
      countDistinct(col("key")).as("nk"))
  }

  /** BLOOM SKETCH DELTA MAINTENANCE — the sketch member of the
    * engine's maintenance matrix (components q218/q230, winnow q182,
    * ANN q188/q203/q211, KMV q220, histogram q227, rollup q226): a
    * persisted runtime-filter bitmap absorbs an appended key batch by
    * word-wise OR of the DELTA's sketch — no rescan of the base —
    * and, because OR is commutative/associative/idempotent, the
    * merged bitmap is BIT-IDENTICAL to a from-scratch rebuild over
    * base ∪ delta (deletions are out of contract, as for every Bloom
    * filter). The census frame proves it: word-exact merge-vs-
    * recompute comparison plus bit populations on all three sketches.
    *
    * Cost shape at 100 TB: the delta pays one aggregation over
    * ITSELF; the base contributes 8 KB of persisted words. The
    * recompute column exists for the oracle — a deployment would
    * drop it and trust the group property this query certifies.
    *
    * CRASH IDEMPOTENCE: a PURE frame transform — no persisted
    * state is mutated; re-running a died job recomputes the same
    * frame (run-twice ≡ run-once), and whatever sink publishes the
    * result owns its own atomicity (the engine's convention:
    * versioned snapshot dirs or batch-identity partitions).
    */
  def bloomDeltaMerge(baseKeys: DataFrame, baseKey: Column,
      deltaKeys: DataFrame, deltaKey: Column,
      mBits: Int = 65536, k: Int = 4): DataFrame = {
    val base = baseKeys.select(baseKey.cast("string").as("key"))
    val delta = deltaKeys.select(deltaKey.cast("string").as("key"))
    val bs = bloomSketchFrame(base, mBits, k)
      .select(col("w").as("bw"), col("nk").as("n_base_keys"))
    val ds = bloomSketchFrame(delta, mBits, k)
      .select(col("w").as("dw"), col("nk").as("n_delta_keys"))
    val rs = bloomSketchFrame(base.unionAll(delta), mBits, k)
      .select(col("w").as("rw"))
    val popcnt = (w: Column) =>
      aggregate(w, lit(0L), (acc, x) => acc + bit_count(x).cast("long"))
    bs.crossJoin(ds).crossJoin(rs)
      .withColumn("mw",
        zip_with(col("bw"), col("dw"), (x, y) => x.bitwiseOR(y)))
      .select(
        col("n_base_keys"), col("n_delta_keys"),
        popcnt(col("bw")).as("bits_base"),
        popcnt(col("dw")).as("bits_delta"),
        popcnt(col("mw")).as("bits_merged"),
        (col("mw") === col("rw")).cast("int")
          .as("merged_equals_recompute"))
  }
}

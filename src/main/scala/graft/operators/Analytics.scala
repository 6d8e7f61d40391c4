package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / window / top-k operator pack — SURVEY.md §2.4–§2.6.
  *
  * Everything here is a lazy DataFrame transform; Catalyst supplies partial
  * (map-side) aggregation, `TakeOrderedAndProject` for top-k, and
  * whole-stage codegen. Scale notes are on each operator.
  */
object Analytics {

  /** True iff the value is a usable measurement: non-null, not NaN, not
    * ±Inf. The numeric-stats convention shared by [[histogram]],
    * [[correlationMatrix]], [[zscorePerGroup]] and
    * [[robustScalePerGroup]]: a non-finite value is non-null, so it
    * would COUNT into n while its sum/percentile contribution poisons or
    * nulls out — n and the moments would describe different samples.
    * Treat it like null everywhere (and DuckDB oracles mirror this with
    * `isfinite`).
    */
  private[graft] def finite(c: Column): Column = {
    val d = c.cast("double")
    d.isNotNull && !isnan(d) && abs(d) =!= lit(Double.PositiveInfinity)
  }

  /** W1 — latest row per key (ref: dashboard.py:104-119, the reference's
    * one true window function: ROW_NUMBER() PARTITION BY event_id,
    * theater_name ORDER BY scraped_at DESC → rn=1).
    *
    * Scale: one hash shuffle on `keys`; within-partition sort only. At
    * 100 TB this is the standard "current state from an append log"
    * pattern — partition count rides `spark.sql.shuffle.partitions` / AQE,
    * and a skewed key is handled by AQE skew-join/agg splitting. `order`
    * must be a total order (include a unique tiebreaker) for deterministic
    * results.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** A3/A4/O6 — group-by aggregate then top-k. Catalyst plans the
    * sort+limit as TakeOrderedAndProject: each task keeps a k-row heap and
    * the driver merges k·numPartitions rows — no global sort at any scale.
    * `ord` must totally order rows (tiebreak on the group key).
    */
  def topKByAgg(df: DataFrame, groupCols: Seq[Column], aggs: Seq[Column],
                ord: Seq[Column], k: Int): DataFrame =
    df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*).orderBy(ord: _*).limit(k)

  /** A6 — per-group distinct count + deterministic ordered string-agg
    * (ref: dashboard.py:291-294 `nunique` + `', '.join(sorted(unique))`).
    * collect_set is bounded by group cardinality; for unbounded-cardinality
    * groups at 100 TB you'd cap with slice() after array_sort — the
    * reference's semantics (small genre groups) don't need it.
    */
  def distinctAndSortedList(df: DataFrame, groupCol: String, countCol: String,
                            listCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        countDistinct(col(countCol)).as("cnt_distinct"),
        concat_ws(", ", array_sort(collect_set(col(listCol)))).as("sorted_list"))

  /** F15 — threshold bucketing (ref: movie_events_scraper.py:493-501;
    * quantity → 보유/소진중/소량보유/소진). Pure codegen'd CASE WHEN — no
    * shuffle, vectorizes over the scan.
    */
  /** KMV (k-minimum-values) distinct-count sketch — a deterministic,
    * engine-portable alternative to HLL: hash every key to a uniform
    * double in [0,1) (13 md5 hex digits = 52 bits, exactly representable),
    * keep the k smallest distinct values; estimate = (k−1) / v_k.
    *
    * Scale shape: the distinct + top-k-smallest is one partial-aggregable
    * pass (each partition keeps its own k minima before the single-row
    * merge — here via sort+limit, which TakeOrderedAndProject runs as
    * per-partition heaps, no global sort). Unlike engine-private HLL
    * registers, the estimate is reproducible bit-for-bit in any engine
    * with md5 — the DuckDB oracle computes the identical number.
    *
    * Output: one row (k, est_distinct, true_distinct).
    */
  def kmvDistinctEstimate(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val v = conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    val mins = df.select(v.as("v")).distinct().orderBy(col("v").asc).limit(k)
      .agg(count(lit(1)).as("k"), max(col("v")).as("vk"))
    val truth = df.agg(countDistinct(col(keyCol)).as("true_distinct"))
    mins.crossJoin(truth)
      .select(col("k"),
        round((col("k") - 1).cast("double") / col("vk"), 6).as("est_distinct"),
        col("true_distinct"))
  }

  /** Deterministic Bernoulli sample: keep a row iff the uniform [0,1)
    * value derived from md5(key) falls under `rate`. Unlike
    * `df.sample()` (seeded per-partition RNG — resplitting the input
    * changes the sample), the decision is a pure function of the KEY:
    * reproducible across engines, partitionings, and reruns, and stable
    * under corpus growth (a kept row stays kept) — the property a
    * training-data subsample needs for ablation comparability.
    * 13 md5 hex digits = 52 bits, exactly representable in a double.
    */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(
      conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
        .cast("long").cast("double") / lit(4503599627370496.0) < rate)

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row gets the key ln(u)/w with u an md5-derived
    * uniform of (id, salt) and w its weight; the n LARGEST keys are the
    * sample — exactly the classic uᵢ^(1/wᵢ) order statistic in log form
    * (monotone-equivalent, numerically tame for tiny weights). This is
    * how a pipeline draws a quality-weighted corpus subsample (DSIR-style
    * importance resampling, temperature-free): inclusion probability
    * scales with w, no replacement, and — the [[deterministicSample]]
    * discipline — the draw is a pure function of (id, salt, w):
    * reproducible across engines, partitionings, and reruns; a new salt
    * is a fresh independent draw.
    *
    * Scale: one narrow map pass + `orderBy().limit(n)` →
    * TakeOrderedAndProject (per-partition n-heaps, driver merge — no
    * global sort, no window). u = (h52 + 0.5)/2⁵² keeps u strictly
    * inside (0,1) so ln(u) is finite; rows with NULL, NaN, ±Inf or
    * non-positive weight are excluded — the shared [[finite]] discipline
    * (Spark's `NaN > 0` is false but DuckDB sorts NaN above everything,
    * so only an explicit finiteness filter keeps the two engines'
    * samples identical; +Inf would likewise always win the draw). Ties
    * (same key) break by id in both engines.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, salt: String): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1, got $n")
    df.filter(finite(col(weightCol)) && esWeight(weightCol) > 0)
      .withColumn("__esk", esKey(idCol, weightCol, salt))
      .orderBy(col("__esk").desc, col(idCol).asc)
      .limit(n)
      .drop("__esk")
  }

  /** Deterministic Gumbel-top-k selection over LOG-weights — the DSIR
    * selection step (sample k items with probability ∝ w, WITHOUT ever
    * computing w = exp(log w)): each row's key is
    *   g = log_w + (−ln(−ln u)),   u = md5-uniform of (id, salt),
    * and the k LARGEST keys are the sample (the Gumbel-max trick; adding
    * Gumbel noise to log-weights and taking the arg-top-k draws from the
    * softmax over weights). Working in log space matters because DSIR
    * log-weights span hundreds of nats — exp overflows a double long
    * before the selection would saturate — and because negative
    * log-weights are valid here, which the Efraimidis–Spirakis u^(1/w)
    * form ([[weightedSample]]) cannot accept. Deterministic for the same
    * reasons as the E-S sampler: u is a pure function of (id, salt), so
    * the draw is stable across engines, partitionings, and reruns.
    * NaN/±Inf log-weights are excluded up front (a NaN key would poison
    * the ordering; +Inf would always win).
    *
    * Scale: orderBy+limit plans as TakeOrderedAndProject — per-partition
    * heaps of k, single driver merge, no global sort.
    */
  def gumbelTopK(df: DataFrame, idCol: String, logWeightCol: String,
                 n: Int, salt: String): DataFrame = {
    require(n >= 1, s"gumbelTopK: n must be >= 1, got $n")
    df.filter(finite(col(logWeightCol)))
      .withColumn("__gk",
        col(logWeightCol).cast("double") - log(-log(mdUniform(idCol, salt))))
      .orderBy(col("__gk").desc, col(idCol).asc)
      .limit(n)
      .drop("__gk")
  }

  /** The shared md5 uniform of (id, salt): strictly inside (0,1), 52
    * exactly-representable bits — used by the E-S key, the Gumbel key,
    * and their threshold-select duals so all four draw IDENTICAL noise.
    */
  private def mdUniform(idCol: String, salt: String): Column =
    (conv(substring(md5(concat(col(idCol).cast("string"), lit("_" + salt))),
        1, 13), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4503599627370496.0)

  /** [[gumbelTopK]] with DISTRIBUTED threshold selection — the form a
    * 100 TB DSIR resampling run needs (round-11 verdict #1): the heap
    * form's `orderBy().limit(n)` plans as TakeOrderedAndProject, whose
    * final step merges up to n·numPartitions candidate rows ON THE
    * DRIVER — optimal at dashboard-scale n, a single-process funnel when
    * a training mix draws tens of millions of documents. Here the
    * selection is a FILTER: compute the exact n-th largest Gumbel key
    * (g desc, id asc — the heap form's total order) and keep rows above
    * it, so selected rows never leave their executors.
    *
    * Threshold discovery (approx-quantile bracket + exact trim, all
    * distributed, driver holds only scalars):
    *   1. one `approxQuantile` pass brackets the n-th key from below —
    *      the relative error ε is sized so the surviving band holds
    *      between n and ~2n + 3εN rows, GUARANTEED ≥ n by the
    *      Greenwald–Khanna rank bound (checked, with a full-frame
    *      fallback if the bound were ever violated);
    *   2. the band's key column (doubles only, no payload) is
    *      range-sort-partitioned (`sortBy` — a distributed sort, not a
    *      driver merge) and the n-th value extracted by partition-offset
    *      arithmetic (`zipWithIndex` holds per-partition COUNTS on the
    *      driver, never rows);
    *   3. selected = band rows with key > τ, plus the ≤ handful of
    *      key == τ ties broken by id (md5-derived doubles collide with
    *      probability ~2⁻⁵², so the tie group is ~1 row; its tiny
    *      `orderBy(id).limit` is bounded by the collision count, not n).
    *
    * Returns EXACTLY the [[gumbelTopK]] set at equal (n, salt) — the
    * spec pins set equality and the absence of TakeOrderedAndProject
    * from the selection plan. Cost, honestly counted: ONE full pass to
    * materialize the persisted keyed projection, then ~5 SMALL actions
    * over caches (total count + approx-quantile share the keyed cache;
    * band count, the key-only range-sort job for τ, and the
    * above/ties counts run over the O(n)-row band cache) — cheap at
    * scale because the band is key-only and O(n), but it is NOT "one
    * extra pass".
    *
    * EAGER, unlike the rest of this pack's lazy builders: those actions
    * run AT CALL TIME (the τ threshold must be a literal in the
    * returned plan). Callers composing lazy plan graphs should call
    * this last, once inputs are final.
    */
  def gumbelSelect(df: DataFrame, idCol: String, logWeightCol: String,
                   n: Int, salt: String): DataFrame = {
    require(n >= 1, s"gumbelSelect: n must be >= 1, got $n")
    thresholdSelect(
      df.filter(finite(col(logWeightCol))),
      idCol,
      col(logWeightCol).cast("double") - log(-log(mdUniform(idCol, salt))),
      n)
  }

  /** [[weightedSample]] (Efraimidis–Spirakis without replacement) with
    * the same distributed threshold selection as [[gumbelSelect]] —
    * identical sample at equal (n, salt), no driver-side k-row merge.
    * EAGER like [[gumbelSelect]]: the threshold actions run at call
    * time (see its scaladoc for the exact action count).
    */
  def weightedSampleSelect(df: DataFrame, idCol: String, weightCol: String,
                           n: Int, salt: String): DataFrame = {
    require(n >= 1, s"weightedSampleSelect: n must be >= 1, got $n")
    thresholdSelect(
      df.filter(finite(col(weightCol)) && esWeight(weightCol) > 0),
      idCol, esKey(idCol, weightCol, salt), n)
  }

  /** Shared distributed top-n-by-key core of [[gumbelSelect]] /
    * [[weightedSampleSelect]]: exact (key desc, id asc) top-n as a
    * filter. `df` must already be filtered to rows with a usable key.
    */
  private def thresholdSelect(df: DataFrame, idCol: String, key: Column,
                              n: Int): DataFrame = {
    val keyed = OpCache.persist(df.withColumn("__tsk", key))
    val total = keyed.count()
    if (total <= n) return keyed.drop("__tsk")
    // Greenwald–Khanna bound: approxQuantile(p, ε) returns a value whose
    // true rank is within ε·total of p·total. Bracket from BELOW the
    // n-th-from-top position by ε·total + 1 so count(key > vLo) ≥ n is
    // guaranteed; ε itself scales with n/total (band stays O(n)) with a
    // 1e-6 floor so the quantile sketch stays cheap on huge frames.
    val eps = math.max(n.toDouble / (4.0 * total), 1e-6)
    val p = 1.0 - math.min(1.0, (n + 2.0 * eps * total + 1.0) / total)
    val band =
      if (p <= 0.0) keyed // already persisted above — no double-persist
      else {
        val vLo = keyed.stat.approxQuantile("__tsk", Array(p), eps).head
        val b = keyed.filter(col("__tsk") > lit(vLo))
        // paranoia: the rank bound makes this unreachable, but an exact
        // selection must never silently depend on an approximation.
        // Count BEFORE persisting so the fallback branch returns the
        // already-persisted `keyed` as-is instead of re-registering it
        // with OpCache (double-tracking → double unpersist on clear());
        // the count itself is a cheap filter scan over keyed's cache.
        if (b.count() >= n) OpCache.persist(b) else keyed
      }
    // exact n-th (key desc) via a distributed range sort of the KEY
    // column only; zipWithIndex ships per-partition counts, not rows
    val tau = band.select(col("__tsk")).rdd.map(_.getDouble(0))
      .sortBy(identity, ascending = false)
      .zipWithIndex()
      .filter(_._2 == n - 1)
      .map(_._1)
      .first()
    val above = band.filter(col("__tsk") > lit(tau))
    val needTies = n - above.count()
    val ties = band.filter(col("__tsk") === lit(tau))
    // keys are md5-derived doubles, so the tie group at τ is one row in
    // anything but a ~2⁻⁵² collision: the normal path unions a PURE
    // FILTER (no TakeOrdered node anywhere in the plan — the spec pins
    // this); only a genuine collision among winners falls back to an
    // id-ranked pick bounded by the collision count, never by n
    val tiesPicked =
      if (ties.count() <= needTies) ties
      else ties.orderBy(col(idCol).asc).limit(needTies.toInt)
    above.unionByName(tiesPicked).drop("__tsk")
  }

  private def esWeight(weightCol: String): Column = col(weightCol).cast("double")

  /** The shared Efraimidis–Spirakis key ln(u)/w (see [[weightedSample]]). */
  private def esKey(idCol: String, weightCol: String, salt: String): Column =
    log(mdUniform(idCol, salt)) / esWeight(weightCol)

  /** [[weightedSample]] with a PER-GROUP quota — the form a mixture
    * pipeline actually runs: up to `nPerGroup` rows per (language,
    * domain, source, …) cell, drawn weight-proportionally without
    * replacement inside each cell, deterministically (same md5-keyed
    * draw, so a cell's sample is stable as OTHER cells grow). The
    * [[cappedPerGroup]] quota shape with importance weights instead of
    * an ordering column.
    *
    * Scale: one group-keyed window (rank within group over the E-S key)
    * — the shuffle is by group key; per-group state is the rank counter,
    * never a buffer. Skewed cells rank in parallel within their
    * partition's sort (no global sort).
    */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String,
                             nPerGroup: Int, salt: String): DataFrame = {
    require(nPerGroup >= 1,
      s"weightedSamplePerGroup: nPerGroup must be >= 1, got $nPerGroup")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__esk").desc, col(idCol).asc)
    df.filter(finite(col(weightCol)) && esWeight(weightCol) > 0)
      .withColumn("__esk", esKey(idCol, weightCol, salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerGroup)
      .drop("__esk", "__rn")
  }

  /** Ordered funnel: for each user, the time each stage was FIRST reached
    * respecting stage order — t₁ = min time of stage 1, tᵢ = min time of
    * stage i strictly after tᵢ₋₁. Users appear once they reach stage 1;
    * unreached later stages are null (`t_1 … t_n` columns). This is the
    * strict sequential-funnel semantics (a purchase before the first
    * click does not count), not mere per-stage minima.
    *
    * Scale shape: the stage-filtered event stream is persisted once and
    * re-probed per stage; every join and aggregation is keyed by user, so
    * all n-1 rounds shuffle only the (tiny) per-user stage frontier plus
    * the one stage's filtered events — never the full log twice. n is
    * small and fixed (funnel definitions are hand-written), so the
    * linear-round plan stays shallow.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    val ev = OpCache.persist(events
      .select(col(userCol), col(typeCol), col(tsCol))
      .filter(col(typeCol).isin(stages: _*)))
    var acc = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_1"))
    stages.tail.zipWithIndex.foreach { case (s, i) =>
      val prev = s"t_${i + 1}"
      val cur = s"t_${i + 2}"
      val nxt = ev.filter(col(typeCol) === s)
        .join(acc.select(col(userCol), col(prev)), userCol)
        .filter(col(tsCol) > col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    acc
  }

  /** Cohort retention: bucket every event time by `bucket` (same unit as
    * `tsCol` — e.g. a day of nanos for the nanos-long event log), cohort
    * = the user's first bucket, and count distinct users per
    * (cohort, bucket_offset). One shuffle by user for the first-bucket
    * window, one aggregation — the classic retention-triangle input.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       bucket: Long): DataFrame = {
    require(bucket > 0)
    val d = expr(s"CAST($tsCol AS BIGINT) div $bucket")
    events.withColumn("__d", d)
      .withColumn("__first", min(col("__d")).over(Window.partitionBy(col(userCol))))
      .groupBy(col("__first").as("cohort"),
        (col("__d") - col("__first")).as("bucket_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Deterministic train/val/test assignment: the split label is a pure
    * function of the key — the same 52-bit md5-prefix fraction as
    * [[deterministicSample]] — so membership is reproducible across
    * engines, partitionings, and reruns, and STABLE UNDER CORPUS GROWTH
    * (a doc never migrates between splits when new data arrives; the
    * property that keeps eval sets uncontaminated across dataset
    * versions). Bands: u < testRate → test, u < testRate+valRate → val,
    * else train. Map-side only — no shuffle, no RNG state.
    */
  def withSplit(df: DataFrame, keyCol: String,
                valRate: Double, testRate: Double): DataFrame = {
    require(valRate >= 0 && testRate >= 0 && valRate + testRate < 1,
      s"split rates must be >= 0 and sum below 1, got val=$valRate test=$testRate")
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)
    df.withColumn("split",
      when(u < testRate, "test")
        .when(u < testRate + valRate, "val")
        .otherwise("train"))
  }

  /** Column profiling: for each requested column — row count, null
    * count, exact distinct count, min/max rendered as strings — one row
    * per column.
    *
    * Shape: the non-distinct stats (count/nulls/min/max for ALL columns)
    * come from ONE partial-aggregable pass; each exact distinct count is
    * its own column-pruned aggregation, unioned and broadcast-joined
    * back. k distinct counts in a single agg would make Catalyst EXPAND
    * every input row k+1× through one big shuffle (measured 6.1 s vs
    * ~2 s at sf0.1 for 5 columns) — per-column distinct aggs instead
    * partial-aggregate map-side, so each exchange carries only that
    * column's per-partition distinct values. The same property is what
    * survives 100 TB: k narrow columnar scans beat one (k+1)×-row
    * shuffle; for truly high-cardinality columns swap in
    * `approx_count_distinct` — the output contract is unchanged.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val pruned = OpCache.persist(df.select(cols.map(col): _*))
    val baseAggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    val base = pruned.agg(baseAggs.head, baseAggs.tail: _*)
      .select(col("__n"), expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("column_name", "__nn", "min_val", "max_val")))
    val distincts = cols.map(c =>
        pruned.select(col(c))
          .agg(countDistinct(col(c)).as("n_distinct"))
          .select(lit(c).as("column_name"), col("n_distinct")))
      .reduce(_ unionByName _)
    base.join(distincts, "column_name")
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Exact equi-width histogram: derive [min, max] in one tiny aggregate,
    * broadcast it, bucket every row map-side (bin = floor((x−lo)/w),
    * last bin closed), ONE group-sized aggregation — the distribution
    * profile behind length/score banding decisions in corpus curation.
    * Empty bins are absent from the output (count 0 adds no information
    * and no join). Cross-engine exactness: identical double arithmetic
    * from the same exact bounds in both engines; a degenerate column
    * (min = max) puts everything in bin 0 instead of dividing by zero.
    * Scale: two passes over the column (bounds + bucketing) — both
    * pruned scans; at 100 TB feed `bounds` from table statistics and it
    * drops to one.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"histogram: nBins must be >= 1, got $nBins")
    // A NaN would poison max → NaN width → every row in a garbage bin 0,
    // and ONE ±Inf bound makes width Inf → every finite row collapses to
    // bin 0 while the Inf row itself lands in bin nBins−1 via least()'s
    // null-skip (and the oracle's int cast errors): exclude every
    // non-finite value like null — a non-value, not a bucketable
    // measurement. persist: bounds + bucketing are two passes over the
    // same narrow projection (the profile() convention).
    val v = OpCache.persist(df.select(col(valueCol).cast("double").as("__x"))
      .filter(finite(col("__x"))))
    val bounds = v.agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val w = (col("__hi") - col("__lo")) / nBins
    v.crossJoin(Hints.bcast(bounds))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBins - 1),
            floor((col("__x") - col("__lo")) / w).cast("int"))))
      .groupBy("bin", "__lo", "__hi")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), col("n"),
        (col("__lo") + col("bin") * w).as("bin_lo"),
        (col("__lo") + (col("bin") + 1) * w).as("bin_hi"))
  }

  /** Equi-DEPTH histogram — [[histogram]]'s quantile dual: bin edges at
    * the i/nBins exact interpolated percentiles (rounded to 6 dp, the
    * `q_percentiles` engine-portability convention), so bins hold ~equal
    * row counts however skewed the distribution — the binning a skewed
    * value column (docs lengths, prices) actually needs, and the same
    * statistic a CBO's equi-height column histogram keeps.
    *
    * Shape: one tiny percentile agg (exact percentile sorts within the
    * agg — the documented swap at the 100 TB tier is
    * `approx_percentile`, same call shape) broadcast-crossed back, then
    * bucket = #edges strictly below v via a literal-array `filter` —
    * map-side — and one group-sized agg. A value equal to an edge falls
    * in the LOWER bin in both engines. Non-finite values are excluded
    * like null (the [[finite]] convention).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"equiDepthHistogram: nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val v = df.select(col(valueCol).cast("double").as("__x"))
      .filter(finite(col("__x")))
    val bounds = v.agg(
      transform(
        expr(s"percentile(__x, array(${ps.mkString(", ")}))"),
        b => round(b, 6)).as("__edges"))
    v.crossJoin(Hints.bcast(bounds))
      .withColumn("bucket",
        size(filter(col("__edges"), b => col("__x") > b)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min(col("__x")).as("lo"), max(col("__x")).as("hi"))
  }

  /** Curriculum ordering — a deterministic training-data schedule:
    * equi-depth quantile buckets of a difficulty/quality score (read
    * buckets in order: curriculum learning's easy→hard progression)
    * with an md5-shuffled order WITHIN each bucket (so consecutive
    * examples aren't score-sorted — the shuffle every dataloader
    * needs, but reproducible: a pure function of (key, salt), stable
    * under repartitioning, replay, and corpus growth, per the
    * [[deterministicSample]] discipline; a new salt is a fresh
    * epoch's shuffle).
    *
    * Shape: one tiny percentile agg broadcast back + one window
    * partitioned BY BUCKET (parallel across buckets — never a global
    * single-partition sort). Output adds (bucket, ord); consumers
    * stream buckets ascending, each in ord order.
    */
  def curriculumOrder(df: DataFrame, keyCol: String, scoreCol: String,
                      nBuckets: Int, salt: String): DataFrame = {
    require(nBuckets >= 2, s"curriculumOrder: nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val v = df.filter(finite(col(scoreCol)))
    val edges = v.agg(
      transform(
        expr(s"percentile(CAST($scoreCol AS DOUBLE), array(${ps.mkString(", ")}))"),
        b => round(b, 6)).as("__edges"))
    val shuffleKey = md5(concat(col(keyCol).cast("string"), lit(":" + salt)))
    v.crossJoin(Hints.bcast(edges))
      .withColumn("bucket",
        size(filter(col("__edges"), b => col(scoreCol).cast("double") > b)))
      .withColumn("ord", row_number().over(
        Window.partitionBy("bucket").orderBy(shuffleKey, col(keyCol))))
      .drop("__edges")
  }

  /** Exact Pearson correlation matrix over numeric columns — the
    * feature-selection profile: one row per column pair with the
    * pairwise-complete sample size and r. ONE partial-aggregable pass
    * computes every pair's conditional sums (n, Σx, Σy, Σxy, Σx², Σy²
    * over rows where BOTH sides are finite — null/NaN/±Inf in one column
    * must not poison its other pairs); r derives from the scale-free
    * integer identity r = A/√(Bx·By) with A = n·Sxy·10⁶ − Sx·Sy,
    * Bx = n·Sx2·10⁶ − Sx² (the ×10⁶ per-value scale cancels).
    *
    * Cross-engine exactness WITHOUT per-row BigDecimal (the
    * [[graft.functions.DotFixedPoint]] discipline applied to scalar
    * sums): each per-row value v (x, y, x·y, x², y²) becomes the
    * fixed-point integer floor(v·10⁶), decomposed into three long limbs
    * base 2²⁰ (h = ⌊p/2⁴⁰⌋, mid, lo ∈ [0,2²⁰) — pure IEEE-identical
    * double/long arithmetic in both engines, floor-division composition
    * keeps every limb exact). The 15 limb sums per pair are plain
    * codegen'd LONG sums — order-independent and exact — reassembled
    * into exact DECIMAL(38,0) integers only on the final one-row
    * projection, cast to double once, and fed to the same r formula and
    * parenthesization in both engines. Overflow is GUARDED, not silent:
    * a same-pass max|p| aggregate feeds a raise_error check on limb-sum
    * capacity (n < 2⁴³ for the low limbs, n·(max|p|/2⁴⁰+1) < 2⁶³ for the
    * high limb) — at lineitem-like magnitudes (|x·y| ≲ 10¹⁰) that
    * envelope holds to ~10¹⁴ rows, i.e. the 100 TB shape; beyond it the
    * operator fails loudly instead of wrapping. Constant columns (zero
    * variance) yield a null r rather than 0/0. 16·k(k−1)/2 + k
    * long aggregates stay one aggregation row at any corpus scale, and
    * the count is kept ≤ spark.sql.codegen.maxFields (100) for k ≤ 4 so
    * the pass stays inside whole-stage codegen; for wider matrices raise
    * that conf to keep codegen (correctness is unaffected either way).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix: need at least two columns")
    val B20 = 1048576L          // 2^20, limb base
    val B40 = 1099511627776L    // 2^40
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j), s"${i}_$j")
    // a NaN/±Inf is non-null, so it would COUNT into n while poisoning
    // the sums — n and the sums would describe different samples and r
    // would be silently wrong (and the oracle's int casts would error).
    // Treat any non-finite value like null: the row leaves the pair.
    def ok(c: String) = finite(col(c).cast("double"))
    val pairAggs = pairs.flatMap { case (a, b, t) =>
      val both = ok(a) && ok(b)
      val x = col(a).cast("double")
      val y = col(b).cast("double")
      val vals = Seq("x" -> x, "y" -> y, "xy" -> (x * y),
        "x2" -> (x * x), "y2" -> (y * y))
      val limbSums = vals.flatMap { case (tag, v) =>
        val p = v * lit(1e6)
        // dividing a double by a power of two only shifts the exponent —
        // exact in both engines — and ⌊⌊p/2²⁰⌋/2²⁰⌋ = ⌊p/2⁴⁰⌋, so the
        // three limbs reassemble to exactly ⌊p⌋: h·2⁴⁰ + mid·2²⁰ + lo
        val q1 = floor(p / lit(1048576.0))       // ⌊p/2²⁰⌋, long
        val h = floor(p / lit(1099511627776.0))  // ⌊p/2⁴⁰⌋, long
        val mid = q1 - h * lit(B20)              // ∈ [0, 2²⁰)
        val lo = floor(p) - q1 * lit(B20)        // ∈ [0, 2²⁰)
        Seq(sum(when(both, h)).as(s"__h_${tag}_$t"),
          sum(when(both, mid)).as(s"__m_${tag}_$t"),
          sum(when(both, lo)).as(s"__l_${tag}_$t"))
      }
      limbSums :+ count(when(both, lit(1))).as(s"__n_$t")
    }
    // ONE filtered max-|p| per COLUMN (not per pair) keeps the aggregate
    // count at 16·k(k−1)/2 + k — with the 4-column flagship that is 100,
    // exactly the spark.sql.codegen.maxFields default, so the pass stays
    // inside whole-stage codegen (at 102 it silently fell out — measured
    // 4.4 s vs 1.x s). Per-pair guard bounds derive from column maxes:
    // max|x·y| ≤ max|x|·max|y|, conservative and still loud, and an x·y
    // that overflowed to Inf is ≤ that product too.
    val colMaxes = cols.map(c =>
      max(when(ok(c), abs(col(c).cast("double") * lit(1e6)))).as(s"__cm_$c"))
    val aggs = pairAggs ++ colMaxes
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b, t) =>
      // exact integer Σ⌊v·10⁶⌋ reassembled from the limb sums, brought
      // back to value scale as a DOUBLE: one int→double rounding, then
      // one /1e6 double divide — the identical two-step sequence the
      // oracle runs, so both engines see the same 64-bit sums
      def S(tag: String): Column =
        (col(s"__h_${tag}_$t").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * lit(B40) +
          col(s"__m_${tag}_$t").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * lit(B20) +
          col(s"__l_${tag}_$t")).cast("double") / lit(1e6)
      val n = col(s"__n_$t")
      val nD = n.cast("double")
      val sx = S("x"); val sy = S("y")
      val den2 = (nD * S("x2") - sx * sx) * (nD * S("y2") - sy * sy)
      // capacity guards (loud, from the same pass): per-row |p| must fit
      // a long with slack; low/mid limb sums hold n·2²⁰ (n < 2⁴³); the
      // high-limb sum holds n·(max|p|/2⁴⁰+1). max|p| over the five value
      // exprs is bounded from the two column maxes: max|x·y|·10⁶ ≤
      // (max|x|·10⁶)·(max|y|·10⁶)/10⁶ (holds even when x·y overflowed to
      // Inf). Checked in double.
      val mx = col(s"__cm_$a"); val my = col(s"__cm_$b")
      val m = greatest(mx, my, mx * my / lit(1e6),
        mx * mx / lit(1e6), my * my / lit(1e6))
      val risk = (m >= lit(4.6e18)) || (nD >= lit(8.0e12)) ||
        (nD * (m / lit(1099511627776.0) + lit(1.0)) >= lit(9.0e18))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), n.as("n"),
        when(risk, raise_error(concat(
            lit(s"correlationMatrix: fixed-point capacity exceeded for ($a, $b): n="),
            nD.cast("string"), lit(" max|p|="), m.cast("string"))))
          .otherwise(when(den2 > 0,
            round((nD * S("xy") - sx * sy) / sqrt(den2), 6)))
          .as("corr"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select("__p.*")
  }

  /** Per-group z-score feature normalization — the standard numeric
    * preprocessing step before model training: z = (x − μ_g) / σ_g with
    * group mean/stddev (population σ). Shape: ONE hash aggregation to
    * group-sized stats + a broadcast join back — the stats table has one
    * row per group (dimension-sized at any corpus scale), so the data
    * side never shuffles. Cross-engine exactness: μ and σ derive from
    * DECIMAL(38,6)-routed sums of x and x² (order-independent), then
    * identical double arithmetic in both engines; exported z is rounded
    * to 6. Degenerate groups (σ = 0, e.g. a single row) get z = 0 rather
    * than a 0/0 NaN; cancellation in σ² = s2/n − μ² is clamped at 0.
    *
    * Non-value handling (round-3 review + round-4 advice): n counts
    * FINITE values only ([[finite]]) — a null must not dilute μ/σ, and a
    * NaN/±Inf would COUNT into n while its decimal-cast sum nulls out,
    * leaving n and the sums describing different samples (silently wrong
    * σ). Non-finite rows keep a null z instead. The stats join back is
    * NULL-SAFE on the group keys, so rows in a null group are normalized
    * within that group rather than silently dropped from the feature
    * table.
    */
  def zscorePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     outCol: String = "zscore"): DataFrame = {
    val g = groupCols.map(col)
    val v = when(finite(col(valueCol)), col(valueCol))
    val stats = df.groupBy(g: _*).agg(
        count(v).cast("double").as("__n"),
        sum(graft.Tables.dec(v)).cast("double").as("__s"),
        sum(graft.Tables.dec(v * v)).cast("double").as("__s2"))
      .withColumn("__mean", col("__s") / col("__n"))
      .withColumn("__std",
        sqrt(greatest(lit(0.0), col("__s2") / col("__n") - col("__mean") * col("__mean"))))
      .select(g :+ col("__mean") :+ col("__std"): _*)
    joinGroupStats(df, stats, groupCols)
      .withColumn(outCol,
        when(!finite(col(valueCol)), lit(null).cast("double"))
          .when(col("__std") > 0,
            round((col(valueCol) - col("__mean")) / col("__std"), 6))
          .otherwise(lit(0.0)))
      .drop("__mean", "__std")
  }

  /** NULL-SAFE broadcast join of a group-keyed stats table back onto the
    * data (shared by [[zscorePerGroup]]/[[robustScalePerGroup]]): rows in
    * a null group match their stats row instead of silently dropping.
    */
  private def joinGroupStats(df: DataFrame, stats: DataFrame,
                             groupCols: Seq[String]): DataFrame = {
    val l = df.alias("__zl")
    val r = Hints.bcast(stats.alias("__zr"))
    val rGroupCols = groupCols.map(c => col(s"__zr.$c"))
    l.join(r, groupCols.map(c => col(s"__zl.$c") <=> col(s"__zr.$c")).reduce(_ && _))
      .drop(rGroupCols.head, rGroupCols.tail: _*)
  }

  /** Per-group ROBUST scaling — the outlier-resistant sibling of
    * [[zscorePerGroup]]: z = (x − median_g) / IQR_g. Mean/stddev move
    * with every heavy-tailed outlier (a handful of giant documents drag
    * μ and explode σ); median and interquartile range don't, which is
    * why sklearn-style pipelines default to RobustScaler on skewed
    * features. Same shape: one group-sized aggregate (Spark's exact
    * `percentile` — the [[q_percentiles]] parity convention with DuckDB
    * `quantile_cont`), broadcast back (null-safe), map-side scale.
    * Cross-engine exactness: each percentile is rounded to 6 BEFORE the
    * subtraction/divide so both engines run identical double arithmetic;
    * zero-IQR groups get 0 (not a division blow-up), non-finite
    * measurements ([[finite]] — a NaN would sort into the percentile
    * buffer and shift every quantile) keep a null z and leave the stats.
    */
  def robustScalePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          outCol: String = "robust_z"): DataFrame = {
    val g = groupCols.map(col)
    // ONE percentile aggregate with an array of fractions: a single
    // sorted buffer per group instead of three independent full copies
    // (each percentile(x, p) call buffers and sorts the whole group).
    // percentile skips nulls, so pre-projecting the value through the
    // SAME [[finite]] predicate the z-null rule uses drops non-finite
    // values from the buffer — one definition of "usable measurement",
    // not a second SQL-string spelling of it (round-4 review).
    val q = expr("percentile(__fin, array(0.25D, 0.5D, 0.75D))")
    val stats = df
      .withColumn("__fin", when(finite(col(valueCol)), col(valueCol)))
      .groupBy(g: _*).agg(q.as("__q"))
      .select(g :+ round(element_at(col("__q"), 2), 6).as("__med") :+
        (round(element_at(col("__q"), 3), 6)
          - round(element_at(col("__q"), 1), 6)).as("__iqr"): _*)
    joinGroupStats(df, stats, groupCols)
      .withColumn(outCol,
        when(!finite(col(valueCol)), lit(null).cast("double"))
          .when(col("__iqr") > 0,
            round((col(valueCol) - col("__med")) / col("__iqr"), 6))
          .otherwise(lit(0.0)))
      .drop("__med", "__iqr")
  }

  /** Gap-based sessionization: a new session starts whenever the gap to
    * the previous event (per key, time-ordered) exceeds `gap`. Classic
    * two-window shape — lag to flag breaks, running sum of breaks as the
    * session ordinal — ONE shuffle by key; both windows share the same
    * partitioning/ordering so they run in a single Window exec pair.
    * Deterministic given a total (timeCol, tieBreak) order per key.
    */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
                 tieBreak: Seq[String], gap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((timeCol +: tieBreak).map(col(_).asc): _*)
    df.withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || col(timeCol) - col("__prev") > gap, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)))
      .drop("__prev", "__brk")
  }

  /** Per-group capped deterministic sample: keep at most `k` rows per
    * group, chosen by md5(key) order (reproducible across engines,
    * partitionings, and reruns — see [[deterministicSample]]). The
    * training-mix primitive: cap each source/language at a quota without
    * a global sort. One shuffle by group key; row_number runs per
    * partition. Skew note: a group 100× larger than the rest still sorts
    * only within its own partition — for truly pathological groups,
    * pre-filter with deterministicSample to ~k/|group| first.
    */
  def cappedPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted training-mix assembly: per-group quotas proportional to
    * `weights` (quota_g = floor(total · w_g / Σw)), rows chosen within
    * each group by md5(key) order — the deterministic mix construction a
    * data pipeline uses to hit a target corpus composition. Groups
    * absent from `weights` are excluded. Same scale shape as
    * [[cappedPerGroup]]: one shuffle by group, per-group heads, no
    * global sort; quotas are plan-time literals so the filter is
    * codegen'd.
    */
  def weightedMix(df: DataFrame, groupCol: String, keyCol: String,
                  weights: Map[String, Double], total: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val wsum = weights.values.sum
    // floor with a 1e-9 nudge: total*w/wsum computed in binary doubles can
    // land one ulp BELOW an exact integer quota (e.g. 200*0.7/5.6) and a
    // bare toLong would short the group by one row
    val quota = weights.map { case (g, w) =>
      (g, math.floor(total * w / wsum + 1e-9).toLong)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    val quotaCol = quota.foldLeft(lit(0L)) { case (acc, (g, q)) =>
      when(col(groupCol) === g, lit(q)).otherwise(acc)
    }
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol)
      .drop("__rn")
  }

  /** Temperature-scaled mix: per-group quotas derived from the DATA —
    * w_g = n_g^alpha, quota_g = floor(total · w_g / Σw). alpha < 1
    * flattens the natural distribution (the multilingual-corpus
    * balancing rule: small groups get an upsampled share, large ones
    * are downsampled); alpha = 1 keeps it; alpha = 0 is uniform. Rows
    * within a group are picked by md5(key) order as in [[weightedMix]].
    *
    * Cross-engine exactness: weights are rounded to 6 dp and summed in
    * DECIMAL (exact, order-independent — a double sum's value depends
    * on partition merge order), then the quota division runs in doubles
    * converted from those exact decimals, so every engine computes
    * identical quotas. alpha = 0.5 goes through sqrt (IEEE
    * correctly-rounded everywhere); other alphas use pow, whose
    * last-ulp behavior is libm-specific — fine in production, but the
    * oracle-checked query pins alpha = 0.5.
    *
    * Scale shape: the count is one partial-aggregable pass; the quota
    * table is group-cardinality-sized and broadcast; the only
    * corpus-sized exchange is the per-group window shuffle — same shape
    * as [[cappedPerGroup]]/[[weightedMix]]. With FEW groups (languages)
    * that window runs on #groups reducers; when quota ≪ n_g — the
    * normal 100 TB case — pre-filter each group with
    * [[deterministicSample]] at ~quota/n_g with slack first (md5 keys
    * make the sample a PREFIX-superset of the window's pick order, so
    * the result is identical), then window the small remainder.
    */
  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String,
                     alpha: Double, total: Long): DataFrame = {
    // NULL-group rows are excluded up front (the analogue of
    // weightedMix's unweighted groups) — counting them would inflate Σw
    // and deflate every real group's quota while the equi-join silently
    // dropped their rows anyway
    val in = df.filter(col(groupCol).isNotNull)
    val nD = col("__n").cast("double")
    val wexpr = if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))
    val wts = OpCache.persist(in.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .select(col(groupCol), round(wexpr, 6).cast("decimal(18,6)").as("__w")))
    val quotas = wts.crossJoin(Hints.bcast(wts.agg(sum(col("__w")).as("__ws"))))
      .select(col(groupCol),
        floor(lit(total.toDouble) * col("__w").cast("double")
          / col("__ws").cast("double") + lit(1e-9)).cast("long").as("__q"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    in.join(Hints.bcast(quotas), groupCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__q"))
      .drop("__rn", "__q")
  }

  /** SCD-2 interval builder: turn a per-key observation log into
    * versioned validity windows — version = ordinal, valid_from = ts,
    * valid_to = next observation's ts (null while current), is_current.
    * One keyed window (lead + row_number share partitioning/ordering →
    * a single Window exec, one shuffle).
    */
  def scd2Intervals(df: DataFrame, keys: Seq[String], timeCol: String,
                    tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((timeCol +: tieBreak).map(col(_).asc): _*)
    df.withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  def stockStatus(qty: Column): Column =
    when(qty > 40, "보유")
      .when(qty > 10, "소진중")
      .when(qty > 0, "소량보유")
      .otherwise("소진")

  /** Unpivot / melt — wide metric columns to long (id…, metric, value)
    * rows, the inverse of the `q_pivot_priority` reshape and the form
    * most profiling/plotting consumers want (one row per measurement).
    *
    * Spark's native `Dataset.unpivot` plans as a single `Expand` node:
    * map-side only, zero shuffles, |valueCols|× the input rows streamed
    * through whole-stage codegen — at 100 TB this is a pure scan shape
    * (column pruning still reaches the source: only id + melted columns
    * are read). Value columns are cast to a common type by the caller
    * (Expand requires one output type); metric labels are the source
    * column names.
    */
  def meltLong(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
               varName: String = "metric", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valueName)

  /** Time-series gap filling with LOCF (last observation carried
    * forward) — regularize an irregular per-key daily series onto a
    * dense date spine and carry the last seen value across the gaps,
    * flagging filled rows. The resample step every training-data
    * freshness join needs before window features make sense.
    *
    * Input must be unique per (keys, dateCol) — aggregate first (the
    * oracle query does). Execution: per-key bounds are one partial agg;
    * the spine is `sequence(lo, hi)` exploded FROM the bounds rows (one
    * row per key-day, generated not joined); original rows attach by an
    * equi-join on (keys, date); LOCF is one `last(value, ignoreNulls)`
    * running window per key. Two key-hash exchanges total (join +
    * window — AQE coalesces the same partitioning), nothing driver-side,
    * and the spine size is data-bounded (Σ per-key day spans). A key
    * whose span is pathological (one row in 1990, one in 2030) inflates
    * only its own spine — at 100 TB cap spans upstream if the data can
    * contain such keys.
    */
  def gapFillLocf(df: DataFrame, keys: Seq[String], dateCol: String,
                  valueCol: String): DataFrame = {
    val k = keys.map(col)
    val bounds = df.groupBy(k: _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = bounds.select(
      k :+ explode(sequence(col("__lo"), col("__hi"))).as(dateCol): _*)
    val w = Window.partitionBy(k: _*).orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, keys :+ dateCol, "left")
      .withColumn("is_gap", when(col(valueCol).isNull, lit(1)).otherwise(lit(0)))
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Distribution drift between two corpus snapshots over a categorical
    * key — the monitoring primitive that tells a training-data pipeline
    * its incoming mix changed (language balance shifting, a source
    * going dark, a crawler flooding one domain) BEFORE the model does:
    * per key, both snapshots' fractions, their difference, and the PSI
    * (population stability index) contribution
    * (p − q)·ln(p/q) over ε-smoothed fractions — Σ psi_term is the
    * scalar gate (rule of thumb: < 0.1 stable, > 0.25 investigate), and
    * the per-key rows say WHICH keys moved. Keys absent from one side
    * (new source / vanished source) survive the full-outer join as
    * count 0 and get the ε treatment rather than a division blowup.
    *
    * Scale: one partial→final count agg per side (exchange = key
    * cardinality, dimension-sized for lang/source/domain keys), one
    * tiny full-outer join of the two count tables, map-side arithmetic.
    * Neither corpus is scanned twice and nothing is driver-side.
    * Doubles are rounded to 6 places — the repo's cross-engine IEEE
    * convention, which is also why ln (one libm call both engines)
    * stays oracle-exact.
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
                        eps: Double = 1e-6): DataFrame =
    distributionDriftFromCounts(
      ref.groupBy(col(keyCol)).agg(count(lit(1)).as("ref_cnt")),
      cur.groupBy(col(keyCol)).agg(count(lit(1)).as("cur_cnt")),
      keyCol, eps)

  /** [[distributionDrift]] for NUMERIC columns — the categorical PSI
    * needs keys, so a numeric column is first bucketed by the REFERENCE
    * snapshot's own equi-depth quantile edges (exact `percentile`,
    * rounded to 6 places so both engines' bin assignment is
    * bit-identical), then the per-bin counts flow through the same
    * PSI arithmetic. Binning by the reference's quantiles is the
    * standard PSI construction: a stable current snapshot puts ~1/nBins
    * in every bin by definition, so every psi_term measures departure
    * from the reference's shape (a location shift loads the edge bins,
    * a variance change hollows the middle). Bin i holds values in
    * (edge_i, edge_{i+1}]; values beyond either end land in the first/
    * last bin (bin = count of edges strictly below the value).
    *
    * Scale: ONE exact-percentile aggregation over the reference (the
    * same sorted-interpolation cost as any exact quantile — use the
    * equi-depth histogram's approx path upstream if the reference is
    * too big for exact), then the nBins-row edge table broadcasts and
    * binning is map-side arithmetic; per-side exchanges carry nBins
    * rows.
    *
    * EAGER at call time (round-14 advice): collecting the O(nBins)
    * edge literals executes the reference percentile job when this
    * method is CALLED, not when the returned frame is acted on — and
    * an empty reference therefore throws here, before any action. A
    * caller composing plans lazily should call this last.
    */
  def numericDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
                   nBins: Int, eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"numericDrift needs >= 2 bins, got $nBins")
    val fr = (1 until nBins).map(_.toDouble / nBins)
    // EXACT interpolating percentile (the q_percentiles-proven parity
    // with DuckDB's quantile_cont) — approx_percentile would return
    // sketch-chosen data values, not interpolations, and bin edges
    // would diverge between engines.
    // The ≤ nBins−1 edges are collected ONCE (an O(nBins) driver value,
    // bounded by the caller's parameter like the threshold scalars) and
    // embedded as literals: the round-13 crossJoin form re-executed the
    // whole reference percentile build under BOTH binned() sides —
    // three reference scans for a two-scan report
    val edgeVals = Option(ref.agg(
        expr(s"percentile($valueCol, array(${fr.mkString(", ")}))").as("__e"))
      .select(transform(col("__e"), e => round(e, 6)).as("__e"))
      .head().getSeq[Double](0))
      // an EMPTY reference leaves the percentile null — without this
      // guard every current row would land in a silent null bin and
      // the report would be garbage with a straight face (found by
      // the empty-input sweep); loud beats wrong
      .getOrElse(throw new IllegalArgumentException(
        "numericDrift: reference snapshot is empty — quantile bin " +
          "edges are undefined"))
    val edgeArr = array(edgeVals.map(lit): _*)
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(aggregate(edgeArr, lit(0),
          (acc, e) => acc + when(col(valueCol).cast("double") > e, 1).otherwise(0))
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cnt))
    distributionDriftFromCounts(
      binned(ref, "ref_cnt"), binned(cur, "cur_cnt"), "bin", eps)
  }

  /** [[numericDrift]] with bin edges from the MERGEABLE quantile sketch
    * instead of an exact `percentile` — the 100 TB form the exact
    * variant's scaladoc only gestured at. An exact percentile over the
    * reference sorts every group inside the aggregate; at corpus scale
    * the reference snapshot is itself huge, and (worse) a nightly drift
    * monitor wants to REUSE last night's reference state, which a sort
    * cannot provide. [[QuantileSketch]] fixes both: edges come off the
    * bucket-count sketch (one partial-aggregable pass, state mergeable
    * by key-sum, ≤5 % relative edge error — harmless for PSI, which
    * only needs STABLE bins, not precise ones), and — unlike
    * `approx_percentile`, the other scale path — the sketch is
    * engine-portable arithmetic, so the DuckDB oracle recomputes the
    * edges and the whole report stays hash-checked.
    *
    * Downstream shape is identical to [[numericDrift]]: the ≤ nBins−1
    * edge array broadcasts, binning is map-side, per-side exchanges
    * carry nBins rows. Coinciding sketch edges (two fractions landing
    * in one bucket) collapse adjacent bins; both engines collapse
    * identically, so the report stays exact-comparable.
    *
    * EAGER at call time, like [[numericDrift]] (round-14 advice): the
    * sketch build + edge collect run when this method is called, and
    * an empty reference throws here, before any action on the result.
    */
  def numericDriftSketch(ref: DataFrame, cur: DataFrame, valueCol: String,
                         nBins: Int, eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"numericDriftSketch needs >= 2 bins, got $nBins")
    val fr = (1 until nBins).map(_.toDouble / nBins)
    // collect-once like the exact variant: the sketch build (one
    // reference pass) runs exactly once instead of once per side —
    // the "100 TB form" motivation demands it here most of all
    val edgeVals = QuantileSketch.quantiles(
        QuantileSketch.build(ref, valueCol, Nil), Nil, fr)
      .agg(array_sort(collect_list(col("est"))).as("__e"))
      .head().getSeq[Double](0)
    // an empty reference yields an EMPTY edge list (zero sketch rows
    // aggregate to []), not a null — same loud-beats-wrong guard as
    // the exact variant, different emptiness signature
    if (edgeVals.isEmpty)
      throw new IllegalArgumentException(
        "numericDriftSketch: reference snapshot is empty — sketch " +
          "bin edges are undefined")
    val edgeArr = array(edgeVals.map(lit): _*)
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(aggregate(edgeArr, lit(0),
          (acc, e) => acc + when(col(valueCol).cast("double") > e, 1).otherwise(0))
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cnt))
    distributionDriftFromCounts(
      binned(ref, "ref_cnt"), binned(cur, "cur_cnt"), "bin", eps)
  }

  /** [[distributionDrift]] from PRE-AGGREGATED per-key count tables —
    * the entry the streaming dual uses: a complete-mode windowless
    * `groupBy(key).count()` stream maintains the current snapshot's
    * counts incrementally (the stateful half), and the drift arithmetic
    * derives from the count tables exactly as in the batch path, so
    * both duals hash against ONE oracle text. Count columns must be
    * named `ref_cnt` / `cur_cnt`.
    */
  def distributionDriftFromCounts(refCounts: DataFrame, curCounts: DataFrame,
                                  keyCol: String,
                                  eps: Double = 1e-6): DataFrame = {
    def fracs(counts: DataFrame, cntName: String, fracName: String): DataFrame =
      counts.crossJoin(Hints.bcast(
          counts.agg(sum(col(cntName)).as(s"__t_$cntName"))))
        .withColumn(fracName,
          col(cntName).cast("double") / col(s"__t_$cntName").cast("double"))
        .drop(s"__t_$cntName")
    val r = fracs(refCounts, "ref_cnt", "__p")
    val c = fracs(curCounts, "cur_cnt", "__q")
    r.join(c, Seq(keyCol), "full_outer")
      .withColumn("ref_cnt", coalesce(col("ref_cnt"), lit(0L)))
      .withColumn("cur_cnt", coalesce(col("cur_cnt"), lit(0L)))
      .withColumn("__ps", greatest(coalesce(col("__p"), lit(0.0)), lit(eps)))
      .withColumn("__qs", greatest(coalesce(col("__q"), lit(0.0)), lit(eps)))
      .withColumn("ref_frac", round(coalesce(col("__p"), lit(0.0)), 6))
      .withColumn("cur_frac", round(coalesce(col("__q"), lit(0.0)), 6))
      .withColumn("frac_diff", round(col("__qs") - col("__ps"), 6))
      .withColumn("psi_term",
        round((col("__qs") - col("__ps")) * log(col("__qs") / col("__ps")), 6))
      .select(col(keyCol), col("ref_cnt"), col("cur_cnt"),
        col("ref_frac"), col("cur_frac"), col("frac_diff"), col("psi_term"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("stockStatus bucket boundaries match reference (41/40, 11/10, 1/0, negative)") {
    // ref: movie_events_scraper.py:493-501 — >40 보유, >10 소진중, >0 소량보유, else 소진
    // incl. the shipped db's negative-quantity row (-38.0) → 소진
    val qs = Seq(41.0, 40.0, 11.0, 10.0, 1.0, 0.0, -38.0).toDF("q")
    val got = qs.withColumn("s", Analytics.stockStatus(col("q")))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(41.0) == "보유")
    assert(got(40.0) == "소진중")
    assert(got(11.0) == "소진중")
    assert(got(10.0) == "소량보유")
    assert(got(1.0) == "소량보유")
    assert(got(0.0) == "소진")
    assert(got(-38.0) == "소진")
  }

  test("meltLong is the pivot inverse: wide metrics to long rows, no shuffle") {
    val wide = Seq((1, 10.0, 0.5), (2, 20.0, 0.25)).toDF("id", "qty", "disc")
    val long = Analytics.meltLong(wide, Seq("id"), Seq("qty", "disc"))
    val got = long.orderBy("id", "metric")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "disc", 0.5), (1, "qty", 10.0),
                      (2, "disc", 0.25), (2, "qty", 20.0)))
    // pure Expand: the physical plan has no exchange
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"melt must not shuffle:\n$plan")
    // pivot(melt) round-trips to the original wide frame
    val back = long.groupBy("id").pivot("metric", Seq("qty", "disc")).agg(first(col("value")))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(back == Seq((1, 10.0, 0.5), (2, 20.0, 0.25)))
  }

  test("gapFillLocf densifies the spine, carries last value, flags gaps") {
    val df = Seq(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-04", 4.0),
      ("b", "2024-01-02", 2.0)).toDF("k", "ds", "v")
      .withColumn("d", to_date(col("ds"))).drop("ds")
    val out = Analytics.gapFillLocf(df, Seq("k"), "d", "v")
      .orderBy("k", "d")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getInt(3))).toSeq
    assert(out == Seq(
      ("a", "2024-01-01", 1.0, 0),
      ("a", "2024-01-02", 1.0, 1), // gap: carried forward
      ("a", "2024-01-03", 1.0, 1),
      ("a", "2024-01-04", 4.0, 0), // real observation replaces the carry
      ("b", "2024-01-02", 2.0, 0))) // single-day key: spine is one row
  }

  test("equiDepthHistogram: equal-count quantile bins on skewed data; edge ties go low") {
    // squares are heavily right-skewed: equi-WIDTH would pile most rows
    // into bin 0; equi-depth must still split 25/25/25/25
    val sq = (1 to 100).map(i => (i * i).toDouble).toDF("v")
    val out = Analytics.equiDepthHistogram(sq, "v", 4).orderBy("bucket").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getLong(1)).toSeq == Seq(25L, 25L, 25L, 25L))
    // bins tile the range: each bucket's max below the next bucket's min
    val (los, his) = (out.map(_.getDouble(2)), out.map(_.getDouble(3)))
    assert(his.init.zip(los.tail).forall { case (h, l) => h < l })
    // a value exactly equal to a quantile edge lands in the LOWER bin:
    // 8 copies of 4 distinct values → edges fall ON values
    val ties = Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0).toDF("v")
    val t = Analytics.equiDepthHistogram(ties, "v", 2).orderBy("bucket").collect()
    // median edge = 2.5; v=2.0 is NOT > 2.5 → lower bin
    assert(t.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((0, 4L), (1, 4L)))
  }

  test("curriculumOrder: quantile buckets ascend by score; within-bucket order is a salted shuffle") {
    val df = (1 to 40).map(i => (i.toLong, (i * i).toDouble)).toDF("id", "score")
    val out = Analytics.curriculumOrder(df, "id", "score", nBuckets = 4, salt = "s1")
      .orderBy("bucket", "ord").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // buckets partition by score quantile: ids 1-10 → bucket 0, … 31-40 → 3
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket(0) == (1L to 10L).toSet && byBucket(3) == (31L to 40L).toSet)
    // ord is 1..k within each bucket
    assert(out.groupBy(_._2).values.forall(b => b.map(_._3).sorted.toSeq == (1 to b.size)))
    // the within-bucket order is NOT score order (it's a shuffle)…
    assert(byBucket(0).toSeq.sorted !=
      out.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq)
    // …but it IS reproducible, and a new salt is a different epoch
    val again = Analytics.curriculumOrder(df, "id", "score", 4, "s1")
      .orderBy("bucket", "ord").collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == again.toSeq)
    val epoch2 = Analytics.curriculumOrder(df, "id", "score", 4, "s2")
      .orderBy("bucket", "ord").collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    assert(out.toSeq != epoch2.toSeq)
  }

  test("latestPerKey keeps exactly the newest row per key, deterministic on ties") {
    val df = Seq(
      ("e1", "t1", 100L, "old"),
      ("e1", "t1", 200L, "new"),
      ("e1", "t2", 100L, "only"),
      ("e2", "t1", 100L, "dup-a"),
      ("e2", "t1", 100L, "dup-b")).toDF("event_id", "theater_name", "scraped_at", "status")
    val out = Analytics.latestPerKey(df, Seq("event_id", "theater_name"),
        Seq(col("scraped_at").desc, col("status").desc))
      .orderBy("event_id", "theater_name")
      .collect().map(_.getString(3)).toSeq
    assert(out == Seq("new", "only", "dup-b"))
  }

  test("distinctAndSortedList mirrors nunique + ', '.join(sorted(unique))") {
    val df = Seq(
      ("드라마", "m1", "하얼빈"), ("드라마", "m2", "아마존 활명수"),
      ("드라마", "m1", "하얼빈"), ("코미디", "m3", "시크릿")
    ).toDF("genre", "movie_cd", "movie_nm")
    val out = Analytics.distinctAndSortedList(df, "genre", "movie_cd", "movie_nm")
      .orderBy("genre").collect()
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getString(2) == "아마존 활명수, 하얼빈")
    assert(out(1).getLong(1) == 1L)
  }

  test("cappedPerGroup keeps at most k rows per group, deterministically") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val once = Analytics.cappedPerGroup(df, Seq("src"), "id", 10)
    assert(once.groupBy("src").count().collect().forall(_.getLong(1) == 10))
    // repartitioning the input must not change the selection (md5-keyed order)
    val again = Analytics.cappedPerGroup(df.repartition(7), Seq("src"), "id", 10)
    assert(once.select("id").collect().map(_.getLong(0)).sorted
      sameElements again.select("id").collect().map(_.getLong(0)).sorted)
  }

  test("weightedMix fills proportional quotas and excludes unweighted groups") {
    import spark.implicits._
    val df = (1L to 90L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt))).toDF("id", "g")
    val out = Analytics.weightedMix(df, "g", "id", Map("a" -> 0.75, "b" -> 0.25), total = 40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byG = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byG == Map("a" -> 30, "b" -> 10)) // 40×0.75, 40×0.25; no 'c'
  }

  test("temperatureMix flattens the natural distribution at alpha=0.5 and keeps it at alpha=1") {
    import spark.implicits._
    // 64 'big' vs 16 'small': natural share 80/20, sqrt share 2:1
    val df = ((1L to 64L).map((_, "big")) ++ (65L to 80L).map((_, "small")))
      .toDF("id", "g")
    val flat = Analytics.temperatureMix(df, "g", "id", alpha = 0.5, total = 30)
      .collect().map(_.getAs[String]("g"))
    val byG = flat.groupBy(identity).view.mapValues(_.length).toMap
    // w = (8, 4), Σ=12 → quotas floor(30·8/12)=20, floor(30·4/12)=10
    assert(byG == Map("big" -> 20, "small" -> 10), s"got $byG")
    val natural = Analytics.temperatureMix(df, "g", "id", alpha = 1.0, total = 30)
      .collect().map(_.getAs[String]("g"))
    val byGN = natural.groupBy(identity).view.mapValues(_.length).toMap
    // w = (64, 16), Σ=80 → quotas 24 / 6: the raw proportions
    assert(byGN == Map("big" -> 24, "small" -> 6), s"got $byGN")
    // md5-keyed picks: repartitioning must not change the selection
    val again = Analytics.temperatureMix(df.repartition(7), "g", "id",
        alpha = 0.5, total = 30)
      .select("id").collect().map(_.getLong(0)).sorted
    val first = Analytics.temperatureMix(df, "g", "id", alpha = 0.5, total = 30)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(first sameElements again)
    graft.operators.OpCache.clear()
  }

  test("temperatureMix excludes NULL-group rows from quotas AND output (review r3)") {
    import spark.implicits._
    val df = ((1L to 64L).map(i => (i, Some("big"))) ++
      (65L to 128L).map(i => (i, None: Option[String]))).toDF("id", "g")
    val out = Analytics.temperatureMix(df, "g", "id", alpha = 1.0, total = 32)
      .collect()
    // null group must not deflate big's quota: w over non-null only
    assert(out.length == 32 && out.forall(_.getAs[String]("g") == "big"),
      s"got ${out.length} rows")
    graft.operators.OpCache.clear()
  }

  test("scd2Intervals chains valid_from/valid_to with one current row per key") {
    import spark.implicits._
    val obs = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L), (2L, 5L, 103L))
      .toDF("user_id", "t", "event_id")
    val out = Analytics.scd2Intervals(obs, Seq("user_id"), "t", Seq("event_id"))
      .orderBy("user_id", "version").collect()
    assert(out.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3, 1))
    assert(out(0).getAs[Long]("valid_to") == 20L && out(1).getAs[Long]("valid_to") == 30L)
    assert(out(2).isNullAt(out(2).fieldIndex("valid_to")) && out(2).getAs[Boolean]("is_current"))
    assert(out.count(_.getAs[Boolean]("is_current")) == 2) // one per key
  }

  test("funnel enforces strict stage order per user") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 8L),
      (3L, "click", 5L),                      // never viewed → excluded
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 15L))
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None),            // click was before the view
      (4L, Some(10L), Some(20L), None)))      // purchase before the click
    graft.operators.OpCache.clear()
  }

  test("retentionCohorts counts distinct users per cohort and offset") {
    import spark.implicits._
    val ev = Seq((1L, 1L), (1L, 5L), (1L, 25L), (2L, 12L), (2L, 38L))
      .toDF("user_id", "ts")
    val out = Analytics.retentionCohorts(ev, "user_id", "ts", bucket = 10L)
      .orderBy("cohort", "bucket_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("withSplit labels are a pure function of the key, stable under growth") {
    import spark.implicits._
    val small = (1L to 200L).toDF("id")
    val grown = (1L to 400L).toDF("id")
    def labels(df: org.apache.spark.sql.DataFrame) =
      Analytics.withSplit(df, "id", valRate = 0.2, testRate = 0.2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (ls, lg) = (labels(small), labels(grown))
    // growing the corpus never relabels an existing key
    assert(ls.forall { case (k, v) => lg(k) == v })
    val byLabel = ls.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
  }

  test("profile emits exact per-column stats including nulls") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (3L, Some("b")))
      .toDF("k", "s")
    val out = Analytics.profile(df, Seq("k", "s")).orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(
      ("k", 4L, 0L, 3L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile plan has no Expand (per-column distinct aggs, not one k-distinct agg)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val plan = Analytics.profile(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"profile should not multiply rows through Expand:\n$plan")
    graft.operators.OpCache.clear()
  }

  test("histogram buckets exactly; max lands in the closed last bin; degenerate column -> bin 0") {
    import spark.implicits._
    // values 0..10 over 5 bins of width 2: bins 0..4, 10 closes into bin 4
    val df = (0 to 10).map(_.toDouble).toDF("x")
    val out = Analytics.histogram(df, "x", nBins = 5).orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      (0, 2L, 0.0, 2.0), (1, 2L, 2.0, 4.0), (2, 2L, 4.0, 6.0),
      (3, 2L, 6.0, 8.0), (4, 3L, 8.0, 10.0))) // 8, 9 and the closed max 10
    val flat = Analytics.histogram(Seq(7.0, 7.0).toDF("x"), "x", nBins = 4).collect()
    assert(flat.length == 1 && flat.head.getInt(0) == 0 && flat.head.getLong(1) == 2L)
    // NaN must not poison the bounds (max=NaN → NaN width → garbage bins)
    val nan = Analytics.histogram(Seq(0.0, 1.0, Double.NaN).toDF("x"), "x", nBins = 2)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(nan == Seq((0, 1L), (1, 1L)))
    graft.operators.OpCache.clear()
  }

  test("correlationMatrix treats NaN like null: excluded from n AND the sums") {
    import spark.implicits._
    val df = Seq((1.0, 1.0), (2.0, 2.0), (Double.NaN, 3.0), (3.0, 3.0))
      .toDF("x", "y")
    val out = Analytics.correlationMatrix(df, Seq("x", "y")).collect().head
    assert(out.getLong(2) == 3L)          // NaN row out of n, not just the sums
    assert(out.getDouble(3) == 1.0)       // remaining rows are perfectly linear
  }

  test("zscorePerGroup normalizes within each group; degenerate groups get 0") {
    import spark.implicits._
    // group g: values 1,2,3 → μ=2, population σ=sqrt(2/3); group h: single row
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 7.0))
      .toDF("grp", "x")
    val out = Analytics.zscorePerGroup(df, Seq("grp"), "x")
      .orderBy("grp", "x")
      .select("grp", "x", "zscore")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val sd = math.sqrt(2.0 / 3.0)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(out == Seq(
      ("g", 1.0, r6(-1.0 / sd)), ("g", 2.0, 0.0), ("g", 3.0, r6(1.0 / sd)),
      ("h", 7.0, 0.0))) // σ=0 → 0, not NaN
  }

  test("correlationMatrix: perfect +/-1, null pairwise exclusion, constant column -> null") {
    import spark.implicits._
    // y = 2x (corr 1), z = -x (corr -1 with both), c constant, and a null
    // in x that must only shrink x's pairs, not the (y,z) pair
    val df = Seq(
      (Some(1.0), 2.0, -1.0, 5.0), (Some(2.0), 4.0, -2.0, 5.0),
      (Some(3.0), 6.0, -3.0, 5.0), (None, 8.0, -4.0, 5.0))
      .toDF("x", "y", "z", "c")
    val out = Analytics.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(out(("x", "y")) == (3L, Some(1.0)))
    assert(out(("x", "z")) == (3L, Some(-1.0)))
    assert(out(("y", "z")) == (4L, Some(-1.0))) // null x row still counts here
    assert(out(("x", "c")) == (3L, None))       // zero variance → null r
  }

  test("robustScalePerGroup: median/IQR scaling resists an outlier that wrecks z-score") {
    import spark.implicits._
    // group g: 1..5 → median 3, IQR = 4 − 2 = 2; an outlier group o where
    // one huge value dominates mean/σ but barely moves median/IQR
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0),
      ("o", 1.0), ("o", 2.0), ("o", 3.0), ("o", 4.0), ("o", 1000.0))
      .toDF("grp", "x")
    val out = Analytics.robustScalePerGroup(df, Seq("grp"), "x")
      .orderBy("grp", "x").select("grp", "x", "robust_z")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.filter(_._1 == "g").map(_._3).toSeq ==
      Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    // in the outlier group the inliers keep moderate robust-z (median 3,
    // IQR 2): x=1 → -1; the outlier itself is far out — exactly the
    // separation a mean/σ scaler loses (σ≈445 squashes inliers to ~0)
    val o = out.filter(_._1 == "o").map(t => t._2 -> t._3).toMap
    assert(o(1.0) == -1.0 && o(1000.0) > 100)
    val z = Analytics.zscorePerGroup(df.filter($"grp" === "o"), Seq("grp"), "x")
      .select("x", "zscore").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(z(1.0)) < 0.6) // z-score squashed the same inlier
  }

  test("zscorePerGroup: null values don't dilute stats; null groups are kept (review r3)") {
    import spark.implicits._
    // group g has a null measurement: stats must come from the two
    // non-null values (μ=2, σ=1), not divide by 3
    val df = Seq((Some("g"), Some(1.0)), (Some("g"), Some(3.0)),
      (Some("g"), None), (None, Some(5.0)), (None, Some(7.0)))
      .toDF("grp", "x")
    val out = Analytics.zscorePerGroup(df, Seq("grp"), "x")
      .select("grp", "x", "zscore").collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (Some("g"), Some(1.0), Some(-1.0)),
      (Some("g"), Some(3.0), Some(1.0)),
      (Some("g"), None, None),              // null x → null z, row kept
      (None, Some(5.0), Some(-1.0)),        // null group normalized, not dropped
      (None, Some(7.0), Some(1.0))))
  }

  test("weightedSample: deterministic, weight-dominant, excludes non-positive weights") {
    import spark.implicits._
    // id 1 carries a weight 10^6× the rest: its E-S key ln(u)/w is
    // ≥ −4e−5 even at the worst-case u, while a weight-1 row needs
    // u > 0.99996 to beat it — with 9 light rows the heavy one is in
    // any top-3 with near-certainty, and the md5 draw is FIXED, so this
    // assertion is deterministic, not flaky
    val df = (Seq((1L, Option(1e6))) ++ (2L to 10L).map(i => (i, Option(1.0))) ++
      Seq((11L, Option(0.0)), (12L, Option(-5.0)), (13L, None: Option[Double]),
        // non-finite weights ride the shared finite() discipline: DuckDB
        // sorts NaN above everything and +Inf always wins ln(u)/w, so
        // both engines must EXCLUDE them for the samples to agree
        (14L, Option(Double.NaN)), (15L, Option(Double.PositiveInfinity))))
      .toDF("id", "w")
    val sampled = Analytics.weightedSample(df, "id", "w", n = 3, salt = "t")
    // orderBy().limit() must plan as the per-partition top-n heap, not a
    // global sort — the property that makes the draw scale
    assert(sampled.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val s1 = sampled.select("id").as[Long].collect().toSet
    assert(s1.contains(1L) && s1.size == 3)
    assert(Seq(11L, 12L, 13L, 14L, 15L).forall(!s1.contains(_)))
    // identical rerun → identical sample (pure function of id/salt/w)
    val s2 = Analytics.weightedSample(df, "id", "w", n = 3, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2)
    // n beyond the eligible row count returns all positive-weight rows
    val all = Analytics.weightedSample(df, "id", "w", n = 100, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(all == (1L to 10L).toSet)
  }

  test("gumbelTopK: matches a brute-force Gumbel-max draw; log-space handles huge and negative log-weights") {
    import spark.implicits._
    // log-weights span −300..+800: exp overflows a double at ~709, so
    // any implementation that exponentiates would break — the log-space
    // key must still rank correctly
    val rows = Seq((1L, Option(800.0)), (2L, Option(750.0)), (3L, Option(-300.0)),
      (4L, Option(0.0)), (5L, Option(-2.5)),
      (6L, Option(Double.NaN)), (7L, Option(Double.PositiveInfinity)),
      (8L, None: Option[Double]))
    val df = rows.toDF("id", "lw")
    def key(id: Long, lw: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_g".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4503599627370496.0
      lw - math.log(-math.log(u))
    }
    val expect = rows.collect { case (id, Some(lw)) if !lw.isNaN && !lw.isInfinite => id -> key(id, lw) }
      .sortBy { case (id, k) => (-k, id) }.take(3).map(_._1).toSet
    val out = Analytics.gumbelTopK(df, "id", "lw", n = 3, salt = "g")
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val got = out.select("id").as[Long].collect().toSet
    assert(got == expect)
    // NaN/Inf/null excluded; rerun identical (pure function of id/salt/lw)
    assert(!got.contains(6L) && !got.contains(7L) && !got.contains(8L))
    val rerun = Analytics.gumbelTopK(df, "id", "lw", n = 3, salt = "g")
      .select("id").as[Long].collect().toSet
    assert(got == rerun)
  }

  test("gumbelSelect/weightedSampleSelect: identical set to the heap form, " +
    "no TakeOrderedAndProject in the selection plan (round-11 verdict #1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit}
    // 500 rows over several partitions, log-weights spanning ±hundreds
    // of nats (the DSIR range) plus a few excluded non-finite rows
    val df = spark.range(500).repartition(7)
      .select(col("id"),
        ((pmod(xxhash64(col("id")), lit(1000L)).cast("double") - 500.0) * 1.7)
          .as("lw"))
      .union(Seq((9001L, Double.NaN), (9002L, Double.PositiveInfinity))
        .toDF("id", "lw"))
    for (n <- Seq(1, 7, 50, 499, 800)) {
      val heap = Analytics.gumbelTopK(df, "id", "lw", n, salt = "sel")
        .select("id").as[Long].collect().toSet
      val thr = Analytics.gumbelSelect(df, "id", "lw", n, salt = "sel")
      val got = thr.select("id").as[Long].collect().toSet
      assert(got == heap, s"gumbelSelect set mismatch at n=$n")
      // the whole point: selection is a distributed filter — NO
      // driver-side k-row merge anywhere in the executed plan (md5 keys
      // are collision-free, so the tie branch is a pure filter too)
      assert(!thr.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
        s"gumbelSelect planned a TakeOrderedAndProject at n=$n")
      graft.operators.OpCache.clear()
    }
    val wdf = spark.range(300).repartition(5)
      .select(col("id"),
        (pmod(xxhash64(col("id"), lit(7)), lit(100L)).cast("double") + 1.0).as("w"))
    for (n <- Seq(3, 42, 299)) {
      val heap = Analytics.weightedSample(wdf, "id", "w", n, salt = "ws")
        .select("id").as[Long].collect().toSet
      val thr = Analytics.weightedSampleSelect(wdf, "id", "w", n, salt = "ws")
      assert(thr.select("id").as[Long].collect().toSet == heap,
        s"weightedSampleSelect set mismatch at n=$n")
      assert(!thr.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
      graft.operators.OpCache.clear()
    }
  }

  test("weightedSamplePerGroup: per-group quota, deterministic, small groups kept whole") {
    import spark.implicits._
    val df = (Seq.tabulate(10)(i => ("a", i.toLong, 1.0 + i)) ++
      Seq(("b", 100L, 5.0), ("b", 101L, 1.0)))
      .toDF("g", "id", "w")
    val out = Analytics.weightedSamplePerGroup(df, Seq("g"), "id", "w",
      nPerGroup = 4, salt = "s")
    val byG = out.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // group a capped at 4 of its 10; group b smaller than the quota
    // survives whole
    assert(byG("a").size == 4 && byG("a").subsetOf((0L to 9L).toSet))
    assert(byG("b") == Set(100L, 101L))
    val rerun = Analytics.weightedSamplePerGroup(df, Seq("g"), "id", "w",
        nPerGroup = 4, salt = "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(rerun == out.collect().map(r => r.getString(0) -> r.getLong(1)).toSet)
  }

  test("zscore/robustScale treat NaN and ±Inf like null (round-4 advice)") {
    import spark.implicits._
    // a NaN is non-null: without the finite() guard it would COUNT into n
    // while its decimal sum nulls out — μ/σ over a phantom sample. The
    // finite rows are 1 and 3 (μ=2, σ=1); non-finite rows keep null z.
    val df = Seq(("g", 1.0), ("g", 3.0), ("g", Double.NaN),
      ("g", Double.PositiveInfinity), ("g", Double.NegativeInfinity))
      .toDF("grp", "x")
    val z = Analytics.zscorePerGroup(df, Seq("grp"), "x")
      .select("x", "zscore").collect()
      .map(r => r.getDouble(0) -> Option(r.get(1)))
    // NaN can't be a map key (boxed-double == is false for NaN): split
    // finite and non-finite rows by predicate instead
    val zFin = z.filter(t => java.lang.Double.isFinite(t._1)).toMap
    assert(zFin == Map(1.0 -> Some(-1.0), 3.0 -> Some(1.0)))
    assert(z.filterNot(t => java.lang.Double.isFinite(t._1))
      .forall(_._2.isEmpty) && z.count(t => !java.lang.Double.isFinite(t._1)) == 3)
    // robust: finite 1..5 → median 3, IQR 2; the Inf row must not sit in
    // the percentile buffer (it would shift q75 to Inf → IQR Inf → z 0)
    val rdf = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 5.0),
      ("g", Double.PositiveInfinity), ("g", Double.NaN)).toDF("grp", "x")
    val rz = Analytics.robustScalePerGroup(rdf, Seq("grp"), "x")
      .select("x", "robust_z").collect()
      .map(r => r.getDouble(0) -> Option(r.get(1)))
    val rzFin = rz.filter(t => java.lang.Double.isFinite(t._1)).toMap
    assert(rzFin(1.0) == Some(-1.0) && rzFin(5.0) == Some(1.0))
    assert(rz.filterNot(t => java.lang.Double.isFinite(t._1))
      .forall(_._2.isEmpty) && rz.count(t => !java.lang.Double.isFinite(t._1)) == 2)
  }

  test("histogram and correlationMatrix exclude ±Inf like NaN (round-4 advice)") {
    import spark.implicits._
    // one +Inf bound would make width Inf: every finite row collapses to
    // bin 0 and the Inf row sneaks into the last bin via least(null-skip)
    val h = Analytics.histogram(
        Seq(0.0, 1.0, Double.PositiveInfinity, Double.NegativeInfinity)
          .toDF("x"), "x", nBins = 2)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(h == Seq((0, 1L), (1, 1L)))
    graft.operators.OpCache.clear()
    // an Inf x would poison Σx while still counting into n
    val df = Seq((1.0, 1.0), (2.0, 2.0), (Double.PositiveInfinity, 3.0),
      (3.0, 3.0)).toDF("x", "y")
    val out = Analytics.correlationMatrix(df, Seq("x", "y")).collect().head
    assert(out.getLong(2) == 3L)
    assert(out.getDouble(3) == 1.0)
  }

  test("distributionDrift: identical mixes score ~0, a vanished key takes " +
      "the epsilon path, a new key appears with ref_cnt 0") {
    import spark.implicits._
    val ref = Seq("en", "en", "en", "de", "fr", "fr").toDF("lang")
    // identical mix → every psi_term rounds to 0
    val same = Analytics.distributionDrift(ref, ref, "lang")
      .collect().map(r => r.getAs[Double]("psi_term"))
    assert(same.forall(_ == 0.0))
    // 'fr' vanishes, 'zh' appears
    val cur = Seq("en", "en", "de", "de", "zh", "zh").toDF("lang")
    val out = Analytics.distributionDrift(ref, cur, "lang")
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("ref_cnt"), r.getAs[Long]("cur_cnt"),
          r.getAs[Double]("psi_term"))).toMap
    assert(out("fr")._1 == 2L && out("fr")._2 == 0L)
    assert(out("zh")._1 == 0L && out("zh")._2 == 2L)
    // epsilon keeps the vanished/new contributions finite and positive
    assert(out("fr")._3 > 0.0 && out("fr")._3.isFinite)
    assert(out("zh")._3 > 0.0 && out("zh")._3.isFinite)
    // hand-check one surviving key: en p=3/6=.5, q=2/6→.333333;
    // (q-p)*ln(q/p) = (-1/6)*ln(2/3) ≈ 0.067577
    assert(math.abs(out("en")._3 - 0.067577) < 1e-5, out("en")._3.toString)
  }

  test("numericDrift: equi-depth reference bins; a pure location shift " +
      "floods the top bin and empties the rest via the epsilon path") {
    import spark.implicits._
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    // stable current = same distribution → every bin ~1/4, psi ≈ 0
    val stable = Analytics.numericDrift(ref, ref, "v", nBins = 4)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("ref_cnt"), r.getAs[Long]("cur_cnt"),
          r.getAs[Double]("psi_term"))).toMap
    assert(stable.keySet == Set(0, 1, 2, 3))
    assert(stable.values.forall { case (rc, cc, psi) => rc == cc && psi == 0.0 })
    // equi-depth: each reference bin holds ~25 of 100
    assert(stable.values.forall { case (rc, _, _) => rc >= 24 && rc <= 26 })
    // +1000 shift: every current value exceeds the last reference edge
    val shifted = Analytics.numericDrift(ref,
        ref.select((col("v") + 1000.0).as("v")), "v", nBins = 4)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("cur_cnt"), r.getAs[Double]("psi_term"))).toMap
    assert(shifted(3)._1 == 100L)
    assert(Seq(0, 1, 2).forall(b => shifted(b)._1 == 0L))
    // emptied bins take the epsilon path: finite, positive contributions
    assert(Seq(0, 1, 2).forall(b =>
      shifted(b)._2 > 0.0 && shifted(b)._2.isFinite))
  }
}

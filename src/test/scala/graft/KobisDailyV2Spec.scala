package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSourceV2 tier of the per-day daily feed (S1): filter pushdown as
  * PARTITION pruning (round-10 verdict #5) — a pushed `target_dt`
  * predicate must shrink what is PLANNED, not just what is returned,
  * and the pushed conjuncts must disappear from Spark's post-scan
  * Filter (they are handled fully at file granularity).
  */
class KobisDailyV2Spec extends SparkSpec {

  private def day(items: String) =
    s"""{"boxOfficeResult": {"boxofficeType": "일별 박스오피스",
       |  "showRange": "x~x", "dailyBoxOfficeList": [$items]}}""".stripMargin

  private def item(cd: String, rank: Int, audi: Long): String =
    s"""{"rnum":"$rank","rank":"$rank","rankInten":"0","rankOldAndNew":"OLD",
       | "movieCd":"$cd","movieNm":"nm-$cd","openDt":"2024-01-01",
       | "salesAmt":"1000","salesShare":"1.5","salesInten":"0",
       | "salesChange":"0","salesAcc":"9000","audiCnt":"$audi",
       | "audiInten":"0","audiChange":"0","audiAcc":"5000",
       | "scrnCnt":"100","showCnt":"400"}""".stripMargin

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft_kobis_daily_v2_")
    Files.writeString(d.resolve("daily_20240101.json"),
      day(Seq(item("A1", 1, 100), item("A2", 2, 90)).mkString(",")))
    Files.writeString(d.resolve("daily_20240102.json"),
      day(Seq(item("B1", 1, 80)).mkString(",")))
    Files.writeString(d.resolve("daily_20240103.json"),
      day(Seq(item("C1", 1, 70), item("C2", 2, 60)).mkString(",")))
    d
  }

  private def read(): DataFrame =
    spark.read.format("kobis-daily").option("path", dir.toString).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

  test("one partition per day file; target_dt stamped from the file name") {
    val df = read()
    assert(scanOf(df).inputPartitions.size == 3)
    val byDay = df.groupBy("target_dt").count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(byDay == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L, "2024-01-03" -> 2L))
  }

  test("equality filter prunes to ONE planned partition, result exact") {
    val df = read().filter(col("target_dt") === lit(java.sql.Date.valueOf("2024-01-02")))
    assert(scanOf(df).inputPartitions.size == 1)
    assert(df.select("movie_cd").collect().map(_.getString(0)).toSeq == Seq("B1"))
  }

  test("range filter plans only the in-range files; pushed conjuncts " +
      "leave no Spark-side re-evaluation") {
    val df = read().filter(col("target_dt") >= lit(java.sql.Date.valueOf("2024-01-02")))
    assert(scanOf(df).inputPartitions.size == 2)
    assert(df.count() == 3)
    // fully-handled push: no FilterExec survives above the scan
    // (target_dt is the only predicate and the source owns it)
    val filters = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filters.isEmpty,
      s"pushed target_dt filter was re-planned post-scan: $filters")
  }

  test("IN-list prunes to the named days; non-date predicates stay residual") {
    val in = read().filter(col("target_dt").isin(
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-03")))
    assert(scanOf(in).inputPartitions.size == 2)
    assert(in.count() == 4)
    // a movie_cd predicate is NOT pushable: still evaluated post-scan,
    // and it must not affect partition planning
    val mixed = read()
      .filter(col("target_dt") === lit(java.sql.Date.valueOf("2024-01-01")))
      .filter(col("movie_cd") === "A2")
    assert(scanOf(mixed).inputPartitions.size == 1)
    assert(mixed.count() == 1)
    val residual = mixed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(residual.nonEmpty, "movie_cd residual should be a post-scan Filter")
  }

  test("statistics cover only the surviving day files (broadcast-eligible)") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val all = scanOf(read()).scan.asInstanceOf[SupportsReportStatistics]
      .estimateStatistics().sizeInBytes().getAsLong
    val pruned = scanOf(read().filter(
        col("target_dt") === lit(java.sql.Date.valueOf("2024-01-02")))).scan
      .asInstanceOf[SupportsReportStatistics]
      .estimateStatistics().sizeInBytes().getAsLong
    assert(pruned > 0 && pruned < all)
  }

  test("RUNTIME filters prune planned partitions (SupportsRuntimeFiltering): " +
      "an IN over target_dt shrinks the plan; a non-date filter is ignored, " +
      "never wrongly applied") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.{EqualTo, In}
    val scan = scanOf(read()).scan
    val srf = scan.asInstanceOf[SupportsRuntimeFiltering]
    assert(srf.filterAttributes().map(_.describe()).toSeq == Seq("target_dt"))
    // a non-pushable runtime filter must be a no-op (the join above
    // re-checks rows; partial application is the contract)
    srf.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("movie_cd", "A1")))
    assert(scan.toBatch.planInputPartitions().length == 3)
    srf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("target_dt", Array[Any](java.sql.Date.valueOf("2024-01-02")))))
    assert(scan.toBatch.planInputPartitions().length == 1)
  }

  test("runtime filter is IDEMPOTENT: a second filter() call with a different " +
      "IN-set prunes from the STATIC plan, never compounds on the first call " +
      "(round-11 verdict #2 guard)") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.In
    val scan = scanOf(read()).scan
    val srf = scan.asInstanceOf[SupportsRuntimeFiltering]
    srf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("target_dt", Array[Any](java.sql.Date.valueOf("2024-01-02")))))
    assert(scan.toBatch.planInputPartitions().length == 1)
    // a re-planned scan with a DISJOINT runtime set must see day 1 and 3,
    // not the empty intersection a compounding prune would produce
    srf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("target_dt", Array[Any](java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf("2024-01-03")))))
    assert(scan.toBatch.planInputPartitions().length == 2)
    // and an EMPTY usable set restores the full static plan
    srf.filter(Array.empty[org.apache.spark.sql.sources.Filter])
    assert(scan.toBatch.planInputPartitions().length == 3)
  }

  test("END-TO-END dynamic pruning: a join against a filtered date dim " +
      "injects a runtime filter into the scan and only the surviving day " +
      "files are read") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import spark.implicits._
    // dim must be a FILE source with a selective predicate — a local
    // relation's filter constant-folds away and DPP declines to fire
    val dimDir = Files.createTempDirectory("graft_daily_dim_").toString + "/dim"
    Seq(("2024-01-02", "keep"), ("2024-01-01", "drop"), ("2024-01-03", "drop"))
      .toDF("dts", "label")
      .select(col("dts").cast("date").as("dt"), col("label"))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "keep")
    val joined = read().join(dim, col("target_dt") === col("dt"))
      .select("movie_cd", "dt")
    val rows = joined.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("B1"))
    // collect() does not descend into AQE stages (QueryStageExec has no
    // children) — recurse through both wrapper kinds explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case b: BatchScanExec => Seq(b)
      }.flatten
    val scan = scans(joined.queryExecution.executedPlan)
      .find(_.scan.description().startsWith("kobis-daily"))
    assert(scan.nonEmpty, "kobis-daily BatchScanExec not found in executed plan")
    assert(scan.get.runtimeFilters.nonEmpty,
      "no dynamic-pruning runtime filter was injected into the scan")
    // the scan emitted only the surviving day file's rows (1), not all 5
    assert(scan.get.metrics("numOutputRows").value == 1,
      s"scan read ${scan.get.metrics("numOutputRows").value} rows — runtime pruning did not happen")
  }

  test("MICRO-BATCH stream over the landing zone: files present at start " +
      "form the first batch, each new day arrives as its own batch, and a " +
      "backfill below the committed day watermark is NOT re-read " +
      "(forward-only append contract)") {
    val d = Files.createTempDirectory("graft_daily_stream_")
    Files.writeString(d.resolve("daily_20240101.json"),
      day(Seq(item("S1", 1, 100), item("S2", 2, 90)).mkString(",")))
    Files.writeString(d.resolve("daily_20240102.json"),
      day(item("S3", 1, 80)))
    val q = spark.readStream.format("kobis-daily")
      .option("path", d.toString).load()
      .select("target_dt", "movie_cd")
      .writeStream.format("memory").queryName("daily_stream_sink")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("daily_stream_sink").count() == 3)
      Files.writeString(d.resolve("daily_20240103.json"),
        day(Seq(item("S4", 1, 70), item("S5", 2, 60)).mkString(",")))
      q.processAllAvailable()
      val rows = spark.table("daily_stream_sink")
        .collect().map(r => (r.getDate(0).toString, r.getString(1))).toSet
      assert(rows == Set(("2024-01-01", "S1"), ("2024-01-01", "S2"),
        ("2024-01-02", "S3"), ("2024-01-03", "S4"), ("2024-01-03", "S5")))
      // a file landing BELOW the committed high-water day is a backfill:
      // the stream's documented contract routes those through the batch
      // reader + partition overwrite, never a silent stream re-read
      Files.writeString(d.resolve("daily_20231231.json"),
        day(item("S0", 1, 50)))
      q.processAllAvailable()
      assert(spark.table("daily_stream_sink").count() == 5)
    } finally q.stop()
  }

  test("column pruning reaches the reader; a non-conforming file name " +
      "fails loudly (pruning correctness rests on the name contract)") {
    val df = read().select("movie_cd", "audi_cnt")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq == Seq("movie_cd", "audi_cnt"))
    assert(df.count() == 5)
    val bad = Files.createTempDirectory("graft_kobis_daily_bad_")
    Files.writeString(bad.resolve("notaday.json"), day(item("Z1", 1, 1)))
    val e = intercept[Exception] {
      spark.read.format("kobis-daily").option("path", bad.toString).load().count()
    }
    assert(e.getMessage.contains("daily_YYYYMMDD") ||
      Option(e.getCause).exists(_.getMessage.contains("daily_YYYYMMDD")))
  }
}

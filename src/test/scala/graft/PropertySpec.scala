package graft

import scala.util.Random

import graft.operators.{Analytics, Dedup}

/** Randomized invariants (fixed seeds — fully reproducible) for the
  * operators whose correctness rests on algebraic structure rather than
  * fixed examples: connected components vs a brute-force union-find
  * oracle, sessionization session-count algebra, and the per-group cap's
  * subset/cardinality/partitioning-independence properties.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).flatMap { case (_, members) =>
      val canon = members.min; members.map(_ -> canon)
    }
  }

  test("connectedComponents matches a union-find oracle on random graphs") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val edges = List.fill(12) {
        val a = rnd.nextInt(15).toLong
        val b = (a + 1 + rnd.nextInt(14)) % 15
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2)
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(edges), s"seed=$seed edges=$edges")
    }
  }

  test("applyCdc matches an in-memory log fold on random feeds; batch split is irrelevant") {
    import graft.operators.Upsert
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val storeKeys = (0L until 8L).toSeq
      val store = storeKeys.map(k => (k, s"base$k")).toDF("k", "payload")
      // random feed: unique (k, seq) per change (the operator's declared
      // input contract), random op mix
      val feed = (for (k <- 0L until 12L; seq <- 1L to 3L
                       if rnd.nextBoolean()) yield {
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        (k, s"v$k-$seq", op, seq)
      }).toList
      // reference: fold by ascending seq over the initial store
      val m = scala.collection.mutable.Map[Long, String]()
      storeKeys.foreach(k => m(k) = s"base$k")
      feed.sortBy(_._4).foreach { case (k, p, op, _) =>
        if (op == "D") m.remove(k) else m(k) = p
      }
      val expected = m.toSeq.sorted
      val feedDf = feed.toDF("k", "payload", "op", "seq")
      val once = Upsert.applyCdc(store, feedDf, Seq("k"), "op", "seq")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(once == expected, s"seed=$seed feed=$feed")
      // applying the feed split into seq-ordered batches reaches the
      // same state (the streaming-sink contract)
      val mid = Upsert.applyCdc(store, feedDf.filter(col("seq") <= 1), Seq("k"), "op", "seq")
      val split = Upsert.applyCdc(mid, feedDf.filter(col("seq") > 1), Seq("k"), "op", "seq")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(split == expected, s"seed=$seed split-fold diverged")
    }
  }

  test("sessionize: session count equals 1 + number of over-gap steps") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val ts = List.fill(10)(rnd.nextInt(400).toLong).distinct.sorted
      val df = ts.zipWithIndex.map { case (t, i) => (1L, t, i.toLong) }
        .toDF("user_id", "t", "eid")
      val out = Analytics.sessionize(df, Seq("user_id"), "t", Seq("eid"), gap = 50L)
      val expected = 1 + ts.sliding(2).count(w => w.length == 2 && w(1) - w(0) > 50)
      assert(out.agg(org.apache.spark.sql.functions.max("session_id"))
        .collect().head.getLong(0) == expected.toLong, s"seed=$seed ts=$ts")
    }
  }

  test("cappedPerGroup: at most k per group, subset of input, partitioning-independent") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val rows = List.fill(30)((rnd.nextInt(60).toLong, "abc" (rnd.nextInt(3)).toString))
        .distinctBy(_._1)
      val df = rows.toDF("id", "g")
      val out = Analytics.cappedPerGroup(df, Seq("g"), "id", 4)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.groupBy(_._2).forall(_._2.length <= 4), s"seed=$seed")
      assert(out.toSet.subsetOf(rows.toSet), s"seed=$seed")
      val again = Analytics.cappedPerGroup(df.repartition(5), Seq("g"), "id", 4)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.sorted.sameElements(again.sorted), s"seed=$seed")
    }
  }

  test("expectations: report counts are consistent with quarantine on random data") {
    import graft.operators.Expectations
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      // random rows with injected nulls and out-of-range values
      val rows = List.fill(40)((
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(20).toLong),
        if (rnd.nextInt(8) == 0) null else "OFX" (rnd.nextInt(3)).toString,
        if (rnd.nextInt(6) == 0) null else java.lang.Double.valueOf(rnd.nextInt(100) - 20)))
      val df = rows.toDF("id", "status", "amount")
      val rules = Seq(
        Expectations.notNull("id"),
        Expectations.inSet("status", Seq("O", "F")),
        Expectations.inRange("amount", 0, 60))
      val rep = Expectations.report(df, rules).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val quar = Expectations.quarantine(df, rules, Seq("id")).collect()
        .map(_.getString(1))
      // every rule checked every row
      assert(rep.values.forall(_._1 == rows.size.toLong), s"seed=$seed")
      // per-rule violation counts agree between report and attribution
      for (r <- rules) {
        val attributed = quar.count(_.split(",").contains(r.name))
        assert(rep(r.name)._2 == attributed.toLong,
          s"seed=$seed rule=${r.name}: report=${rep(r.name)._2} quarantine=$attributed")
      }
      // quarantine holds exactly the rows failing >=1 rule
      val expectedBad = rows.count { case (id, st, am) =>
        id == null || st == null || !Seq("O", "F").contains(st) ||
          am == null || am < 0 || am > 60 }
      assert(quar.length == expectedBad, s"seed=$seed")
    }
  }
}

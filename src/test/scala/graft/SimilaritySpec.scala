package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK computes exact cosine and ranks deterministically") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical direction → cos 1
      (2L, Array(0.0f, 1.0f)),   // orthogonal → cos 0
      (3L, Array(-1.0f, 0.0f))   // opposite → cos -1
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("embedding physical-type drift: array<double> input scores identically to array<float>") {
    // the round-6 lesson (events.ts flipped physical type between testdata
    // regenerations) generalized to the embeddings table: the fixed-point
    // hop casts elements to double FIRST, so a regeneration shipping
    // list<double> instead of list<float> must be a no-op for every
    // similarity path, not a throw or a score drift
    val f = Seq((0L, Array(0.25f, 0.5f)), (1L, Array(0.5f, 0.25f)),
                (2L, Array(0.25f, 0.5f))).toDF("vec_id", "embedding")
    val d = Seq((0L, Array(0.25d, 0.5d)), (1L, Array(0.5d, 0.25d)),
                (2L, Array(0.25d, 0.5d))).toDF("vec_id", "embedding")
    def run(vs: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(vs.filter(col("vec_id") === 0), vs,
          "vec_id", "embedding", 2)
        .select("cand_id", "cos_sim").orderBy("cand_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(f) == run(d))
    assert(run(d).head == ((1L, 0.8)))   // exact: (0.25,0.5)·(0.5,0.25)/(norms)
  }

  test("jacobiEigen solves a known symmetric system exactly") {
    // [[2,1],[1,2]] → eigenvalues (3, 1), eigenvectors (1,1)/√2 and (1,-1)/√2
    val (evals, evecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // sign convention: largest-|component| positive
    assert(math.abs(math.abs(evecs(1)(0)) - s) < 1e-12)
    assert(evecs(1).maxBy(math.abs) > 0)
  }

  test("covarianceSums matches a locally computed covariance") {
    val data = Seq(
      Array(1.0f, 2.0f, 0.0f), Array(2.0f, 4.0f, 1.0f),
      Array(3.0f, 6.0f, 0.0f), Array(4.0f, 8.0f, 1.0f))
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Similarity.covarianceSums(df, "embedding", dim = 3)
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(6))).toMap
    val n = data.length
    def mean(c: Int) = data.map(_(c).toDouble).sum / n
    def cov(a: Int, b: Int) =
      data.map(v => v(a).toDouble * v(b).toDouble).sum / n - mean(a) * mean(b)
    for (i <- 0 until 3; j <- i until 3)
      assert(math.abs(got((i, j)) - cov(i, j)) < 1e-9, s"cov($i,$j)")
    // a ragged row (wrong dim) must be excluded from every cell's sample
    val ragged = df.union(Seq((99L, Array(5.0f))).toDF("vec_id", "embedding"))
    val got2 = Similarity.covarianceSums(ragged, "embedding", dim = 3)
      .select("n").distinct().collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(n.toLong))
  }

  test("hadamardProject: identical vectors project identically; top-1 survives 8->4 JL reduction") {
    // 3 well-separated cluster axes in dim 8 (power of two), pairs of
    // identical vectors — the training-free sketch must keep exact
    // duplicates identical and same-cluster neighbors top-ranked
    val dim = 8
    val vecs = (0L until 24L).map { i =>
      val c = (i % 3).toInt
      val v = Array.fill(dim)(0.0f)
      v(c * 2) = 1.0f
      v(6) = 0.01f * ((i / 3 % 4) + 1) // duplicates share (cluster, i/3%4)
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.hadamardProject(df, "vec_id", "embedding", k = 4, dim = dim)
    val rows = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // ids 0 and 12 are bit-identical inputs → identical projections
    assert(rows(0L) == rows(12L))
    // dimension guard: a ragged vector is excluded, non-power-of-two dim throws
    assertThrows[IllegalArgumentException](
      Similarity.hadamardProject(df, "vec_id", "embedding", k = 2, dim = 6))
    // reduced-space exact top-1 finds a same-cluster member for every query
    val top1 = Similarity.bruteForceTopK(
        proj.filter(col("vec_id") < 3), proj, "vec_id", "proj", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length == 3 &&
      top1.forall { case (q, cand) => (cand % 3) == (q % 3) },
      s"cross-cluster top-1 in ${top1.toSeq}")
    graft.operators.OpCache.clear()
  }

  test("recallAtK: per-query hit fraction; queries the approx side missed score 0") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "cand_id")
    val approx = Seq((1L, 10L), (1L, 99L)).toDF("query_id", "cand_id")
    val got = Similarity.recallAtK(approx, exact).orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }

  test("meanPoolEmbeddings: per-group element-wise means, ragged rows excluded") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 0.0f)),
      (1, Array(5.0f))) // ragged: excluded like null
      .toDF("label", "embedding")
    val got = Similarity.meanPoolEmbeddings(df, "label", "embedding", dim = 2)
      .orderBy("label", "i").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0, 0, 2L, 2.0), (0, 1, 2L, 4.0),
                      (1, 0, 1L, 10.0), (1, 1, 1L, 0.0)))
  }

  test("covariance partials merge exactly: batches == one-shot, any merge order") {
    val df = (0L until 30L).map { i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 13).toFloat / 13f))
    }.toDF("vec_id", "embedding")
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("i", "j").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    val oneShot = rowsOf(Similarity.covarianceSums(df, "embedding", dim = 4))
    val parts = (0 to 2).map { b =>
      Similarity.covariancePartials(
        df.filter(pmod(col("vec_id"), lit(3)) === b), "embedding", dim = 4)
    }
    // scrambled merge order: commutativity + associativity of the exact
    // decimal sums means the folded state is bit-identical either way
    val merged = rowsOf(Similarity.finalizeCovariance(
      Seq(parts(2), parts(0), parts(1)).reduce(Similarity.mergeCovariance)))
    assert(merged == oneShot)
  }

  test("pcaFit finds the dominant direction; components orthonormal, variance ordered") {
    // anisotropic cloud: spread 10× along (1,1,0)/√2, noise elsewhere —
    // deterministic fixture (no RNG: fixed lattice offsets)
    val dir = Array(1.0, 1.0, 0.0).map(_ / math.sqrt(2.0))
    val pts = for (i <- -5 to 5; j <- Seq(-0.3, 0.3)) yield {
      val t = i.toDouble
      Array((t * dir(0) + j * 0.1).toFloat, (t * dir(1) - j * 0.1).toFloat,
            (j * 0.5).toFloat)
    }
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")
    val (comps, _, explained) = Similarity.pcaFit(df, "embedding", dim = 3, k = 3)
    // first component aligns with the planted direction
    val cosAlign = math.abs(comps(0).zip(dir).map { case (a, b) => a * b }.sum)
    assert(cosAlign > 0.999, s"alignment $cosAlign")
    // orthonormal rows
    for (a <- 0 until 3; b <- a until 3) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"orthonormality ($a,$b): $dot")
    }
    // explained-variance fractions are descending and sum to ~1 at full rank
    assert(explained.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(explained.sum - 1.0) < 1e-9)
  }

  test("pcaProject at full rank is a rotation: pairwise distances preserved") {
    val pts = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(4.0f, 0.0f, -1.0f)),
      (2L, Array(-2.0f, 1.0f, 0.5f)), (3L, Array(0.0f, -3.0f, 2.0f)))
    val df = pts.toDF("vec_id", "embedding")
    val (comps, means, _) = Similarity.pcaFit(df, "embedding", dim = 3, k = 3)
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", comps, means)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = pts.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    for (a <- pts.map(_._1); b <- pts.map(_._1) if a < b)
      assert(math.abs(d2(proj(a), proj(b)) - d2(orig(a), orig(b))) < 1e-6,
        s"distance ($a,$b) not preserved")
  }

  test("IVF assigns to the nearest centroid and searches only that cell") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // centroid A (also a query)
      (1L, Array(0.0f, 1.0f)),    // centroid B
      (2L, Array(0.9f, 0.1f)),    // → cell A
      (3L, Array(0.1f, 0.9f))     // → cell B
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0),
      nCells = 2, "vec_id", "embedding", k = 5).collect()
    // query 0's cell contains only vec 2; vec 3 (other cell) is invisible
    assert(out.map(_.getLong(2)).toSeq == Seq(2L))
    assert(out.head.getLong(1) == 0L)
  }

  test("LSH buckets put identical vectors together and ANN finds them") {
    val base = Array.tabulate(8)(i => (i + 1).toFloat / 10f)
    val vecs = Seq(
      (0L, base), (1L, base),
      (2L, base.map(-_))
    ).toDF("vec_id", "embedding")
    val buckets = Similarity.lshBuckets(vecs, "vec_id", "embedding", 4, 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(buckets(0L) == buckets(1L))
    assert(buckets(0L) != buckets(2L)) // opposite vector flips every plane sign
    val ann = Similarity.annTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 4, 8, 3).collect()
    assert(ann.map(_.getLong(2)).toSeq == Seq(1L)) // only same-bucket candidate
    assert(ann.head.getDouble(3) == 1.0)
  }

  test("ivf nProbe=2 recovers cross-cell neighbors that nProbe=1 misses") {
    import spark.implicits._
    // centroid cells: 0=(1,0), 1=(0.6,0.8); v5 lands in cell 1, query 9 in
    // cell 0 — its near neighbor v5 is only reachable with a second probe
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.6f, 0.8f),
      5L -> Array(0.8f, 0.6f), 6L -> Array(1.0f, -0.1f),
      9L -> Array(0.98f, 0.2f)).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 9L)
    val one = Similarity.ivfTopK(vecs, q, nCells = 2, "vec_id", "embedding", k = 4)
      .collect().map(_.getAs[Long]("cand_id")).toSet
    val two = Similarity.ivfTopK(vecs, q, nCells = 2, "vec_id", "embedding", k = 4, nProbe = 2)
      .collect().map(_.getAs[Long]("cand_id")).toSet
    assert(!one.contains(5L) && two.contains(5L), s"one=$one two=$two")
    assert(one.subsetOf(two))
    graft.operators.OpCache.clear()
  }

  test("kmeans separates two well-separated clusters; empty cells keep centroids") {
    import spark.implicits._
    // cluster A along (1,0,0,0)-ish, cluster B along (0,0,1,1)-ish
    val a = (1L to 8L).map(i => (i, Array(1.0f, 0.05f * i, 0.0f, 0.0f)))
    val b = (11L to 18L).map(i => (i, Array(0.0f, 0.0f, 1.0f, 1.0f + 0.05f * (i - 10))))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", nCells = 2, iters = 5)
    assert(cents.count() == 2)
    val assigned = Similarity.assignToCentroids(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // purity: each true cluster maps to exactly one centroid id, and the
    // two clusters map to different ones
    val cellsA = a.map(x => assigned(x._1)).toSet
    val cellsB = b.map(x => assigned(x._1)).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB,
      s"impure assignment: A->$cellsA B->$cellsB")
    graft.operators.OpCache.clear()
  }

  test("int8 quantized cosine tracks float cosine and is exact on identical vectors") {
    val df = Seq(
      (1L, Array(0.10f, 0.20f, -0.30f, 0.40f)),
      (2L, Array(0.10f, 0.20f, -0.30f, 0.40f)),   // identical to 1
      (3L, Array(0.40f, -0.10f, 0.20f, 0.05f)),
      (4L, Array(-0.20f, 0.30f, 0.10f, -0.40f)),
      (5L, Array(0.0f, 0.0f, 0.0f, 0.0f)))        // zero vector: scale guard
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 1L)
    val got = Similarity.int8TopK(q, df, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // identical vector quantizes identically → cosine exactly 1.0
    assert(got(2L) == 1.0, s"got $got")
    // quantized scores stay within int8 error of the float cosines
    val exact = Similarity.bruteForceTopK(q, df, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    Seq(3L, 4L).foreach { id =>
      assert(math.abs(got(id) - exact(id)) < 0.02,
        s"id $id: int8 ${got(id)} vs float ${exact(id)}")
    }
    // zero vector: defined (0.0), not NaN/error
    assert(got(5L) == 0.0)
    graft.operators.OpCache.clear()
  }

  test("PQ: codebooks train per subspace, identical vectors encode identically, ADC ranks the true neighbor first") {
    // two well-separated clusters in dim 4, m=2 subspaces of 2
    val a = (1L to 6L).map(i => (i, Array(1.0f, 0.02f * i, 0.0f, 0.01f * i)))
    val b = (11L to 16L).map(i => (i, Array(0.0f, 0.01f * i, 1.0f, 0.02f * i)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding",
      dim = 4, m = 2, ksub = 2, iters = 4)
    assert(cb.count() == 4) // 2 subspaces × 2 centroids
    val books = Similarity.collectCodebooks(cb, m = 2, ksub = 2)
    assert(books.length == 2 && books(0).length == 2 && books(0)(0).length == 2)

    val enc = Similarity.pqEncode(df, "vec_id", "embedding", books)
    val codes = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    // within each tight cluster the codes collapse to the cluster's cell
    assert(a.map(x => codes(x._1)).toSet.size == 1, s"A codes: ${a.map(x => codes(x._1))}")
    assert(b.map(x => codes(x._1)).toSet.size == 1)
    assert(codes(1L) != codes(11L))

    // ADC: a query from cluster A must rank an A-member first
    val top = Similarity.pqTopK(df.filter(col("vec_id") === 1L), enc,
        "vec_id", "embedding", books, k = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) >= 1L && top.head.getLong(1) <= 6L,
      s"nearest by ADC should be in cluster A: ${top.mkString(",")}")
    graft.operators.OpCache.clear()
  }

  test("IVF-PQ: cell-bounded ADC ranks a same-cluster member first") {
    // ids 0 and 1 are the IVF centroids (vec_id < nCells): put one in
    // each cluster so cells align with clusters
    val a = Seq(0L, 2L, 3L, 4L).map(i => (i, Array(1.0f, 0.02f * i, 0.0f, 0.01f * i)))
    val b = Seq(1L, 11L, 12L, 13L).map(i => (i, Array(0.0f, 0.01f * i, 1.0f, 0.02f * i)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqTopK(df, df.filter(col("vec_id") === 2L),
        "vec_id", "embedding", dim = 4, nCells = 2, m = 2, ksub = 2,
        iters = 3, k = 2)
      .orderBy("rank").collect()
    assert(top.nonEmpty)
    // every returned candidate comes from the query's own cell = cluster A
    val aIds = a.map(_._1).toSet
    assert(top.forall(r => aIds.contains(r.getLong(1))),
      s"candidates leaked across cells: ${top.mkString(",")}")
    graft.operators.OpCache.clear()
  }

  test("deterministic IVF-PQ composes exactly: ivfAssign cells × pqAdcDeterministic scores") {
    // 2 clusters in dim 8; ids 0/1 are the IVF centroids (one per
    // cluster) and ids 0/1 also seed the PQ codebooks (ksub = 2)
    val a = Seq(0L, 2L, 3L, 4L).map(i =>
      (i, Array(1.0f, 0.03f * i, 0.0f, 0.01f * i, 0.5f, 0.0f, 0.02f * i, 0.1f)))
    val b = Seq(1L, 11L, 12L).map(i =>
      (i, Array(0.0f, 0.01f * i, 1.0f, 0.02f * i, 0.0f, 0.5f, 0.1f, 0.03f * i)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") === 2L || col("vec_id") === 11L)
    // k larger than any cell → no truncation, the FULL candidate sets compare
    val ivfpq = Similarity.ivfPqAdcDeterministic(qs, df, "vec_id", "embedding",
        dim = 8, nCells = 2, m = 2, ksub = 2, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(ivfpq.nonEmpty)
    val cells = Similarity.ivfAssign(df, df.filter(col("vec_id") < 2),
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pqAll = Similarity.pqAdcDeterministic(qs, df, "vec_id", "embedding",
        dim = 8, m = 2, ksub = 2, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // candidate set = exactly the query's cell-mates (minus self)...
    val expected = cells.keySet.flatMap(q => cells.keySet.collect {
      case c if c != q && cells(c) == cells(q) && Set(2L, 11L)(q) => (q, c)
    })
    assert(ivfpq.keySet == expected, s"got ${ivfpq.keySet}, want $expected")
    ivfpq.foreach { case ((q, c), (cell, adot)) =>
      assert(cell == cells(q))
      // ...and each pair's ADC score is bit-identical to the PQ-only path
      assert(adot == pqAll((q, c)), s"($q,$c): ivfpq $adot vs pq ${pqAll((q, c))}")
    }
    graft.operators.OpCache.clear()
  }

  test("ANN recall floor: LSH and IVF recover most brute-force neighbors on clustered data") {
    // deterministic 3-cluster corpus in dim 8: cluster axes e0/e2/e4 plus
    // small per-id jitter on the odd dims — everything downstream is
    // deterministic, so the floors are stable, not flaky
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      val v = Array.fill(dim)(0.0f)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = 0.01f * ((i * 7 % 13) + 1)
      v(7) = 0.002f * (i % 5)
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 6)
    def topSets(r: Array[org.apache.spark.sql.Row]) =
      r.groupBy(_.getLong(0)).view
        .mapValues(_.map(x => x.getLong(x.fieldIndex("cand_id"))).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (q, s) =>
        approx.getOrElse(q, Set.empty).intersect(s).size }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val lsh = topSets(Similarity.annTopK(df, queries,
      "vec_id", "embedding", nPlanes = 4, dim = dim, k = 3).collect())
    val ivf = topSets(Similarity.ivfTopK(df, queries, nCells = 3,
      "vec_id", "embedding", k = 3).collect())
    val rLsh = recall(lsh)
    val rIvf = recall(ivf)
    assert(rLsh >= 0.8, s"LSH recall@3 dropped to $rLsh")
    assert(rIvf >= 0.8, s"IVF recall@3 dropped to $rIvf")
    graft.operators.OpCache.clear()
  }

  test("PCA-reduced ANN: top-k recall survives 8->4 dimensionality reduction") {
    // the 100 TB lever claim — project before candidate generation, keep
    // recall — measured end to end: 3 clusters on axes e0/e2/e4, the
    // within-cluster ORDERING signal on a shared axis e6 (so it lies in
    // the captured subspace), genuine noise on e7 (dropped by the
    // reduction). Exact top-k in REDUCED space vs ORIGINAL space.
    // (First cut of this fixture put the ordering signal on per-cluster
    // odd dims — orthogonal to every top component, so the reduction
    // erased it and recall collapsed to 0: reduction only preserves
    // rankings whose signal the kept subspace actually spans.)
    val dim = 8
    val vecs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      val v = Array.fill(dim)(0.0f)
      v(c * 2) = 1.0f
      v(6) = 0.01f * ((i * 7 % 13) + 1) // shared ordering signal: captured
      v(7) = 0.002f * (i % 5)           // noise: dropped by the reduction
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 6)
    def topSets(r: Array[org.apache.spark.sql.Row]) =
      r.groupBy(_.getLong(0)).view
        .mapValues(_.map(x => x.getLong(x.fieldIndex("cand_id"))).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    // UNCENTERED fit: cosine is an angle from the ORIGIN, so the
    // projection must be a pure linear map (a centered projection
    // shifts the origin and reshuffles angular top-k)
    val (comps, means, explained) =
      Similarity.pcaFit(df, "embedding", dim, k = 4, center = false)
    // cluster axes + the shared signal axis carry nearly all energy
    assert(explained.sum > 0.95, s"4 components explain only ${explained.sum}")
    val projected = Similarity.pcaProject(df, "vec_id", "embedding", comps, means)
      .withColumn("pca", transform(col("pca"), _.cast("float")))
    val reduced = topSets(Similarity.bruteForceTopK(
      projected.filter(col("vec_id") < 6), projected, "vec_id", "pca", k = 3)
      .collect())
    val hits = exact.map { case (q, s) =>
      reduced.getOrElse(q, Set.empty).intersect(s).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    assert(recall >= 0.8, s"PCA-space recall@3 dropped to $recall")
    graft.operators.OpCache.clear()
  }

  test("trained IVF-PQ recall floor on a codebook-representable clustered corpus (round-4 verdict)") {
    // pins the TRAINED composition end-to-end — k-means codebook init →
    // Lloyd's → in-row encode → cell-bounded ADC ranking — not just its
    // oracle-exact deterministic face. PQ can only rank what its
    // codebooks can REPRESENT, so the fixture puts the within-cluster
    // variation in its own subspace with exactly ksub distinct patterns
    // (a lossless codebook exists; training must find it), and gives
    // every vector the same norm so ADC's dot-ranking and brute-force's
    // cosine-ranking order candidates identically.
    val dim = 8
    // cluster identity c on dims 0/2/4 (subspaces 0-2 under m=4), four
    // equal-norm jitter patterns j on dims 6-7 (subspace 3). The k-means
    // init picks the first ksub ids in md5(id) order — 27, 59, 6, 43 for
    // 0..59 (md5 is stable, so this is deterministic) — and a lossless
    // codebook is only FOUND if those four start on distinct patterns:
    // remap 59→1 and 43→0 so init covers {3,1,2,0}
    val jOverride = Map(59L -> 1, 43L -> 0)
    val vecs = (0L until 60L).map { i =>
      val c = (i % 3).toInt
      val j = jOverride.getOrElse(i, (i % 4).toInt)
      val v = Array.fill(dim)(0.0f)
      v(c * 2) = 1.0f
      v(6) = (0.5 * math.cos(0.3 * j)).toFloat
      v(7) = (0.5 * math.sin(0.3 * j)).toFloat
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 6)
    def topSets(r: Array[org.apache.spark.sql.Row]) =
      r.groupBy(_.getLong(0)).view
        .mapValues(_.map(x => x.getLong(x.fieldIndex("cand_id"))).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    val ivfpq = topSets(Similarity.ivfPqTopK(df, queries,
      "vec_id", "embedding", dim = dim, nCells = 3, m = 4, ksub = 4,
      iters = 3, k = 3, nProbe = 1).collect())
    val hits = exact.map { case (q, s) =>
      ivfpq.getOrElse(q, Set.empty).intersect(s).size }.sum
    val r = hits.toDouble / exact.values.map(_.size).sum
    assert(r >= 0.9, s"trained IVF-PQ recall@3 dropped to $r")
    graft.operators.OpCache.clear()
  }

  test("semanticDedup: within-cell cosine components collapse to min-id survivors") {
    import spark.implicits._
    // two cells (centers 0 = e0, 1 = e1); ids 0/2/4 form a semantic
    // cluster in cell 0 (pairwise cos ≥ 0.99), ids 1/3 duplicate in
    // cell 1, id 5 sits in cell 1 but below the threshold (survives
    // alone with size 1)
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      2L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      4L -> Array(0.9f, 0.0f, 0.1f, 0.0f),
      5L -> Array(0.0f, 0.6f, 0.0f, 0.8f))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 2), threshold = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      0L -> (0L, 3L),   // survivor of {0,2,4}
      1L -> (1L, 2L),   // survivor of {1,3}
      5L -> (1L, 1L)))  // no semantic dup: survives with size 1
    graft.operators.OpCache.clear()
    // dup-free corpus: the pair set is empty, connected components sees
    // zero edges, and EVERY doc must survive with size 1 (regression
    // guard for the empty-label-table path)
    val ortho = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      2L -> Array(0.9f, 0.0f, 0.4f, 0.0f))
      .toDF("vec_id", "embedding")
    val all = Similarity.semanticDedup(ortho, "vec_id", "embedding",
        ortho.filter(col("vec_id") < 2), threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    graft.operators.OpCache.clear()
  }

  test("semanticDedup maxCellSize fails a degenerate centroid set loudly, passes balanced cells") {
    import spark.implicits._
    // all six docs point the same way → ONE centroid swallows the whole
    // corpus: exactly the silent-quadratic shape the guard exists for
    val clump = (0L to 5L).map(i => i -> Array(1.0f, i * 1e-4f, 0.0f, 0.0f))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.semanticDedup(clump, "vec_id", "embedding",
        clump.filter(col("vec_id") < 1), threshold = 0.9,
        maxCellSize = Some(4L)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxCellSize")),
      s"expected the maxCellSize guard message, got: ${messages(e).mkString(" | ")}")
    graft.operators.OpCache.clear()
    // a cap the cells respect changes NOTHING: same survivors as the
    // unguarded run on the two-cell fixture above
    val vecs = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      1L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      2L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f, 0.0f))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 2), threshold = 0.8, maxCellSize = Some(2L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 2L, 1L -> 2L))
    graft.operators.OpCache.clear()
  }

  test("lshBuckets fails loudly on embedding length mismatch (ADVICE r1)") {
    val bad = Seq((1L, Array(0.1f, 0.2f, 0.3f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.lshBuckets(bad, "vec_id", "embedding", 4, 8).collect()
    }
    assert(e.getMessage.contains("length") ||
      Option(e.getCause).exists(_.getMessage.contains("length")))
  }

  test("ivfPqRerankTopK: with exhaustive probe + corpus-wide shortlist the " +
      "rerank output EQUALS brute force (the rerank stage is exact)") {
    import spark.implicits._
    val dim = 8
    val vecs = (0L until 24L).map { i =>
      val v = Array.tabulate(dim)(d =>
        (math.cos(0.7 * i + 1.3 * d) * 0.5).toFloat)
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    def sets(r: Array[org.apache.spark.sql.Row]) =
      r.groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(x => x.getInt(x.fieldIndex("rank")))
          .map(x => x.getLong(x.fieldIndex("cand_id"))).toSeq).toMap
    val exact = sets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    val rr = sets(Similarity.ivfPqRerankTopK(df, queries,
      "vec_id", "embedding", dim = dim, nCells = 2, m = 4, ksub = 4,
      iters = 3, k = 3, nProbe = 2, rerank = 24).collect())
    // nProbe = nCells and rerank = |corpus| remove both approximation
    // stages, so the EXACT rerank must reproduce brute force order
    // including rank order (ties broken by cand_id in both)
    assert(rr == exact, s"rerank diverged from brute force: $rr vs $exact")
    graft.operators.OpCache.clear()
  }

  test("ivfPqResidualRerankTopK: exhaustive probe + corpus-wide shortlist " +
      "EQUALS brute force (residual decomposition preserves the exact rerank)") {
    import spark.implicits._
    val dim = 8
    val vecs = (0L until 24L).map { i =>
      val v = Array.tabulate(dim)(d =>
        (math.cos(0.7 * i + 1.3 * d) * 0.5).toFloat)
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 4)
    def sets(r: Array[org.apache.spark.sql.Row]) =
      r.groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(x => x.getInt(x.fieldIndex("rank")))
          .map(x => x.getLong(x.fieldIndex("cand_id"))).toSeq).toMap
    val exact = sets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    val rr = sets(Similarity.ivfPqResidualRerankTopK(df, queries,
      "vec_id", "embedding", dim = dim, nCells = 2, m = 4, ksub = 4,
      iters = 3, k = 3, nProbe = 2, rerank = 24).collect())
    assert(rr == exact, s"residual rerank diverged from brute force: $rr vs $exact")
    graft.operators.OpCache.clear()
  }

  test("opqEigenRotation is orthogonal and ivfPqResidualOpqRerankTopK " +
      "with exhaustive probe + corpus-wide shortlist EQUALS brute force " +
      "(rotation invariance, round-10 verdict #3)") {
    import spark.implicits._
    val dim = 8
    val vecs = (0L until 24L).map { i =>
      val v = Array.tabulate(dim)(d =>
        (math.cos(0.7 * i + 1.3 * d) * 0.5).toFloat)
      (i, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    // R·Rᵀ = I: rows are reordered orthonormal eigenvectors
    val r = Similarity.opqEigenRotation(df, "embedding", dim, m = 4)
    assert(r.length == dim && r.forall(_.length == dim))
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(c => r(i)(c) * r(j)(c)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"R·Rᵀ($i,$j)=$d, want $want")
    }
    val queries = df.filter(col("vec_id") < 4)
    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(x => x.getInt(x.fieldIndex("rank")))
          .map(x => x.getLong(x.fieldIndex("cand_id"))).toSeq).toMap
    val exact = sets(Similarity.bruteForceTopK(queries, df,
      "vec_id", "embedding", k = 3).collect())
    // exhaustive probe + full shortlist removes both approximation
    // stages; because the rotation is orthogonal the exact rerank in
    // the rotated pipeline must still reproduce brute force exactly
    val rr = sets(Similarity.ivfPqResidualOpqRerankTopK(df, queries,
      "vec_id", "embedding", dim = dim, nCells = 2, m = 4, ksub = 4,
      iters = 3, k = 3, nProbe = 2, rerank = 24).collect())
    assert(rr == exact, s"OPQ rerank diverged from brute force: $rr vs $exact")
    graft.operators.OpCache.clear()
  }

  test("residual ADC-only recall floor on the sf0.1 bench embeddings " +
      "(round-9 verdict #2)") {
    // ADC-ONLY (no rerank): the residual path's measured 0.339 vs the
    // plain path's 0.302 at the bench operating point — the floor pins
    // the residual encoding keeps its fidelity edge; full decomposition
    // (coverage vs quantization noise) lives in the ivfPqResidualTopK
    // scaladoc and the bench JSON's four recall fields.
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
    val r = Bench.ivfPqAdcRecallAt10(spark, dir, residual = true)
    assert(r >= 0.30, s"residual ADC recall@10 dropped to $r")
  }

  test("trained IVF-PQ + exact rerank holds the recall floor on the sf0.1 " +
      "bench embeddings (round-8 verdict #6)") {
    // The BENCH-CORPUS floor, not a toy fixture: near-isotropic vectors
    // are ANN's adversarial case (no cluster structure, thin cosine
    // margins), and plain ADC saturates at 0.3-0.5 recall@10 there —
    // the exact rerank stage is what clears the bar. Deterministic
    // given the data (seeded init, first-nCells centroids): measured
    // 0.72 at the pinned operating point; the 0.65 floor leaves margin
    // only against a testdata regeneration, not run-to-run noise.
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
    val r = Bench.ivfPqRecallAt10(spark, dir)
    assert(r >= 0.65, s"trained IVF-PQ rerank recall@10 dropped to $r")
  }

  test("hardNegatives skips same-label neighbors, however close") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.99f, 0.1f), 7),   // nearest of all — but same label
      (2L, Array(0.9f, 0.3f), 8),    // nearest DIFFERENT-label → rank 1
      (3L, Array(0.0f, 1.0f), 9),    // farther, different label → rank 2
      (4L, Array(-1.0f, 0.0f), 7)    // same label again — excluded
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        vecs.filter(col("vec_id") === 0), vecs,
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    graft.operators.OpCache.clear()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L))
    assert(out.head.getDouble(2) > 0.9)
  }

  test("hardNegatives: null labels never equal anything (null-safe)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), Some(7)),
      (1L, Array(0.9f, 0.1f), None),      // null label differs from 7 → mined
      (2L, Array(0.8f, 0.2f), Some(7))    // same label → excluded
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        vecs.filter(col("vec_id") === 0), vecs,
        "vec_id", "embedding", "label", k = 2).collect()
    graft.operators.OpCache.clear()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("hardNegativesIvf bounds candidates to probed cells, exact within them") {
    // two tight clusters; centroids = ids 0 and 1 (one per cluster).
    // query 2 sits in cluster A: with nProbe=1 its negatives come from
    // cluster A only; nProbe=2 admits the cross-cluster negative too.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1),    // centroid/member of cluster A
      (1L, Array(0.0f, 1.0f), 2),    // centroid/member of cluster B
      (2L, Array(0.99f, 0.05f), 1),  // query, cluster A, label 1
      (3L, Array(0.95f, 0.1f), 3),   // cluster A, different label
      (4L, Array(0.05f, 0.99f), 3)   // cluster B, different label
    ).toDF("vec_id", "embedding", "label")
    def mine(nProbe: Int) = {
      val r = Similarity.hardNegativesIvf(vecs,
          vecs.filter(col("vec_id") === 2), nCells = 2,
          "vec_id", "embedding", "label", k = 5, nProbe = nProbe)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      graft.operators.OpCache.clear(); r
    }
    assert(mine(1) == Seq(3L))          // same-label 0 excluded, B invisible
    // second probe admits cluster B; 4 = (.05,.99) has cos≈0.10 with the
    // query vs 1 = (0,1) at cos≈0.05, so 4 ranks above 1
    assert(mine(2) == Seq(3L, 4L, 1L))
  }
}

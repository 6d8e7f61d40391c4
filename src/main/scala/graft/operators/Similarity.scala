package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Three paths:
  *   - [[bruteForceTopK]]: exact cosine top-k over the full corpus — the
  *     correctness baseline.
  *   - [[lshBuckets]] + [[annTopK]] / [[nearDupPairs]]: sign-random-
  *     projection LSH. Buckets are computed in the scan (inlined ±1
  *     hyperplanes, zero shuffle); candidates are an equi-join on the
  *     bucket, cutting pairwise work by ~2^nPlanes.
  *   - [[ivfAssign]] + [[ivfTopK]]: inverted-file cells around a
  *     broadcast centroid set; search touches 1/nCells of the corpus.
  *
  * Exactness: dot products accumulate as DECIMAL(38,18) over elements
  * cast float→double→decimal(18,9) — order-independent and bit-identical
  * to the DuckDB oracle (a direct float→decimal cast would round the
  * float's short decimal representation and diverge). The exported cosine
  * is rounded to 6 decimals because the final decimal→double conversion
  * can differ by 1 ulp across engines.
  *
  * Execution shape: every pairwise score runs as `explode once →
  * equi-join on element index → hash aggregate` — whole-stage codegen
  * end to end. (Higher-order lambdas are interpreted row-at-a-time in
  * Spark; fine for the per-row bucket projections, far too slow for
  * per-pair dots.)
  */
object Similarity {

  private val elemDec = "decimal(18,9)"

  /** Exploded decimal element table: (__vid, __i, __x). */
  private def elems(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(idCol).as("__vid"), posexplode(col(vecCol)).as(Seq("__i", "__xr")))
      .select(col("__vid"), col("__i"),
              col("__xr").cast("double").cast(elemDec).as("__x"))

  /** Euclidean norms per id: (__vid, nrm) — exact decimal sum → sqrt. */
  private def norms(e: DataFrame): DataFrame =
    e.groupBy(col("__vid"))
      .agg(sqrt(sum(col("__x") * col("__x")).cast("double")).as("nrm"))

  /** Rounded cosine for (id_a, id_b [, carry…]) pairs via one codegen'd
    * hash aggregation over the element join.
    */
  private def pairCosine(pairs: DataFrame, e: DataFrame, nrm: DataFrame): DataFrame = {
    val carry = pairs.columns.filterNot(Seq("id_a", "id_b").contains)
    val groupCols = (Seq("id_a", "id_b") ++ carry).map(col)
    pairs
      .join(e.select(col("__vid").as("id_a"), col("__i"), col("__x").as("__xa")), "id_a")
      .join(e.select(col("__vid").as("id_b"), col("__i"), col("__x").as("__xb")),
            Seq("id_b", "__i"))
      .groupBy(groupCols: _*)
      .agg(sum(col("__xa") * col("__xb")).as("__dot"))
      .join(nrm.select(col("__vid").as("id_a"), col("nrm").as("__na")), "id_a")
      .join(nrm.select(col("__vid").as("id_b"), col("nrm").as("__nb")), "id_b")
      .withColumn("cos_sim",
        round(col("__dot").cast("double") / (col("__na") * col("__nb")), 6))
      .drop("__dot", "__na", "__nb")
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = OpCache.persist(elems(corpus, idCol, vecCol))
    val nrm = norms(e)
    val pairs = queries.select(col(idCol).as("id_a"))
      .crossJoin(corpus.select(col(idCol).as("id_b")))
      .filter(col("id_a") =!= col("id_b"))
    pairCosine(pairs, e, nrm)
      .select(col("id_a").as("query_id"), col("id_b").as("cand_id"), col("cos_sim"))
      .transform(topK(_, k))
  }

  /** Deterministic ±1 hyperplanes: sign(p,d) = +1 iff the first md5 hex
    * digit of "p_d" is odd — computed driver-side (tiny) and inlined as
    * literal arrays, reproducible in any engine with md5.
    */
  def planeSigns(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${p}_${d}".getBytes("UTF-8"))
      if ((((digest(0) >> 4) & 0xF) % 2) == 1) 1 else -1
    }

  /** Per-vector LSH bucket: an `nPlanes`-char '0'/'1' string, bit p set
    * iff Σ_d sign(p,d)·x_d ≥ 0. Each projection is a higher-order
    * aggregate against an inlined ±1 array — zero explode, zero shuffle:
    * the bucket is computed in the same scan that reads the vector
    * (per-row work, where interpreted lambdas are cheap enough).
    */
  def lshBuckets(vectors: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int, dim: Int): DataFrame = {
    val signs = planeSigns(nPlanes, dim)
    val bits = (0 until nPlanes).map { p =>
      val signArr = array(signs(p).map(lit): _*)
      val proj = aggregate(
        zip_with(col(vecCol), signArr,
          (x, s) => x.cast("double").cast(elemDec) * s),
        lit(0).cast("decimal(38,9)"),
        (acc, v) => (acc + v).cast("decimal(38,9)"))
      when(proj >= 0, "1").otherwise("0")
    }
    // zip_with pads with nulls on length mismatch, which would silently turn
    // the projection null (bucket bit '0'); fail loudly instead.
    vectors.select(col(idCol),
      when(size(col(vecCol)) === dim, concat(bits: _*))
        .otherwise(raise_error(concat(
          lit(s"lshBuckets: embedding length must be $dim, got "),
          size(col(vecCol)).cast("string")))).as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH buckets prefilter the
    * O(n²) pair space (same-bucket only), then exact cosine decides.
    * The dedup-flavored dual of [[annTopK]].
    */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                   nPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val e = OpCache.persist(elems(vectors, idCol, vecCol))
    val nrm = norms(e)
    val buckets = lshBuckets(vectors, idCol, vecCol, nPlanes, dim)
    val pairs = buckets.alias("x").join(buckets.alias("y"), Seq("bucket"))
      .select(col("bucket"), col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .filter(col("id_a") < col("id_b"))
    pairCosine(pairs, e, nrm)
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "bucket", "cos_sim")
  }

  /** ANN top-k: exact cosine, but only within the query's LSH bucket. */
  def annTopK(vectors: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, nPlanes: Int, dim: Int,
              k: Int): DataFrame = {
    val e = OpCache.persist(elems(vectors, idCol, vecCol))
    val nrm = norms(e)
    val buckets = lshBuckets(vectors, idCol, vecCol, nPlanes, dim)
    val qb = queries.select(col(idCol)).join(buckets, idCol)
      .select(col(idCol).as("id_a"), col("bucket"))
    val pairs = qb.join(buckets.select(col(idCol).as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
    pairCosine(pairs, e, nrm)
      .select(col("id_a").as("query_id"), col("bucket"),
              col("id_b").as("cand_id"), col("cos_sim"))
      .transform(topK(_, k))
  }

  /** IVF (inverted-file) ANN — centroid-cell dual of the LSH path:
    * every vector is assigned to its nearest centroid (max rounded
    * cosine, centroid-id tie-break), queries probe only their own cell.
    * Centroids are a fixed deterministic subset (`vec_id < nCells`);
    * production would plug an offline k-means — the broadcast-assign /
    * cell-join plumbing is what must scale and is identical either way.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame =
    ivfAssignWith(elems(vectors, idCol, vecCol), centroids, idCol)

  private def ivfAssignWith(e: DataFrame, centroids: DataFrame,
                            idCol: String): DataFrame = {
    val nrm = norms(e)
    val pairs = e.select(col("__vid").as("id_a")).distinct()
      .crossJoin(centroids.select(col(idCol).as("id_b")))
    val scored = pairCosine(pairs, e, nrm)
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cos_sim").desc, col("id_b").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id_a").as(idCol), col("id_b").as("centroid_id"))
  }

  /** IVF top-k: exact cosine within the query's centroid cell (nProbe=1). */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, nCells: Int,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = OpCache.persist(elems(vectors, idCol, vecCol))
    val assigned = ivfAssignWith(e, vectors.filter(col(idCol) < nCells), idCol)
    val nrm = norms(e)
    val q = queries.select(col(idCol)).join(assigned, idCol)
      .select(col(idCol).as("id_a"), col("centroid_id"))
    val pairs = q.join(assigned.select(col(idCol).as("id_b"), col("centroid_id")),
                       Seq("centroid_id"))
      .filter(col("id_a") =!= col("id_b"))
    pairCosine(pairs, e, nrm)
      .select(col("id_a").as("query_id"), col("centroid_id"),
              col("id_b").as("cand_id"), col("cos_sim"))
      .transform(topK(_, k))
  }
}

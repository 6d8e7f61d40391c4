package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — queries × corpus via a
  *     broadcast of the (small) query set, so the corpus scan stays
  *     embarrassingly parallel. The per-pair work is a higher-order
  *     function (zip_with + aggregate), no UDF.
  *   - [[lshBuckets]] + [[annTopK]]: the 100 TB path — sign-random-
  *     projection LSH. Each vector gets an `nPlanes`-bit bucket from
  *     deterministic ±1 hyperplanes (derived from md5 so any engine can
  *     reproduce them); candidates are an equi-join on the bucket, cutting
  *     pairwise work by ~2^nPlanes. An IVF variant would swap the bucket
  *     for a nearest-centroid id; the plumbing is identical.
  *
  * Exactness: dot products accumulate as DECIMAL(38,18) (element casts to
  * DECIMAL(18,9)), so results are order-independent and bit-identical to
  * the DuckDB oracle; the final cosine is double IEEE with fixed op order.
  */
object Similarity {

  private val elemDec = "decimal(18,9)"
  private val accDec = "decimal(38,18)"

  /** Exact decimal dot product of two float arrays. Elements go
    * float→double→decimal: the float→double step is binary-exact, so the
    * decimal rounding sees the full value (a direct float→decimal cast
    * would round the float's 8-digit shortest representation and diverge
    * from engines that round the exact binary value).
    */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        x.cast("double").cast(elemDec) * y.cast("double").cast(elemDec)),
      lit(0).cast(accDec),
      (acc, v) => (acc + v).cast(accDec))

  /** Euclidean norm as double (exact decimal sum of squares → sqrt). */
  def normDouble(a: Column): Column =
    sqrt(dotDec(a, a).cast("double"))

  /** Cosine rounded to 6 decimals: the decimal dot is exact, but the
    * final decimal→double conversion and division can differ by 1 ulp
    * across engines — rounding makes the value portable (ranking ties are
    * then broken by candidate id, also portable).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dotDec(a, b).cast("double") / (normA * normB), 6)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). `queries` must be small (it broadcasts).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", normDouble(col("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cn", normDouble(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rn").as("rank"))
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
    * the bucket is computed in the same scan that reads the vector.
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
    vectors.select(col(idCol), concat(bits: _*).as("bucket"))
  }

  /** IVF (inverted-file) ANN — the centroid-cell dual of the LSH path:
    * every vector is assigned to its nearest centroid (max cosine,
    * deterministic centroid-id tie-break), queries probe only their own
    * cell. Centroids here are a fixed, deterministic subset of the corpus
    * (`vec_id < nCells`) — in production they'd come from an offline
    * k-means; the engine-side plumbing (broadcast centroid set, map-side
    * assignment, cell-equi-join search) is identical either way and is
    * what must scale: assignment is one broadcast-join scan, and search
    * touches 1/nCells of the corpus per query.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame = {
    val c = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
      .withColumn("cn", normDouble(col("cv")))
    val v = vectors.select(col(idCol), col(vecCol))
      .withColumn("vn", normDouble(col(vecCol)))
    val scored = v.join(broadcast(c))
      .withColumn("sim", cosine(col(vecCol), col("cv"), col("vn"), col("cn")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("centroid_id"))
  }

  /** IVF top-k: exact cosine within the query's centroid cell (nProbe=1). */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, nCells: Int,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val centroids = vectors.filter(col(idCol) < nCells)
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol)
    val withCell = vectors.join(assigned, idCol)
    val q = queries.join(assigned, idCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
      .withColumn("qn", normDouble(col("qv")))
    val c = withCell
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("centroid_id"))
      .withColumn("cn", normDouble(col("cv")))
    val scored = c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("centroid_id"), col("cand_id"),
              col("cos_sim"), col("rn").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH buckets prefilter the
    * O(n²) pair space (same-bucket only), then exact cosine decides.
    * The dedup-flavored dual of [[annTopK]] — at 100 TB the bucket join
    * is the only pairwise structure, sized by 2^nPlanes.
    */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                   nPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    // pair count here is O(n²/2^nPlanes), so the per-pair dot must stay
    // in codegen: explode each vector once into (id, i, x_dec) rows and
    // compute candidate dots as one hash aggregation (higher-order
    // lambdas are interpreted — fine per-query-vector, too slow per-pair)
    val e = vectors
      .select(col(idCol).as("__vid"), posexplode(col(vecCol)).as(Seq("__i", "__xr")))
      .select(col("__vid"), col("__i"),
              col("__xr").cast("double").cast(elemDec).as("__x"))
      .persist()
    val norms = e.groupBy(col("__vid"))
      .agg(sqrt(sum(col("__x") * col("__x")).cast("double")).as("nrm"))
    val buckets = lshBuckets(vectors, idCol, vecCol, nPlanes, dim)
    val cands = buckets.alias("x").join(buckets.alias("y"), Seq("bucket"))
      .select(col("bucket"), col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .filter(col("id_a") < col("id_b"))
    val dots = cands
      .join(e.select(col("__vid").as("id_a"), col("__i"), col("__x").as("__xa")), "id_a")
      .join(e.select(col("__vid").as("id_b"), col("__i"), col("__x").as("__xb")),
            Seq("id_b", "__i"))
      .groupBy("id_a", "id_b", "bucket")
      .agg(sum(col("__xa") * col("__xb")).as("dot"))
    dots
      .join(norms.select(col("__vid").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("__vid").as("id_b"), col("nrm").as("nb")), "id_b")
      .withColumn("cos_sim", round(col("dot").cast("double") / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "bucket", "cos_sim")
  }

  /** ANN top-k: exact cosine, but only within the query's LSH bucket. */
  def annTopK(vectors: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, nPlanes: Int, dim: Int,
              k: Int): DataFrame = {
    val buckets = lshBuckets(vectors, idCol, vecCol, nPlanes, dim)
    val withB = vectors.join(buckets, idCol)
    val q = queries.join(buckets, idCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
      .withColumn("qn", normDouble(col("qv")))
    val c = withB
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("bucket"))
      .withColumn("cn", normDouble(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"), col("cos_sim"),
              col("rn").as("rank"))
  }
}

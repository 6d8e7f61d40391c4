package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator pack — exact, n-gram Jaccard, MinHash+LSH.
  *
  * Scale posture: exact dedup is one hash aggregation. Near-dup at 100 TB
  * must avoid the O(n²) pairwise join — MinHash+LSH does: per-doc
  * signatures are map-side, candidate generation is an equi-join on
  * (band, band_signature) buckets, and only candidates pay the exact
  * Jaccard verification. The plain shingle-join variant is kept for
  * corpora where shingle collisions are rare (and as the verification
  * step); its join key is the shingle itself, so a hot shingle would need
  * the usual df-cap/salting treatment — noted inline.
  *
  * Portability: MinHash here uses lexicographic MIN over md5(i || ':' ||
  * shingle) hex strings as the i-th hash function — fully reproducible in
  * any engine with md5 (the DuckDB oracle), unlike engine-private hash64s.
  */
object Dedup {

  /** Exact dedup: canonical (min id) per identical text. */
  def exactCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** Distinct word k-gram shingles per document: (id, s). */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col(idCol),
        explode(sequence(lit(1), size(col("__t")) - (k - 1))).as("__i"),
        col("__t"))
      .select(col(idCol), concat_ws(" ", slice(col("__t"), col("__i"), lit(k))).as("s"))
      .distinct()

  /** Pairwise n-gram Jaccard over documents sharing ≥1 shingle; keeps
    * pairs with similarity ≥ threshold. At scale, cap shingle document
    * frequency first (a shingle appearing in 10⁶ docs generates 10¹²
    * pairs) — here df is naturally tiny.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val cached = shingles.persist() // read 3× below (counts + both join sides)
    val counts = cached.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = cached.select(col(idCol).as("id_a"), col("s"))
    val b = cached.select(col(idCol).as("id_b"), col("s").as("s_b"))
    a.join(b, col("s") === col("s_b") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(counts.select(col(idCol).as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col(idCol).as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** MinHash signatures: each shingle is md5-hashed ONCE; hash function i
    * is the 16-hex-char window of the doubled digest starting at offset
    * 2i, and the signature is the lexicographic MIN of that window across
    * the doc's shingles. One digest + cheap substrings instead of
    * numHashes digests per shingle (16× less hashing), computed as
    * parallel aggregate expressions in one pass — map-side partial
    * aggregation reduces each partition to one row per doc before the
    * shuffle. Windows of one digest are correlated across i (slightly
    * less independent bands than true MinHash) — acceptable because LSH
    * only generates candidates and the exact-Jaccard verification step
    * decides; still portable to any engine with md5/substring.
    */
  def minhashSignatures(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    require(numHashes <= 16, "windowed-md5 scheme supports up to 16 hash functions")
    val doubled = shingles.withColumn("__hh", concat(md5(col("s")), md5(col("s"))))
    val aggs = (0 until numHashes).map(i =>
      min(substring(col("__hh"), 1 + 2 * i, 16)).as(s"sig_$i"))
    doubled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: `numBands` keys per doc, each the md5 of that band's
    * concatenated signature minima. Docs sharing any (band, key) are
    * candidates — an equi-join, never a cross product.
    */
  def lshBandKeys(signatures: DataFrame, idCol: String,
                  numHashes: Int, numBands: Int): DataFrame = {
    val rows = numHashes / numBands
    val bands = (0 until numBands).map { b =>
      val sigCols = (b * rows until (b + 1) * rows).map(i => col(s"sig_$i"))
      struct(lit(b).as("band"), md5(concat(sigCols: _*)).as("key"))
    }
    signatures.select(col(idCol), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs from LSH buckets (distinct over bands). */
  def lshCandidates(bandKeys: DataFrame, idCol: String): DataFrame = {
    val a = bandKeys.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = bandKeys.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-Jaccard verify ≥ threshold.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int, numHashes: Int, numBands: Int,
                      threshold: Double): DataFrame = {
    // the shingle set feeds signatures, counts, and both verification
    // joins — persist it once instead of recomputing the explode+distinct
    // (on a cluster this is the natural checkpoint of the pipeline)
    val sh = wordShingles(df, idCol, textCol, k).persist()
    val cands = lshCandidates(
      lshBandKeys(minhashSignatures(sh, idCol, numHashes), idCol, numHashes, numBands),
      idCol)
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val shared = cands
      .join(sh.select(col(idCol).as("id_a"), col("s")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
    shared
      .join(counts.select(col(idCol).as("id_a"), col("n").as("n_a")), "id_a")
      .join(counts.select(col(idCol).as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}

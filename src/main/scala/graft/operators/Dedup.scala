package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deduplication operator pack — exact, n-gram Jaccard, MinHash+LSH.
  *
  * Scale posture: exact dedup is one hash aggregation. Near-dup at 100 TB
  * must avoid the O(n²) pairwise join — MinHash+LSH does: per-doc
  * signatures are map-side, candidate generation is an equi-join on
  * (band, band_signature) buckets, and only candidates pay the exact
  * Jaccard verification. The plain shingle-join variant is kept for
  * corpora where shingle collisions are rare (and as the verification
  * step); its join key is the shingle itself, so a hot shingle is
  * bounded by the `maxShingleDf` frequency cap on
  * [[jaccardPairsFromText]]/[[containmentPairs]].
  *
  * Portability: MinHash hash function i is the lexicographic MIN over a
  * 16-hex-char window of each shingle's doubled md5 digest — fully
  * reproducible in any engine with md5/substring (the DuckDB oracle),
  * unlike engine-private hash64s.
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
    * pairs with similarity ≥ threshold. `maxShingleDf` is the same
    * hot-shingle frequency cap as [[jaccardPairsFromText]]: shingles in
    * more than that many documents leave the universe before the
    * self-join (a shingle appearing in 10⁶ docs generates 10¹² pairs),
    * and the Jaccard denominators count only surviving shingles.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, threshold: Double,
                   maxShingleDf: Option[Long] = None): DataFrame = {
    val universe = maxShingleDf match {
      case None => shingles
      case Some(cap) =>
        require(cap >= 1, s"maxShingleDf must be >= 1, got $cap")
        val raw = OpCache.persist(shingles)
        val hot = raw.groupBy(col("s")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("s")
        raw.join(hot, Seq("s"), "left_anti")
    }
    val cached = OpCache.persist(universe) // read 3× below (counts + both join sides)
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

  /** All-pairs n-gram Jaccard straight from text — the scale-tuned shape
    * of [[wordShingles]]+[[jaccardPairs]] with identical output:
    *   - per-doc distinct shingle hashes come from the native codegen'd
    *     [[graft.functions.ShingleHash64]] (one tight loop per document —
    *     zero shuffle, no interpreted per-position lambda, no
    *     intermediate shingle-string array);
    *   - the self-join runs on 64-bit shingle hashes, not ~40-byte
    *     shingle strings — smaller shuffle, cheaper sort/hash compare
    *     (64-bit collisions are negligible at corpus scale and the oracle
    *     gate would surface one);
    *   - per-doc shingle counts ride along the exploded rows, so the
    *     jaccard denominator needs no extra join.
    */
  def jaccardPairsFromText(df: DataFrame, idCol: String, textCol: String,
                           k: Int, threshold: Double,
                           maxShingleDf: Option[Long] = None): DataFrame =
    sharedShingleCounts(df, idCol, textCol, k, maxShingleDf)
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "jaccard")

  /** Shared candidate core of [[jaccardPairsFromText]] and
    * [[containmentPairs]]: (id_a, id_b, n_a, n_b, shared) for every pair
    * of documents co-occurring on ≥1 shingle hash — the per-doc shingle
    * counts ride the exploded rows so no score needs an extra join.
    *
    * `maxShingleDf` is the hot-shingle frequency cap: shingles whose
    * document frequency exceeds it are removed from the universe BEFORE
    * the self-join — a single boilerplate shingle (license header,
    * templated page) in 10⁶ docs would otherwise alone generate ~10¹²
    * candidate pairs, the one way these direct pair forms go quadratic
    * (the LSH/banding paths bound candidates by construction). Scores
    * are then exact Jaccard/containment over the CAPPED shingle
    * universe: the hot shingles leave numerator and denominators
    * together, so surviving scores stay internally consistent — the
    * standard stop-shingle treatment in near-dup practice. None (the
    * default) keeps the exact uncapped semantics and plan.
    */
  private def sharedShingleCounts(df: DataFrame, idCol: String,
                                  textCol: String, k: Int,
                                  maxShingleDf: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    // persisted: the self-join would otherwise recompute the shingle
    // hashing for BOTH sides (alias mismatch defeats ReuseExchange)
    val exploded = Stage.spread(df)
      .select(col(idCol),
        graft.functions.ShingleHash64(spark,
          TextAnalysis.tokens(col(textCol)), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col(idCol), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    val ex = maxShingleDf match {
      case None => OpCache.persist(exploded)
      case Some(cap) =>
        require(cap >= 1, s"maxShingleDf must be >= 1, got $cap")
        // ShingleHash64 emits per-doc DISTINCT hashes, so count(1) per
        // hash IS document frequency. The hot set (df > cap) is tiny by
        // construction — AQE turns the anti-join into a broadcast — and
        // per-doc sizes are recomputed over the surviving universe so
        // the score denominators match the capped numerator.
        val raw = OpCache.persist(exploded.drop("n"))
        val hot = raw.groupBy("h").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > cap).select("h")
        OpCache.persist(raw.join(hot, Seq("h"), "left_anti")
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col(idCol)))))
    }
    val a = ex.select(col(idCol).as("id_a"), col("n").as("n_a"), col("h"))
    val b = ex.select(col(idCol).as("id_b"), col("n").as("n_b"), col("h"))
    a.join(b, Seq("h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("shared"))
  }

  /** Asymmetric containment near-dup pairs: score = |A∩B| / min(|A|,|B|)
    * over distinct k-gram shingles — the signal Jaccard structurally
    * misses: a short document wholly quoted inside a much longer one has
    * tiny Jaccard (union is dominated by the long doc) but containment
    * ≈ 1. Standard companion rule in pretraining dedup (subsumed docs
    * carry no new tokens). Same scale shape as [[jaccardPairsFromText]]:
    * native [[graft.functions.ShingleHash64]] in-scan, 64-bit-key
    * self-join, counts riding the exploded rows — only the score differs.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int, threshold: Double,
                       maxShingleDf: Option[Long] = None): DataFrame =
    sharedShingleCounts(df, idCol, textCol, k, maxShingleDf)
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "n_a", "n_b", "shared", "containment")

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

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * chunks (a pair within Hamming distance ≤ 12 of uniformly-spread
    * differing bits shares some chunk with high probability), candidate on
    * (band, chunk) equality, verify exact Hamming ≤ maxHamming. Same
    * LSH-candidate-then-verify shape as MinHash — linear until the tiny
    * candidate join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int,
                   maxBucketDf: Option[Long] = None): DataFrame = {
    // carry the 4 chunks as integers: per-pair Hamming is then
    // Σ bit_count(a⊕b) — pure codegen'd arithmetic, no per-bit lambda
    val chunkCols = (0 until 4).map(c =>
      expr(s"cast(conv(substring(simhash, ${c * 16 + 1}, 16), 2, 10) AS long)").as(s"ck_$c"))
    val sh = TextAnalysis.withSimhash(df, idCol, textCol)
      .select(col(idCol) +: col("simhash") +: chunkCols: _*)
    val chunksAll = sh.select(col(idCol) +: (0 until 4).map(c => col(s"ck_$c")) :+
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("band"), col(s"ck_$c").as("key"))): _*)).as("bk"): _*)
      .select(col(idCol) +: (0 until 4).map(c => col(s"ck_$c")) :+
              col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
    // HOT-BUCKET df-cap (round-13, from the sf10 gate's find: a
    // saturated vocabulary collided simhashes into 169M pairs at 500k
    // docs) — the [[jaccardPairsFromText]] maxShingleDf guard applied
    // to the banding join: buckets with more than `maxBucketDf` members
    // leave the candidate universe BEFORE the self-join, bounding pair
    // output at ~cap²/2 per bucket; surviving pairs are exact over the
    // capped universe. The hot set is the anti side (count of
    // over-cap buckets, typically tiny), joined hint-free so AQE
    // broadcasts it when small and shuffle-joins when a pathological
    // corpus makes it big.
    val chunks = maxBucketDf.fold(chunksAll) { cap =>
      val hot = chunksAll.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select("band", "key")
      chunksAll.join(hot, Seq("band", "key"), "left_anti")
    }
    val aCols = Seq(col("band"), col("key"), col(idCol).as("id_a")) ++
      (0 until 4).map(c => col(s"ck_$c").as(s"a_$c"))
    val bCols = Seq(col("band"), col("key"), col(idCol).as("id_b")) ++
      (0 until 4).map(c => col(s"ck_$c").as(s"b_$c"))
    chunks.select(aCols: _*).join(chunks.select(bCols: _*), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .drop("band", "key").distinct()
      .withColumn("hamming",
        (0 until 4).map(c => expr(s"bit_count(a_$c ^ b_$c)")).reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Connected components over an undirected near-duplicate pair list —
    * the step AFTER pair generation in a dedup pipeline: transitive
    * closure groups pairs into clusters so "keep one doc per cluster"
    * (canonical = MIN id) is well-defined even for chains a~b~c where
    * a≁c directly.
    *
    * Alternating large-star/small-star contraction (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond"): edges stay
    * oriented (bigger, smaller); large-star rewires every
    * larger-than-self neighbor of each node to the node's neighborhood
    * minimum, small-star rewires the smaller neighbors. The alternation
    * converges to a star forest whose roots are component minima in
    * O(log² n) rounds REGARDLESS of component diameter — the property
    * min-label propagation lacks: its round count is the diameter, and
    * span dedup or quote chains produce long paths (a 10⁴-hop chain
    * would mean 10⁴ rounds of propagation but ~13 star rounds). Each
    * round is two groupBy+join passes over the edge set, keyed by node
    * — no driver-side graph state; the driver only runs the converged
    * check. Returns (id, comp) for every node that appears in some
    * pair, comp = the component's minimum id — including nodes whose
    * ONLY appearance is a self-pair (a, a): the contraction drops
    * self-loops from the edge set (they carry no connectivity), so such
    * nodes are unioned back as singleton components afterwards rather
    * than silently vanishing (round-5 advice; current callers emit
    * id_a < id_b pairs, but the contract should not depend on that).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIter)._1

  /** Incremental cluster maintenance — fold NEW near-dup pairs into an
    * existing label table without re-deriving the old pairs: the stored
    * (id, comp) labels become edges (they carry exactly the old
    * connectivity — comp is a member id, so the id space is shared) and
    * star contraction runs over labels ∪ newPairs. Cost scales with
    * |labels| + |newPairs| — one label row per already-clustered doc,
    * NOT the original candidate-generation work — which is what a
    * per-ingestion-batch dedup deployment pays; correctness is the
    * [[IncrementalAgg]]/covariance-merge claim transplanted to graphs:
    * the folded labels are IDENTICAL to a full recompute (min-id of a
    * merged component is the global min; the oracle pins it by running
    * the same SQL as the one-shot query). Subset soundness holds
    * because banded candidate generation is pairwise-local: a pair's
    * bands depend only on its two documents, so pairs(A) =
    * pairs(corpus) ∩ A×A and the new-edge set is exactly the pairs
    * touching new documents.
    */
  def incrementalClusters(oldLabels: DataFrame, newPairs: DataFrame,
                          aCol: String, bCol: String): DataFrame =
    connectedComponents(
      oldLabels.select(col("id").as(aCol), col("comp").as(bCol))
        .unionByName(newPairs.select(aCol, bCol)), aCol, bCol)

  /** [[connectedComponents]] exposing the converged round count — the
    * spec pins the O(log²) behavior on a long path with it. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): (DataFrame, Int) = {
    // localCheckpoint, NOT persist: persist caches the DATA but the logical
    // plan keeps growing — after k rounds the plan tree holds O(4^k)
    // copies of the upstream pair-generation pipeline, and Catalyst
    // (analysis, optimization, even Expression.toString in logs) walks all
    // of it on the driver every round. Checkpointing truncates the plan to
    // a LogicalRDD so each round's plan is constant-size. Same pattern
    // a 1000-executor run needs (there with reliable checkpoint dirs to
    // also bound failure-recovery lineage).
    // Orient + distinct ONCE, self-loops still included, and checkpoint
    // THAT: both the edge set and the self-pair ids then split off the
    // materialized blocks — deriving selfIds straight from `pairs` would
    // re-run the caller's whole pair-generation pipeline a second time
    // (measured +0.5 s on q_dedup_semantic when first landed that way).
    val all = pairs
      .select(greatest(col(aCol), col(bCol)).as("a"),
              least(col(aCol), col(bCol)).as("b"))
      .distinct()
      .localCheckpoint(true)
    // self-loops contribute no connectivity and would break the
    // (bigger, smaller) orientation invariant, so they leave the edge
    // set here — but their nodes must still be labeled (see scaladoc):
    // the ones no real edge covers are unioned back at the end.
    val selfIds = all.filter(col("a") === col("b")).select(col("a").as("id"))
    // a filter over the checkpointed blocks is already a constant-size
    // plan — no second checkpoint needed before the contraction loop
    var e = all.filter(col("a") =!= col("b"))

    // large-star: per node u, m = min(Γ(u) ∪ {u}); every neighbor v > u
    // re-targets to m. Output stays (bigger, smaller): v > u ≥ m.
    def largeStar(ed: DataFrame): DataFrame = {
      val bi = ed.select(col("a").as("u"), col("b").as("v"))
        .union(ed.select(col("b").as("u"), col("a").as("v")))
      val mn = bi.groupBy("u").agg(min(col("v")).as("mv"))
      bi.join(mn, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), least(col("u"), col("mv")).as("b"))
        .distinct()
    }
    // small-star: edges already orient (bigger u, smaller v); per u,
    // m = min of its smaller neighbors — they re-target to m, and u
    // keeps (u, m). Both outputs stay (bigger, smaller).
    def smallStar(ed: DataFrame): DataFrame = {
      val mn = ed.groupBy("a").agg(min(col("b")).as("m"))
      ed.join(mn, "a")
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(mn.select(col("a"), col("m").as("b")))
        .distinct()
    }
    // Converged ⇔ the edge set is a star forest: no target is also a
    // source (chains are gone) and every source has exactly one root.
    // A star forest oriented (bigger, smaller) necessarily roots each
    // star at its component MINIMUM — which is why the check certifies
    // the answer, not just a fixpoint. ONE fused probe job per round
    // (round-8 verdict #2; was two): tag each edge endpoint with its
    // role, group once by node, and a node violates iff it has >1
    // outgoing edge (multi-out) or is both a source and a target
    // (chained) — the same two predicates the old per-predicate jobs
    // checked, now sharing a single shuffle over the checkpointed
    // blocks.
    def isStarForest(ed: DataFrame): Boolean = {
      val roles = ed.select(col("a").as("n"), lit(1L).as("s"), lit(0L).as("t"))
        .union(ed.select(col("b").as("n"), lit(0L).as("s"), lit(1L).as("t")))
      roles.groupBy("n")
        .agg(sum(col("s")).as("sc"), sum(col("t")).as("tc"))
        .filter(col("sc") > 1 || (col("sc") > 0 && col("tc") > 0))
        .isEmpty
    }
    // Round batching (round-16, guide §2.4 — remove jobs outright): a
    // converged star forest is a FIXPOINT of both stars (largeStar: a
    // member's only neighbor is its smaller center, filtered by v > u,
    // while the center re-emits (member, center); smallStar: a member's
    // min smaller neighbor is already its center), so running TWO
    // contraction rounds between convergence probes cannot change the
    // labels — convergence mid-pair just makes the second round an
    // identity pass over the already-contracted edge set. This halves
    // the per-round fixed bill (one localCheckpoint materialization +
    // one probe job per TWO rounds instead of per one), which is job
    // machinery, not data, at any scale where the edge set has
    // contracted. The up-front probe is folded into the loop for the
    // same reason: raw pair sets are essentially never star forests, so
    // it was one more fixed job per call, and running the pair of
    // rounds on an already-converged input is an identity pass. `iter`
    // still counts CONTRACTION ROUNDS (the O(log²) spec bound reads
    // it), now rounded up to the next even number.
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      e = smallStar(largeStar(smallStar(largeStar(e)))).localCheckpoint(true)
      iter += 2
      done = isStarForest(e)
    }
    // fail loudly: unconverged edges would silently keep multiple docs
    // per cluster downstream, indistinguishable from a correct run
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter star rounds; " +
        "raise maxIter")
    val edgeLabels = e.select(col("a").as("id"), col("b").as("comp"))
      .union(e.select(col("b").as("id"), col("b").as("comp")).distinct())
    // nodes seen only as (a, a): singleton components, labeled by
    // themselves; an anti join keeps ids the edge labels already cover
    // out (the real component label wins over the degenerate self one)
    val selfOnly = selfIds
      .join(edgeLabels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    (edgeLabels.union(selfOnly), iter)
  }

  /** Distinct word k-gram shingles as ONE array column per document —
    * no explode, no shuffle: a narrow projection over the scan.
    */
  def wordShingleArray(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col(idCol),
        array_distinct(transform(
          sequence(lit(1), size(col("__t")) - (k - 1)),
          i => concat_ws(" ", slice(col("__t"), i, lit(k))))).as("sh"))

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-Jaccard verify ≥ threshold.
    *
    * 100 TB shape: signatures, shingle counts and band keys are all
    * computed map-side from the per-doc shingle array (higher-order
    * functions, zero shuffles); the first exchange in the whole plan is
    * the equi-join on (band, key) — whose input is numBands rows per doc —
    * and only the surviving candidate pairs pay the exploded
    * intersection join.
    */
  /** Per-document MinHash-LSH index row: (id, n, sh, bands) with
    * `bands` = numBands (band, key) structs — everything computed
    * map-side from the shingle array, one narrow row per doc. This is
    * the PERSISTENT shape for incremental dedup: write it as the corpus
    * index table and new batches join band keys against it without ever
    * re-reading corpus text ([[incrementalNearDups]]).
    */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   k: Int, numHashes: Int, numBands: Int): DataFrame = {
    require(numHashes % numBands == 0)
    val rows = numHashes / numBands
    val withArr = Stage.spread(df)
      .transform(wordShingleArray(_, idCol, textCol, k))
      .withColumn("__hh", transform(col("sh"), s => concat(md5(s), md5(s))))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(col("__hh"), h => substring(h, 1 + 2 * i, 16))).as(s"sig_$i"))
    val bands = (0 until numBands).map { b =>
      val sigCols = (b * rows until (b + 1) * rows).map(i => col(s"sig_$i"))
      struct(lit(b).as("band"), md5(concat(sigCols: _*)).as("key"))
    }
    withArr
      .select(col(idCol) +: size(col("sh")).as("n") +: col("sh") +: sigs: _*)
      .select(col(idCol), col("n"), col("sh"), array(bands: _*).as("bands"))
  }

  private def bandKeys(index: DataFrame, idCol: String): DataFrame =
    index.select(col(idCol), explode(col("bands")).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int, numHashes: Int, numBands: Int,
                      threshold: Double): DataFrame = {
    val withSig = minhashIndex(df, idCol, textCol, k, numHashes, numBands)
      .transform(OpCache.persist) // one narrow row per doc; feeds band keys + both verify sides
    val keyed = bandKeys(withSig, idCol)
    val cands = keyed.alias("x").join(keyed.alias("y"), Seq("band", "key"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .filter(col("id_a") < col("id_b")).distinct()
    cands
      .join(withSig.select(col(idCol).as("id_a"), col("n").as("n_a"),
                           col("sh").as("sh_a")), "id_a")
      .join(withSig.select(col(idCol).as("id_b"), col("n").as("n_b"),
                           col("sh").as("sh_b")), "id_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Incremental near-dup detection — the 100 TB ingestion shape: a new
    * batch is checked against the STORED corpus index
    * ([[minhashIndex]] rows, persisted as a table) plus itself, without
    * re-reading or re-hashing any corpus text. Returns
    * (id_fresh, id_other, jaccard) for every fresh doc that near-dups an
    * indexed doc or another fresh doc (fresh-fresh pairs reported once,
    * smaller id first).
    *
    * Scale: band keys explode to numBands rows/doc; the candidate join is
    * the only exchange touching the corpus-sized side, and on a real
    * deployment the index table is bucketed by (band, key) so the fresh
    * batch (small, broadcast-able) probes co-located buckets. Verification
    * joins fetch shingle arrays only for surviving candidate ids.
    */
  def incrementalNearDups(index0: DataFrame, freshIndex0: DataFrame,
                          idCol: String, threshold: Double): DataFrame = {
    // both inputs are referenced by the band-key join AND the verify
    // joins: persist so an expression-backed index (built inline from
    // text, as the oracle query does) is computed once. For the intended
    // production shape — `index` read from its stored parquet table —
    // the persist is just a cheap columnar cache of that scan.
    val index = OpCache.persist(index0)
    val freshIndex = OpCache.persist(freshIndex0)
    val fk = bandKeys(freshIndex, idCol)
    val allTagged = bandKeys(index, idCol).withColumn("__fresh", lit(false))
      .union(fk.withColumn("__fresh", lit(true)))
    val cands = fk.alias("x").join(allTagged.alias("y"), Seq("band", "key"))
      .select(col(s"x.$idCol").as("id_fresh"), col(s"y.$idCol").as("id_other"),
              col("__fresh"))
      .filter(col("id_fresh") =!= col("id_other"))
      // fresh-fresh pairs appear mirrored — keep one orientation
      .filter(!col("__fresh") || col("id_fresh") < col("id_other"))
      .select("id_fresh", "id_other").distinct()
    cands
      .join(freshIndex.select(col(idCol).as("id_fresh"), col("n").as("n_a"),
                              col("sh").as("sh_a")), "id_fresh")
      .join(index.union(freshIndex)
              .select(col(idCol).as("id_other"), col("n").as("n_b"),
                      col("sh").as("sh_b")), "id_other")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_fresh", "id_other", "jaccard")
  }

  /** End-to-end near-dup corpus dedup — the one-call composition a
    * training-data pipeline runs before anything else: MinHash-LSH
    * candidates → exact-Jaccard verify ≥ `threshold` → connected
    * components over surviving pairs → keep each cluster's canonical
    * (min-id) member. Returns one row per SURVIVING doc with its
    * cluster size (1 for docs with no near-dup) — the audit shape a
    * deletion run wants (removed count = |corpus| − |survivors|).
    *
    * 100 TB: every stage is an already-audited scale shape (map-side
    * banding, bucketed candidate join, pair-only verification,
    * constant-size-plan label propagation); nothing materializes beyond
    * the pair set and the label table. Canonical = component label
    * directly, because min-label propagation converges to the min id.
    */
  /** Cluster labels with EXACT-TEXT COLLAPSE before the LSH pair search
    * — the text analog of the multimodal distinct-signature fix the sf1
    * measurement forced (round 9): a corpus where one document repeats
    * g times used to push g² candidate pairs through banding, Jaccard
    * verify, and CC (500 identical docs = 124,750 pairs; 10⁶ would be
    * 5·10¹¹ — and MANY identical copies is exactly the case a dedup
    * pass exists for). Identical texts (md5-grouped, restricted to docs
    * with ≥ 1 shingle — shingle-less docs never pair today and keep
    * that behavior) are Jaccard 1 ≥ any threshold BY CONSTRUCTION, so
    * each group collapses to its min-id representative: LSH + verify
    * run over DISTINCT texts only, members attach by one (member → rep)
    * edge each, and connectivity — hence every min-id label — is
    * PROVABLY unchanged (Jaccard and band keys are functions of the
    * text, so X≡rep(G) relates to any Y exactly as rep(G) does; the
    * committed corpus oracles pin the equality). Member edges exist
    * only for groups of size > 1, so the label table still covers
    * exactly the docs in some near-dup relation and the sparse-corpus
    * cost is unchanged.
    */
  private def collapsedNearDupLabels(df: DataFrame, idCol: String,
      textCol: String, k: Int, numHashes: Int, numBands: Int,
      threshold: Double): DataFrame = {
    val eligible = df
      .select(col(idCol), col(textCol))
      .filter(size(TextAnalysis.tokens(col(textCol))) >= k)
      .withColumn("__th", md5(col(textCol)))
    val groups = OpCache.persist(eligible.groupBy(col("__th"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__gn")))
    val reps = df.join(groups.select(col("__rep").as(idCol)), Seq(idCol), "left_semi")
    val repPairs = minhashLshPairs(reps, idCol, textCol,
        k, numHashes, numBands, threshold)
      .select("id_a", "id_b")
    val memberEdges = eligible
      .join(groups.filter(col("__gn") > 1), Seq("__th"))
      .select(col(idCol).as("id_a"), col("__rep").as("id_b"))
    connectedComponents(repPairs.unionByName(memberEdges), "id_a", "id_b")
  }

  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  k: Int, numHashes: Int, numBands: Int,
                  threshold: Double): DataFrame = {
    val labels = OpCache.persist(collapsedNearDupLabels(
      df, idCol, textCol, k, numHashes, numBands, threshold))
    val canon = labels.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as(idCol), col("cluster_size"))
    val unique = df.select(col(idCol))
      .join(labels.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .withColumn("cluster_size", lit(1L))
    unique.unionByName(canon)
  }

  /** [[dedupCorpus]] with a QUALITY-preferring survivor: each near-dup
    * cluster keeps its best row by `preferCol` (DESC, nulls last, min-id
    * tie-break) instead of the min id — the CCNet/RefinedWeb "keep the
    * best rendition" policy (duplicates differ in boilerplate, OCR noise,
    * truncation; a quality or length score picks the one worth
    * training on). Deterministic: the (prefer, id) order is total.
    * Returns (id, cluster_size) survivors like [[dedupCorpus]].
    *
    * Scale: identical to [[dedupCorpus]] until the survivor pick, which
    * joins `preferCol` onto the LABEL table only (clustered docs — the
    * small side, never the corpus) and rank-filters per component; the
    * window partitions by component over that label-sized frame.
    */
  def dedupCorpusBy(df: DataFrame, idCol: String, textCol: String,
                    preferCol: String, k: Int, numHashes: Int, numBands: Int,
                    threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = OpCache.persist(collapsedNearDupLabels(
      df, idCol, textCol, k, numHashes, numBands, threshold))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col(preferCol).desc_nulls_last, col("id").asc)
    val canon = labels
      .join(df.select(col(idCol).as("id"), col(preferCol)), "id")
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("comp"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id").as(idCol), col("__sz").as("cluster_size"))
    val unique = df.select(col(idCol))
      .join(labels.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .withColumn("cluster_size", lit(1L))
    unique.unionByName(canon)
  }

  /** Leakage-SAFE train/val/test split: the split label is a pure md5
    * function of each document's near-dup CLUSTER representative, not of
    * the document itself, so near-duplicates land in the same split BY
    * CONSTRUCTION — the fix for what `q_split_leakage`'s audit measures
    * (a per-document split assigns two 0.9-Jaccard copies of the same
    * page independently, and one in train + one in test is exactly the
    * contamination that inflates eval numbers). Composition:
    * [[collapsedNearDupLabels]]' component labels give every clustered
    * doc its representative id; unclustered docs represent themselves
    * (`coalesce`); then [[graft.operators.Analytics.withSplit]]'s
    * md5-fraction rule runs on that `cluster_key`. Growth stability is
    * PER-CLUSTER, not absolute: as long as a doc's component keeps the
    * same min-id representative, its split never changes, and ADDING a
    * near-duplicate of an existing test doc routes it to test
    * automatically. But when corpus growth MERGES two clusters (a new
    * bridge near-dup), the merged component takes the smaller min id —
    * every doc of the higher-min cluster gets a NEW cluster_key and can
    * migrate splits, including test→train (the contamination direction
    * across dataset versions). Re-snapshot frozen eval sets whenever
    * cluster topology changes; the split is leakage-safe within any one
    * corpus version, not an immutable doc→split promise across versions.
    *
    * `cluster_key` is a RESERVED output column (an existing one is
    * overwritten); the internal join label is `__`-prefixed so a caller
    * `comp` column survives untouched.
    *
    * Scale: one label-table left join beyond the standard near-dup
    * labeling cost (labels are clustered-docs-sized, not corpus-sized);
    * the split itself is map-side arithmetic.
    */
  def splitByCluster(df: DataFrame, idCol: String, textCol: String,
                     valRate: Double, testRate: Double,
                     k: Int, numHashes: Int, numBands: Int,
                     threshold: Double): DataFrame = {
    val labels = OpCache.persist(collapsedNearDupLabels(
      df, idCol, textCol, k, numHashes, numBands, threshold))
    val keyed = df
      .join(labels.select(col("id").as(idCol), col("comp").as("__comp")),
            Seq(idCol), "left")
      .withColumn("cluster_key", coalesce(col("__comp"), col(idCol)))
      .drop("__comp")
    Analytics.withSplit(keyed, "cluster_key", valRate, testRate)
  }

  /** Persist a [[minhashIndex]] as the two stored tables the incremental
    * path probes — the promised SCALE.md shape, now actually exercised:
    *
    *   - `bandTable`: the exploded (id, band, key) rows, BUCKETED and
    *     sorted by (band, key) — a fresh batch's candidate probe becomes
    *     a co-located join where the corpus-sized side is never
    *     re-shuffled (its bucketing IS the join distribution);
    *   - `docTable`: the narrow (id, n, sh) verify rows, bucketed by id
    *     so the post-candidate shingle fetch co-locates the same way.
    *
    * Corpus text is hashed exactly once, at index-build time; every
    * later ingestion batch reads only these two tables.
    */
  def writeIndexTables(index: DataFrame, idCol: String,
                       bandTable: String, docTable: String,
                       nBuckets: Int): Unit = {
    val spark = index.sparkSession
    def clear(tbl: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      // a previous JVM's in-memory catalog died with it, but its managed
      // location under the warehouse survives — CREATE refuses to reuse
      // it (LOCATION_ALREADY_EXISTS), so clear the orphan explicitly
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    // build the NEW generation completely under __stage names before
    // touching the live tables (the AtomicStore discipline for catalog
    // tables): a crash mid-build leaves the live index untouched; a
    // crash mid-swap leaves readers failing loudly (table-not-found)
    // until the idempotent rebuild reruns — never a partial-data index.
    val stageB = bandTable + "__stage"
    val stageD = docTable + "__stage"
    clear(stageB); clear(stageD)
    bandKeys(index, idCol).write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "band", "key").sortBy("band", "key")
      .saveAsTable(stageB)
    index.select(col(idCol), col("n"), col("sh")).write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, idCol).sortBy(idCol)
      .saveAsTable(stageD)
    clear(bandTable); clear(docTable)
    spark.sql(s"ALTER TABLE $stageB RENAME TO $bandTable")
    spark.sql(s"ALTER TABLE $stageD RENAME TO $docTable")
  }

  /** [[incrementalNearDups]] served from the STORED index tables written
    * by [[writeIndexTables]]: same output contract, but the corpus side
    * comes straight off its bucketed scans — no text re-read, no
    * re-hashing, no corpus-side exchange in the probe join (only the
    * small fresh batch redistributes to the bucket layout).
    */
  def incrementalNearDupsStored(spark: org.apache.spark.sql.SparkSession,
                                bandTable: String, docTable: String,
                                freshIndex0: DataFrame, idCol: String,
                                threshold: Double): DataFrame = {
    val freshIndex = OpCache.persist(freshIndex0)
    val fk = bandKeys(freshIndex, idCol)
    // two probe joins instead of one union-then-join: a union would wipe
    // the stored side's bucketing and force the corpus rows through an
    // exchange again
    val vsStored = fk.alias("x")
      .join(spark.table(bandTable).alias("y"), Seq("band", "key"))
      .select(col(s"x.$idCol").as("id_fresh"), col(s"y.$idCol").as("id_other"))
      .filter(col("id_fresh") =!= col("id_other"))
    val vsFresh = fk.alias("x").join(fk.alias("y"), Seq("band", "key"))
      .select(col(s"x.$idCol").as("id_fresh"), col(s"y.$idCol").as("id_other"))
      .filter(col("id_fresh") < col("id_other"))
    val cands = vsStored.union(vsFresh).distinct()
    val others = spark.table(docTable)
      .select(col(idCol).as("id_other"), col("n").as("n_b"), col("sh").as("sh_b"))
      .union(freshIndex.select(col(idCol).as("id_other"), col("n").as("n_b"),
        col("sh").as("sh_b")))
    cands
      .join(freshIndex.select(col(idCol).as("id_fresh"), col("n").as("n_a"),
                              col("sh").as("sh_a")), "id_fresh")
      .join(others, "id_other")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_fresh", "id_other", "jaccard")
  }

  /** Benchmark-decontamination report: for every corpus document, count
    * distinct word `k`-gram shingles it shares with any probe (benchmark)
    * document. Docs with `n_shared` > 0 are contamination candidates a
    * training pipeline must drop before training on the corpus.
    *
    * 100 TB shape: the probe side is a benchmark suite — tiny relative
    * to the corpus — so its exploded shingle set is BROADCAST and the
    * corpus side never shuffles: shingle arrays are computed map-side
    * (wordShingleArray, no explode on the corpus rows until the hash
    * join's stream side), and the per-doc count is a partial-aggregable
    * groupBy on the already-doc-keyed join output.
    */
  def contaminationReport(corpus: DataFrame, probe: DataFrame,
                          idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    // native ShingleHash64 on BOTH sides, joining on 64-bit hashes rather
    // than shingle strings — same scale tuning as jaccardPairsFromText:
    // one tight codegen'd loop per doc, 8-byte join keys (collisions
    // negligible; the oracle gate, which compares shingle STRINGS in
    // DuckDB, would surface one)
    def hashes(df: DataFrame) =
      df.select(col(idCol),
        graft.functions.ShingleHash64(spark, TextAnalysis.tokens(col(textCol)), k).as("hs"))
    val probeHashes = Hints.bcast(
      hashes(probe).select(explode(col("hs")).as("h")).distinct())
    hashes(Stage.spread(corpus))
      .select(col(idCol), explode(col("hs")).as("h"))
      .join(probeHashes, "h")
      .groupBy(col(idCol))
      // plain count, not countDistinct: both join inputs are already
      // distinct on their keys (ShingleHash64 emits distinct hashes per
      // doc; probe side is .distinct), so (doc, h) pairs are unique
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[contaminationReport]] with an in-plan Bloom-filter PREFILTER on
    * the corpus side — the variant for when the probe shingle set has
    * outgrown the broadcast budget (a full eval-suite + held-out-set
    * sweep can reach 10⁸-10⁹ shingles; at 8 bytes a hash that is tens of
    * GB exploded, but the Bloom SKETCH of it is capped at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` ≈ 8 MB).
    *
    * Shape: `might_contain((SELECT bloom_filter_agg(h) FROM probe), h)`
    * — the scalar subquery runs once, the fixed-size bitmap rides to
    * every task, and corpus shingle rows are discarded in whole-stage
    * codegen BEFORE the shuffle for the confirm join. The confirm join
    * (plain shuffle hash/SMJ on the 8-byte hash — NO broadcast hint, the
    * probe side is assumed big) then eliminates Bloom false positives,
    * so the output is byte-identical to [[contaminationReport]]: the
    * sketch only decides how much non-matching corpus volume survives to
    * the shuffle, never the answer. Same oracle SQL as the broadcast
    * variant, by construction.
    *
    * Reference anchor: same decontamination semantics as
    * `contaminationReport` (SURVEY §2 LLM-pack); this is the scale-path
    * dual, exercising [[graft.functions.BloomSketch]].
    */
  def contaminationReportBloom(corpus: DataFrame, probe: DataFrame,
                               idCol: String, textCol: String, k: Int,
                               expectedShingles: Long = 1L << 20): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.BloomSketch.register(spark)
    def hashes(df: DataFrame) =
      df.select(col(idCol),
        graft.functions.ShingleHash64(spark, TextAnalysis.tokens(col(textCol)), k).as("hs"))
    // temp views because a scalar subquery is a SQL-only construct —
    // fixed names are safe: Verify/Bench run queries sequentially per
    // session, and the drain/streaming paths use dedicated sessions.
    // The probe relation is referenced TWICE (bloom subquery + confirm
    // join), so persist it once — at deployment scale that is the
    // difference between one and two shuffles of the probe shingle set
    OpCache.persist(hashes(probe).select(explode(col("hs")).as("h")).distinct())
      .createOrReplaceTempView("graft_bloom_probe")
    hashes(Stage.spread(corpus))
      .select(col(idCol).as("doc_id"), explode(col("hs")).as("h"))
      .createOrReplaceTempView("graft_bloom_corpus")
    spark.sql(
      s"""WITH pre AS (
         |  SELECT doc_id, h FROM graft_bloom_corpus
         |  WHERE might_contain(
         |    (SELECT bloom_filter_agg(h, ${expectedShingles}L, ${8L * expectedShingles}L)
         |     FROM graft_bloom_probe), h)
         |)
         |SELECT pre.doc_id AS `$idCol`, count(1) AS n_shared
         |FROM pre JOIN graft_bloom_probe p ON pre.h = p.h
         |GROUP BY pre.doc_id
         |""".stripMargin)
  }

  /** Token positions (1-based) covered by a duplicated k-gram — the core
    * of exact-substring (span-level) dedup à la Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"): a
    * k-gram is duplicated when its TOTAL occurrence count across the
    * corpus (including repeats inside one document) is >= minCount, and
    * every token position under any occurrence of a duplicated k-gram is
    * covered.
    *
    * Scale shape: the positional [[graft.functions.ShingleHash64]]
    * hashes every k-gram in one codegen'd loop per document, so the
    * occurrence count is a hash aggregation over 8-byte keys (map-side
    * partial), never over ~40-byte gram strings, and the probe back is
    * an equi-join on the same longs (AQE broadcasts the duplicated-gram
    * side when it is small, which it is unless the corpus is mostly
    * boilerplate). Nothing here is quadratic in documents — work is
    * linear in total token count, matching the suffix-array formulation's
    * O(total tokens) while staying embarrassingly parallel.
    */
  private def coveredPositions(df: DataFrame, idCol: String, textCol: String,
                               k: Int, minCount: Long): DataFrame = {
    require(k >= 1, s"span dedup: k must be >= 1, got $k")
    require(minCount >= 2, s"span dedup: minCount must be >= 2, got $minCount")
    val spark = df.sparkSession
    // persisted: read twice (global gram counts + the probe back)
    val grams = OpCache.persist(Stage.spread(df)
      .select(col(idCol), posexplode(graft.functions.ShingleHash64.positional(
        spark, TextAnalysis.tokens(col(textCol)), k)).as(Seq("__p0", "h"))))
    val dup = grams.groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select("h")
    grams.join(dup, "h")
      .select(col(idCol), explode(sequence(col("__p0") + 1, col("__p0") + k)).as("p"))
      .distinct()
  }

  /** Most-duplicated passages report: the topN word k-grams by total
    * corpus occurrence count (with the distinct-document count riding
    * along), ties broken by gram text — the diagnostic a corpus owner
    * runs before span dedup to see WHAT the boilerplate is. Gram strings
    * (not hashes) are the output here, so the count groups by string —
    * map-side partial aggregation means only per-partition-distinct
    * grams shuffle, and topN goes through TakeOrderedAndProject (no
    * global sort). For a pure threshold scan at the 100 TB tier, count
    * hashes first ([[coveredPositions]]' shape) and join the few
    * surviving hashes back for their text.
    */
  def topDuplicatedGrams(df: DataFrame, idCol: String, textCol: String,
                         k: Int, topN: Int): DataFrame = {
    require(k >= 1 && topN >= 1)
    Stage.spread(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col(idCol),
        explode(sequence(lit(1), size(col("__t")) - (k - 1))).as("__i"),
        col("__t"))
      .select(col(idCol), concat_ws(" ", slice(col("__t"), col("__i"), lit(k))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(topN)
  }

  /** Per-document k-gram NOVELTY — the duplication-contamination score a
    * corpus owner ranks by before pruning: for each document, the
    * fraction of its DISTINCT word k-grams that appear in no other
    * document (df = 1 across the corpus). A boilerplate-heavy or
    * near-duplicated document scores near 0, genuinely fresh text near
    * 1 — the per-document complement of [[topDuplicatedGrams]]'s
    * corpus-level view. Two exchanges: one gram-keyed (distinct + df
    * window over (doc, gram) rows), one doc-keyed aggregate; novelty is
    * one IEEE division of exact counts.
    */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    require(k >= 1)
    val docGram = Stage.spread(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col(idCol),
        explode(sequence(lit(1), size(col("__t")) - (k - 1))).as("__i"),
        col("__t"))
      .select(col(idCol),
        concat_ws(" ", slice(col("__t"), col("__i"), lit(k))).as("gram"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    docGram.withColumn("__df", count(lit(1)).over(w))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams"))
  }

  /** Maximal duplicated spans per document: contiguous runs of token
    * positions covered by some corpus-duplicated k-gram, as
    * (id, span_start, span_end, span_len) with 1-based inclusive token
    * positions. Gaps-and-islands over [[coveredPositions]]: run key is
    * p - row_number() within the document, so each maximal run collapses
    * to one group — a per-document window plus one aggregation, both
    * partitioned by document id.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int, minCount: Long = 2L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("p"))
    coveredPositions(df, idCol, textCol, k, minCount)
      .withColumn("__grp", col("p") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("p")).cast("long").as("span_start"),
        max(col("p")).cast("long").as("span_end"),
        count(lit(1)).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_end"), col("span_len"))
  }

  /** Span-level dedup output: each document with its duplicated spans
    * REMOVED — kept tokens re-joined in order — plus how many tokens were
    * dropped. Documents with no duplicated span pass through verbatim
    * (modulo whitespace normalization: tokens re-joined single-spaced);
    * fully-duplicated documents come out as an empty clean_text, which a
    * downstream gate can drop.
    *
    * The covered-position set rides back to the document row as one
    * collect_set per id (a single doc-keyed aggregation), and the kept
    * tokens are selected by a codegen'd positional array filter — no
    * second explode of the corpus.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           k: Int, minCount: Long = 2L): DataFrame = {
    val cov = coveredPositions(df, idCol, textCol, k, minCount)
      .groupBy(col(idCol)).agg(collect_set(col("p")).as("__cov"))
    df.join(cov, Seq(idCol), "left")
      .withColumn("__cov", coalesce(col("__cov"), array().cast("array<int>")))
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol),
        concat_ws(" ", filter(col("__toks"),
          (x, i) => !array_contains(col("__cov"), i + 1))).as("clean_text"),
        size(col("__cov")).cast("long").as("n_removed"))
  }
}

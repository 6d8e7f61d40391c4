package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection — the continuous dual of
  * [[graft.operators.Dedup.incrementalNearDups]]: documents stream in,
  * each is banded with the same MinHash-LSH scheme as the batch
  * operators, and the stateful stage keeps, PER BAND BUCKET, the ids
  * already seen in that bucket. A new arrival emits one candidate pair
  * per prior bucket member, then joins the bucket.
  *
  * State shape — the part that must hold at 100 TB stream volume:
  *   - keyed by (band, key): cardinality ≈ distinct buckets, not stream
  *     length; hot buckets are exactly near-dup clusters.
  *   - each bucket's member list is CAPPED at `maxBucket` ids: a
  *     degenerate bucket (boilerplate shingles all hashing together)
  *     stops accumulating state and stops emitting pairs instead of
  *     exploding quadratically — the standard guard in production LSH
  *     dedup; the cap is recorded in the emitted `truncated` flag so
  *     downstream can route those docs to a batch pass.
  *   - `NoTimeout` here (exact within the run); a TTL variant would swap
  *     in ProcessingTimeTimeout the same way StreamingDedup's
  *     watermarked variant bounds exact-dedup state.
  *
  * Candidate pairs are LSH candidates, not verified near-dups: the
  * verification (exact Jaccard on shingle arrays) happens downstream on
  * the tiny candidate stream — same split as the batch pipeline.
  */
object StreamingNearDup {

  case class BandedDoc(band: Int, key: String, doc_id: Long)

  /** Emitted stream. CONTRACT: rows with `truncated = true` are overflow
    * MARKERS, not candidate pairs — they carry `id_a == id_b` (the doc
    * that hit a full bucket) and must be routed to the batch pass, never
    * verified as a pair. Consumers filter
    * `id_a =!= id_b || truncated` before pair verification.
    */
  case class CandidatePair(id_a: Long, id_b: Long, band: Int, truncated: Boolean)

  /** Per-bucket state: joined member ids (capped at `maxBucket`) plus the
    * ids already routed to the batch pass via a truncation marker, so a
    * replayed/duplicated arrival doesn't re-emit its marker every time.
    */
  case class BucketState(members: List[Long], marked: List[Long])

  /** Band a streaming document feed with the batch operators' MinHash
    * scheme (k-shingles → numHashes windowed-md5 mins → numBands keys) —
    * all map-side, no state.
    */
  def banded(docs: DataFrame, idCol: String, textCol: String,
             k: Int, numHashes: Int, numBands: Int): DataFrame = {
    require(numHashes % numBands == 0)
    val rows = numHashes / numBands
    val toks = filter(split(col(textCol), " "), x => x =!= "")
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(0))),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
    val hh = transform(sh, s => concat(md5(s), md5(s)))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(hh, h => substring(h, 1 + 2 * i, 16))).as(s"sig_$i"))
    val withSig = docs
      .filter(size(toks) >= k)
      .select(col(idCol).as("doc_id") +: sigs: _*)
    val bands = (0 until numBands).map { b =>
      val sigCols = (b * rows until (b + 1) * rows).map(i => col(s"sig_$i"))
      struct(lit(b).as("band"), md5(concat(sigCols: _*)).as("key"))
    }
    withSig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"))
  }

  /** Stateful candidate emission: for every banded arrival, one pair per
    * id already in its (band, key) bucket, bucket membership capped at
    * `maxBucket`.
    */
  def candidatePairs(spark: SparkSession, bandedDocs: DataFrame,
                     maxBucket: Int = 64): Dataset[CandidatePair] = {
    import spark.implicits._
    bandedDocs.as[BandedDoc]
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), docs, state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Nil, Nil))
          // markers-per-doc is bounded too: past this a degenerate bucket
          // stops deduplicating markers (the batch pass they route to is
          // idempotent, so an occasional repeat is harmless; unbounded
          // state is not)
          val maxMarked = 8 * maxBucket
          val out = scala.collection.mutable.ListBuffer[CandidatePair]()
          docs.foreach { d =>
            if (!st.members.contains(d.doc_id)) {
              if (st.members.size < maxBucket) {
                st.members.foreach { m =>
                  out += CandidatePair(math.min(m, d.doc_id),
                    math.max(m, d.doc_id), band, truncated = false)
                }
                st = st.copy(members = d.doc_id :: st.members)
              } else if (!st.marked.contains(d.doc_id)) {
                // full bucket: emit the overflow marker ONCE per doc (see
                // CandidatePair contract) and remember it
                out += CandidatePair(d.doc_id, d.doc_id, band, truncated = true)
                if (st.marked.size < maxMarked)
                  st = st.copy(marked = d.doc_id :: st.marked)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}

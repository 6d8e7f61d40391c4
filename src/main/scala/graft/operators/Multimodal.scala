package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `BINARY` columns with typed metadata alongside. The Spark-side shape is
  * real and tested — typed `Dataset` over the binary column, per-partition
  * batch iteration (the Scala analog of a pandas-UDF batch), deterministic
  * output schema — while the codec call itself is a clearly-marked STUB
  * (no image/audio libraries in this environment).
  *
  * Scale: `mapPartitions` keeps decode batched and executor-local; binary
  * payloads never shuffle (features are extracted before any wide op), and
  * a real deployment would cap `spark.sql.files.maxPartitionBytes` so one
  * partition of blobs fits executor memory.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, blob: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           content_hash: String, width: Int, height: Int,
                           frames: Int)

  /** STUB decode — stands in for an image/audio codec (???-grade).
    * Deterministic fake dimensions derived from the payload so tests and
    * oracles are reproducible; a real build swaps only this function.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (64 + n % 32, 64 + (n * 7) % 32, 1)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Decode/feature-extract over a media DataFrame with columns
    * (doc_id LONG, media_type STRING, blob BINARY).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val (w, h, f) = decodeStub(r.blob)
        MediaFeatures(r.doc_id, r.media_type, r.blob.length, md5Hex(r.blob),
                      w, h, f)
      }
    }.toDF()
  }

  case class ResizedMedia(doc_id: Long, media_type: String, width: Int,
                          height: Int, blob: Array[Byte])

  /** Resize plumbing: batch-transforms payloads to a target box. The
    * STUB "resampler" deterministically subsamples bytes proportionally
    * to the area ratio — a real build swaps in an image scaler; schema,
    * batching and partition behavior are what the engine owns.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val (w, h, _) = decodeStub(r.blob)
        val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h))
        val keep = math.max(1, (r.blob.length * ratio).toInt)
        ResizedMedia(r.doc_id, r.media_type, targetW, targetH, r.blob.take(keep))
      }
    }.toDF()
  }

  case class AudioChunk(doc_id: Long, chunk_idx: Int, start_sample: Long,
                        n_samples: Int, chunk_hash: String)

  /** Audio chunking plumbing: fixed-length windows with `overlap` samples
    * of lookback — the standard shape for feature extraction (fbank,
    * embeddings) over long audio. The payload is treated as 16-bit PCM
    * (2 bytes/sample, STUB stand-in for a real decoder); each chunk row
    * carries its sample offsets so downstream models can reassemble
    * order. flatMap shape, executor-local, no shuffle.
    */
  def chunkAudio(spark: SparkSession, media: DataFrame,
                 chunkSamples: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSamples, "overlap must be < chunkSamples")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.flatMap { r =>
        val totalSamples = r.blob.length / 2
        val stride = chunkSamples - overlap
        // drop tail starts whose chunk holds no NEW samples (everything
        // in [s, total) already inside the previous chunk's window) —
        // they'd double-process and double-count on reassembly
        val starts = (0L until totalSamples.toLong by stride.toLong)
          .filter(s => s == 0 || s + overlap < totalSamples)
        starts.zipWithIndex.map { case (s, i) =>
          val n = math.min(chunkSamples.toLong, totalSamples - s).toInt
          val bytes = r.blob.slice(2 * s.toInt, 2 * (s.toInt + n))
          AudioChunk(r.doc_id, i, s, n, md5Hex(bytes))
        }
      }
    }.toDF()
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame-sampling plumbing for video-typed payloads: every `stride`-th
    * frame index up to the stub-decoded frame count, one output row per
    * sampled frame (flatMap shape — the row explosion video work needs).
    * The frame "content" is a deterministic hash of (payload, index).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.flatMap { r =>
        val frames = 1 + r.blob.length % 31 // STUB frame count from payload
        (0 until frames by stride).map { i =>
          FrameSample(r.doc_id, i, md5Hex(r.blob ++ BigInt(i).toByteArray))
        }
      }
    }.toDF()
  }
}

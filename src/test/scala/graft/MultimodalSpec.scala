package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payloads flow through typed batch feature extraction") {
    val media = Seq(
      (1L, "image/png", "fake png bytes"),
      (2L, "audio/wav", "")).toDF("doc_id", "media_type", "payload")
      .withColumn("blob", col("payload").cast("binary")).drop("payload")
    val out = Multimodal.extractFeatures(spark, media).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_bytes") == 14)
    assert(out(0).getAs[String]("content_hash").length == 32)
    assert(out(0).getAs[Int]("width") == 64 + 14 % 32)
    assert(out(1).getAs[Int]("n_bytes") == 0)
    // d41d8... = md5 of empty input, pinned so the stub stays deterministic
    assert(out(1).getAs[String]("content_hash") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("resize bounds payloads; frame sampling explodes one row per stride") {
    val media = Seq((1L, "video/mp4", "x" * 100))
      .toDF("doc_id", "media_type", "payload")
      .withColumn("blob", col("payload").cast("binary")).drop("payload")

    val resized = Multimodal.resize(spark, media, 8, 8).collect().head
    assert(resized.getAs[Int]("width") == 8)
    assert(resized.getAs[Array[Byte]]("blob").length < 100)

    // 100 bytes → 1 + 100%31 = 8 stub frames; stride 3 → indices 0,3,6
    val frames = Multimodal.sampleFrames(spark, media, stride = 3)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6))
    assert(frames.map(_.getAs[String]("frame_hash")).distinct.length == 3)
  }

  test("real ImageIO codec: synthetic PNG round-trips header probe, resize, and rejects garbage") {
    import spark.implicits._
    val media = Seq(3L, 40L).map(id =>
        Multimodal.MediaRecord(id, "image", Multimodal.syntheticPng(id)))
      .toDS().toDF()
    // header probe returns the synthesis dims through a REAL png decode
    val meta = Multimodal.decodeImageMeta(spark, media).orderBy("doc_id").collect()
    assert(meta.map(r => (r.getAs[Int]("width"), r.getAs[Int]("height"),
      r.getAs[String]("format"))).toSeq ==
      Seq((16 + 3 % 32, 16 + 21 % 32, "png"), (16 + 40 % 32, 16 + 280 % 32, "png")))
    // real resize re-encodes decodable PNGs at the target box, and the two
    // docs' pixels stay distinct through the scale (not a constant fill)
    val resized = Multimodal.resizeImages(spark, media, 8, 6)
    val back = Multimodal.decodeImageMeta(spark, resized.select("doc_id", "media_type", "blob"))
      .orderBy("doc_id").collect()
    assert(back.forall(r => r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6
      && r.getAs[String]("format") == "png"))
    val blobs = resized.orderBy("doc_id").collect().map(_.getAs[Array[Byte]]("blob").toSeq)
    assert(blobs(0) != blobs(1))
    // a non-image payload quarantines as unknown instead of throwing
    val junk = Seq(Multimodal.MediaRecord(9L, "image", Array[Byte](1, 2, 3))).toDS().toDF()
    val u = Multimodal.decodeImageMeta(spark, junk).collect().head
    assert(u.getAs[Int]("width") == -1 && u.getAs[String]("format") == "unknown")
    // extractFeatures routes recognized payloads through the REAL probe
    // (actual PNG dims), unrecognized ones through the declared stub
    val feat = Multimodal.extractFeatures(spark, media).orderBy("doc_id").collect()
    assert(feat.head.getAs[Int]("width") == 16 + 3 % 32
      && feat.head.getAs[Int]("height") == 16 + 21 % 32)
    // JPEG breadth: the lossy writer+reader pair is a different codec
    // than PNG — re-encode one payload as JPEG and probe it back
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.syntheticPng(3L)))
    val jbaos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jbaos))
    val jpeg = Seq(Multimodal.MediaRecord(30L, "image", jbaos.toByteArray)).toDS().toDF()
    val jm = Multimodal.decodeImageMeta(spark, jpeg).collect().head
    assert(jm.getAs[String]("format") == "jpeg"
      && jm.getAs[Int]("width") == 16 + 3 % 32
      && jm.getAs[Int]("height") == 16 + 21 % 32)
  }

  test("real javax.sound codec: synthetic WAV header parses back the synthesis arithmetic") {
    import spark.implicits._
    val media = Seq(5L, 6L).map(id =>
        Multimodal.MediaRecord(id, "audio", Multimodal.syntheticWav(id)))
      .toDS().toDF()
    val meta = Multimodal.decodeAudioMeta(spark, media).orderBy("doc_id").collect()
    assert(meta.map(r => (r.getAs[Int]("sample_rate"), r.getAs[Int]("channels"),
      r.getAs[Long]("n_frames"))).toSeq ==
      Seq((8000 + 1 * 4000, 2, 105L), (8000 + 2 * 4000, 1, 106L)))
  }

  test("audio decode quarantines non-audio payloads as (-1,-1,-1) instead of throwing") {
    import spark.implicits._
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio", Multimodal.syntheticWav(1L)),
        Multimodal.MediaRecord(2L, "audio", "definitely not a WAV".getBytes("UTF-8")),
        Multimodal.MediaRecord(3L, "audio", Array.empty[Byte]))
      .toDS().toDF()
    val meta = Multimodal.decodeAudioMeta(spark, media).orderBy("doc_id").collect()
    assert(meta.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rate"),
      r.getAs[Int]("channels"), r.getAs[Long]("n_frames"))).toSeq ==
      Seq((1L, 12000, 2, 101L), (2L, -1, -1, -1L), (3L, -1, -1, -1L)))
  }

  test("aHash: perturbed copy lands near its base, different bases far, garbage quarantines") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.syntheticPng(5)),
      Multimodal.MediaRecord(2L, "image", Multimodal.syntheticPngPerturbed(5)),
      Multimodal.MediaRecord(3L, "image", Multimodal.syntheticPng(11)),
      Multimodal.MediaRecord(4L, "image", "not an image".getBytes)).toDS().toDF()
    val hashes = Multimodal.imageAHashBands(spark, media)
    val rows = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rows(4L) == Seq(-1, -1, -1, -1)) // quarantined, never throws
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val nearDist = ham(rows(1L), rows(2L))
    val farDist = ham(rows(1L), rows(3L))
    assert(nearDist <= 8, s"perturbed copy drifted to Hamming $nearDist")
    assert(farDist > 8, s"unrelated images within Hamming $farDist")
    // the banded pair search surfaces exactly the near pair
    val pairs = Multimodal.imageNearDupPairs(spark, hashes, tau = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, nearDist)))
  }

  test("audio fingerprint: perturbed PCM near its base, different audio far, quarantine") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.syntheticWav(7)),
      Multimodal.MediaRecord(2L, "audio", Multimodal.syntheticWavPerturbed(7)),
      Multimodal.MediaRecord(3L, "audio", Multimodal.syntheticWav(23)),
      Multimodal.MediaRecord(4L, "audio", "not audio at all".getBytes)).toDS().toDF()
    val hashes = Multimodal.audioFingerprintBands(spark, media)
    val rows = hashes.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rows(4L) == Seq(-1, -1, -1, -1))
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val nearDist = ham(rows(1L), rows(2L))
    val farDist = ham(rows(1L), rows(3L))
    assert(nearDist <= 8, s"perturbed PCM drifted to Hamming $nearDist")
    assert(farDist > 8, s"unrelated audio within Hamming $farDist")
    // the band pair search is modality-agnostic: same operator as images
    val pairs = Multimodal.imageNearDupPairs(spark, hashes, tau = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, nearDist)))
  }

  test("audio chunking windows samples with overlap and exact offsets") {
    import spark.implicits._
    // 20 bytes = 10 PCM samples; chunk=4, overlap=1 → stride 3:
    // candidate starts 0,3,6,9 — but the chunk at 9 holds only sample 9,
    // already inside chunk [6,10): no new samples, so it is dropped
    val media = Seq(Multimodal.MediaRecord(7L, "audio", Array.tabulate(20)(_.toByte)))
      .toDS().toDF()
    val chunks = Multimodal.chunkAudio(spark, media, chunkSamples = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getAs[Long]("start_sample")).toSeq == Seq(0L, 3L, 6L))
    assert(chunks.map(_.getAs[Int]("n_samples")).toSeq == Seq(4, 4, 4))
    assert(chunks.map(_.getAs[String]("chunk_hash")).distinct.length == 3)
    // every sample is covered: last chunk ends exactly at totalSamples
    assert(chunks.last.getAs[Long]("start_sample") + chunks.last.getAs[Int]("n_samples") == 10)
  }

  test("distinct-signature pair plan == naive all-pairs reference on random " +
      "duplicate-heavy signature sets (round-9 quadratic fix equivalence)") {
    import spark.implicits._
    // seeded randomized equivalence: many ids mapped onto FEW signatures
    // (the duplicate-heavy regime the sf1 measurement exposed) so both
    // the dist=0 within-group expansion and the cross-signature band
    // path carry real weight. The reference is the obviously-correct
    // O(n²) in-memory scan.
    val rnd = new scala.util.Random(9)
    for (trial <- 1 to 3) {
      val sigs = Array.fill(6)(Array.fill(4)(rnd.nextInt(1 << 16)))
      val docs = (0L until 40L).map { id =>
        val s = sigs(rnd.nextInt(sigs.length))
        (id, s(0), s(1), s(2), s(3))
      }
      val tau = 8 + rnd.nextInt(20)
      val hashes = docs.toDF("doc_id", "b0", "b1", "b2", "b3")
      val got = Multimodal.imageNearDupPairs(spark, hashes, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        (a, i) <- docs.zipWithIndex
        b <- docs.drop(i + 1)
        if (1 to 4).exists(k => a.productElement(k) == b.productElement(k))
        d = (1 to 4).map(k => Integer.bitCount(
          a.productElement(k).asInstanceOf[Int] ^
            b.productElement(k).asInstanceOf[Int])).sum
        if d <= tau
      } yield (math.min(a._1, b._1), math.max(a._1, b._1), d)).toSet
      assert(got == expect, s"trial $trial (tau=$tau) diverged")
      graft.operators.OpCache.clear()
    }
  }

  test("capped pair report == per-doc window cap over the FULL pair set on " +
      "random duplicate-heavy inputs (round-9 verdict #9)") {
    import spark.implicits._
    // the lead()-generated dist-0 part must contain every pair the final
    // per-doc budget can keep — proven here against capping the uncapped
    // output, on the duplicate-heavy regime where the within-group term
    // is the one being bounded
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val sigs = Array.fill(5)(Array.fill(4)(rnd.nextInt(1 << 16)))
      val docs = (0L until 40L).map { id =>
        val s = sigs(rnd.nextInt(sigs.length))
        (id, s(0), s(1), s(2), s(3))
      }
      val tau = 8 + rnd.nextInt(16)
      val cap = 1 + rnd.nextInt(3)
      val hashes = docs.toDF("doc_id", "b0", "b1", "b2", "b3")
      val got = Multimodal.imageNearDupPairsCapped(spark, hashes, tau, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val full = Multimodal.imageNearDupPairs(spark, hashes, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val expect = full.groupBy(_._1).values.flatMap(
        _.sortBy(p => (p._3, p._2)).take(cap)).toSet
      assert(got == expect, s"trial $trial (tau=$tau cap=$cap) diverged")
      graft.operators.OpCache.clear()
    }
  }

  test("mediaDedupClusters == clustering the full pair graph on random " +
      "duplicate-heavy inputs (the linear path's label contract)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val sigs = Array.fill(8)(Array.fill(4)(rnd.nextInt(1 << 16)))
    val docs = (0L until 50L).map { id =>
      val s = sigs(rnd.nextInt(sigs.length))
      (id, s(0), s(1), s(2), s(3))
    }
    val hashes = docs.toDF("doc_id", "b0", "b1", "b2", "b3")
    val viaPairs = {
      val pairs = Multimodal.imageNearDupPairs(spark, hashes, tau = 16)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaReps = Multimodal.mediaDedupClusters(spark, hashes, tau = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReps == viaPairs)
    graft.operators.OpCache.clear()
  }

  test("aHash threshold arithmetic is overflow-exact (round-8 advice): " +
      "mulGt matches BigInteger on 128-bit products") {
    import java.math.BigInteger
    def ref(a: Long, b: Long, c: Long, d: Long): Boolean =
      BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
        .compareTo(BigInteger.valueOf(c).multiply(BigInteger.valueOf(d))) > 0
    // the overflow regime the old Long math silently wrapped in:
    // ~1.3e8 PCM samples / ~8.7e8 pixels pushes sum*n past 2^63
    val cases = Seq(
      (765L * 870000000L, 870000000L, 765L * 870000000L * 64L, 870000000L / 64L),
      (Long.MaxValue / 3, 7L, Long.MaxValue / 3, 7L),           // exact tie
      (Long.MaxValue / 3, 7L, Long.MaxValue / 3, 6L),
      (32767L * 140000000L, 140000000L, 32767L * 139999999L, 140000001L),
      (0L, 5L, 0L, 9L), (1L, 1L, 0L, 0L),
      ((1L << 62) + 3L, 4L, (1L << 62) + 2L, 4L))               // hi equal, lo differs
    cases.foreach { case (a, b, c, d) =>
      assert(Multimodal.mulGt(a, b, c, d) == ref(a, b, c, d), s"($a,$b,$c,$d)")
      assert(Multimodal.mulGt(c, d, a, b) == ref(c, d, a, b), s"($c,$d,$a,$b)")
    }
  }
}

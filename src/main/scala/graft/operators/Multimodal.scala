package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `BINARY` columns with typed metadata alongside — typed `Dataset` over
  * the binary column, per-partition batch iteration (the Scala analog of
  * a pandas-UDF batch), deterministic output schema.
  *
  * Codec status (round-6): the IMAGE paths are REAL — the JDK bundles
  * ImageIO readers/writers for PNG/JPEG/GIF/BMP, so [[decodeImageMeta]]
  * (header-only dimension probe) and [[resizeImages]] (decode → bilinear
  * scale → PNG re-encode) run actual codecs, no external libraries. The
  * AUDIO metadata path is likewise real via the JDK's `javax.sound`
  * WAV/AIFF parsers ([[decodeAudioMeta]]). Only paths with no JDK codec
  * remain clearly-marked STUBs: video frame decode ([[sampleFrames]]'s
  * frame count) and the generic byte-subsample [[resize]]; compressed-
  * audio decode stays out too (JDK has no MP3/AAC codec).
  *
  * Scale: `mapPartitions` keeps decode batched and executor-local; binary
  * payloads never shuffle (features are extracted before any wide op), and
  * a real deployment would cap `spark.sql.files.maxPartitionBytes` so one
  * partition of blobs fits executor memory. Metadata probes must stay
  * header-only ([[decodeImageMeta]] never decodes pixels) — at 100 TB the
  * difference between reading a 33-byte header and inflating a frame
  * buffer per row IS the job's cost.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, blob: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           content_hash: String, width: Int, height: Int,
                           frames: Int)

  /** STUB decode — stands in for codecs the JDK does NOT carry (video
    * containers, compressed audio). Deterministic fake dimensions derived
    * from the payload so tests and oracles are reproducible; for image
    * payloads use the REAL [[decodeImageMeta]]/[[resizeImages]] instead.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (64 + n % 32, 64 + (n * 7) % 32, 1)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Exact `a*b > c*d` for NON-NEGATIVE longs via 128-bit products —
    * the aHash / audio-fingerprint thresholds multiply a per-cell sum by
    * the total sample count, which overflows a Long around 1.3e8 PCM
    * samples / 8.7e8 pixels and would silently flip hash bits
    * (round-8 advice). `Math.multiplyHigh` is the signed high word,
    * which equals the unsigned one when both operands are ≥ 0 — true
    * for every call site (sums of non-negative intensities, counts).
    */
  private[graft] def mulGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }

  /** Decode/feature-extract over a media DataFrame with columns
    * (doc_id LONG, media_type STRING, blob BINARY). Payloads a real JDK
    * ImageIO reader recognizes (magic-byte match) get REAL dimensions
    * via the header probe; everything else (video, audio, opaque bytes)
    * falls back to [[decodeStub]] — the honest split: real codec where
    * one exists, declared stub where none does.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val (w, h, f) = probeImage(r.blob).getOrElse(decodeStub(r.blob))
        MediaFeatures(r.doc_id, r.media_type, r.blob.length, md5Hex(r.blob),
                      w, h, f)
      }
    }.toDF()
  }

  /** Header-only (width, height, 1) via a matching ImageIO reader; None
    * when no installed codec recognizes the payload.
    */
  private def probeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val rd = readers.next()
        try { rd.setInput(in); Some((rd.getWidth(0), rd.getHeight(0), 1)) }
        finally rd.dispose()
      } else None
    } finally in.close()
  }

  case class ImageMeta(doc_id: Long, width: Int, height: Int, format: String)

  /** REAL image metadata decode via the JDK's bundled ImageIO codecs:
    * per payload, the matching reader's header probe gives
    * (width, height, format). Header-ONLY on purpose — `getWidth/getHeight`
    * on the reader parse the image header without inflating pixel data,
    * which is the scan posture a 100 TB metadata pass needs. Payloads no
    * installed reader recognizes come back as (-1, -1, "unknown") rather
    * than throwing: one corrupt blob must not kill a corpus-wide pass
    * (route the unknowns to quarantine downstream).
    */
  def decodeImageMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        // memory-cached stream: ImageIO's default file-cache would write
        // a temp file per payload — pure executor-heap probing instead
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (readers.hasNext) {
            val rd = readers.next()
            try {
              rd.setInput(in)
              ImageMeta(r.doc_id, rd.getWidth(0), rd.getHeight(0),
                        rd.getFormatName.toLowerCase)
            } finally rd.dispose()
          } else ImageMeta(r.doc_id, -1, -1, "unknown")
        } finally in.close()
      }
    }.toDF()
  }

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                       n_frames: Long)

  /** REAL audio metadata decode via the JDK's `javax.sound` file parsers
    * (WAV/AIFF/AU ship with the JVM): sample rate, channel count and
    * frame length from the container header — again header-only, no PCM
    * materialization. Compressed formats (MP3/AAC) have no JDK codec;
    * those payloads (and corrupt blobs) quarantine as (-1, -1, -1)
    * rather than throwing — same posture as [[decodeImageMeta]]: one
    * unrecognized blob must not kill a corpus-wide pass. Decoding the
    * compressed formats themselves stays declared-stub territory (no
    * codec library in this container); the ROUTING is real and tested.
    */
  def decodeAudioMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        try {
          val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(r.blob))
          AudioMeta(r.doc_id, ff.getFormat.getSampleRate.toInt,
                    ff.getFormat.getChannels, ff.getFrameLength.toLong)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException =>
            AudioMeta(r.doc_id, -1, -1, -1L)
        }
      }
    }.toDF()
  }

  case class ResizedMedia(doc_id: Long, media_type: String, width: Int,
                          height: Int, blob: Array[Byte])

  /** REAL image resize: full ImageIO decode → bilinear `Graphics2D`
    * scale → PNG re-encode, one output payload per input. This is the
    * pixel-touching counterpart to [[decodeImageMeta]]'s header probe —
    * the batch shape of a training-data thumbnail pass. Fails loudly on
    * an undecodable payload (a resize pass, unlike a metadata sweep, has
    * no meaningful output for garbage input — filter through
    * [[decodeImageMeta]] first to quarantine unknowns).
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.blob))
        require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        ResizedMedia(r.doc_id, r.media_type, targetW, targetH, baos.toByteArray)
      }
    }.toDF()
  }

  /** Deterministic PNG fixture: a (16 + id % 32) × (16 + 7·id % 32) image
    * whose pixels hash off (id, x, y), encoded through the real ImageIO
    * PNG writer. This substitutes for on-disk image files (the testdata
    * carries none) — the ENCODE side of the real-codec round trip the
    * decode oracles close. Executor-side, one per row, no shuffle.
    */
  /** Fixture-cache variant for the oracle/bench harness: the probe
    * outputs (width, height, format) are functions of `docId % 32` only,
    * so the 32 representative PNGs are encoded once per JVM and reused —
    * the measured cost is then the ENGINE's per-row decode probe, not
    * 5000 redundant ImageIO encodes of the same dimension cycle. Specs
    * that need per-doc-unique pixel content keep calling [[syntheticPng]].
    */
  case class ImageHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual average-hash (aHash) over REAL decoded pixels — the
    * image near-dup signature: decode via ImageIO, per-pixel intensity
    * r+g+b, average-pool onto an 8×8 grid (pixel (x,y) → cell
    * (x·8/w, y·8/h), integer division), bit = cell mean > global mean.
    * The threshold compares EXACT integer cross-products
    * (cellSum·totalCount > totalSum·cellCount — no float division), so
    * the 64 bits are a pure function of the pixel values and the DuckDB
    * oracle can restate them as closed-form arithmetic over the fixture
    * formula: the decode path itself gets hash-verified, not just
    * headers. Lossless-codec caveat: bit-exact oracle agreement needs a
    * lossless format (PNG); JPEG decode is platform-stable but not
    * formula-predictable — hashes still work for dedup, just not for
    * closed-form oracles.
    *
    * The hash ships as FOUR 16-bit band ints (bit idx = cy·8+cx; band k
    * holds bits [16k, 16k+16), bit b of the band = 1 << b): bands ARE
    * the LSH blocking key for [[imageNearDupPairs]] (two images within
    * Hamming 3 of each other share ≥ 1 exact band by pigeonhole), and
    * 16-bit ints never meet integer-overflow or sign-bit trouble in
    * either engine. Unrecognized payloads quarantine as (-1,-1,-1,-1),
    * the house convention. Map-side only; one decode per payload.
    */
  def imageAHashBands(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.blob))
        catch { case _: Exception => null }
        if (img == null) ImageHash(r.doc_id, -1, -1, -1, -1)
        else {
          val w = img.getWidth; val h = img.getHeight
          val cellSum = new Array[Long](64)
          val cellCnt = new Array[Long](64)
          var total = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val i = ((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)
              val c = (y * 8 / h) * 8 + (x * 8 / w)
              cellSum(c) += i; cellCnt(c) += 1; total += i
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val bands = new Array[Int](4)
          var c = 0
          while (c < 64) {
            if (mulGt(cellSum(c), n, total, cellCnt(c)))
              bands(c / 16) |= 1 << (c % 16)
            c += 1
          }
          ImageHash(r.doc_id, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }.toDF()
  }

  /** Image near-dup pairs by banded aHash: candidates = pairs sharing
    * at least one exact 16-bit band (4 equi-joins, the SimHash chunk-
    * banding shape — never all-pairs), verified by full Hamming distance
    * ≤ `tau` via codegen'd `bit_count(xor)`. Pigeonhole guarantee: any
    * pair within Hamming 3 shares a band; τ > 3 trades recall for the
    * same bounded candidate space. Quarantined hashes (-1 bands) are
    * excluded — they'd otherwise all collide on every band.
    */
  def imageNearDupPairs(spark: SparkSession, hashes: DataFrame,
                        tau: Int): DataFrame = {
    // the hash frame is referenced several times — without a persist
    // each reference re-runs the upstream DECODE pass over every
    // payload (measured 8× the corpus decode cost at sf0.1). The hash
    // table is ~16 bytes/item; pin it once.
    val hs = OpCache.persist(hashes.filter(col("b0") >= 0))
    // DISTINCT-SIGNATURE plan (round-9 sf1 measurement: the naive
    // doc×doc band joins went α≈1.2 super-linear on the duplicate-heavy
    // synthetic corpus — every identical-hash group of size g fed g²
    // rows through FOUR band joins plus a quadratic dropDuplicates).
    // Identical signatures collapse first: the band joins and the
    // Hamming verify run over the D distinct signatures only, then
    // surviving signature pairs expand back to member doc pairs. The
    // OUTPUT is unchanged and inherently Θ(Σ group²) on such corpora —
    // that term is the contract of emitting every pair (named in
    // SCALE.md); what this plan removes is the 4× candidate-generation
    // and shuffle work riding on it. Identical-hash pairs are emitted
    // directly from one equi-self-join at dist = 0.
    val within = hs.select(col("doc_id").as("doc_a"), col("b0"), col("b1"),
        col("b2"), col("b3"))
      .join(hs.select(col("doc_id").as("doc_b"), col("b0"), col("b1"),
        col("b2"), col("b3")), Seq("b0", "b1", "b2", "b3"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0).as("dist"))
    within.unionByName(crossSignaturePairs(hs, tau))
  }

  /** The DISTINCT-SIGNATURE half of [[imageNearDupPairs]] (0 < dist ≤
    * tau — differing signatures only): band joins + Hamming verify over
    * distinct signatures, then expansion back to member doc pairs.
    * Shared by the capped variant, which replaces the Θ(Σ g²) dist-0
    * self-join with a bounded lead() generation.
    */
  private def crossSignaturePairs(hs: DataFrame, tau: Int): DataFrame = {
    val d = OpCache.persist(
      hs.select("b0", "b1", "b2", "b3").dropDuplicates())
    // (hi, lo) packs the 4×16-bit signature into two comparable longs —
    // the strict order that dedups a signature pair across band joins
    def hi(p: String) = (col(s"${p}0").cast("long") * 65536L + col(s"${p}1"))
    def lo(p: String) = (col(s"${p}2").cast("long") * 65536L + col(s"${p}3"))
    val da = d.select(col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val db = d.select(col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    val ordered = hi("a") < hi("c") || (hi("a") === hi("c") && lo("a") < lo("c"))
    val hashPairs = (0 to 3).map { k =>
      da.join(db, col(s"a$k") === col(s"c$k") && ordered)
    }.reduce(_.unionByName(_))
      .dropDuplicates("a0", "a1", "a2", "a3", "c0", "c1", "c2", "c3")
    val dist = (0 to 3).map(k =>
      bit_count(col(s"a$k").bitwiseXOR(col(s"c$k")))).reduce(_ + _)
    val survivors = hashPairs.withColumn("dist", dist.cast("int"))
      .filter(col("dist") <= tau) // dist > 0 by construction: signatures differ
    val cross = survivors
      .join(hs.select(col("doc_id").as("__ida"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")),
        Seq("a0", "a1", "a2", "a3"))
      .join(hs.select(col("doc_id").as("__idb"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")),
        Seq("c0", "c1", "c2", "c3"))
      .select(least(col("__ida"), col("__idb")).as("doc_a"),
        greatest(col("__ida"), col("__idb")).as("doc_b"), col("dist"))
    cross
  }

  /** [[imageNearDupPairs]] with a per-document pair budget (round-9
    * verdict #9): each doc_a reports at most `maxPairsPerDoc` partners,
    * the best by (dist asc, doc_b asc) — equivalent to capping the full
    * pair set per doc_a, so the oracle is one LIMIT-per-group window
    * over the uncapped derivation. The point is bounding the Θ(Σ g²)
    * OUTPUT term the uncapped report carries by contract: the dist-0
    * within-group part is generated as each member's next
    * `maxPairsPerDoc` group successors via lead() — g·cap rows of work,
    * never g² — which provably contains every dist-0 pair the final cap
    * can keep (a doc's best partners at dist 0 are exactly its nearest
    * group successors by id); the cross-signature part rides the
    * distinct-signature search unchanged and the final per-doc window
    * folds both to the budget. Cluster labeling
    * ([[mediaDedupClusters]]) stays the scale default when pair
    * identities aren't needed at all.
    */
  def imageNearDupPairsCapped(spark: SparkSession, hashes: DataFrame,
                              tau: Int, maxPairsPerDoc: Int): DataFrame = {
    require(maxPairsPerDoc >= 1, s"maxPairsPerDoc must be >= 1, got $maxPairsPerDoc")
    val hs = OpCache.persist(hashes.filter(col("b0") >= 0))
    val sig = Seq("b0", "b1", "b2", "b3")
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(sig.map(col): _*).orderBy(col("doc_id").asc)
    val within = (1 to maxPairsPerDoc).map { o =>
      hs.withColumn("__nb", lead(col("doc_id"), o).over(wg))
        .filter(col("__nb").isNotNull)
        .select(col("doc_id").as("doc_a"), col("__nb").as("doc_b"),
          lit(0).as("dist"))
    }.reduce(_ unionByName _)
    val cross = crossSignaturePairs(hs, tau)
    val wcap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"))
      .orderBy(col("dist").asc, col("doc_b").asc)
    within.unionByName(cross)
      .withColumn("__rn", row_number().over(wcap))
      .filter(col("__rn") <= maxPairsPerDoc)
      .drop("__rn")
  }

  /** Near-dup CLUSTER labels without ever materializing the quadratic
    * pair set — the scale-safe form the sf1 measurement demanded: on a
    * corpus where many payloads are bit-identical (the common case a
    * dedup pass exists to catch), the pair LIST is Θ(Σ group²) but the
    * cluster STRUCTURE is linear. Identical signatures collapse to a
    * min-id representative, the banded+Hamming search runs over
    * representatives only, members attach by one (member → rep) edge
    * each, and connected components label the union. Components of size
    * 1 (docs in no real pair) are dropped, so the output row set —
    * and every label, since min-id labeling is connectivity-determined
    * — exactly equals clustering the full [[imageNearDupPairs]] output
    * (the committed cluster oracle pins this equality).
    */
  def mediaDedupClusters(spark: SparkSession, hashes: DataFrame,
                         tau: Int): DataFrame = {
    val hs = OpCache.persist(hashes.filter(col("b0") >= 0))
    val rep = OpCache.persist(hs.groupBy("b0", "b1", "b2", "b3")
      .agg(min(col("doc_id")).as("rep_id")))
    val repPairs = imageNearDupPairs(spark,
      rep.select(col("rep_id").as("doc_id"), col("b0"), col("b1"),
        col("b2"), col("b3")), tau)
    val memberEdges = hs.join(rep, Seq("b0", "b1", "b2", "b3"))
      .select(col("doc_id").as("id_a"), col("rep_id").as("id_b"))
    val edges = repPairs.select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      .unionByName(memberEdges)
    val labels = Dedup.connectedComponents(edges, "id_a", "id_b")
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("__n"))
    labels.join(sizes, "comp").filter(col("__n") > 1)
      .select("id", "comp")
  }

  /** Audio fingerprint — the aHash design over the 1-D PCM stream: a
    * REAL `javax.sound` container parse yields the 16-bit little-endian
    * signed samples; per-sample intensity |s|, average-pooled onto 64
    * windows (sample k → window k·64/n, integer division), bit = window
    * mean > global mean via exact cross-products. Channels are treated
    * as one interleaved sample sequence (fingerprinting cares about the
    * energy envelope, and it keeps the closed-form oracle restatable).
    * Same four-16-bit-band output as [[imageAHashBands]] — so
    * [[imageNearDupPairs]] serves audio unchanged (the pair search is
    * modality-agnostic: bands in, Hamming-verified pairs out). Non-PCM /
    * non-16-bit / big-endian / unrecognized payloads quarantine as
    * (-1,-1,-1,-1).
    */
  def audioFingerprintBands(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val parsed =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.blob))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              None
            else Some(ais.readAllBytes())
          } catch { case _: Exception => None }
        parsed match {
          case Some(data) if data.length >= 2 =>
            val n = data.length / 2
            val winSum = new Array[Long](64)
            val winCnt = new Array[Long](64)
            var total = 0L
            var k = 0
            while (k < n) {
              val s = ((data(2 * k + 1) << 8) | (data(2 * k) & 0xff)).toShort
              val i = math.abs(s.toLong)
              val w = (k.toLong * 64 / n).toInt
              winSum(w) += i; winCnt(w) += 1; total += i
              k += 1
            }
            val bands = new Array[Int](4)
            var c = 0
            while (c < 64) {
              if (winCnt(c) > 0 && mulGt(winSum(c), n, total, winCnt(c)))
                bands(c / 16) |= 1 << (c % 16)
              c += 1
            }
            ImageHash(r.doc_id, bands(0), bands(1), bands(2), bands(3))
          case _ => ImageHash(r.doc_id, -1, -1, -1, -1)
        }
      }
    }.toDF()
  }

  /** PCM-perturbed WAV fixture (every payload byte XOR 0x08 before the
    * container encode — replicable in the oracle) — the planted audio
    * near-dups, mirroring [[syntheticPngPerturbedFixture]].
    */
  def syntheticWavPerturbedFixture(docId: Long): Array[Byte] =
    wavPerturbedCache.computeIfAbsent(((docId % 100) + 100) % 100,
      r => syntheticWavPerturbed(r))

  private val wavPerturbedCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  def syntheticWavPerturbed(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 4).toInt * 4000
    val channels = 1 + (docId % 2).toInt
    val nFrames = 100 + (docId % 50).toInt
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    var i = 0
    while (i < pcm.length) {
      pcm(i) = (((docId * 31 + i * 7) & 0xff) ^ 0x08).toByte; i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Base-image fixture + a deterministically PERTURBED variant
    * (per-pixel RGB XOR 0x0f0f0f — channel-local, so the oracle can
    * restate it) for near-dup evidence: a perturbed copy lands within a
    * few Hamming bits of its base, a different base is ~32 bits away.
    */
  def syntheticPngPerturbedFixture(docId: Long): Array[Byte] =
    pngPerturbedCache.computeIfAbsent(((docId % 32) + 32) % 32,
      r => syntheticPngPerturbed(r))

  private val pngPerturbedCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  def syntheticPngPerturbed(docId: Long): Array[Byte] = {
    val base = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(syntheticPng(docId)))
    var y = 0
    while (y < base.getHeight) {
      var x = 0
      while (x < base.getWidth) {
        base.setRGB(x, y, (base.getRGB(x, y) ^ 0x0f0f0f) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(base, "png", baos)
    baos.toByteArray
  }

  def syntheticPngFixture(docId: Long): Array[Byte] =
    pngCache.computeIfAbsent(((docId % 32) + 32) % 32, r => syntheticPng(r))

  private val pngCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 32).toInt
    val h = 16 + ((docId * 7) % 32).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((docId * 2654435761L) + x * 31 + y * 131) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Fixture-cache variant for the oracle/bench harness: the header
    * fields [[decodeAudioMeta]] probes (rate, channels, frames) are
    * functions of `docId % 100` (lcm of the 4/2/50 cycles), so the 100
    * representative WAVs are encoded once per JVM — same rationale as
    * [[syntheticPngFixture]].
    */
  def syntheticWavFixture(docId: Long): Array[Byte] =
    wavCache.computeIfAbsent(((docId % 100) + 100) % 100, r => syntheticWav(r))

  private val wavCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

  /** Deterministic 16-bit PCM WAV fixture: sample rate 8000 + 4000·(id%4),
    * 1 + id%2 channels, 100 + id%50 frames, written through the real
    * `javax.sound` WAVE writer — the encode side for [[decodeAudioMeta]].
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 4).toInt * 4000
    val channels = 1 + (docId % 2).toInt
    val nFrames = 100 + (docId % 50).toInt
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    var i = 0
    while (i < pcm.length) { pcm(i) = ((docId * 31 + i * 7) & 0xff).toByte; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Generic resize plumbing for payloads WITHOUT a JDK codec: the STUB
    * "resampler" deterministically subsamples bytes proportionally to the
    * area ratio. For actual images use [[resizeImages]] — a real decode/
    * scale/re-encode through ImageIO.
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

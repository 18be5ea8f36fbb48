package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Barrier.BarrierOps

/**
 * Multimodal-column handling: image/audio/video payloads carried as
 * opaque `binary` columns with a typed metadata struct alongside —
 * the fourth north-star family (no counterpart in the reference
 * engine, which is purely relational).
 *
 * Everything metadata/bytes-level (length, digests, base64, frame
 * slicing, resize arithmetic) is codegen'd built-ins over
 * `BinaryType` — no UDFs, fully portable to the DuckDB oracle. The
 * codec step needs per-row imperative code behind the batched
 * `mapPartitions` plumbing (the Scala analogue of `mapInPandas`):
 * [[decodeImageFeatures]] is a REAL image decoder over the JDK's
 * own `javax.imageio` (PNG/BMP/GIF/JPEG ship in every JDK — no
 * external codec libraries needed), while [[decodeFeaturesStub]]
 * remains the clearly-marked deterministic placeholder for codecs
 * the JDK does not carry (video/audio — ffmpeg/JNI territory).
 */
object Multimodal {

  /**
   * Deterministic multimodal corpus synthesized from a text table:
   * `payload` = UTF-8 bytes of `textCol` (a stand-in for real media
   * bytes), `media` = struct(format, width, height) derived from the
   * id — so the oracle can reproduce both sides with no shared state.
   *
   * Scale: pure per-row projection, no shuffle; payloads stay opaque
   * binary all the way down (never materialized as strings).
   */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    docs.select(
      id,
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        element_at(
          array(lit("png"), lit("jpeg"), lit("webp")),
          (id % 3 + 1).cast("int")).as("format"),
        (lit(64) * (id % 4 + 1)).cast("int").as("width"),
        (lit(64) * (id % 3 + 1)).cast("int").as("height")).as("media"))
  }

  /** Byte length of a binary payload. */
  def nBytes(payload: Column): Column = length(payload).cast("int")

  /** Lowercase-hex SHA-256 digest of the raw bytes. */
  def sha256Hex(payload: Column): Column = sha2(payload, 256)

  /** Lowercase-hex MD5 digest of the raw bytes. */
  def md5Hex(payload: Column): Column = md5(payload)

  /** RFC-4648 base64 (no line wrapping in Spark ≥3.3 defaults). */
  def b64(payload: Column): Column = base64(payload)

  /** Uppercase hex of the first `n` bytes — a magic-number peek. */
  def hexHead(payload: Column, n: Int): Column =
    hex(payload.substr(lit(1), lit(n)))

  /**
   * Aspect-preserving resize arithmetic on the metadata struct only —
   * the planning half of a resize operator (the pixel half lives
   * behind [[decodeFeaturesStub]]'s codec boundary). Output dims are
   * floor(dim × scale) with scale = maxDim / max(w, h), capped at 1.
   */
  def resizeDims(media: Column, maxDim: Int): Column = {
    val w = media.getField("width").cast("double")
    val h = media.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    struct(
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"))
  }

  /**
   * Frame sampling: slice the payload into fixed-size chunks starting
   * every `stride` bytes — the byte-level shape of video
   * frame-extraction (seek points + bounded reads). One output row
   * per (row, frame).
   *
   * Scale: `sequence` + `posexplode` + `substr` are all codegen'd;
   * the fan-out is bounded by payload size / stride and shuffles
   * nothing. At 100 TB the per-row expansion streams through the
   * scan stage without materializing whole payload copies per frame
   * (each frame is an independent bounded slice).
   */
  def frames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameSize: Int,
      stride: Int): DataFrame = {
    // Empty payloads emit no frames (Spark's sequence(1,0,n) throws;
    // DuckDB's generate_series(1,0,n) is empty — match the latter).
    val positions = when(
      length(col(payloadCol)) > 0,
      sequence(lit(1), length(col(payloadCol)), lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), col(payloadCol), posexplode(positions))
      .select(
        col(idCol),
        col("pos").cast("int").as("frame_idx"),
        col(payloadCol).substr(col("col"), lit(frameSize)).as("frame"))
  }

  /**
   * Codec-boundary STUB: batched feature extraction over payload
   * bytes via typed `mapPartitions` — the Scala analogue of a
   * `mapInPandas` decode UDF. A real deployment would decode the
   * image/audio codec per batch here (javax.imageio / ffmpeg / JNI);
   * this container ships no codec libraries, so the body emits
   * DETERMINISTIC FAKE features (byte-sampled, normalized to [0,1])
   * while keeping every piece of the Spark plumbing real: typed
   * Dataset[(id, bytes)] input, fixed `dim` feature-vector schema,
   * explicit batch shape (`batchSize`-row groups, the unit a codec
   * would process per native call), partition-local execution (no
   * shuffle, no driver collect).
   */
  /**
   * M10: per-payload byte-entropy probe — the "is this blob even
   * media?" triage run before any decode stage: Shannon entropy over
   * the byte histogram separates structured/compressible payloads
   * (text ≈ 4–5 bits/byte, bitmaps lower) from already-compressed or
   * encrypted blobs (≈ 8 bits/byte) and from degenerate fills
   * (≈ 0) — the cheap filter that keeps corrupted and
   * junk-re-encoded media out of a training corpus without decoding
   * anything.
   *
   * Float parity: per-byte terms p·ln(p) round(12) into
   * DECIMAL(38,12) before summing (q190 ln discipline), one fixed
   * IEEE finish dividing by the ln(2) LITERAL (an engine-computed
   * ln(2) can differ in the last ulp); a single-byte payload yields
   * Σ = 0 whose negation is −0.0 — oracle side carries `+ 0.0`.
   *
   * Scale: the byte explode is linear in corpus bytes (the
   * unavoidable cost of an exact histogram — a sampled variant would
   * subsample positions upstream); per-(payload, byte) partial
   * aggregation collapses to ≤ 256 rows per payload before the
   * per-payload window and entropy fold.
   *
   * Output: (idCol, n_bytes, n_distinct, entropy_bits).
   */
  def byteEntropy(
      df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val counts = df
      .where(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol), col(payloadCol).as("__p"),
        explode(sequence(lit(1), length(col(payloadCol)))).as("__pos"))
      .select(col(idCol), expr("hex(substring(__p, __pos, 1))").as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col(idCol))))
    val t = col("__c").cast("double") / col("__n").cast("double")
    counts
      .select(col(idCol), col("__n"),
        round(t * log(t), 12).cast(DecimalType(38, 12)).as("__t"))
      .groupBy(col(idCol))
      .agg(
        max(col("__n")).as("n_bytes"),
        count(lit(1)).as("n_distinct"),
        round(-sum(col("__t")).cast("double") /
          lit(0.6931471805599453), 6).as("entropy_bits"))
  }

  /**
   * M11: container-format sniffing from MAGIC BYTES — the
   * trust-nothing check before routing payloads to decoders:
   * declared metadata lies (mislabeled uploads, re-encodes behind a
   * stale extension, content-type spoofing), while the first bytes
   * of a container cannot. Recognizes PNG (PNG), JPEG
   * (FF D8 FF), WEBP (RIFF....WEBP — the type tag sits at bytes
   * 9–12, AFTER the chunk-size field), and GIF; everything else is
   * "unknown". Pure per-row projection on the payload's first 12
   * bytes — no decode, no shuffle.
   */
  def sniffFormat(payload: Column): Column = {
    val h = hex(substring(payload, 1, 12))
    when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("52494646") &&
        h.substr(17, 8) === "57454250", "webp")
      .when(h.startsWith("474946"), "gif")
      .otherwise("unknown")
  }

  /**
   * M11 audit surface: declared vs sniffed format per payload — the
   * pre-decode mislabel report. `format_ok = false` rows are the
   * decode-stage poison a release gate quarantines first.
   */
  def formatAudit(
      df: DataFrame, idCol: String, payloadCol: String,
      declaredCol: Column): DataFrame =
    df.select(
      col(idCol), declaredCol.as("declared"),
      sniffFormat(col(payloadCol)).as("sniffed"))
      .withColumn("format_ok", col("sniffed") === col("declared"))

  def decodeFeaturesStub(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // >>> codec call site: decode(batch) would go here <<<
          batch.map { case (id, bytes) =>
            val feats = Array.tabulate(dim) { j =>
              if (bytes.isEmpty) 0.0f
              else (bytes(j * 31 % bytes.length) & 0xff) / 255.0f
            }
            (id, feats)
          }
        }
      }
      .toDF(idCol, "features")
  }

  /**
   * M4 (codec step, REAL): batched image decode + feature extraction
   * over `javax.imageio` — the JDK's own codec plugins (PNG, BMP,
   * GIF, JPEG, WBMP ship in every JDK, no external libraries), run
   * inside the same typed batched-`mapPartitions` plumbing as
   * [[decodeFeaturesStub]]: partition-local, no shuffle, no driver
   * collect, `batchSize`-row groups (the unit a native codec would
   * process per call; ImageIO itself is per-image, so the grouping
   * here is the batch SHAPE contract the plumbing guarantees any
   * future codec).
   *
   * Features per payload: `decode_ok`, pixel `width`/`height`, and
   * per-channel means `mean_r/mean_g/mean_b` — each mean one IEEE
   * division of an EXACT integer channel sum by the exact pixel
   * count, so results are engine-reproducible wherever the expected
   * pixels are arithmetically derivable (the [[syntheticBmp]] gate
   * fixture). Undecodable payloads (truncated files, non-image
   * bytes, empty/NULL) emit `decode_ok = false` with NULL features —
   * the triage column a curation pipeline filters on before the
   * expensive downstream stages.
   *
   * Scale: decode cost is linear in payload bytes and embarrassingly
   * partition-parallel; nothing leaves the executor but the fixed
   * 7-column feature row. Pixel sums accumulate in Long — exact up
   * to 2⁶³/255 ≈ 3.6e16 pixels per image, far past any real payload.
   */
  def decodeImageFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO's default ImageInputStream is DISK-cache backed — a
        // temp file per decode, an IO dependency (and contention
        // hazard) that buys nothing for in-memory byte arrays.
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try {
                if (bytes == null || bytes.isEmpty) null
                else javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
              } catch { case scala.util.control.NonFatal(_) => null }
            if (img == null)
              (id, false, Option.empty[Int], Option.empty[Int],
                Option.empty[Double], Option.empty[Double],
                Option.empty[Double])
            else {
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff
                  sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              (id, true, Some(w), Some(h),
                Some(sr.toDouble / n), Some(sg.toDouble / n),
                Some(sb.toDouble / n))
            }
          }
        }
      }
      .toDF(idCol, "decode_ok", "width", "height",
        "mean_r", "mean_g", "mean_b")
  }

  /**
   * Deterministic 24-bit BMP fixture: pixel (x, y) (y from the top)
   * has channels
   *   r = (seed·7 + 3x + 5y) mod 256,
   *   g = (seed·11 + 2x + 7y) mod 256,
   *   b = (seed·13 + x + 11y) mod 256
   * — pure integer arithmetic, so a DuckDB oracle reproduces the
   * EXPECTED decode features (width/height/channel means) without
   * decoding anything: the gate proves the [[decodeImageFeatures]]
   * codec path recovers exactly the pixels the generator wrote.
   * BMP because its 24-bit uncompressed form is a pixel-exact
   * container with a 54-byte header and no entropy coding — the
   * bytes are fully specified by this formula. `w·3` must be
   * 4-byte-aligned (BMP row padding is deliberately out of scope).
   */
  def syntheticBmp(seed: Long, w: Int, h: Int): Array[Byte] =
    bmpFrom(w, h) { (x, y) =>
      (Math.floorMod(seed * 7 + 3L * x + 5L * y, 256).toInt,
        Math.floorMod(seed * 11 + 2L * x + 7L * y, 256).toInt,
        Math.floorMod(seed * 13 + x + 11L * y, 256).toInt)
    }

  /** Perceptual-hash fixture: [[syntheticBmp]]'s formula family with
    * SEED-DEPENDENT gradients — (1 + seed mod 11) / (2 + seed mod 13)
    * style slopes per channel. The plain fixture's constant slopes
    * make aHash a function of seed mod 256 alone (a constant luma
    * shift cancels out of the global-mean comparison), collapsing any
    * large corpus into a few hundred identical-hash families; the
    * seed-mixed slopes plus a (1 + seed mod 7)·x·y cross term give ~7·11·13·256-scale hash diversity (a pure gradient's constant luma offsets cancel out of the global-mean bits; the cross term is what breaks within-slope-class clustering), so
    * band buckets stay small and the near-dup cap stays INACTIVE at
    * gate scales. Pure integer arithmetic — oracle-replayable. */
  def syntheticBmpTextured(seed: Long, w: Int, h: Int): Array[Byte] =
    syntheticBmpTexturedVariant(seed, w, h, 0, 0, 0)

  /** [[syntheticBmpTextured]] with a deterministic LOCAL
    * perturbation: pixels with x < regionW and y < regionH get
    * `delta` added to every channel (mod 256 — wraparound is
    * deliberate; the oracle replays it). The near-duplicate twin
    * generator: same image almost everywhere, one corner touched. */
  def syntheticBmpTexturedVariant(
      seed: Long, w: Int, h: Int, delta: Int,
      regionW: Int, regionH: Int): Array[Byte] = {
    val s11 = Math.floorMod(seed, 11)
    val s13 = Math.floorMod(seed, 13)
    val s7 = Math.floorMod(seed, 7)
    bmpFrom(w, h) { (x, y) =>
      val d = if (x < regionW && y < regionH) delta.toLong else 0L
      val xy = x.toLong * y
      (Math.floorMod(
          seed * 7 + (1 + s11) * x + (2 + s13) * y + (1 + s7) * xy + d,
          256).toInt,
        Math.floorMod(
          seed * 11 + (3 + s13) * x + (1 + s11) * y + (2 + s7) * xy + d,
          256).toInt,
        Math.floorMod(
          seed * 13 + (2 + s11) * x + (3 + s13) * y + (3 + s7) * xy + d,
          256).toInt)
    }
  }

  /** Shared 24-bit BMP writer: 54-byte header + bottom-up b,g,r rows
    * from a pixel function (x, y from the top → (r, g, b) in
    * [0, 255]). The byte layout the two fixture generators and any
    * test-local golden image share. */
  private[graft] def bmpFrom(w: Int, h: Int)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w >= 1 && h >= 1, s"need positive dims, got ${w}x$h")
    require((w * 3) % 4 == 0,
      s"w*3 must be 4-byte aligned (w multiple of 4), got w=$w")
    val dataSize = w * 3 * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // bottom-up storage; row == y from the top
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, row)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      row -= 1
    }
    buf.array()
  }

  /** `(idCol, payload)` frame carrying one [[syntheticBmp]] per id —
    * the distributed fixture feeding the codec gate. Per-row
    * generation, no shuffle. */
  def withSyntheticBmp(
      df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticBmp(id, w, h))))
      .toDF(idCol, "payload")
  }

  /**
   * M12 (codec step, REAL — audio): batched WAV/PCM decode + feature
   * extraction over `javax.sound.sampled` — the JDK's own audio
   * codec (WAV/AIFF/AU ship in every JDK, no ffmpeg needed), inside
   * the same typed batched-`mapPartitions` plumbing as
   * [[decodeImageFeatures]]: partition-local, no shuffle, no driver
   * collect.
   *
   * Features per payload: `decode_ok`, `sample_rate`, `n_channels`,
   * `bits`, `n_samples` (interleaved samples across channels), the
   * integer `peak` (max |sample|), and `mean_abs` — the exact
   * integer Σ|sample| divided by the exact sample count, one IEEE
   * division, engine-reproducible wherever the expected samples are
   * arithmetically derivable (the [[syntheticWav]] gate fixture).
   * Only 16-bit PCM payloads are decoded (the training-corpus
   * lingua franca); other widths and undecodable bytes triage as
   * `decode_ok = false` with NULL features — the pre-transcode
   * filter column. |sample| sums in Long — exact to 2⁶³/32768 ≈
   * 2.8e14 samples per payload, far past any real clip.
   */
  def decodeAudioFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val none = (id, false, Option.empty[Int], Option.empty[Int],
              Option.empty[Int], Option.empty[Long], Option.empty[Int],
              Option.empty[Double])
            try {
              if (bytes == null || bytes.isEmpty) none
              else {
                val ais = javax.sound.sampled.AudioSystem
                  .getAudioInputStream(
                    new java.io.ByteArrayInputStream(bytes))
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 ||
                  fmt.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                  none
                else {
                  val data = ais.readAllBytes()
                  // honor the container's byte order: WAV is
                  // little-endian, AIFF/AU big-endian — assembling a
                  // fixed order would mark byte-swapped garbage
                  // decode_ok=true (round-11 review catch)
                  val big = fmt.isBigEndian
                  val n = data.length / 2
                  var sumAbs = 0L
                  var peak = 0
                  var i = 0
                  while (i < n) {
                    val b0 = data(2 * i)
                    val b1 = data(2 * i + 1)
                    val s =
                      if (big) (b0.toInt << 8) | (b1 & 0xff)
                      else (b1.toInt << 8) | (b0 & 0xff)
                    val a = math.abs(s)
                    sumAbs += a
                    if (a > peak) peak = a
                    i += 1
                  }
                  (id, true, Some(fmt.getSampleRate.toInt),
                    Some(fmt.getChannels), Some(16), Some(n.toLong),
                    Some(peak),
                    if (n == 0) None else Some(sumAbs.toDouble / n))
                }
              }
            } catch { case scala.util.control.NonFatal(_) => none }
          }
        }
      }
      .toDF(idCol, "decode_ok", "sample_rate", "n_channels", "bits",
        "n_samples", "peak", "mean_abs")
  }

  /**
   * Deterministic 16-bit PCM mono WAV fixture: sample i (0-based) is
   *   s_i = ((seed·31 + 7·i) mod 4001) − 2000
   * — pure integer arithmetic in [−2000, 2000], so a DuckDB oracle
   * reproduces the EXPECTED decode features (count, peak, mean |s|)
   * without decoding anything; the gate proves
   * [[decodeAudioFeatures]] recovers exactly the samples the
   * generator wrote through the JDK's WAV parser (44-byte canonical
   * RIFF/fmt/data header, little-endian payload).
   */
  def syntheticWav(
      seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    require(nSamples >= 1 && sampleRate >= 1,
      s"need positive dims, got n=$nSamples sr=$sampleRate")
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(
        (Math.floorMod(seed * 31 + 7L * i, 4001L) - 2000L).toShort)
      i += 1
    }
    buf.array()
  }

  /** `(idCol, payload)` frame carrying one [[syntheticWav]] per id. */
  def withSyntheticWav(
      df: DataFrame, idCol: String, nSamples: Int,
      sampleRate: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticWav(id, nSamples, sampleRate))))
      .toDF(idCol, "payload")
  }

  /**
   * M15 support: the fixed-point DFT basis table — for t ∈ [0, n),
   * k ∈ `bins`: c = round(cos(2πtk/n)·10⁴), s = round(sin(2πtk/n)·
   * 10⁴). Driver-generated ONCE and handed to BOTH engines (the
   * [[phashDctTable]] discipline): with the trig factors as shared
   * integer literals, the DFT sums are EXACT long arithmetic with
   * zero cross-engine cos/sin ulp hazard.
   */
  private[graft] def dftTable(
      n: Int, bins: Seq[Int]): Seq[(Int, Int, Long, Long)] =
    for (t <- 0 until n; k <- bins) yield {
      val ang = 2.0 * math.Pi * t * k / n
      (t, k, Math.round(math.cos(ang) * 10000.0),
        Math.round(math.sin(ang) * 10000.0))
    }

  /**
   * M15 (r13): audio spectral probe — exact-integer DFT power at
   * declared frequency bins over the DECODED PCM samples, the
   * CONTENT fingerprint the amplitude features
   * ([[decodeAudioFeatures]]'s peak / mean|s|) cannot be: two
   * different tones at equal loudness are indistinguishable by
   * amplitude stats but separate cleanly in the spectrum — this is
   * the audio analogue of [[imagePHash]]'s DCT signature, and the
   * dedup/quality primitive an audio curation pass keys on (hum
   * detection at 50/60 Hz bins, silence vs broadband noise,
   * near-dup tone matching).
   *
   * ALL-INTEGER pipeline (the [[phashDctTable]] trick on the time
   * axis): per declared bin k over the first `n` samples,
   *   re_k = Σ_t s_t·c(t,k),  im_k = −Σ_t s_t·s(t,k)
   * with c/s the shared [[dftTable]] literals — order-free exact
   * long sums (|s_t| ≤ 32767 ⇒ |re| ≤ 32767·10⁴·n, n = 64 →
   * 2.1e13); power_k = re² + im² computed in BigInt and emitted as
   * a STRING (the q189 rule — it reaches ~1e27), re/im as exact
   * longs.
   *
   * Decode inherits [[decodeAudioFeatures]]'s contract (JDK
   * javax.sound, 16-bit PCM, container byte order honored). Clips
   * SHORTER than `n` samples triage as decode_ok = false with NULL
   * spectra (the fixed-size basis table is what keeps both engines
   * exact — the [[imagePHash]] sub-grid rule), alongside
   * undecodable payloads; longer clips probe their first n samples
   * (documented — [[audioSpectralSweep]] is the windowed sweep over
   * the rest; byte-level [[frames]] cannot feed the decoder since a
   * WAV slice loses its header).
   *
   * Output: (idCol, decode_ok, bin, re, im, power), one row per
   * declared bin (NULL spectra on triage rows keep the id visible),
   * ordered by (id, bin) at the call site.
   */
  def audioSpectralProbe(
      df: DataFrame, idCol: String, payloadCol: String,
      n: Int, bins: Seq[Int], batchSize: Int = 64): DataFrame = {
    require(n >= 2 && n <= 65536, s"n must be in [2, 65536], got $n")
    require(bins.nonEmpty, "need at least one bin")
    require(bins.forall(k => k >= 0 && k < n),
      s"bins must lie in [0, n=$n), got $bins")
    require(bins.distinct.size == bins.size, "bins must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val sortedBins = bins.sorted
    val tab = dftTable(n, sortedBins)
    val kIdx = sortedBins.zipWithIndex.toMap
    val cT = Array.ofDim[Long](n, sortedBins.size)
    val sT = Array.ofDim[Long](n, sortedBins.size)
    tab.foreach { case (t, k, c, s) =>
      cT(t)(kIdx(k)) = c; sT(t)(kIdx(k)) = s
    }
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            // Mono only (r13 ADVICE): on multi-channel PCM the raw
            // stream interleaves per-channel values, so "first n
            // samples" would DFT a channel-interleaved signal
            // (frequencies halved/mixed) — the shared decoder
            // triages that like non-16-bit PCM.
            val samples = decodePcm16Mono(bytes, minSamples = n)
            if (samples == null)
              sortedBins.map(k => (id, false, k, Option.empty[Long],
                Option.empty[Long], Option.empty[String]))
            else {
              val re = new Array[Long](sortedBins.size)
              val im = new Array[Long](sortedBins.size)
              var t = 0
              while (t < n) {
                val x = samples(t).toLong
                var j = 0
                while (j < sortedBins.size) {
                  re(j) += x * cT(t)(j)
                  im(j) -= x * sT(t)(j)
                  j += 1
                }
                t += 1
              }
              sortedBins.zipWithIndex.map { case (k, j) =>
                val p = BigInt(re(j)) * BigInt(re(j)) +
                  BigInt(im(j)) * BigInt(im(j))
                (id, true, k, Some(re(j)), Some(im(j)),
                  Some(p.toString))
              }
            }
          }
        }
      }
      .toDF(idCol, "decode_ok", "bin", "re", "im", "power")
  }

  /** Shared decode for the spectral operators: 16-bit SIGNED mono
    * PCM through javax.sound with the container's byte order
    * honored; anything else (multi-channel, non-16-bit, undecodable,
    * fewer than `minSamples` samples) returns null = triage. Exactly
    * [[audioSpectralProbe]]'s contract, factored so the windowed
    * sweep decodes THE SAME bytes to THE SAME integers. */
  private def decodePcm16Mono(
      bytes: Array[Byte], minSamples: Int): Array[Int] =
    try {
      if (bytes == null || bytes.isEmpty) null
      else {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getChannels != 1 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
        else {
          val data = ais.readAllBytes()
          val big = fmt.isBigEndian
          val total = data.length / 2
          if (total < minSamples) null
          else Array.tabulate(total) { i =>
            val b0 = data(2 * i)
            val b1 = data(2 * i + 1)
            if (big) (b0.toInt << 8) | (b1 & 0xff)
            else (b1.toInt << 8) | (b0 & 0xff)
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /**
   * M16 (r14): windowed audio spectral sweep — [[audioSpectralProbe]]
   * over EVERY length-`n` window at stride `hop`, the STFT-shaped
   * readout that sees what the first-n probe structurally cannot: a
   * clip whose content CHANGES (tone switch, hum that starts
   * mid-clip, speech→silence) has per-window spectra that separate
   * where the whole-clip or first-n numbers blur. This closes the
   * r13 scaladoc promise on the probe — the byte-frame operator
   * [[frames]] cannot feed the decoder (a WAV slice loses its
   * header), so the sweep decodes ONCE per clip and windows over the
   * SAMPLE axis.
   *
   * Same ALL-INTEGER discipline as the probe: the [[dftTable]]
   * fixed-point basis literals are shared with the oracle, per-window
   * re/im are exact long sums (the window count doesn't change the
   * q319 magnitude bound), power is BigInt → STRING (q189 rule).
   * Decode inherits [[audioSpectralProbe]]'s triage contract via the
   * shared decoder; clips shorter than `n` triage (one NULL-spectrum
   * row per bin, window 0).
   *
   * `maxWindows` bounds per-clip fan-out (a 10-minute clip at
   * hop = n/2 is ~28k windows — cap it and state the regime in the
   * gate comment). Output rows per decoded clip:
   * min(maxWindows, (samples − n)/hop + 1) × bins — bounded,
   * shuffle-free, one decode pass.
   *
   * Output: (idCol, decode_ok, win_idx, start_sample, bin, re, im,
   * power), ordered by (id, win_idx, bin) at the call site
   * ("window" is a reserved word in DuckDB — win_idx keeps the
   * oracle un-quoted).
   */
  def audioSpectralSweep(
      df: DataFrame, idCol: String, payloadCol: String,
      n: Int, hop: Int, bins: Seq[Int], maxWindows: Int,
      batchSize: Int = 64): DataFrame = {
    require(n >= 2 && n <= 65536, s"n must be in [2, 65536], got $n")
    require(hop >= 1, s"hop must be >= 1, got $hop")
    require(maxWindows >= 1, s"maxWindows must be >= 1, got $maxWindows")
    require(bins.nonEmpty, "need at least one bin")
    require(bins.forall(k => k >= 0 && k < n),
      s"bins must lie in [0, n=$n), got $bins")
    require(bins.distinct.size == bins.size, "bins must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val sortedBins = bins.sorted
    val tab = dftTable(n, sortedBins)
    val kIdx = sortedBins.zipWithIndex.toMap
    val cT = Array.ofDim[Long](n, sortedBins.size)
    val sT = Array.ofDim[Long](n, sortedBins.size)
    tab.foreach { case (t, k, c, s) =>
      cT(t)(kIdx(k)) = c; sT(t)(kIdx(k)) = s
    }
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val samples = decodePcm16Mono(bytes, minSamples = n)
            if (samples == null)
              sortedBins.map(k => (id, false, 0, Option.empty[Long],
                k, Option.empty[Long], Option.empty[Long],
                Option.empty[String]))
            else {
              val nWin = math.min(
                maxWindows.toLong,
                ((samples.length - n) / hop + 1).toLong).toInt
              (0 until nWin).flatMap { w =>
                val start = w * hop
                val re = new Array[Long](sortedBins.size)
                val im = new Array[Long](sortedBins.size)
                var t = 0
                while (t < n) {
                  val x = samples(start + t).toLong
                  var j = 0
                  while (j < sortedBins.size) {
                    re(j) += x * cT(t)(j)
                    im(j) -= x * sT(t)(j)
                    j += 1
                  }
                  t += 1
                }
                sortedBins.zipWithIndex.map { case (k, j) =>
                  val p = BigInt(re(j)) * BigInt(re(j)) +
                    BigInt(im(j)) * BigInt(im(j))
                  (id, true, w, Some(start.toLong), k,
                    Some(re(j)), Some(im(j)), Some(p.toString))
                }
              }
            }
          }
        }
      }
      .toDF(idCol, "decode_ok", "win_idx", "start_sample", "bin",
        "re", "im", "power")
  }

  /** M19 support: triangular mel filterbank weights as fixed-point
    * literals — mel(f) = 2595·log10(1 + f/700), `nMels` triangles
    * with mel-equidistant centers over [0, sampleRate/2], weight at
    * DFT bin k (center frequency k·sr/n) floored to the 1e4 grid,
    * zero-weight cells dropped. Computed driver-side ONCE and handed
    * to BOTH engines as literals (the q269/dftTable pattern) — the
    * mel/log10/pow floats never cross an engine boundary. */
  private[graft] def melWeights(
      n: Int, nMels: Int, sampleRate: Int): Seq[(Int, Int, Long)] = {
    val nBins = n / 2 + 1
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    val mMax = mel(sampleRate / 2.0)
    val fc = (0 to nMels + 1).map(i =>
      700.0 * (math.pow(10.0, i * mMax / (nMels + 1) / 2595.0) - 1.0))
    for {
      m <- 1 to nMels
      k <- 0 until nBins
      f = k.toDouble * sampleRate / n
      w = if (f <= fc(m - 1) || f >= fc(m + 1)) 0.0
        else if (f <= fc(m)) (f - fc(m - 1)) / (fc(m) - fc(m - 1))
        else (fc(m + 1) - f) / (fc(m + 1) - fc(m))
      wq = math.floor(w * 10000.0).toLong
      if wq > 0L
    } yield (m - 1, k, wq)
  }

  /**
   * M19 (r15): mel-filterbank energies — the audio feature
   * ASR/audio-dedup pipelines actually key on: raw DFT bins weight
   * every frequency equally, but perception (and every practical
   * audio fingerprint from Shazam-style landmarks to MFCC front
   * ends) is log-frequency — triangular filters mel-spaced over
   * [0, sr/2] pool the per-window power spectrum into `nMels`
   * bands. COMPOSED from existing ops (the preference order's first
   * rung): one [[audioSpectralSweep]] pass over ALL bins 0..n/2
   * (one decode per clip, exact integer re/im), then one
   * partial-aggregated weighted sum against the broadcast
   * [[melWeights]] literal table — band energy =
   * Σ_k w[m,k]·power[k] in exact DECIMAL(38,0) (power ≤ ~4.4e26 at
   * n = 64, × 1e4 weight × 33 bins ≈ 1.5e32 — headroom documented),
   * emitted as STRING digits (the q189 >2⁶³ rule).
   *
   * Triage inherits the sweep's contract: an undecodable/short clip
   * carries NULL power, so every mel band of its window-0 row reads
   * NULL energy — visible, never dropped.
   *
   * Scale: decode cost identical to the sweep (bins add integer
   * MACs, not decodes); the mel pooling is one broadcast join + one
   * partial-agg exchange keyed by (clip, window, mel) — bounded
   * fan-in of n/2+1 rows per output row.
   *
   * Output: (idCol, decode_ok, win_idx, mel, energy) — order at the
   * call site.
   */
  def melEnergies(
      df: DataFrame, idCol: String, payloadCol: String,
      n: Int, hop: Int, nMels: Int, sampleRate: Int,
      maxWindows: Int): DataFrame = {
    require(nMels >= 2 && nMels <= 128,
      s"nMels must be in [2, 128], got $nMels")
    val spark = df.sparkSession
    import spark.implicits._
    val w = melWeights(n, nMels, sampleRate)
    require(
      (0 until nMels).forall(m => w.exists(_._1 == m)),
      s"mel filter with no positive-weight bin at n=$n, " +
        s"nMels=$nMels, sr=$sampleRate — widen bands or raise n")
    // r16 optimization (guide §1.2 step 2 / §2.3): the r15 shape
    // COMPOSED this over [[audioSpectralSweep]] at ALL bins 0..n/2 —
    // per window it materialized n/2+1 BigInt powers as STRING rows
    // (2M rows at sf0.1), shuffled them through a broadcast join +
    // DECIMAL(38,0) aggregate, and parsed every digit string back to
    // decimal. The pooling is now FUSED into the decode pass: the
    // same [[dftTable]] basis MACs, the same exact integer
    // power = re²+im² per bin (BigInteger — the q189 >2⁶³ bound
    // unchanged), and the same Σ_k w[m,k]·power[k] per band, summed
    // in BigInteger instead of DECIMAL(38,0) — bit-identical digit
    // strings, zero post-decode shuffle (measured 7.0 s → the r16
    // number at sf0.1; oracle untouched). Triage contract unchanged:
    // an undecodable/short clip emits one NULL-energy window-0 row
    // per mel band.
    val sortedBins = (0 to n / 2).toSeq
    val tab = dftTable(n, sortedBins)
    val nBins = sortedBins.size
    val cT = Array.ofDim[Long](n, nBins)
    val sT = Array.ofDim[Long](n, nBins)
    tab.foreach { case (t, k, c, s) => cT(t)(k) = c; sT(t)(k) = s }
    // per mel band: the (bin, weight) pairs with positive weight
    val wByMel: Array[Array[(Int, Long)]] =
      (0 until nMels).map(m =>
        w.filter(_._1 == m).map { case (_, k, wq) => (k, wq) }.toArray)
        .toArray
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val samples = decodePcm16Mono(bytes, minSamples = n)
          if (samples == null)
            (0 until nMels).map(m =>
              (id, false, 0, m, Option.empty[String]))
          else {
            val nWin = math.min(
              maxWindows.toLong,
              ((samples.length - n) / hop + 1).toLong).toInt
            (0 until nWin).flatMap { wi =>
              val start = wi * hop
              val re = new Array[Long](nBins)
              val im = new Array[Long](nBins)
              var t = 0
              while (t < n) {
                val x = samples(start + t).toLong
                val cRow = cT(t)
                val sRow = sT(t)
                var j = 0
                while (j < nBins) {
                  re(j) += x * cRow(j)
                  im(j) -= x * sRow(j)
                  j += 1
                }
                t += 1
              }
              val powers = Array.tabulate(nBins) { j =>
                val r = java.math.BigInteger.valueOf(re(j))
                val i = java.math.BigInteger.valueOf(im(j))
                r.multiply(r).add(i.multiply(i))
              }
              (0 until nMels).map { m =>
                var acc = java.math.BigInteger.ZERO
                val bw = wByMel(m)
                var b = 0
                while (b < bw.length) {
                  acc = acc.add(powers(bw(b)._1)
                    .multiply(java.math.BigInteger.valueOf(bw(b)._2)))
                  b += 1
                }
                (id, true, wi, m, Some(acc.toString))
              }
            }
          }
        }
      }
      .toDF(idCol, "decode_ok", "win_idx", "mel", "energy")
  }

  /** M20 support: milli-log10 of a 3-digit mantissa — ⌊log10⌋ made
    * exact-replayable: the table maps every m ∈ [100, 999] to
    * round(1000·log10(m)) ∈ [2000, 3000), computed driver-side ONCE
    * and handed to BOTH engines as literals (the melWeights /
    * dftTable pattern) — the transcendental log never crosses an
    * engine boundary; the bounded quantized domain (900 rows) is
    * what makes a log table possible at all. */
  private[graft] def milliLog10Table: Seq[(Int, Long)] =
    (100 to 999).map(m =>
      (m, math.round(1000.0 * math.log10(m.toDouble))))

  /** M20 support: DCT-II cosine literals for the cepstral stage —
    * c[j][m] = round(10⁴·cos(π·j·(2m+1)/(2·nMels))), j ∈
    * [0, nCoefs), m ∈ [0, nMels) — the [[phashDctTable]] fixed-point
    * discipline (no orthonormalization factors; a fingerprint keys
    * on relative shape, and the scale is one public constant). */
  private[graft] def mfccDctTable(
      nCoefs: Int, nMels: Int): Seq[(Int, Int, Long)] =
    for {
      j <- 0 until nCoefs
      m <- 0 until nMels
    } yield (j, m, math.round(
      10000.0 * math.cos(math.Pi * j * (2 * m + 1) / (2.0 * nMels))))

  /**
   * M20 (r16): MFCC — the log + DCT-II cepstral stage over [[
   * melEnergies]], completing the audio-feature ladder M15 (DFT
   * probe) → M16 (windowed sweep) → M19 (mel pooling) → this (the
   * canonical feature ASR front ends and audio fingerprints ship):
   * mel band energies span orders of magnitude, so perception-like
   * features take the LOG first; correlated adjacent bands then
   * decorrelate through a DCT-II, and the first `nCoefs`
   * coefficients are the clip's spectral-envelope signature.
   *
   * EXACT-REPLAY ARITHMETIC (both transcendental stages ride
   * driver-literal tables over bounded quantized domains — the
   * unigram-LM micro-log-prob discipline): the log quantizes each
   * energy (an exact DECIMAL(38,0) digit string) to (digit count d,
   * 3-digit truncated mantissa m) — pure string ops both engines
   * share — and reads log-energy L = 1000·(d−3) + [[
   * milliLog10Table]](m) in EXACT milli-log10 units (mantissa
   * truncation ⇒ L is the floor of the true milli-log within one
   * table step; zero energy defines L = −3000, one grid decade
   * below E = 1, documented). The DCT-II is then exact long MACs
   * against [[mfccDctTable]]: mfcc[j] = Σ_m L_m·c[j][m] — |L| ≤
   * ~3.2·10⁴ × 10⁴ × 128 mels ≈ 4·10¹⁰, far inside Long.
   *
   * Triage inherits M19's contract: NULL energies (undecodable /
   * short clips) make every coefficient of that window NULL —
   * visible, never dropped.
   *
   * Scale: the sweep+pool cost is M19's (one decode per clip); the
   * cepstral stage adds two bounded broadcast joins (900-row log
   * table, nCoefs·nMels cosine table) and one partial-aggregated
   * groupBy keyed (clip, window, coef) — fan-in nMels per output
   * row, shuffle bounded by windows × nCoefs, never samples.
   *
   * Output: (idCol, decode_ok, win_idx, coef, mfcc) — order at the
   * call site.
   */
  def mfcc(
      df: DataFrame, idCol: String, payloadCol: String,
      n: Int, hop: Int, nMels: Int, sampleRate: Int,
      maxWindows: Int, nCoefs: Int = 13): DataFrame = {
    require(nCoefs >= 1 && nCoefs <= nMels,
      s"nCoefs must be in [1, nMels=$nMels], got $nCoefs")
    val spark = df.sparkSession
    val me = melEnergies(df, idCol, payloadCol, n, hop, nMels,
      sampleRate, maxWindows)
    val logT = broadcast(
      spark.createDataFrame(milliLog10Table).toDF("__m3", "__lv"))
    val dctT = broadcast(
      spark.createDataFrame(mfccDctTable(nCoefs, nMels))
        .toDF("__coef", "mel", "__c"))
    me
      .withColumn("__m3", rpad(col("energy"), 3, "0").cast("int"))
      .join(logT, Seq("__m3"), "left")
      .withColumn("__lq",
        when(col("energy").isNull, lit(null).cast("long"))
          .when(col("energy") === "0", lit(-3000L))
          .otherwise(lit(1000L) * (length(col("energy")) - lit(3)) +
            col("__lv")))
      .join(dctT, Seq("mel"))
      .groupBy(col(idCol), col("decode_ok"), col("win_idx"),
        col("__coef").as("coef"))
      .agg(sum(col("__lq") * col("__c")).as("mfcc"))
  }

  /**
   * M16 fixture: a two-tone WAV whose content CHANGES mid-clip —
   * samples 0 until nSamples/2 carry the fixed-point cosine of
   * `binFirst` (cycle length `n`), the rest carry `binSecond`, plus
   * a small deterministic per-sample perturbation so clips aren't
   * bit-identical across seeds. Tone values come from the SAME
   * [[dftTable]] literals the analysis uses, so both engines
   * regenerate the fixture exactly: s_i = c(i mod n, bin(i)) +
   * ((seed·31 + 7i) mod 41 − 20), |s| ≤ 10020 < 2¹⁵.
   */
  def syntheticToneWav(
      seed: Long, nSamples: Int, sampleRate: Int,
      n: Int, binFirst: Int, binSecond: Int): Array[Byte] = {
    require(nSamples >= 1 && sampleRate >= 1,
      s"need positive dims, got n=$nSamples sr=$sampleRate")
    // r16: flat array lookup — the (t, bin)-tuple-keyed Map cost one
    // boxed tuple allocation + hash per SAMPLE (measured ~0.8 s per
    // fixture pass at sf0.1 across q329/q344/q350); values identical.
    val toneFirst = new Array[Long](n)
    val toneSecond = new Array[Long](n)
    dftTable(n, Seq(binFirst, binSecond).distinct).foreach {
      case (t, k, c, _) =>
        if (k == binFirst) toneFirst(t) = c
        if (k == binSecond) toneSecond(t) = c
    }
    val half = nSamples / 2
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val base = if (i < half) toneFirst(i % n) else toneSecond(i % n)
      val s = base + (Math.floorMod(seed * 31 + 7L * i, 41L) - 20L)
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** `(idCol, payload)` frame carrying one [[syntheticToneWav]]
    * per id. */
  def withSyntheticToneWav(
      df: DataFrame, idCol: String, nSamples: Int, sampleRate: Int,
      n: Int, binFirst: Int, binSecond: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id,
        syntheticToneWav(id, nSamples, sampleRate, n, binFirst,
          binSecond))))
      .toDF(idCol, "payload")
  }

  /**
   * M17 (r14): video-shaped scene-change detection — the composition
   * [[frames]] was built for, finally feeding a real decoder: a
   * fixed-frame-size container (the honest stand-in for video in a
   * container with no codecs — each frame is a self-contained BMP,
   * so the byte slice [[frames]] emits IS decodable, unlike the WAV
   * case where a slice loses its header) is sliced into frames,
   * every complete frame decodes ONCE and fingerprints with the M14
   * DCT pHash, and consecutive frames compare by hamming — a
   * boundary (hamming ≥ threshold) is a scene change, the
   * frame-dedup/keyframe-selection primitive a video curation pass
   * keys on (static scenes collapse to one keyframe; cuts survive).
   *
   * Per clip: one [[frames]] slice (codegen'd substr fan-out,
   * shuffle-free), one decode+pHash pass per COMPLETE frame (partial
   * tails drop — a truncated trailing frame is not a scene), one
   * per-clip window over frame_idx for the lag hamming (bounded by
   * frames-per-clip, never corpus-wide). The hamming is a 63-position
   * exact character fold (HOF — 63 elements, not a hot kernel);
   * everything is integer/string, zero float anywhere.
   *
   * Output: (idCol, frame_idx, decode_ok, phash, hamming,
   * scene_change) — hamming NULL on the first frame and around
   * undecodable frames (scene_change NULL there too: unknown is not
   * false); frame 0 is scene_change = true by convention (a clip
   * starts a scene).
   */
  def videoSceneChanges(
      df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, grid: Int = 16, threshold: Int = 10): DataFrame = {
    require(frameBytes >= 62,
      s"frameBytes must cover at least a BMP header, got $frameBytes")
    require(grid >= 8 && grid <= 64, s"grid must be in [8, 64], got $grid")
    require(threshold >= 1 && threshold <= 63,
      s"threshold must be in [1, 63], got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val n = grid
    val c = Array.ofDim[Long](n, 8)
    phashDctTable(n).foreach { case (i, u, v) => c(i)(u) = v }
    val fr = frames(df, idCol, payloadCol, frameBytes, frameBytes)
      .where(length(col("frame")) === frameBytes)
    val hashed = fr
      .select(col(idCol).cast("long"), col("frame_idx"), col("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(64).flatMap { batch =>
          batch.map { case (id, fi, bytes) =>
            val img =
              try {
                javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
              } catch { case scala.util.control.NonFatal(_) => null }
            if (img == null || img.getWidth < n || img.getHeight < n)
              (id, fi, false, Option.empty[String])
            else (id, fi, true, Some(phashOfImage(img, n, c)))
          }
        }
      }
      .toDF(idCol, "frame_idx", "decode_ok", "phash")
    sceneChangeWindow(hashed, idCol, threshold)
  }

  /** Shared scene-change finish for the per-frame pHash table
    * (M17 [[videoSceneChanges]] and M18 [[gifSceneChanges]]): per-clip
    * lag window over frame_idx, 63-position exact hamming, boundary =
    * hamming ≥ threshold (NULL around undecodable frames — unknown is
    * not false); frame 0 is scene_change = true by convention. */
  private def sceneChangeWindow(
      hashed: DataFrame, idCol: String, threshold: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    val prev = lag(col("phash"), 1).over(w)
    val prevIdx = lag(col("frame_idx"), 1).over(w)
    val ham = when(col("phash").isNotNull && prev.isNotNull,
      aggregate(sequence(lit(1), lit(63)), lit(0),
        (acc, i) => acc + when(
          col("phash").substr(i, lit(1)) === prev.substr(i, lit(1)),
          0).otherwise(1)))
    hashed
      .withColumn("hamming", ham)
      .withColumn("scene_change",
        when(col("frame_idx") === 0, lit(true))
          .when(col("hamming").isNotNull && prevIdx.isNotNull &&
            prevIdx === col("frame_idx") - 1,
            col("hamming") >= threshold))
  }

  /**
   * M18 (r15): animated-GIF multi-frame scene-change detection — the
   * REAL variable-frame container closing M17's documented stand-in
   * caveat: [[videoSceneChanges]] slices fixed-size byte frames
   * because no JDK video codec exists, but the JDK's own GIF codec
   * DOES carry a real frame directory — `ImageReader
   * .getNumImages(true)` walks the container's image descriptors and
   * `read(i)` LZW-decodes each frame, so frame boundaries come from
   * the CODEC, not from byte arithmetic (per-frame byte lengths vary
   * with content; a fixed-stride `substr` could never find them).
   * Downstream is the same M14/M17 pipeline: per-frame DCT pHash,
   * per-clip lag window, hamming ≥ threshold marks a cut.
   *
   * Decode semantics (r16, M18b): frames COMPOSITE per the frame
   * directory's disposal metadata — each raster draws at its
   * descriptor offset onto the logical-screen canvas, and
   * doNotDispose / restoreToBackgroundColor / restoreToPrevious
   * apply between frames (see [[readGifFrames]]; background is
   * defined BLACK), so delta-encoded GIFs hash the frames a viewer
   * shows, not partial rasters; full-frame GIFs composite to exactly
   * their stored rasters (the r15 fixtures are bit-unchanged).
   * Triage: a payload without the GIF magic (r15 ADVICE — a BMP/PNG
   * payload must not sneak through as a one-frame "clip"), with no
   * image reader, or with an unreadable logical-screen descriptor
   * emits ONE (frame_idx 0, decode_ok false) row — undecodable is
   * visible, never silently dropped (the M12 rule); a frame failing
   * mid-container triages and HALTS the walk (compositing is
   * stateful — frames after a hole would be silently wrong).
   *
   * Scale: one decode pass per clip inside `mapPartitions`
   * (partition-local, no shuffle, `ImageIO.setUseCache(false)` per
   * the q283 temp-file rule), frame fan-out bounded by the
   * container's own directory; then one per-clip window (bounded by
   * frames-per-clip, never corpus-wide). Zero float anywhere.
   *
   * Output: (idCol, frame_idx, decode_ok, phash, hamming,
   * scene_change) — the M17 shape exactly.
   */
  def gifSceneChanges(
      df: DataFrame, idCol: String, payloadCol: String,
      grid: Int = 16, threshold: Int = 10): DataFrame = {
    require(grid >= 8 && grid <= 64, s"grid must be in [8, 64], got $grid")
    require(threshold >= 1 && threshold <= 63,
      s"threshold must be in [1, 63], got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val n = grid
    val c = Array.ofDim[Long](n, 8)
    phashDctTable(n).foreach { case (i, u, v) => c(i)(u) = v }
    val hashed = df
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          val frames = readGifFrames(bytes)
          if (frames.isEmpty)
            Seq((id, 0, false, Option.empty[String]))
          else frames.map {
            case (fi, img) if img != null &&
                img.getWidth >= n && img.getHeight >= n =>
              (id, fi, true, Some(phashOfImage(img, n, c)))
            case (fi, _) => (id, fi, false, Option.empty[String])
          }
        }
      }
      .toDF(idCol, "frame_idx", "decode_ok", "phash")
    sceneChangeWindow(hashed, idCol, threshold)
  }

  /** True iff the payload leads with the GIF87a/GIF89a magic — the
    * r15 ADVICE gate: without it ANY ImageIO-readable payload (BMP/
    * PNG/JPEG) would decode as a one-frame "clip" with decode_ok =
    * true instead of triaging, despite the operator's documented
    * GIF frame-directory semantics. */
  private def isGifMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a'

  /** Walk a GIF's frame directory with the JDK codec and COMPOSITE
    * each frame per its disposal metadata (M18b, r16 — real scraped
    * GIFs are delta-encoded; reading frames as STORED pHashes
    * partial rasters): each frame's raster draws at its descriptor's
    * (left, top) onto a logical-screen canvas; after emitting, the
    * disposal method applies — `doNotDispose`/`none` keep the
    * canvas, `restoreToBackgroundColor` clears the frame's rect to
    * the defined background (BLACK — GIF background rendering is
    * viewer-defined; black is deterministic and matches the zero
    * luma the oracle replays), `restoreToPrevious` reverts to the
    * canvas as it stood before the frame drew. Full-frame GIFs
    * (every frame full-screen at (0,0)) composite to exactly their
    * STORED rasters, so the r15 q337 fixtures are bit-unchanged.
    *
    * Triage: Nil when the payload lacks the GIF magic, no reader
    * claims the bytes, or the stream's LogicalScreenDescriptor is
    * unreadable (one visible triage row at the call site — the M12
    * rule). A frame whose raster or metadata fails mid-container
    * emits as (frame_idx, null) and STOPS the walk — compositing is
    * stateful, so frames after a hole would be silently wrong. */
  private[graft] def readGifFrames(
      bytes: Array[Byte]): Seq[(Int, java.awt.image.BufferedImage)] = {
    import scala.util.control.NonFatal
    import java.awt.image.BufferedImage
    if (!isGifMagic(bytes)) return Nil
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case NonFatal(_) => null }
    if (iis == null) return Nil
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis, false, false)
        val screen =
          try {
            val tree = reader.getStreamMetadata.getAsTree(
              "javax_imageio_gif_stream_1.0")
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            val lsd = tree.getElementsByTagName(
              "LogicalScreenDescriptor")
            if (lsd.getLength < 1) null
            else {
              val n = lsd.item(0)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              (n.getAttribute("logicalScreenWidth").toInt,
                n.getAttribute("logicalScreenHeight").toInt)
            }
          } catch { case NonFatal(_) => null }
        if (screen == null) return Nil
        val (sw, sh) = screen
        if (sw < 1 || sh < 1) return Nil
        val nImg =
          try reader.getNumImages(true)
          catch { case NonFatal(_) => 0 }
        var canvas = new BufferedImage(sw, sh,
          BufferedImage.TYPE_INT_RGB)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, BufferedImage)]
        var i = 0
        var halted = false
        while (i < nImg && !halted) {
          val frame =
            try {
              val img = reader.read(i)
              val md = reader.getImageMetadata(i).getAsTree(
                "javax_imageio_gif_image_1.0")
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              def one(tag: String) = {
                val nl = md.getElementsByTagName(tag)
                if (nl.getLength < 1) null
                else nl.item(0)
                  .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              }
              val desc = one("ImageDescriptor")
              val gce = one("GraphicControlExtension")
              if (img == null || desc == null) null
              else (img,
                desc.getAttribute("imageLeftPosition").toInt,
                desc.getAttribute("imageTopPosition").toInt,
                if (gce == null) "none"
                else gce.getAttribute("disposalMethod"))
            } catch { case NonFatal(_) => null }
          if (frame == null) {
            out += ((i, null))
            halted = true
          } else {
            val (img, left, top, disposal) = frame
            val prev =
              if (disposal == "restoreToPrevious") deepCopy(canvas)
              else null
            val g = canvas.createGraphics()
            try g.drawImage(img, left, top, null)
            finally g.dispose()
            out += ((i, deepCopy(canvas)))
            disposal match {
              case "restoreToBackgroundColor" =>
                val g2 = canvas.createGraphics()
                try {
                  g2.setColor(java.awt.Color.BLACK)
                  g2.fillRect(left, top, img.getWidth, img.getHeight)
                } finally g2.dispose()
              case "restoreToPrevious" => canvas = prev
              case _ => ()
            }
          }
          i += 1
        }
        out.toSeq
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Opaque RGB deep copy of a canvas (emitted frames must not alias
    * the mutable compositing state). */
  private def deepCopy(
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    val c = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = c.createGraphics()
    try g.drawImage(img, 0, 0, null)
    finally g.dispose()
    c
  }

  /** M17 fixture: a fixed-frame-size "video" — `nFrames` concatenated
    * [[syntheticBmpTextured]] BMPs of `w`×`h`; frames before
    * `switchAt` render scene seed·31+1, the rest seed·31+2 (two
    * totally different textures — the planted cut). Frame size is
    * 54 + 3·w·h bytes exactly (w multiple of 4 ⇒ no row padding). */
  def syntheticVideo(
      seed: Long, nFrames: Int, w: Int, h: Int,
      switchAt: Int): Array[Byte] = {
    require(nFrames >= 1 && switchAt >= 0 && switchAt <= nFrames,
      s"bad frame plan: n=$nFrames switch=$switchAt")
    val a = syntheticBmpTextured(seed * 31 + 1, w, h)
    val b = syntheticBmpTextured(seed * 31 + 2, w, h)
    val out = new Array[Byte](a.length * nFrames)
    var f = 0
    while (f < nFrames) {
      val src = if (f < switchAt) a else b
      System.arraycopy(src, 0, out, f * a.length, a.length)
      f += 1
    }
    out
  }

  /** `(idCol, payload)` frame carrying one [[syntheticVideo]] per
    * id. */
  def withSyntheticVideo(
      df: DataFrame, idCol: String, nFrames: Int, w: Int, h: Int,
      switchAt: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticVideo(id, nFrames, w, h, switchAt))))
      .toDF(idCol, "payload")
  }

  /** M18 fixture pixel formula: the [[syntheticBmpTextured]]
    * cross-term discipline on ONE channel — palette index at (x, y
    * from the top) = floorMod(seed·7 + (1+seed%11)·x + (2+seed%13)·y
    * + (1+seed%7)·x·y, 256). The GIF palette is the identity gray
    * ramp (entry i = rgb(i, i, i)), so the DECODED pixel's luma is
    * exactly 1000·index and the oracle replays pixels arithmetically
    * with no GIF decode (the q283 discipline). */
  private[graft] def gifPixelIndex(seed: Long, x: Int, y: Int): Int = {
    val s11 = Math.floorMod(seed, 11)
    val s13 = Math.floorMod(seed, 13)
    val s7 = Math.floorMod(seed, 7)
    Math.floorMod(
      seed * 7 + (1 + s11) * x + (2 + s13) * y + (1 + s7) * x.toLong * y,
      256).toInt
  }

  /** M18 fixture: a REAL animated GIF written by the JDK's own GIF
    * codec (`ImageIO` write sequence → LZW frames + image
    * descriptors; per-frame byte lengths vary with content, so only
    * a real frame directory can find the boundaries). Frames before
    * `switchAt` render scene seed·31+1, the rest seed·31+2 (the
    * planted cut — the [[syntheticVideo]] plan); pixels per
    * [[gifPixelIndex]] over a 256-gray `IndexColorModel`. Indexed
    * sources round-trip BIT-EXACTLY through GIF's lossless LZW
    * (pinned in MultimodalSpec), and the writer output is
    * deterministic — no timestamps in GIF89a. */
  def syntheticGif(
      seed: Long, nFrames: Int, w: Int, h: Int,
      switchAt: Int): Array[Byte] = {
    require(nFrames >= 1 && switchAt >= 0 && switchAt <= nFrames,
      s"bad frame plan: n=$nFrames switch=$switchAt")
    import javax.imageio.ImageIO
    import java.awt.image.{BufferedImage, IndexColorModel}
    ImageIO.setUseCache(false)
    val ramp = (0 until 256).map(_.toByte).toArray
    val cm = new IndexColorModel(8, 256, ramp, ramp, ramp)
    def frame(s: Long): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          r.setSample(x, y, 0, gifPixelIndex(s, x, y))
          x += 1
        }
        y += 1
      }
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val s = if (f < switchAt) seed * 31 + 1 else seed * 31 + 2
        writer.writeToSequence(
          new javax.imageio.IIOImage(frame(s), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** `(idCol, payload)` frame carrying one [[syntheticGif]] per id. */
  def withSyntheticGif(
      df: DataFrame, idCol: String, nFrames: Int, w: Int, h: Int,
      switchAt: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, syntheticGif(id, nFrames, w, h, switchAt))))
      .toDF(idCol, "payload")
  }

  /** M18b fixture frame plan: (seed offset, left, top, width,
    * height, disposal) per frame over a `w`×`h` logical screen —
    * frame 0 is the full-screen base; 1 is a patch disposed
    * restore-to-BACKGROUND (its rect goes black before frame 2);
    * 2 a kept patch; 3 a patch disposed restore-to-PREVIOUS (gone
    * by frame 4 even though frame 4 doesn't cover it); 4 a final
    * kept patch. Shared by the fixture writer, the oracle
    * generator, and the spec's expected-pixel replay. */
  private[graft] def gifDeltaPlan(
      w: Int, h: Int): Seq[(Long, Int, Int, Int, Int, String)] = Seq(
    (1L, 0, 0, w, h, "doNotDispose"),
    (2L, w / 2, 0, w / 2, h / 2, "restoreToBackgroundColor"),
    (3L, 0, h / 2, w / 2, h / 2, "doNotDispose"),
    (4L, w / 4, h / 4, w / 2, h / 2, "restoreToPrevious"),
    (5L, 3 * w / 4, 3 * h / 4, w / 4, h / 4, "doNotDispose"))

  /** M18b expected COMPOSITED palette index at (x, y) of frame
    * `fi` — the pure-arithmetic replay both the oracle and the spec
    * pin against the codec walk: applies [[gifDeltaPlan]]'s draw +
    * disposal state machine over [[gifPixelIndex]] patches; −1
    * encodes the defined-black background (luma 0, off the
    * 1000·index ramp). */
  private[graft] def gifDeltaExpectedIndex(
      seed: Long, w: Int, h: Int, fi: Int, x: Int, y: Int): Int = {
    val plan = gifDeltaPlan(w, h)
    // canvas state as Option[index] per pixel; None = black
    var canvas: (Int, Int) => Int = (_, _) => -1
    var out = -1
    var i = 0
    while (i <= fi) {
      val (so, l, t, pw, ph, disp) = plan(i)
      val prev = canvas
      val drawn: (Int, Int) => Int = (px, py) =>
        if (px >= l && px < l + pw && py >= t && py < t + ph)
          gifPixelIndex(seed * 31 + so, px - l, py - t)
        else prev(px, py)
      if (i == fi) out = drawn(x, y)
      canvas = disp match {
        case "restoreToBackgroundColor" => (px, py) =>
          if (px >= l && px < l + pw && py >= t && py < t + ph) -1
          else drawn(px, py)
        case "restoreToPrevious" => prev
        case _ => drawn
      }
      i += 1
    }
    out
  }

  /** M18b fixture: a DELTA-encoded animated GIF written by the JDK
    * codec — per-frame IIOMetadata carries the image descriptor
    * offsets and disposal methods of [[gifDeltaPlan]], so only a
    * disposal-aware composite (not a STORED read) reproduces what a
    * viewer shows: frame 1's rect goes black before frame 2
    * (restore-to-background), frame 3 vanishes by frame 4
    * (restore-to-previous). Pixels per [[gifPixelIndex]] over the
    * same 256-gray identity palette as [[syntheticGif]] — indexed
    * LZW round-trips bit-exactly and the composited luma is
    * 1000·[[gifDeltaExpectedIndex]] (0 for defined-black). */
  def syntheticGifDelta(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 8 && h >= 8 && w % 4 == 0 && h % 4 == 0,
      s"screen must be >= 8 and divisible by 4, got ${w}x$h")
    import javax.imageio.{ImageIO, ImageTypeSpecifier, IIOImage}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.{BufferedImage, IndexColorModel}
    ImageIO.setUseCache(false)
    val ramp = (0 until 256).map(_.toByte).toArray
    val cm = new IndexColorModel(8, 256, ramp, ramp, ramp)
    def patch(s: Long, pw: Int, ph: Int): BufferedImage = {
      val img = new BufferedImage(pw, ph,
        BufferedImage.TYPE_BYTE_INDEXED, cm)
      val r = img.getRaster
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          r.setSample(x, y, 0, gifPixelIndex(s, x, y))
          x += 1
        }
        y += 1
      }
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      gifDeltaPlan(w, h).foreach { case (so, l, t, pw, ph, disp) =>
        val img = patch(seed * 31 + so, pw, ph)
        val md = writer.getDefaultImageMetadata(
          new ImageTypeSpecifier(img), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        def node(tag: String): IIOMetadataNode = {
          val nl = root.getElementsByTagName(tag)
          if (nl.getLength >= 1)
            nl.item(0).asInstanceOf[IIOMetadataNode]
          else {
            val n = new IIOMetadataNode(tag)
            root.appendChild(n)
            n
          }
        }
        val desc = node("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", l.toString)
        desc.setAttribute("imageTopPosition", t.toString)
        desc.setAttribute("imageWidth", pw.toString)
        desc.setAttribute("imageHeight", ph.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disp)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, md), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** `(idCol, payload)` frame carrying one [[syntheticGifDelta]]
    * per id. */
  def withSyntheticGifDelta(
      df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticGifDelta(id, w, h))))
      .toDF(idCol, "payload")
  }

  /**
   * Overlapping byte-shingle token string: hex(payload) sliced into
   * `widthBytes`-byte grams every `strideBytes` bytes, space-joined —
   * the binary analogue of word shingles, feeding the same SimHash
   * kernel. Overlap (stride < width) keeps the signature robust to
   * byte insertions/shifts, which block-aligned chunking is not.
   * A payload shorter than one gram contributes its whole hex as the
   * single token. Pure per-row projection.
   */
  def byteShingleString(
      payload: Column, widthBytes: Int, strideBytes: Int): Column = {
    require(widthBytes >= 1 && strideBytes >= 1,
      s"width/stride must be >= 1, got $widthBytes/$strideBytes")
    val hx = hex(payload)
    val w = widthBytes * 2
    val st = strideBytes * 2
    array_join(
      transform(
        sequence(lit(1), greatest(length(hx) - (w - 1), lit(1)), lit(st)),
        i => hx.substr(i, lit(w))), " ")
  }

  /**
   * Binary-payload near-duplicate pairs — fuzzy dedup for media
   * blobs where M1's exact digests can't see a re-encoded/padded
   * copy: byte-shingle SimHash (64-bit, the codegen'd q18 kernel)
   * plus a 4×16-bit BAND bucket join, exact-hamming verified. The
   * band pigeonhole guarantees recall for hamming ≤ 3: four bands
   * can't all differ on ≤ 3 flipped bits.
   *
   * Scale: signatures compute ONCE (localCheckpoint barrier — both
   * self-join branches read the materialized per-doc rows instead of
   * re-running the kernel per consumer, the q127 shared-subtree
   * rule) and the self-join touches only band-bucket collisions —
   * NEVER all pairs. Dup-heavy corpora make a bucket quadratic in
   * its dup-group size: `capPerBucket` hard-bounds every bucket to
   * its cap lowest ids (the q130 blocked-join rule; sized to be
   * INACTIVE at gate scales so results stay byte-identical, and
   * mirrored in the oracle) — and run D1 exact dedup first (digests
   * are already in M1) so only near-misses reach the band join.
   * Hamming is two long XOR+bit_counts per candidate — integer
   * arithmetic, method-independent across engines.
   *
   * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤
   * `maxHamming`, ordered.
   */
  def binaryNearDups(
      df: DataFrame, idCol: String, payloadCol: String,
      widthBytes: Int = 8, strideBytes: Int = 2,
      maxHamming: Int = 3, capPerBucket: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 bands guarantee recall only to hamming 3; got $maxHamming")
    require(capPerBucket >= 2,
      s"capPerBucket must be >= 2 to ever emit a pair, got $capPerBucket")
    import org.apache.spark.sql.expressions.Window
    val sigs = df.select(
        col(idCol).as("__id"),
        graft.operators.Dedup.simhashFast(
          byteShingleString(col(payloadCol), widthBytes, strideBytes))
          .as("__fp"))
      .withColumn("__hi",
        conv(substring(col("__fp"), 1, 32), 2, 10).cast("long"))
      .withColumn("__lo",
        conv(substring(col("__fp"), 33, 32), 2, 10).cast("long"))
      .barriered
    val wb = Window.partitionBy(col("__k"), col("__bv"))
      .orderBy(col("__id"))
    val bands = sigs.select(
        col("__id"), col("__hi"), col("__lo"),
        posexplode(array((0 until 4).map(k =>
          substring(col("__fp"), 1 + 16 * k, 16)): _*)).as(Seq("__k", "__bv")))
      .withColumn("__rn", row_number().over(wb))
      .where(col("__rn") <= capPerBucket)
      .drop("__rn")
    def side(s: String) = bands.select(
      col("__id").as(s"id_$s"), col("__hi").as(s"__hi$s"),
      col("__lo").as(s"__lo$s"), col("__k"), col("__bv"))
    val cand = side("a").join(side("b"), Seq("__k", "__bv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__hia", "__loa", "__hib", "__lob")
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(col("__hia").bitwiseXOR(col("__hib"))) +
          bit_count(col("__loa").bitwiseXOR(col("__lob")))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Shared single-pass aHash bit derivation over a decoded image —
    * the exact integer pipeline both [[imageAHash]] and the fused
    * [[imagePerceptualHashes]] run (one source of truth). Caller
    * guarantees w, h >= 8. */
  private def ahashOfImage(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var tot = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val p = img.getRGB(x, y)
        val luma = 299L * ((p >> 16) & 0xff) +
          587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        val i = by * 8 + bx
        sums(i) += luma
        cnts(i) += 1L
        tot += luma
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) {
      // S_block·N > S_total·n_block, cross-multiplied —
      // exact up to ~2^63/255000 px per image
      sb.append(if (sums(i) * n > tot * cnts(i)) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /** Shared pHash bit derivation: floor-grid cells, two exact long
    * DCT passes against the caller's cosine table, 63-AC
    * order-statistic median, sign bits (one source of truth for
    * [[imagePHash]] and [[imagePerceptualHashes]]). Caller
    * guarantees w, h >= n. */
  private def phashOfImage(
      img: java.awt.image.BufferedImage, n: Int,
      c: Array[Array[Long]]): String = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](n, n)
    val cnts = Array.ofDim[Long](n, n)
    var y = 0
    while (y < h) {
      val cy = y * n / h
      var x = 0
      while (x < w) {
        val cx = x * n / w
        val p = img.getRGB(x, y)
        val luma = 299L * ((p >> 16) & 0xff) +
          587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        sums(cx)(cy) += luma
        cnts(cx)(cy) += 1L
        x += 1
      }
      y += 1
    }
    // stage1(x, v) = Σ_y cell(x, y) · c(y, v)
    val st1 = Array.ofDim[Long](n, 8)
    var cx = 0
    while (cx < n) {
      var cy = 0
      while (cy < n) {
        val cell = sums(cx)(cy) / cnts(cx)(cy)
        var v = 0
        while (v < 8) {
          st1(cx)(v) += cell * c(cy)(v)
          v += 1
        }
        cy += 1
      }
      cx += 1
    }
    // coeff(u, v) = Σ_x stage1(x, v) · c(x, u)
    val coef = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sAcc = 0L
        var x = 0
        while (x < n) {
          sAcc += st1(x)(v) * c(x)(u)
          x += 1
        }
        coef(u * 8 + v) = sAcc
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(coef, 1, ac, 0, 63)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31) // true median of 63
    val sb = new java.lang.StringBuilder(63)
    var i = 0
    while (i < 63) {
      sb.append(if (ac(i) > med) '1' else '0')
      i += 1
    }
    sb.toString
  }

  /**
   * M13 (r12): perceptual average-hash (aHash) over DECODED pixels —
   * the image near-duplicate signature M9 ([[binaryNearDups]])
   * structurally cannot be: M9 shingles the encoded BYTES, so the
   * same picture saved twice (different compressor, stripped
   * metadata, tweaked corner) hashes apart; aHash fingerprints the
   * IMAGE — 8×8 block luminances thresholded at the global mean —
   * so re-encodes collide and a small retouch flips only the bits
   * whose blocks it touched. The classic pre-embedding image dedup
   * key (pairs with D-family text near-dup the way q283 pairs with
   * the byte path).
   *
   * ALL-INTEGER pipeline (engine-replayable on arithmetic fixtures):
   * luma per pixel = 299·r + 587·g + 114·b (×1000 fixed point, no
   * division); the image divides into an 8×8 block grid by integer
   * floor boundaries (x ∈ [bx·w/8, (bx+1)·w/8)); bit(bx, by) = 1
   * iff S_block·N_pixels > S_total·n_block (the global-mean
   * cross-multiplication — exact rational compare, no division;
   * identical to classic mean-of-block-means aHash when 8 | w and
   * 8 | h, and well-defined for ragged blocks). The hash is the
   * 64-char '0'/'1' string in row-major block order (idx = by·8+bx)
   * — the house simhash fingerprint convention, band-sliceable by
   * substring. A constant image hashes to all zeros (no block is
   * strictly above the mean; spec-pinned).
   *
   * Images narrower/shorter than 8 px decode but cannot fill the
   * grid — they triage as `decode_ok = false` with a NULL hash,
   * alongside undecodable payloads. Decode mechanics inherit
   * [[decodeImageFeatures]]'s contract: JDK ImageIO inside batched
   * mapPartitions, partition-local, exact Long block sums (safe to
   * 2⁶³/255000 ≈ 3.6e13 px).
   *
   * Output: (idCol, decode_ok, ahash).
   */
  def imageAHash(
      df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // same disk-cache bypass as decodeImageFeatures
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try {
                if (bytes == null || bytes.isEmpty) null
                else javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
              } catch { case scala.util.control.NonFatal(_) => null }
            if (img == null || img.getWidth < 8 || img.getHeight < 8)
              (id, false, Option.empty[String])
            else (id, true, Some(ahashOfImage(img)))
          }
        }
      }
      .toDF(idCol, "decode_ok", "ahash")
  }

  /**
   * M14 support: the fixed-point DCT-II cosine table — c(i, u) =
   * round(cos(π(2i+1)u / (2n)) · 10⁴) for i ∈ [0, n), u ∈ [0, 8).
   * Driver-generated ONCE and handed to BOTH engines (the q269
   * literal-matrix pattern): the operator's per-image kernel and the
   * oracle's VALUES table consume the same integers, so the whole
   * DCT is EXACT long arithmetic with zero cross-engine cos/ulp
   * hazard. The 10⁴ grid is the mechanism's one documented
   * quantization (frequency responses keep ~4 significant digits —
   * far beyond what a 63-bit sign signature resolves).
   */
  private[graft] def phashDctTable(n: Int): Seq[(Int, Int, Long)] =
    for (i <- 0 until n; u <- 0 until 8) yield
      (i, u, Math.round(
        math.cos(math.Pi * (2 * i + 1) * u / (2.0 * n)) * 10000.0))

  /**
   * M14 (r13): perceptual DCT hash (pHash) over DECODED pixels — the
   * robust upgrade of [[imageAHash]]: aHash thresholds block lumas
   * at the GLOBAL MEAN, so any luminance change that moves blocks
   * relative to that mean (a brightness ramp/vignette, a contrast
   * stretch) flips bits wholesale; pHash signs LOW-FREQUENCY DCT
   * coefficients against their own median, and a smooth luma ramp
   * concentrates into a handful of low-order coefficients — the
   * other ~60 bits stand. The classic robust image fingerprint
   * (same role as in pHash/imagehash libraries), here as an
   * ALL-INTEGER pipeline:
   *
   *  - luma = 299r + 587g + 114b (×1000 fixed point — the M13
   *    convention);
   *  - the image floor-grids into n×n cells (n = `grid`, the aHash
   *    block rule); cell value = S_cell div cnt_cell (exact integer
   *    floor division, both engines);
   *  - separable 2-D DCT-II via TWO exact integer matrix passes
   *    against the [[phashDctTable]] literals: stage1(x, v) =
   *    Σ_y cell(x,y)·c(y,v); coeff(u,v) = Σ_x stage1(x,v)·c(x,u).
   *    Magnitudes bound by 255000·10⁸·n² (n = 16 → 6.5e15), an
   *    order-free exact long sum — no float enters anywhere;
   *  - the 63 AC coefficients (u,v ∈ [0,8)² minus DC) sign against
   *    their TRUE MEDIAN (32nd smallest of 63 — an order statistic,
   *    no averaging/division): bit = coeff > median. DC is excluded
   *    so overall brightness never feeds the signature;
   *  - hash = the 63-char '0'/'1' string in (u·8+v) order minus the
   *    DC slot — the house fingerprint convention, band-sliceable.
   *
   * A constant image has all-zero AC coefficients → all-'0' hash
   * (spec-pinned, mirroring aHash). Images smaller than the cell
   * grid (w or h < grid) triage as decode_ok = false with a NULL
   * hash, alongside undecodable payloads. Decode inherits
   * [[decodeImageFeatures]]'s contract (batched mapPartitions, JDK
   * ImageIO, disk cache off).
   *
   * Output: (idCol, decode_ok, phash).
   */
  def imagePHash(
      df: DataFrame, idCol: String, payloadCol: String,
      grid: Int = 16, batchSize: Int = 64): DataFrame = {
    require(grid >= 8 && grid <= 64,
      s"grid must be in [8, 64], got $grid")
    val spark = df.sparkSession
    import spark.implicits._
    val n = grid
    val tab = phashDctTable(n)
    val c = Array.ofDim[Long](n, 8)
    tab.foreach { case (i, u, v) => c(i)(u) = v }
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try {
                if (bytes == null || bytes.isEmpty) null
                else javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
              } catch { case scala.util.control.NonFatal(_) => null }
            if (img == null || img.getWidth < n || img.getHeight < n)
              (id, false, Option.empty[String])
            else (id, true, Some(phashOfImage(img, n, c)))
          }
        }
      }
      .toDF(idCol, "decode_ok", "phash")
  }

  /**
   * M13+M14 fused: BOTH perceptual hashes from ONE decode — the
   * composition every gate/pipeline wanting aHash AND pHash should
   * run: `ImageIO.read` + the pixel walk dominate either hash's
   * cost, so computing them separately pays the decode twice for no
   * information gain (measured on q317: two decodes ≈ 2.1 s at
   * sf0.1; fused ≈ half). Bit derivations are the shared
   * single-source helpers of [[imageAHash]] / [[imagePHash]] —
   * byte-identical outputs by construction.
   *
   * Triage: decode failure / w or h < 8 → decode_ok = false, both
   * NULL; decodable but smaller than the pHash cell grid → aHash
   * present, phash NULL (each hash keeps its own contract).
   *
   * Output: (idCol, decode_ok, ahash, phash).
   */
  def imagePerceptualHashes(
      df: DataFrame, idCol: String, payloadCol: String,
      grid: Int = 16, batchSize: Int = 64): DataFrame = {
    require(grid >= 8 && grid <= 64,
      s"grid must be in [8, 64], got $grid")
    val spark = df.sparkSession
    import spark.implicits._
    val n = grid
    val c = Array.ofDim[Long](n, 8)
    phashDctTable(n).foreach { case (i, u, v) => c(i)(u) = v }
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try {
                if (bytes == null || bytes.isEmpty) null
                else javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes))
              } catch { case scala.util.control.NonFatal(_) => null }
            if (img == null || img.getWidth < 8 || img.getHeight < 8)
              (id, false, Option.empty[String], Option.empty[String])
            else {
              val ah = ahashOfImage(img)
              val ph =
                if (img.getWidth < n || img.getHeight < n) None
                else Some(phashOfImage(img, n, c))
              (id, true, Some(ah), ph)
            }
          }
        }
      }
      .toDF(idCol, "decode_ok", "ahash", "phash")
  }

  /**
   * M13 (pair stage): perceptual near-duplicate pairs over
   * [[imageAHash]] fingerprints — [[binaryNearDups]]'s 4×16-bit
   * band-bucket join and exact-hamming verify, fed by the DECODED
   * signature instead of the byte shingles (same pigeonhole recall
   * guarantee to hamming ≤ 3, same `capPerBucket` bound mirrored in
   * any oracle, same shared-signature barrier). Undecodable/NULL
   * hashes drop before banding.
   *
   * Output: (id_a, id_b, hamming), id_a < id_b, ordered.
   */
  def imageNearDups(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, capPerBucket: Int = 64,
      batchSize: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 bands guarantee recall only to hamming 3; got $maxHamming")
    require(capPerBucket >= 2,
      s"capPerBucket must be >= 2 to ever emit a pair, got $capPerBucket")
    import org.apache.spark.sql.expressions.Window
    val sigs = imageAHash(df, idCol, payloadCol, batchSize)
      .where(col("decode_ok") && col("ahash").isNotNull)
      .select(
        col(idCol).as("__id"),
        col("ahash").as("__fp"))
      .withColumn("__hi",
        conv(substring(col("__fp"), 1, 32), 2, 10).cast("long"))
      .withColumn("__lo",
        conv(substring(col("__fp"), 33, 32), 2, 10).cast("long"))
      .barriered
    val wb = Window.partitionBy(col("__k"), col("__bv"))
      .orderBy(col("__id"))
    val bands = sigs.select(
        col("__id"), col("__hi"), col("__lo"),
        posexplode(array((0 until 4).map(k =>
          substring(col("__fp"), 1 + 16 * k, 16)): _*)).as(Seq("__k", "__bv")))
      .withColumn("__rn", row_number().over(wb))
      .where(col("__rn") <= capPerBucket)
      .drop("__rn")
    def side(s: String) = bands.select(
      col("__id").as(s"id_$s"), col("__hi").as(s"__hi$s"),
      col("__lo").as(s"__lo$s"), col("__k"), col("__bv"))
    side("a").join(side("b"), Seq("__k", "__bv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__hia", "__loa", "__hib", "__lob")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("__hia").bitwiseXOR(col("__hib"))) +
          bit_count(col("__loa").bitwiseXOR(col("__lob")))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** `(idCol, payload)` frame carrying one [[syntheticBmpTextured]]
    * per id PLUS a [[syntheticBmpTexturedVariant]] twin
    * (id + idOffset, same seed) for every everyK-th id — the
    * controlled near-duplicate corpus feeding the perceptual-hash
    * gate. Per-row generation, no shuffle. */
  def withSyntheticBmpPairs(
      df: DataFrame, idCol: String, w: Int, h: Int, everyK: Long,
      delta: Int, regionW: Int, regionH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        // Twin ids live at −(id+1) — STRUCTURALLY disjoint from any
        // non-negative base id at every scale (the r12 ADVICE
        // finding: an additive offset collides once base ids reach
        // it, silently merging two images under one id in both the
        // operator and the oracle's GROUP BY replay).
        require(id >= 0L,
          s"withSyntheticBmpPairs: base ids must be >= 0, got $id")
        val base = (id, syntheticBmpTextured(id, w, h))
        if (id % everyK == 0L)
          Iterator(base, (-id - 1L,
            syntheticBmpTexturedVariant(
              id, w, h, delta, regionW, regionH)))
        else Iterator(base)
      })
      .toDF(idCol, "payload")
  }

  /** [[syntheticBmpTextured]] with a horizontal BRIGHTNESS RAMP: every
    * channel gains min(255, base + rampMax·x div w) — the
    * vignette-style luminance edit that defeats a global-mean hash
    * (block means move relative to the global mean) while a DCT
    * signature absorbs it into a few low-order coefficients. Integer
    * shift, saturating clamp — both exactly oracle-replayable
    * (LEAST(255, ch + rampMax*x//w)). */
  def syntheticBmpTexturedRamp(
      seed: Long, w: Int, h: Int, rampMax: Int): Array[Byte] = {
    val s11 = Math.floorMod(seed, 11)
    val s13 = Math.floorMod(seed, 13)
    val s7 = Math.floorMod(seed, 7)
    bmpFrom(w, h) { (x, y) =>
      val shift = rampMax.toLong * x / w
      val xy = x.toLong * y
      def ch(v: Long): Int =
        math.min(255L, Math.floorMod(v, 256) + shift).toInt
      (ch(seed * 7 + (1 + s11) * x + (2 + s13) * y + (1 + s7) * xy),
        ch(seed * 11 + (3 + s13) * x + (1 + s11) * y + (2 + s7) * xy),
        ch(seed * 13 + (2 + s11) * x + (3 + s13) * y + (3 + s7) * xy))
    }
  }

  /** `(idCol, payload)` fixture for the pHash-robustness gate: the
    * textured base for every id plus a brightness-RAMPED twin
    * ([[syntheticBmpTexturedRamp]]) at −(id+1) for every
    * `everyK`-th id — same disjoint-negative-twin convention as
    * [[withSyntheticBmpPairs]]. */
  def withSyntheticBmpRampPairs(
      df: DataFrame, idCol: String, w: Int, h: Int, everyK: Long,
      rampMax: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.flatMap { id =>
        require(id >= 0L,
          s"withSyntheticBmpRampPairs: base ids must be >= 0, got $id")
        val base = (id, syntheticBmpTextured(id, w, h))
        if (id % everyK == 0L)
          Iterator(base, (-id - 1L,
            syntheticBmpTexturedRamp(id, w, h, rampMax)))
        else Iterator(base)
      })
      .toDF(idCol, "payload")
  }
}

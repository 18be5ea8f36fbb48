package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Unit tests for multimodal binary-column handling: payload
  * synthesis, digests, frame slicing, resize arithmetic, and the
  * batched decode-stub plumbing (schema / determinism / batch shape). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcd"),
    (1L, "hello world, a somewhat longer payload for slicing tests"),
    (2L, "")
  ).toDF("doc_id", "text")

  test("synthesize: payload is UTF-8 bytes, media struct typed and deterministic") {
    val m = Multimodal.synthesize(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName === "binary")
    val row = m.where($"doc_id" === 1).select("media.format", "media.width", "media.height")
      .as[(String, Int, Int)].head()
    assert(row === (("jpeg", 128, 128))) // id 1: format idx 2, 64*(1%4+1), 64*(1%3+1)
    val bytes = m.where($"doc_id" === 0).select("payload").as[Array[Byte]].head()
    assert(bytes.toSeq === "abcd".getBytes("UTF-8").toSeq)
  }

  test("digests and peeks match java.security golden values") {
    val m = Multimodal.synthesize(docs, "doc_id", "text")
    val (sha, md, b64head, hexhead, n) = m.where($"doc_id" === 0)
      .select(
        Multimodal.sha256Hex($"payload"),
        Multimodal.md5Hex($"payload"),
        Multimodal.b64($"payload"),
        Multimodal.hexHead($"payload", 2),
        Multimodal.nBytes($"payload"))
      .as[(String, String, String, String, Int)].head()
    val jd = java.security.MessageDigest.getInstance("SHA-256")
      .digest("abcd".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha === jd)
    assert(md === "e2fc714c4727ee9395f324cd2e7f331f") // md5("abcd")
    assert(b64head === "YWJjZA==")
    assert(hexhead === "6162") // 'a','b'
    assert(n === 4)
  }

  test("frames: stride/size slicing, 0-based frame_idx, short tail frame") {
    val m = Multimodal.synthesize(docs.where($"doc_id" === 1), "doc_id", "text")
    val out = Multimodal.frames(m, "doc_id", "payload", frameSize = 16, stride = 20)
      .select($"frame_idx", length($"frame").cast("int"))
      .as[(Int, Int)].collect().sortBy(_._1)
    // payload is 56 bytes → starts at 1, 21, 41 → 16-byte frames each
    assert(out.map(_._1).toSeq === Seq(0, 1, 2))
    assert(out.map(_._2).toSeq === Seq(16, 16, 16))
  }

  test("frames: empty payload emits no frames (sequence 1..0 edge)") {
    val m = Multimodal.synthesize(docs.where($"doc_id" === 2), "doc_id", "text")
    assert(Multimodal.frames(m, "doc_id", "payload", 16, 20).count() === 0)
  }

  test("resizeDims: aspect preserved, never upscales") {
    val meta = Seq((256, 128), (100, 50), (64, 192)).toDF("width", "height")
      .select(struct($"width", $"height").as("media"))
    val out = meta.select(Multimodal.resizeDims($"media", 128).as("r"))
      .select("r.out_w", "r.out_h").as[(Int, Int)].collect().toSeq
    assert(out === Seq((128, 64), (100, 50), (42, 128)))
  }

  test("decodeFeaturesStub: fixed-dim schema, deterministic, partition-local") {
    val m = Multimodal.synthesize(docs, "doc_id", "text").repartition(2)
    val f1 = Multimodal.decodeFeaturesStub(m, "doc_id", "payload", dim = 8, batchSize = 2)
    assert(f1.schema("features").dataType.simpleString === "array<float>")
    val rows = f1.as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.forall(_._2.length == 8))
    assert(rows.forall(_._2.forall(v => v >= 0.0f && v <= 1.0f)))
    // Deterministic across runs and partitionings.
    val f2 = Multimodal.decodeFeaturesStub(
      m.repartition(3), "doc_id", "payload", 8, 64)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(rows.map(_._2.toSeq).toSeq === f2.map(_._2.toSeq).toSeq)
    // Empty payload row yields all-zero features, no crash.
    assert(rows.head._1 === 0L)
    assert(rows.last._2.forall(_ === 0.0f))
  }

  test("byteShingleString: overlapping hex grams; short payload = one token") {
    val df = Seq((1L, "abcdefgh"), (2L, "ab")).toDF("id", "t")
      .select(col("id"),
        Multimodal.byteShingleString(encode(col("t"), "UTF-8"),
          widthBytes = 4, strideBytes = 2).as("g"))
    val m = df.as[(Long, String)].collect().toMap
    // "abcdefgh" hex = 16 chars; grams of 8 every 4: pos 1, 5, 9
    assert(m(1L) === "6162636465666768".sliding(8, 4).toSeq
      .filter(_.length == 8).mkString(" "))
    assert(m(2L) === "6162") // shorter than one gram -> whole hex
  }

  test("binaryNearDups: identical payloads pair at hamming 0, a small edit " +
      "stays near, unrelated payloads don't pair") {
    // long payload: a 1-char append touches only ~3 of ~2000
    // shingles, so the signature barely moves (hamming 0 here —
    // simhash bit flips scale with changed/total tokens)
    val base = (0 until 4000).map(i => ('a' + (i * 7 + i * i % 13) % 26)
      .toChar).mkString
    val near = base + "t"
    val far = (0 until 4000).map(i => ('A' + (i * 11 + 3) % 26)
      .toChar).mkString
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("id", "t")
      .select(col("id"), encode(col("t"), "UTF-8").as("payload"))
    val pairs = Multimodal.binaryNearDups(df, "id", "payload")
      .as[(Long, Long, Int)].collect().toSeq
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((1L, 2L)) === 0)
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) <= 3)
    assert(!pairs.exists(p => p._1 === 4L || p._2 === 4L))
  }

  test("sniffFormat: real magics recognized, WEBP type tag honored, " +
      "junk unknown") {
    val rows = Seq(
      (1L, "89504E47AABBCC", "png"),
      (2L, "FFD8FFE000", "jpeg"),
      (3L, "52494646000000005745425000", "webp"),   // RIFF + WEBP tag
      (4L, "524946460000000041564920", "unknown"),  // RIFF but AVI
      (5L, "47494638", "gif"),
      (6L, "0001", "unknown"),
      (7L, "", "unknown")
    ).toDF("id", "hx", "want")
      .select(col("id"), unhex(col("hx")).as("payload"), col("want"))
    val got = rows.select(col("id"),
        Multimodal.sniffFormat(col("payload")).as("s"), col("want"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, s, want) => assert(s === want, s"id=$id") }
  }

  test("byteEntropy: uniform-byte goldens; degenerate fill is 0 bits") {
    val df = Seq(
      (1L, "aabb"),  // two bytes, 50/50 -> 1 bit
      (2L, "abcd"),  // four distinct -> 2 bits
      (3L, "aaaa"),  // one byte -> 0 bits
      (4L, "")       // empty payload: excluded
    ).toDF("id", "t").select(col("id"),
      encode(col("t"), "UTF-8").as("payload"))
    val out = Multimodal.byteEntropy(df, "id", "payload")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 2L, 1.0)))
    assert(out(2L) === ((2L, 4L, 4L, 2.0)))
    assert(out(3L) === ((3L, 4L, 1L, 0.0)))
    assert(!out.contains(4L))
  }

  private def bmpExpected(seed: Long, w: Int, h: Int)
      : (Double, Double, Double) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += Math.floorMod(seed * 7 + 3L * x + 5L * y, 256)
      sg += Math.floorMod(seed * 11 + 2L * x + 7L * y, 256)
      sb += Math.floorMod(seed * 13 + x + 11L * y, 256)
    }
    val n = (w * h).toDouble
    (sr / n, sg / n, sb / n)
  }

  test("decodeImageFeatures: ImageIO recovers syntheticBmp pixels " +
      "exactly; garbage and empty payloads triage as decode_ok=false") {
    val ids = Seq(3L, 17L, 1000L).toDF("id")
    val imgs = Multimodal.withSyntheticBmp(ids, "id", w = 8, h = 8)
    val corrupt = Seq(
      (-1L, "not an image".getBytes("UTF-8")),
      (-2L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.decodeImageFeatures(
        imgs.unionByName(corrupt), "id", "payload", batchSize = 2)
      .as[(Long, Boolean, Option[Int], Option[Int], Option[Double],
        Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(3L, 17L, 1000L)) {
      val (er, eg, eb) = bmpExpected(id, 8, 8)
      val r = out(id)
      assert(r._2 && r._3 === Some(8) && r._4 === Some(8))
      // integer sums / exact pixel count: bit-exact, not approximate
      assert(r._5 === Some(er) && r._6 === Some(eg) && r._7 === Some(eb),
        s"id=$id got $r want ($er,$eg,$eb)")
    }
    for (id <- Seq(-1L, -2L)) {
      val r = out(id)
      assert(!r._2 && r._3.isEmpty && r._5.isEmpty, s"id=$id: $r")
    }
  }

  test("decodeImageFeatures: decodes a PNG round-tripped through " +
      "ImageIO.write; direct pixel check") {
    // PNG is lossless: the decoded means must equal the BMP twin's.
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, ((10 * x + y) << 16) | ((20 * x) << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val out = Multimodal.decodeImageFeatures(
        Seq((7L, bos.toByteArray)).toDF("id", "payload"), "id", "payload")
      .as[(Long, Boolean, Option[Int], Option[Int], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(out._2 && out._3 === Some(4) && out._4 === Some(2))
    val n = 8.0
    val er = (0 until 2).flatMap(y => (0 until 4).map(x => 10 * x + y))
      .sum / n
    val eg = (0 until 2).flatMap(y => (0 until 4).map(x => 20 * x)).sum / n
    val eb = (0 until 2).flatMap(y => (0 until 4).map(x => x + y)).sum / n
    assert(out._5 === Some(er) && out._6 === Some(eg) &&
      out._7 === Some(eb))
  }

  test("decodeImageFeatures: batch shape and partitioning do not " +
      "change results") {
    val ids = (0L until 37L).toDF("id")
    val imgs = Multimodal.withSyntheticBmp(ids, "id", w = 4, h = 3)
    def run(bs: Int, parts: Int) =
      Multimodal.decodeImageFeatures(
          imgs.repartition(parts), "id", "payload", batchSize = bs)
        .orderBy("id").collect().map(_.toString).toSeq
    assert(run(1, 1) === run(64, 7))
  }

  test("decodeAudioFeatures: javax.sound recovers syntheticWav " +
      "samples exactly; garbage and non-PCM-16 triage as false") {
    val ids = Seq(5L, 123L, 4096L).toDF("id")
    val wavs = Multimodal.withSyntheticWav(ids, "id",
      nSamples = 200, sampleRate = 8000)
    val corrupt = Seq(
      (-1L, "RIFF....WAVE but junk".getBytes("UTF-8")),
      (-2L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.decodeAudioFeatures(
        wavs.unionByName(corrupt), "id", "payload", batchSize = 2)
      .as[(Long, Boolean, Option[Int], Option[Int], Option[Int],
        Option[Long], Option[Int], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (id <- Seq(5L, 123L, 4096L)) {
      val samples = (0 until 200).map(i =>
        (Math.floorMod(id * 31 + 7L * i, 4001L) - 2000L).toInt)
      val r = out(id)
      assert(r._2 && r._3 === Some(8000) && r._4 === Some(1) &&
        r._5 === Some(16) && r._6 === Some(200L), s"id=$id: $r")
      assert(r._7 === Some(samples.map(math.abs).max), s"id=$id peak")
      // integer sum / exact count: bit-exact
      assert(r._8 === Some(
        samples.map(s => math.abs(s).toLong).sum.toDouble / 200),
        s"id=$id mean_abs")
    }
    for (id <- Seq(-1L, -2L)) {
      val r = out(id)
      assert(!r._2 && r._3.isEmpty && r._8.isEmpty, s"id=$id: $r")
    }
  }

  test("decodeAudioFeatures: big-endian PCM (AIFF) honors the byte " +
      "order — features identical to the little-endian WAV twin") {
    import javax.sound.sampled._
    val wav = Multimodal.syntheticWav(5L, 200, 8000)
    val src = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bigFmt = new AudioFormat(8000f, 16, 1, true, true)
    val conv = AudioSystem.getAudioInputStream(bigFmt, src)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(conv, AudioFileFormat.Type.AIFF, bos)
    val rows = Seq((1L, wav), (2L, bos.toByteArray))
      .toDF("id", "payload")
    val out = Multimodal.decodeAudioFeatures(rows, "id", "payload")
      .as[(Long, Boolean, Option[Int], Option[Int], Option[Int],
        Option[Long], Option[Int], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 && out(2L)._2)
    // identical samples through opposite byte orders
    assert(out(2L)._6 === out(1L)._6, "n_samples")
    assert(out(2L)._7 === out(1L)._7, "peak")
    assert(out(2L)._8 === out(1L)._8, "mean_abs")
  }

  /** Test-side aHash replay: the operator's integer pipeline
    * recomputed directly from a pixel function. */
  private def ahashOf(w: Int, h: Int)(
      px: (Int, Int) => (Int, Int, Int)): String = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val luma = 299L * r + 587L * g + 114L * b
      val i = (y * 8 / h) * 8 + (x * 8 / w)
      sums(i) += luma; cnts(i) += 1L; tot += luma
    }
    val n = w.toLong * h
    (0 until 64).map(i =>
      if (sums(i) * n > tot * cnts(i)) '1' else '0').mkString
  }

  test("imageAHash: black/white golden, constant-image zeros, " +
      "formula replay, small/undecodable triage") {
    // left half black, right half white (8x8, one pixel per block):
    // white pixels are above the global mean, black below
    val split = Multimodal.bmpFrom(8, 8)((x, _) =>
      if (x < 4) (0, 0, 0) else (255, 255, 255))
    val const = Multimodal.bmpFrom(8, 8)((_, _) => (17, 99, 200))
    val tiny = Multimodal.bmpFrom(4, 4)((_, _) => (1, 2, 3))
    val junk = Array[Byte](1, 2, 3)
    val df = Seq((1L, split), (2L, const), (3L, tiny), (4L, junk))
      .toDF("id", "payload")
    val got = Multimodal.imageAHash(df, "id", "payload")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((true, Some("00001111" * 8))))
    assert(got(2L) === ((true, Some("0" * 64))))
    assert(got(3L) === ((false, None)), "sub-8px image must triage")
    assert(got(4L) === ((false, None)), "junk bytes must triage")

    // decode path == arithmetic replay on the textured fixtures
    def basePx(seed: Long)(x: Int, y: Int) = {
      val s11 = seed % 11; val s13 = seed % 13; val s7 = seed % 7
      val xy = x.toLong * y
      (Math.floorMod(seed * 7 + (1 + s11) * x + (2 + s13) * y
          + (1 + s7) * xy, 256).toInt,
        Math.floorMod(seed * 11 + (3 + s13) * x + (1 + s11) * y
          + (2 + s7) * xy, 256).toInt,
        Math.floorMod(seed * 13 + (2 + s11) * x + (3 + s13) * y
          + (3 + s7) * xy, 256).toInt)
    }
    val fx = Seq(
      (10L, Multimodal.syntheticBmpTextured(10L, 16, 16)),
      (11L, Multimodal.syntheticBmpTextured(11L, 16, 16)),
      (12L, Multimodal.syntheticBmpTexturedVariant(10L, 16, 16, 8, 2, 2)))
      .toDF("id", "payload")
    val gfx = Multimodal.imageAHash(fx, "id", "payload")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> r._3.get).toMap
    assert(gfx(10L) === ahashOf(16, 16)(basePx(10L)))
    assert(gfx(11L) === ahashOf(16, 16)(basePx(11L)))
    def varPx(x: Int, y: Int) = {
      val (r, g, b) = basePx(10L)(x, y)
      if (x < 2 && y < 2)
        ((r + 8) % 256, (g + 8) % 256, (b + 8) % 256)
      else (r, g, b)
    }
    assert(gfx(12L) === ahashOf(16, 16)(varPx _))
  }

  test("imageNearDups: perturbed twin pairs at replayed hamming; " +
      "triaged payloads never pair") {
    // seed 10: s11 = 10, s13 = 10, s7 = 3
    def tex(d0: Long)(x: Int, y: Int) = {
      val d = if (x < 2 && y < 2) d0 else 0L
      val xy = x.toLong * y
      (Math.floorMod(10L * 7 + 11L * x + 12L * y + 4L * xy + d,
          256).toInt,
        Math.floorMod(10L * 11 + 13L * x + 11L * y + 5L * xy + d,
          256).toInt,
        Math.floorMod(10L * 13 + 12L * x + 13L * y + 6L * xy + d,
          256).toInt)
    }
    val expBase = ahashOf(16, 16)(tex(0L))
    val expVar = ahashOf(16, 16)(tex(8L))
    val expHam = expBase.zip(expVar).count { case (a, b) => a != b }
    val df = Seq(
      (1L, Multimodal.syntheticBmpTextured(10L, 16, 16)),
      (2L, Multimodal.syntheticBmpTexturedVariant(10L, 16, 16, 8, 2, 2)),
      (3L, Multimodal.syntheticBmpTextured(10L, 16, 16)), // exact re-save of 1
      (4L, Array[Byte](9, 9, 9))) // undecodable: never pairs
      .toDF("id", "payload")
    val got = Multimodal.imageNearDups(df, "id", "payload")
      .as[(Long, Long, Int)].collect().toSeq
    // the exact re-save pairs at hamming 0 with both twins' partners
    assert(got.contains((1L, 3L, 0)))
    if (expHam <= 3) {
      assert(got.contains((1L, 2L, expHam)))
      assert(got.contains((2L, 3L, expHam)))
    } else {
      assert(!got.exists(p => p._1 == 1L && p._2 == 2L),
        s"hamming $expHam above maxHamming must be filtered")
    }
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  /** Independent in-test pHash replay: floor-grid cells, two exact
    * integer DCT passes against the shared cosine table, 63-AC
    * order-statistic median, sign bits. */
  private def phashOf(w: Int, h: Int, grid: Int)(
      px: (Int, Int) => (Int, Int, Int)): String = {
    val n = grid
    val c = Array.ofDim[Long](n, 8)
    Multimodal.phashDctTable(n).foreach { case (i, u, v) => c(i)(u) = v }
    val sums = Array.ofDim[Long](n, n)
    val cnts = Array.ofDim[Long](n, n)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sums(x * n / w)(y * n / h) += 299L * r + 587L * g + 114L * b
      cnts(x * n / w)(y * n / h) += 1L
    }
    val coef = Array.ofDim[Long](64)
    for (u <- 0 until 8; v <- 0 until 8)
      coef(u * 8 + v) = (0 until n).map { x =>
        (0 until n).map(y =>
          (sums(x)(y) / cnts(x)(y)) * c(y)(v)).sum * c(x)(u)
      }.sum
    val ac = coef.drop(1)
    val med = ac.sorted.apply(31)
    ac.map(v => if (v > med) '1' else '0').mkString
  }

  test("audioSpectralProbe: basis-table shape, independent replay " +
      "parity, exact DC-bin golden, short/junk triage") {
    val tab8 = Multimodal.dftTable(8, Seq(0, 1))
    assert(tab8.size === 16)
    tab8.filter(_._2 == 0).foreach { case (_, _, c, s) =>
      assert(c === 10000L && s === 0L, "k = 0 is cos 1 / sin 0")
    }
    assert(tab8.forall(r => math.abs(r._3) <= 10000L &&
      math.abs(r._4) <= 10000L))

    // stereo PCM: interleaved channels would DFT a frequency-mixed
    // signal — must triage, not probe garbage (r13 ADVICE)
    val stereo = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(8000f, 16, 2, true, false)
      val raw = Array.tabulate[Byte](4 * 64)(i => (i % 97).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, 64)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val bins = Seq(0, 2, 7)
    val df = Seq(
      (1L, Multimodal.syntheticWav(5L, 64, 8000)),
      (2L, Multimodal.syntheticWav(5L, 32, 8000)), // too short for n
      (3L, Array[Byte](1, 2, 3)),
      (4L, stereo)) // 2-channel: triage like non-16-bit PCM
      .toDF("id", "payload")
    val got = Multimodal.audioSpectralProbe(df, "id", "payload",
        n = 64, bins = bins)
      .as[(Long, Boolean, Int, Option[Long], Option[Long],
        Option[String])].collect()
    assert(got.length === 12, "one row per (id, bin)")
    val byIdBin = got.map(r => (r._1, r._3) -> r).toMap
    for (id <- Seq(2L, 3L, 4L); k <- bins) {
      val r = byIdBin((id, k))
      assert(!r._2 && r._4.isEmpty && r._5.isEmpty && r._6.isEmpty,
        s"id $id bin $k must triage")
    }
    // independent arithmetic replay of the decoded path
    val samples = (0 until 64)
      .map(i => Math.floorMod(5L * 31 + 7L * i, 4001L) - 2000L)
    val t64 = Multimodal.dftTable(64, bins)
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    for (k <- bins) {
      val re = (0 until 64).map(t => samples(t) * t64((t, k))._1).sum
      val im = -(0 until 64).map(t => samples(t) * t64((t, k))._2).sum
      val r = byIdBin((1L, k))
      assert(r._2 && r._4.contains(re) && r._5.contains(im))
      assert(r._6.contains(
        (BigInt(re) * BigInt(re) + BigInt(im) * BigInt(im)).toString))
    }
    // DC bin is the exact scaled sample sum with zero imaginary part
    assert(byIdBin((1L, 0))._4.contains(10000L * samples.sum))
    assert(byIdBin((1L, 0))._5.contains(0L))
  }

  test("audioSpectralSweep: per-window replay parity, tone switch " +
      "separates windows where the first-n probe cannot, cap + triage") {
    val wav = Multimodal.syntheticToneWav(9L, 192, 16000,
      n = 64, binFirst = 5, binSecond = 11)
    val df = Seq(
      (1L, wav),
      (2L, Multimodal.syntheticWav(2L, 32, 16000)), // too short
      (3L, Array[Byte](9, 9, 9)))
      .toDF("id", "payload")
    val bins = Seq(0, 5, 11)
    val got = Multimodal.audioSpectralSweep(df, "id", "payload",
        n = 64, hop = 64, bins = bins, maxWindows = 8)
      .as[(Long, Boolean, Int, Option[Long], Int, Option[Long],
        Option[Long], Option[String])].collect()
    // 3 windows x 3 bins for the good clip, 1 triage row per bin each
    // for the short and corrupt clips
    assert(got.count(_._1 == 1L) === 9)
    assert(got.count(r => r._1 == 2L || r._1 == 3L) === 6)
    got.filter(r => r._1 != 1L).foreach { r =>
      assert(!r._2 && r._3 == 0 && r._4.isEmpty && r._8.isEmpty)
    }
    val byWinBin = got.filter(_._1 == 1L)
      .map(r => (r._3, r._5) -> r).toMap
    // independent arithmetic replay: regenerate samples from the
    // fixture formula and fold the shared dft literals per window
    val tone = Multimodal.dftTable(64, Seq(5, 11))
      .map { case (t, k, c, _) => (t, k) -> c }.toMap
    val samples = (0 until 192).map { i =>
      val bin = if (i < 96) 5 else 11
      tone((i % 64, bin)) + (Math.floorMod(9L * 31 + 7L * i, 41L) - 20L)
    }
    val d64 = Multimodal.dftTable(64, bins)
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    for (w <- 0 until 3; k <- bins) {
      val re = (0 until 64).map(t => samples(w * 64 + t) * d64((t, k))._1).sum
      val im = -(0 until 64).map(t => samples(w * 64 + t) * d64((t, k))._2).sum
      val r = byWinBin((w, k))
      assert(r._2 && r._4.contains(w * 64L) &&
        r._6.contains(re) && r._7.contains(im), s"w=$w k=$k")
    }
    def pw(w: Int, k: Int) = BigInt(byWinBin((w, k))._8.get)
    // window 0 is pure tone A (bin 5), window 2 pure tone B (bin 11)
    assert(pw(0, 5) > pw(0, 11) * 100, "window 0 concentrates at bin 5")
    assert(pw(2, 11) > pw(2, 5) * 100, "window 2 concentrates at bin 11")
    // the first-n probe sees ONLY tone A — bin 11 reads as noise
    val probe = Multimodal.audioSpectralProbe(
        df.where(col("id") === 1L), "id", "payload", n = 64, bins = bins)
      .as[(Long, Boolean, Int, Option[Long], Option[Long],
        Option[String])].collect()
      .map(r => r._3 -> BigInt(r._6.get)).toMap
    assert(probe(5) > probe(11) * 100,
      "first-n probe cannot see the mid-clip switch to tone B")
    // maxWindows cap is real: cap at 2 drops window 2
    val capped = Multimodal.audioSpectralSweep(df.where(col("id") === 1L),
        "id", "payload", n = 64, hop = 64, bins = bins, maxWindows = 2)
      .select("win_idx").as[Int].collect()
    assert(capped.toSet === Set(0, 1))
  }

  test("melEnergies (M19): band pooling matches a manual " +
      "weight-sum over the sweep; the two tones land in different " +
      "argmax bands; triage rows NULL per band; deterministic") {
    val wav = Multimodal.syntheticToneWav(3L, 192, 16000, 64, 5, 11)
    val df = Seq(
      (1L, wav),
      (2L, "RIFF....not a wav".getBytes("UTF-8")))
      .toDF("id", "payload")
    val got = Multimodal.melEnergies(df, "id", "payload",
        n = 64, hop = 64, nMels = 6, sampleRate = 16000,
        maxWindows = 8)
      .as[(Long, Boolean, Int, Int, Option[String])].collect()
    // manual replay: sweep power × melWeights, summed as BigInt
    val sweep = Multimodal.audioSpectralSweep(df.where($"id" === 1L),
        "id", "payload", n = 64, hop = 64, bins = 0 to 32,
        maxWindows = 8)
      .as[(Long, Boolean, Int, Option[Long], Int, Option[Long],
        Option[Long], Option[String])].collect()
      .map(r => (r._3, r._5) -> BigInt(r._8.get)).toMap
    val mw = Multimodal.melWeights(64, 6, 16000)
    for ((id, ok, w, m, e) <- got if id == 1L) {
      assert(ok)
      val want = mw.filter(_._1 == m)
        .map { case (_, k, wq) => sweep((w, k)) * wq }.sum
      assert(BigInt(e.get) === want, s"win $w mel $m")
    }
    // tone separation: 1250 Hz (win 0) peaks in band 2, 2750 Hz
    // (win 2) in band 3 — the log-frequency read
    def argmax(w: Int) = got.filter(r => r._1 == 1L && r._3 == w)
      .maxBy(r => BigInt(r._5.get))._4
    assert(argmax(0) === 2 && argmax(2) === 3,
      s"band separation: ${argmax(0)} vs ${argmax(2)}")
    // every decoded window carries all 6 bands
    assert(got.count(r => r._1 == 1L && r._3 == 0) === 6)
    // corrupt clip: one NULL-energy row per band at window 0
    val tri = got.filter(_._1 == 2L)
    assert(tri.length === 6 &&
      tri.forall(r => !r._2 && r._3 == 0 && r._5.isEmpty))
    // determinism
    val again = Multimodal.melEnergies(df, "id", "payload",
        n = 64, hop = 64, nMels = 6, sampleRate = 16000,
        maxWindows = 8)
      .as[(Long, Boolean, Int, Int, Option[String])].collect()
    assert(again.sortBy(r => (r._1, r._3, r._4)).toSeq ===
      got.sortBy(r => (r._1, r._3, r._4)).toSeq)
  }

  test("videoSceneChanges: planted cut flags at the boundary, static " +
      "frames read hamming 0, per-frame pHash parity with the fused " +
      "operator, partial tails drop, corrupt frames triage") {
    val clip = Multimodal.syntheticVideo(9L, 6, 16, 16, switchAt = 3)
    assert(clip.length === 822 * 6)
    val partial = Multimodal.syntheticVideo(5L, 2, 16, 16, 1) ++
      Array.fill[Byte](100)(7)
    val corrupt = Array.fill[Byte](822 * 2)(3)
    val df = Seq((1L, clip), (2L, partial), (3L, corrupt))
      .toDF("id", "payload")
    val got = Multimodal.videoSceneChanges(df, "id", "payload",
        frameBytes = 822, grid = 16, threshold = 10)
      .as[(Long, Int, Boolean, Option[String], Option[Int],
        Option[Boolean])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // clip 1: 6 frames; 0 starts a scene; 1-2 identical to 0;
    // 3 is the cut; 4-5 identical to 3
    assert(got.keySet.count(_._1 == 1L) === 6)
    assert(got((1L, 0)) === ((1L, 0, true,
      got((1L, 0))._4, None, Some(true))))
    for (f <- Seq(1, 2, 4, 5))
      assert(got((1L, f))._5 === Some(0) &&
        got((1L, f))._6 === Some(false), s"static frame $f")
    val cut = got((1L, 3))
    assert(cut._5.exists(_ >= 10) && cut._6 === Some(true),
      s"planted cut must flag: $cut")
    // per-frame pHash parity with the fused single-image operator
    val sceneHashes = Multimodal.imagePerceptualHashes(
        Seq((0L, Multimodal.syntheticBmpTextured(9L * 31 + 1, 16, 16)),
          (1L, Multimodal.syntheticBmpTextured(9L * 31 + 2, 16, 16)))
          .toDF("id", "payload"), "id", "payload")
      .as[(Long, Boolean, Option[String], Option[String])]
      .collect().map(r => r._1 -> r._4.get).toMap
    assert(got((1L, 0))._4 === Some(sceneHashes(0L)))
    assert(got((1L, 3))._4 === Some(sceneHashes(1L)))
    // the cut hamming equals the direct hash comparison
    val direct = sceneHashes(0L).zip(sceneHashes(1L))
      .count { case (a, b) => a != b }
    assert(cut._5 === Some(direct))
    // clip 2: 100-byte tail dropped -> exactly 2 frames, cut at 1
    assert(got.keySet.count(_._1 == 2L) === 2)
    assert(got((2L, 1))._5.exists(_ >= 10) &&
      got((2L, 1))._6 === Some(true))
    // clip 3: complete frames that don't decode -> triage rows,
    // frame 0 still opens a scene, frame 1 unknown (NULL)
    assert(got((3L, 0)) === ((3L, 0, false, None, None, Some(true))))
    assert(got((3L, 1)) === ((3L, 1, false, None, None, None)))
  }

  test("gifSceneChanges (M18): real codec frame directory — lossless " +
      "indexed round-trip, planted cut flags, triage rows for " +
      "corrupt/truncated containers, single-frame clip, determinism") {
    // the fixture's GIF encode→decode round-trip is BIT-EXACT: the
    // decoded raster reproduces gifPixelIndex (the oracle's contract)
    val bytes = Multimodal.syntheticGif(9L, 4, 16, 16, switchAt = 2)
    assert(new String(bytes.take(6), "US-ASCII") === "GIF89a")
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis, false, true)
    assert(reader.getNumImages(true) === 4)
    for (f <- 0 until 4) {
      val img = reader.read(f)
      val seed = if (f < 2) 9L * 31 + 1 else 9L * 31 + 2
      for (y <- 0 until 16; x <- 0 until 16) {
        val idx = Multimodal.gifPixelIndex(seed, x, y)
        assert(img.getRGB(x, y) === (0xff000000 | (idx << 16) |
          (idx << 8) | idx), s"f=$f x=$x y=$y")
      }
    }
    reader.dispose(); iis.close()
    // frame byte spans differ per content (LZW) — a fixed stride
    // could not slice this container; only the directory can
    val clip = Multimodal.syntheticGif(1L, 6, 16, 16, switchAt = 3)
    val df = Seq(
      (1L, clip),
      (2L, Array.fill[Byte](120)(7)),           // no reader claims it
      (3L, clip.take(20)),                      // header, cut mid-table
      (4L, Multimodal.syntheticGif(5L, 1, 16, 16, 0)))
      .toDF("id", "payload")
    val got = Multimodal.gifSceneChanges(df, "id", "payload",
        grid = 16, threshold = 10)
      .as[(Long, Int, Boolean, Option[String], Option[Int],
        Option[Boolean])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // clip 1: 6 decoded frames, static until the cut at 3
    assert(got.keySet.count(_._1 == 1L) === 6)
    assert(got((1L, 0))._6 === Some(true))
    for (f <- Seq(1, 2, 4, 5))
      assert(got((1L, f))._5 === Some(0) &&
        got((1L, f))._6 === Some(false), s"static frame $f")
    assert(got((1L, 3))._5.exists(_ >= 10) &&
      got((1L, 3))._6 === Some(true))
    // the GIF pHash equals the BMP pHash of the same pixel formula's
    // gray image (luma 1000·idx both ways) — cross-codec parity
    val gray = Multimodal.bmpFrom(16, 16)((x, y) => {
      val i = Multimodal.gifPixelIndex(1L * 31 + 1, x, y); (i, i, i)
    })
    val bmpHash = Multimodal.imagePHash(
        Seq((0L, gray)).toDF("id", "payload"), "id", "payload",
        grid = 16)
      .as[(Long, Boolean, Option[String])].collect().head._3
    assert(got((1L, 0))._4 === bmpHash)
    // corrupt + truncated: ONE triage row each, scene at 0 by
    // convention, everything else NULL
    assert(got((2L, 0)) === ((2L, 0, false, None, None, Some(true))))
    assert(got((3L, 0)) === ((3L, 0, false, None, None, Some(true))))
    assert(got.keySet.count(_._1 == 2L) === 1)
    assert(got.keySet.count(_._1 == 3L) === 1)
    // single-frame clip: one decoded row, no hamming
    assert(got((4L, 0))._3 === true && got((4L, 0))._5 === None &&
      got((4L, 0))._6 === Some(true))
    // encoder determinism (no timestamps in GIF89a)
    assert(java.util.Arrays.equals(bytes,
      Multimodal.syntheticGif(9L, 4, 16, 16, switchAt = 2)))
  }

  test("imagePerceptualHashes: fused pass is byte-identical to the " +
      "single-hash operators; tiered triage") {
    val df = Seq(
      (1L, Multimodal.syntheticBmpTextured(3L, 16, 16)),
      (2L, Multimodal.syntheticBmpTextured(4L, 16, 16)),
      (3L, Multimodal.bmpFrom(8, 8)((_, _) => (1, 2, 3))), // < grid
      (4L, Multimodal.bmpFrom(4, 4)((_, _) => (1, 2, 3))), // < 8
      (5L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
    val fused = Multimodal.imagePerceptualHashes(df, "id", "payload",
        grid = 16)
      .as[(Long, Boolean, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val a = Multimodal.imageAHash(df, "id", "payload")
      .as[(Long, Boolean, Option[String])]
      .collect().map(r => r._1 -> r._3).toMap
    val p = Multimodal.imagePHash(df, "id", "payload", grid = 16)
      .as[(Long, Boolean, Option[String])]
      .collect().map(r => r._1 -> r._3).toMap
    for (id <- Seq(1L, 2L, 3L, 4L, 5L)) {
      assert(fused(id)._3 === a(id), s"ahash mismatch id $id")
      assert(fused(id)._4 === p(id), s"phash mismatch id $id")
    }
    // tiered triage: 8x8 decodes (ahash present) but is below the
    // pHash grid (phash NULL); sub-8px and junk fail both
    assert(fused(3L)._2 && fused(3L)._3.isDefined &&
      fused(3L)._4.isEmpty)
    assert(!fused(4L)._2 && !fused(5L)._2)
  }

  test("imagePHash: cosine-table shape, constant-image zeros, " +
      "formula replay, triage, and ramp robustness vs aHash") {
    val tab = Multimodal.phashDctTable(16)
    assert(tab.size === 128)
    assert(tab.filter(_._2 == 0).forall(_._3 == 10000L),
      "u = 0 row is cos(0) = 1 exactly")
    assert(tab.forall(t => math.abs(t._3) <= 10000L))

    val const = Multimodal.bmpFrom(16, 16)((_, _) => (17, 99, 200))
    val tiny = Multimodal.bmpFrom(8, 8)((_, _) => (1, 2, 3))
    val junk = Array[Byte](1, 2, 3)
    val df = Seq(
      (1L, const), (2L, tiny), (3L, junk),
      (10L, Multimodal.syntheticBmpTextured(10L, 16, 16)),
      (11L, Multimodal.syntheticBmpTexturedRamp(10L, 16, 16, 40)))
      .toDF("id", "payload")
    val got = Multimodal.imagePHash(df, "id", "payload", grid = 16)
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // constant image: every AC coefficient is 0 -> no bit above the
    // median -> all zeros
    assert(got(1L) === ((true, Some("0" * 63))))
    assert(got(2L) === ((false, None)), "sub-grid image must triage")
    assert(got(3L) === ((false, None)), "junk bytes must triage")

    // decode path == arithmetic replay (base + ramped fixtures)
    def basePx(seed: Long)(x: Int, y: Int) = {
      val s11 = seed % 11; val s13 = seed % 13; val s7 = seed % 7
      val xy = x.toLong * y
      (Math.floorMod(seed * 7 + (1 + s11) * x + (2 + s13) * y
          + (1 + s7) * xy, 256).toInt,
        Math.floorMod(seed * 11 + (3 + s13) * x + (1 + s11) * y
          + (2 + s7) * xy, 256).toInt,
        Math.floorMod(seed * 13 + (2 + s11) * x + (3 + s13) * y
          + (3 + s7) * xy, 256).toInt)
    }
    def rampPx(seed: Long, rampMax: Int)(x: Int, y: Int) = {
      val (r, g, b) = basePx(seed)(x, y)
      val s = (rampMax.toLong * x / 16).toInt
      (math.min(255, r + s), math.min(255, g + s),
        math.min(255, b + s))
    }
    assert(got(10L)._2.get === phashOf(16, 16, 16)(basePx(10L)))
    assert(got(11L)._2.get === phashOf(16, 16, 16)(rampPx(10L, 40)))

    // THE M14 claim: under a brightness ramp the aHash flips many
    // global-mean bits while the pHash flips few DCT-sign bits —
    // measured over 20 twin pairs (rampMax = 40, the q317 config).
    val ids = spark.range(0, 200).select(col("id"))
    val imgs = Multimodal.withSyntheticBmpRampPairs(ids, "id",
      w = 16, h = 16, everyK = 10L, rampMax = 40)
    val a = Multimodal.imageAHash(imgs, "id", "payload")
    val p = Multimodal.imagePHash(imgs, "id", "payload", grid = 16)
    def hams(dfh: org.apache.spark.sql.DataFrame, hc: String) = {
      val base = dfh.where(col("id") >= 0L)
        .select(col("id"), col(hc).as("ha"))
      val tw = dfh.where(col("id") < 0L)
        .select((-col("id") - 1L).as("id"), col(hc).as("hb"))
      base.join(tw, "id")
        .as[(Long, String, String)].collect()
        .map { case (id, x, y) =>
          id -> x.zip(y).count { case (i, j) => i != j } }
        .toMap
    }
    val ah = hams(a, "ahash")
    val ph = hams(p, "phash")
    assert(ah.size === 20 && ph.size === 20)
    // measured at this config: ahash avg 8.15 (min 3), phash avg 2.1
    // (max 4); pin loose envelopes so the contrast is the assertion
    assert(ph.values.sum * 2 < ah.values.sum,
      s"phash total ${ph.values.sum} must be < half ahash total " +
        s"${ah.values.sum}")
    assert(ah.keys.count(k => ph(k) < ah(k)) >= 18)
    assert(ph.values.max <= 8)
  }
  test("readGifFrames (M18b): delta-encoded GIF composites per " +
      "disposal metadata — restore-to-background blacks the rect, " +
      "restore-to-previous reverts; full-frame GIFs composite to " +
      "their stored rasters; non-GIF magic triages (r15 ADVICE)") {
    val seed = 7L
    val bytes = Multimodal.syntheticGifDelta(seed, 16, 16)
    assert(new String(bytes.take(6), "US-ASCII") === "GIF89a")
    val frames = Multimodal.readGifFrames(bytes)
    assert(frames.size === 5 && frames.forall(_._2 != null))
    // every composited pixel equals the frame plan's arithmetic
    // replay (the oracle's contract): luma 1000·idx, black = 0
    frames.foreach { case (fi, img) =>
      assert(img.getWidth === 16 && img.getHeight === 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val idx = Multimodal.gifDeltaExpectedIndex(
          seed, 16, 16, fi, x, y)
        val want =
          if (idx < 0) 0xff000000
          else 0xff000000 | (idx << 16) | (idx << 8) | idx
        assert(img.getRGB(x, y) === want, s"f=$fi x=$x y=$y")
      }
    }
    // frame 1's rect reads BLACK from frame 2 on (restore-to-
    // background applied after frame 1 emitted)
    assert(Multimodal.gifDeltaExpectedIndex(
      seed, 16, 16, 1, 10, 3) >= 0)
    assert(Multimodal.gifDeltaExpectedIndex(
      seed, 16, 16, 2, 10, 3) === -1)
    // frame 3's patch is GONE by frame 4 (restore-to-previous):
    // frame 4 == frame 2 everywhere outside frame 4's own patch
    for (y <- 0 until 16; x <- 0 until 16
         if !(x >= 12 && y >= 12)) {
      assert(Multimodal.gifDeltaExpectedIndex(
        seed, 16, 16, 4, x, y) ===
        Multimodal.gifDeltaExpectedIndex(seed, 16, 16, 2, x, y))
    }
    assert((4 until 12).exists(x => (4 until 12).exists(y =>
      Multimodal.gifDeltaExpectedIndex(seed, 16, 16, 3, x, y) !==
        Multimodal.gifDeltaExpectedIndex(seed, 16, 16, 2, x, y))),
      "frame 3 must visibly differ from frame 2 inside its patch")
    // full-frame GIFs composite to exactly their stored rasters —
    // the r15 q337 fixtures are bit-unchanged by the M18b rewrite
    val full = Multimodal.readGifFrames(
      Multimodal.syntheticGif(9L, 3, 16, 16, 2))
    assert(full.size === 3 && full.forall(_._2 != null))
    full.foreach { case (fi, img) =>
      val s2 = if (fi < 2) 9L * 31 + 1 else 9L * 31 + 2
      for (y <- 0 until 16; x <- 0 until 16) {
        val idx = Multimodal.gifPixelIndex(s2, x, y)
        assert(img.getRGB(x, y) ===
          (0xff000000 | (idx << 16) | (idx << 8) | idx))
      }
    }
    // an ImageIO-readable NON-GIF payload (BMP) triages instead of
    // decoding as a one-frame clip
    val bmp = Multimodal.syntheticBmpTextured(3L, 16, 16)
    assert(Multimodal.readGifFrames(bmp).isEmpty)
    val got = Multimodal.gifSceneChanges(
        Seq((1L, bmp)).toDF("id", "payload"), "id", "payload",
        grid = 16, threshold = 10)
      .as[(Long, Int, Boolean, Option[String], Option[Int],
        Option[Boolean])].collect()
    assert(got.toSeq === Seq((1L, 0, false, None, None, Some(true))))
    // fixture determinism
    assert(java.util.Arrays.equals(bytes,
      Multimodal.syntheticGifDelta(seed, 16, 16)))
  }

  test("mfcc (M20): coefficients replay from mel energies via the " +
      "mantissa log table + integer DCT-II; triage rows NULL; an " +
      "all-silence clip takes the zero-energy log floor") {
    val ids = Seq(2L, 4L).toDF("id")
    val wavs = Multimodal.withSyntheticToneWav(
      ids, "id", nSamples = 192, sampleRate = 16000, n = 64,
      binFirst = 5, binSecond = 11)
    val corrupt = Seq((-2L, "RIFF....not a wav".getBytes("UTF-8")))
      .toDF("id", "payload")
    val df = wavs.unionByName(corrupt)
    // independent replay: melEnergies → string log-quantize → DCT
    val me = Multimodal.melEnergies(df, "id", "payload", 64, 64, 6,
        16000, 8)
      .as[(Long, Boolean, Int, Int, Option[String])].collect()
    val logT = Multimodal.milliLog10Table.toMap
    def lq(e: Option[String]): Option[Long] = e.map { s =>
      if (s == "0") -3000L
      else 1000L * (s.length - 3) +
        logT(s.padTo(3, '0').take(3).toInt)
    }
    val dct = Multimodal.mfccDctTable(4, 6)
    val expected = me.groupBy(r => (r._1, r._2, r._3)).flatMap {
      case ((id, ok, w), rows) =>
        (0 until 4).map { j =>
          val cs = dct.filter(_._1 == j)
            .map(t => t._2 -> t._3).toMap
          val terms = rows.toSeq.map(r =>
            lq(r._5).map(_ * cs(r._4)))
          val v =
            if (terms.forall(_.isEmpty)) None
            else Some(terms.flatten.sum)
          (id, ok, w, j) -> v
        }
    }
    val got = Multimodal.mfcc(df, "id", "payload", 64, 64, 6,
        16000, 8, nCoefs = 4)
      .as[(Long, Boolean, Int, Int, Option[Long])].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"cell $k") }
    // triage clip: every coefficient NULL
    assert((0 until 4).forall(j => got((-2L, false, 0, j)).isEmpty))
    // all-silence WAV: every band energy 0 → L = −3000 (the defined
    // floor, one grid decade below E = 1) → mfcc_j = −3000·Σ_m c_jm
    val dataLen = 192 * 2
    val silence = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    silence.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    silence.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
    silence.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val sgot = Multimodal.mfcc(
        Seq((5L, silence.array())).toDF("id", "payload"),
        "id", "payload", 64, 64, 6, 16000, 8, nCoefs = 4)
      .as[(Long, Boolean, Int, Int, Option[Long])].collect()
      .map(r => (r._3, r._4) -> r._5).toMap
    for (j <- 0 until 4; w <- 0 until 3) {
      val want = -3000L *
        dct.filter(_._1 == j).map(_._3).sum
      assert(sgot((w, j)) === Some(want), s"silence w=$w j=$j")
    }
    // log-table endpoints and size (the bounded quantized domain)
    assert(logT(100) === 2000L && logT(999) === 3000L)
    assert(Multimodal.milliLog10Table.size === 900)
  }
}

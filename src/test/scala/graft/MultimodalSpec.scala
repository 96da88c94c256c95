package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType, StructType}

/** m01–m04: binary-column plumbing, byte features, frame windows, and
  * the REAL javax.imageio image path. The byte-feature arithmetic is
  * pinned exactly (header checksum, byte histogram), and the image
  * path is verified as a true encode→decode round trip through the
  * JDK codec — pixels in, identical pixels out. */
class MultimodalSpec extends SparkSpec {

  test("m01 schema: binary payload + typed metadata struct") {
    val df = Multimodal.binaryWithMeta(tables.documents)
    df.schema("payload").dataType shouldBe BinaryType
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    meta("mime").dataType shouldBe StringType
    meta("width").dataType shouldBe IntegerType
    meta("height").dataType shouldBe IntegerType
  }

  test("m01 stays a narrow projection (no shuffle)") {
    planOf(Multimodal.binaryWithMeta(tables.documents)) should not include "Exchange"
  }

  test("m01 payload round-trips the text bytes exactly") {
    val r = Multimodal.binaryWithMeta(tables.documents)
      .select(col("doc_id"), col("payload").cast("string").as("back"))
      .join(tables.documents, "doc_id")
      .where(col("back") =!= col("text"))
    r.count() shouldBe 0
  }

  test("m02 byte features: known bytes give the pinned checksum + histogram") {
    import spark.implicits._
    val payload = Array.tabulate(256)(i => i.toByte) // every byte value once
    val out = Multimodal.byteFeatures(
      Seq(MediaRow(1L, payload, "image/png")).toDS()).collect().head
    out.n_bytes shouldBe 256
    out.header_sum shouldBe (0 until 16).sum // first 16 bytes: 0..15
    out.features.length shouldBe 8
    // uniform byte spread: each 32-wide bucket holds exactly 32/256
    out.features.foreach(f => f shouldBe (32.0 / 256.0) +- 1e-12)
  }

  test("m02 byte features are deterministic and partition-preserving") {
    import spark.implicits._
    val media = Multimodal.binaryWithMeta(tables.documents)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow].repartition(3)
    val a = Multimodal.byteFeatures(media)
    a.rdd.getNumPartitions shouldBe 3
    val run1 = a.collect().map(r => (r.doc_id, r.header_sum, r.features.toSeq)).sortBy(_._1)
    val run2 = Multimodal.byteFeatures(media).collect()
      .map(r => (r.doc_id, r.header_sum, r.features.toSeq)).sortBy(_._1)
    run1 shouldBe run2
  }

  test("m02 handles empty and null payloads without dividing by zero") {
    import spark.implicits._
    val rows = Seq(MediaRow(1L, Array.emptyByteArray, "a"), MediaRow(2L, null, "b"))
    val out = Multimodal.byteFeatures(rows.toDS()).collect().sortBy(_.doc_id)
    out.foreach { r =>
      r.n_bytes shouldBe 0
      r.header_sum shouldBe 0
      r.features.sum shouldBe 0.0
    }
  }

  test("m04 real codec round trip: hand-built PNG decodes to the exact pixels") {
    import spark.implicits._
    // build a known image OUTSIDE Spark, through the same JDK codec a
    // user's real PNGs would hit, and pin geometry + every pixel
    val w = 5; val h = 3
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 70) << 8) | (x + y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val out = Multimodal.decodeImages(
      Seq(MediaRow(7L, buf.toByteArray, "image/png")).toDS()).collect().head
    out.width shouldBe w
    out.height shouldBe h
    out.n_bytes shouldBe buf.toByteArray.length
    // expected digest + luma computed directly from the source pixels
    val md = java.security.MessageDigest.getInstance("MD5")
    var luma = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      md.update((rgb >> 16).toByte); md.update((rgb >> 8).toByte); md.update(rgb.toByte)
      luma += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    out.pixel_md5 shouldBe graft.Exact.hex(md.digest())
    out.mean_luma shouldBe luma.toDouble / (3.0 * w * h)
  }

  test("m07 dHash: deterministic, container-insensitive, perturbation-tolerant, discriminative") {
    import spark.implicits._
    def pngOf(img: java.awt.image.BufferedImage, fmt: String = "png"): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    // a 12x10 horizontal gradient — strong, stable left<right signs
    val a = new java.awt.image.BufferedImage(12, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 12)
      a.setRGB(x, y, (x * 20) << 16 | (x * 20) << 8 | (x * 20))
    // b = a with ONE subpixel nudged by +1 — perceptually identical
    val b = new java.awt.image.BufferedImage(12, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 12) b.setRGB(x, y, a.getRGB(x, y))
    b.setRGB(3, 3, (a.getRGB(3, 3) & 0xffffff) + 1)
    // c = the opposite gradient — structurally different
    val c = new java.awt.image.BufferedImage(12, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 12)
      c.setRGB(x, y, ((220 - x * 18) << 16) | ((220 - x * 18) << 8) | (220 - x * 18))
    val rows = Multimodal.dhashImages(Seq(
      MediaRow(1L, pngOf(a), "image/png"),
      MediaRow(2L, pngOf(a), "image/png"),        // identical bytes
      MediaRow(3L, pngOf(a, "bmp"), "image/bmp"), // same pixels, other container
      MediaRow(4L, pngOf(b), "image/png"),
      MediaRow(5L, pngOf(c), "image/png")
    ).toDS()).collect().map(r => r.doc_id -> r.dhash).toMap
    def ham(x: String, y: String): Int = x.zip(y).count(p => p._1 != p._2)
    rows(1L) should have length 64
    rows(2L) shouldBe rows(1L)                 // determinism
    rows(3L) shouldBe rows(1L)                 // container-insensitive
    ham(rows(1L), rows(4L)) should be <= 2     // one-subpixel nudge
    ham(rows(1L), rows(5L)) should be > 6      // opposite gradient is far
    // pair machinery: the three same-pixel images + the nudge pair up,
    // the opposite gradient never does
    val pairs = Multimodal.imageNearDupPairs(Seq(
      MediaRow(1L, pngOf(a), "image/png"),
      MediaRow(2L, pngOf(a), "image/png"),
      MediaRow(4L, pngOf(b), "image/png"),
      MediaRow(5L, pngOf(c), "image/png")
    ).toDS()).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    pairs((1L, 2L)) shouldBe 0
    pairs.keySet should contain allOf ((1L, 4L), (2L, 4L))
    pairs.keys.flatMap(k => Seq(k._1, k._2)) should not contain 5L
  }

  test("m10 audio embedding: container-insensitive, gain near-parallel, law parity; q99 dedups the near-copy") {
    import spark.implicits._
    def wav2(samples: Array[Short], aiff: Boolean = false): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        if (aiff) {
          pcm(2 * i) = ((samples(i) >> 8) & 0xff).toByte
          pcm(2 * i + 1) = (samples(i) & 0xff).toByte
        } else {
          pcm(2 * i) = (samples(i) & 0xff).toByte
          pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, aiff)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        if (aiff) javax.sound.sampled.AudioFileFormat.Type.AIFF
        else javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val a = Array.tabulate[Short](650)(i => (i * 4).toShort)
    val louder = a.map(s => (s * 2).toShort)
    val other = Array.tabulate[Short](650)(i => ((650 - i) * 4).toShort)
    val media = Seq(
      Multimodal.MediaRow(1L, wav2(a), "audio/wav"),
      Multimodal.MediaRow(2L, wav2(a, aiff = true), "audio/aiff"),
      Multimodal.MediaRow(3L, wav2(louder), "audio/wav"),
      Multimodal.MediaRow(4L, wav2(other), "audio/wav")).toDS()
    val out = Multimodal.embedAudio(media).collect()
      .map(r => r.doc_id -> r.emb).toMap
    // WAV and AIFF of the SAME samples embed identically
    out(1L).toSeq shouldBe out(2L).toSeq
    // a 2x-gain copy embeds exactly 4x (energies scale by c^2) —
    // parallel under cosine, the gain-invariance claim made literal
    out(3L).toSeq shouldBe out(1L).toSeq.map(_ * 4)
    // a genuinely different envelope is far from parallel
    def cos(u: Array[Long], v: Array[Long]): Double = {
      val ud = u.map(_.toDouble); val vd = v.map(_.toDouble)
      val m = ud.sum / 64.0; val n2 = vd.sum / 64.0
      val uc = ud.map(_ - m); val vc = vd.map(_ - n2)
      uc.zip(vc).map { case (x, y) => x * y }.sum /
        (math.sqrt(uc.map(x => x * x).sum) * math.sqrt(vc.map(x => x * x).sum))
    }
    cos(out(1L), out(3L)) should be > 0.999
    cos(out(1L), out(4L)) should be < 0.5
    // law parity: golden env_emb (PCM law, no parser) equals the
    // decode-path embedding for a law-synthesized WAV
    val payload = "the audio golden law parity probe".getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.io.ByteArrayOutputStream()
    val g = GoldenGen.audioGolden("k", payload, md, buf)
    val lawMedia = Multimodal.encodeWav(
      Seq(Multimodal.MediaRow(7L, payload, "text/plain")).toDS())
    Multimodal.embedAudio(lawMedia).collect().head.emb.mkString(" ") shouldBe g.env_emb
    // stereo fails loudly (the m08 contract)
    val stereo = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt, 16L)
      val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, b)
      b.toByteArray
    }
    val ex = intercept[Exception] {
      Multimodal.embedAudio(
        Seq(Multimodal.MediaRow(9L, stereo, "audio/wav")).toDS()).collect()
    }
    ex.getMessage should include("mono")
  }

  test("m08 audio fingerprint: container- and gain-independent, discriminative, pairs work") {
    import spark.implicits._
    // 16-bit mono PCM helpers through the REAL JDK writers
    def wav(samples: Array[Short], aiff: Boolean = false): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        if (aiff) { // AIFF is big-endian
          pcm(2 * i) = ((samples(i) >> 8) & 0xff).toByte
          pcm(2 * i + 1) = (samples(i) & 0xff).toByte
        } else {
          pcm(2 * i) = (samples(i) & 0xff).toByte
          pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        }
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, aiff)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        if (aiff) javax.sound.sampled.AudioFileFormat.Type.AIFF
        else javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    // a 650-sample ramp — strong monotone envelope; amplitudes small
    // enough that x2 gain cannot clip
    val a = Array.tabulate[Short](650)(i => (i * 4).toShort)
    val louder = a.map(s => (s * 2).toShort)
    val b = a.reverse // opposite envelope
    val rows = Multimodal.fingerprintAudio(Seq(
      MediaRow(1L, wav(a), "audio/wav"),
      MediaRow(2L, wav(a), "audio/wav"),          // identical bytes
      MediaRow(3L, wav(a, aiff = true), "audio/aiff"), // same samples, AIFF container
      MediaRow(4L, wav(louder), "audio/wav"),     // 2x gain — same envelope SHAPE
      MediaRow(5L, wav(b), "audio/wav")
    ).toDS()).collect().map(r => r.doc_id -> r.afp).toMap
    def ham(x: String, y: String): Int = x.zip(y).count(p => p._1 != p._2)
    rows(1L) should have length 64
    rows(2L) shouldBe rows(1L)              // determinism
    rows(3L) shouldBe rows(1L)              // container-independent
    rows(4L) shouldBe rows(1L)              // gain-independent (c^2 scales all energies)
    ham(rows(1L), rows(5L)) should be > 6   // reversed envelope is far
    // pair machinery: copies + gain copy pair up; the reverse never does
    val pairs = Multimodal.audioNearDupPairs(Seq(
      MediaRow(1L, wav(a), "audio/wav"),
      MediaRow(4L, wav(louder), "audio/wav"),
      MediaRow(5L, wav(b), "audio/wav")
    ).toDS()).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    pairs((1L, 4L)) shouldBe 0
    pairs.keys.flatMap(k => Seq(k._1, k._2)) should not contain 5L
    // stereo fails loudly: interleaved channels would silently change
    // the envelope (a stereo file and its mono master never pairing)
    val stereoPcm = new Array[Byte](400)
    val sfmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val sais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereoPcm), sfmt, 100L)
    val sbuf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(sais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sbuf)
    val ex = intercept[Exception] {
      Multimodal.fingerprintAudio(Seq(
        MediaRow(9L, sbuf.toByteArray, "audio/wav")).toDS()).collect()
    }
    ex.getMessage should include("mix down")
  }

  test("m04 encodePng emits real PNGs; resize is exact nearest-neighbor") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"), "image/png"),
      MediaRow(2L, Array.tabulate[Byte](100)(_.toByte), "image/png")).toDS()
    val pngs = Multimodal.encodePng(media).collect().sortBy(_.doc_id)
    // PNG magic bytes — these are spec-compliant containers, not fakes
    pngs.foreach { p =>
      (p.payload.take(8).map(_ & 0xff).toSeq) shouldBe
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    }
    // decode is deterministic across runs (same digest both times)
    val d1 = Multimodal.decodeImages(Multimodal.encodePng(media)).collect()
      .map(r => (r.doc_id, r.width, r.height, r.pixel_md5)).sortBy(_._1)
    val d2 = Multimodal.decodeImages(Multimodal.encodePng(media)).collect()
      .map(r => (r.doc_id, r.width, r.height, r.pixel_md5)).sortBy(_._1)
    d1 shouldBe d2
    // resize to 2x2: dst(x,y) = src(x*sw/2, y*sh/2), checked per pixel
    val resized = Multimodal.decodeImages(
      Multimodal.resizeImages(Multimodal.encodePng(media), 2, 2)).collect()
    resized.foreach { r => r.width shouldBe 2; r.height shouldBe 2 }
    val srcImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngs.head.payload))
    val rszPayload = Multimodal.resizeImages(Multimodal.encodePng(media), 2, 2)
      .collect().sortBy(_.doc_id).head.payload
    val rszImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rszPayload))
    for (y <- 0 until 2; x <- 0 until 2)
      (rszImg.getRGB(x, y) & 0xffffff) shouldBe
        (srcImg.getRGB(x * srcImg.getWidth / 2, y * srcImg.getHeight / 2) & 0xffffff)
  }

  test("m04 summary runs over the real corpus: one row per image-mime doc") {
    val docs = tables.documents
    val out = Multimodal.imageDecodeSummary(docs)
    val expected = docs.filter(expr("doc_id % 3 = 0")).count()
    out.count() shouldBe expected
    // geometry matches encodePng's derivation and every digest is real
    out.collect().foreach { r =>
      r.getAs[Int]("width") should (be >= 1 and be <= 16)
      r.getAs[Int]("height") should (be >= 1 and be <= 16)
      r.getAs[String]("pixel_md5").length shouldBe 32
    }
  }

  test("m03 frame sampling: stride geometry, short-tail frame, exact window digests") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](150)(i => ('a' + i % 26).toByte)
    val media = Seq(MediaRow(1L, payload, "video/mp4"),
      MediaRow(2L, Array.emptyByteArray, "video/mp4")).toDS()
    val out = Multimodal.sampleFrames(media, frameSize = 32, stride = 64, maxFrames = 4)
      .collect().sortBy(r => (r.doc_id, r.frame_idx))
    // 150 bytes @ stride 64: offsets 0, 64, 128 (cap 4 never reached)
    out.map(r => (r.doc_id, r.frame_idx, r.byte_offset, r.n_bytes)) shouldBe Array(
      (1L, 0, 0, 32), (1L, 1, 64, 32), (1L, 2, 128, 22))
    def h(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    out(0).frame_hash shouldBe h(payload.slice(0, 32))
    out(2).frame_hash shouldBe h(payload.slice(128, 150))
  }

  test("m05 real codec round trip: hand-built PCM decodes to the exact samples") {
    import spark.implicits._
    // 4 known samples, hand-packed little-endian 16-bit — encode
    // through the REAL AudioSystem WAV writer, decode with the real
    // parser, and the PCM content digest must equal md5 of exactly
    // these bytes (container-independent: headers don't participate)
    val samples = Array[Short](0, 1000, -1000, 32767)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val media = Seq(Multimodal.MediaRow(7L, buf.toByteArray, "audio/wav")).toDS()
    val out = Multimodal.decodeAudio(media).collect()
    out should have length 1
    val r = out.head
    r.channels shouldBe 1
    r.sample_rate shouldBe 8000
    r.n_frames shouldBe 4L
    r.duration_ms shouldBe 0L // 4 frames / 8000 Hz, integer ms
    val md = java.security.MessageDigest.getInstance("MD5")
    r.pcm_md5 shouldBe graft.Exact.hex(md.digest(pcm))
    // rms over exact integer sum of squares: sqrt((0+1000^2+1000^2+32767^2)/4)
    r.rms shouldBe math.sqrt((1000L * 1000 + 1000L * 1000 + 32767L * 32767).toDouble / 4)
  }

  test("m05 unparseable payload fails loudly with the doc id") {
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(99L,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), "audio/wav")).toDS()
    val ex = intercept[Exception] {
      Multimodal.decodeAudio(junk).collect()
    }
    ex.getMessage should include("99")
  }

  test("m05 summary runs over the real corpus: one row per audio-mime doc") {
    val docs = tables.documents
    val expected = Multimodal.binaryWithMeta(docs)
      .filter(col("meta.mime") === "audio/wav").count()
    val rows = Multimodal.audioDecodeSummary(docs).collect()
    rows.length.toLong shouldBe expected
    rows.foreach { r =>
      r.getAs[Int]("channels") shouldBe 1
      r.getAs[Int]("sample_rate") shouldBe 8000
      r.getAs[Long]("n_frames") should be >= 64L
      r.getAs[String]("pcm_md5") should fullyMatch regex "[0-9a-f]{32}"
    }
  }

  test("m06 multi-frame round trip: hand-built animated GIF decodes frame-exact") {
    import spark.implicits._
    // 3 grayscale frames of known constant values — the 256-gray GIF
    // palette represents them exactly, so the decoded pixels must be
    // BIT-equal, not approximately equal
    val values = Array(10, 128, 250)
    val buf = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val out = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    values.foreach { v =>
      val img = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(i => img.setRGB(i % 2, i / 2, (v << 16) | (v << 8) | v))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); out.close(); writer.dispose()
    val media = Seq(Multimodal.MediaRow(5L, buf.toByteArray, "image/gif")).toDS()
    val all = Multimodal.decodeGifFrames(media, stride = 1).collect().sortBy(_.frame_idx)
    all should have length 3
    all.foreach { r =>
      r.n_frames shouldBe 3
      r.width shouldBe 2
      r.height shouldBe 2
    }
    // constant-gray frame: mean luminance IS the gray value, exactly
    all.map(_.mean_luma) shouldBe values.map(_.toDouble)
    // and the digest equals md5 over the known RGB byte stream
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = values.map { v =>
      graft.Exact.hex(md.digest(Array.fill(12)(v.toByte)))
    }
    all.map(_.pixel_md5).toSeq shouldBe expected.toSeq
    // stride=2 samples frames 0 and 2
    Multimodal.decodeGifFrames(media, stride = 2).collect()
      .map(_.frame_idx).sorted shouldBe Array(0, 2)
  }

  test("m06 golden law: encode->decode reproduces law pixels on adversarial gray ramps at every geometry") {
    import spark.implicits._
    // Round-13 regression guard for BOTH codec traps the golden oracle
    // caught: default-palette quantization (arbitrary, non-aligned
    // grays) and the reader's broken de-interlace of small heights
    // (any h < 8 with non-constant rows). Payloads are crafted so the
    // law produces varied geometry and dense gray ramps.
    val payloads = (0 until 24).map { k =>
      (k.toLong, Array.tabulate[Byte](37 + 11 * k)(i => ((i * 37 + k) % 256).toByte))
    }
    val media = payloads.map { case (id, b) =>
      Multimodal.MediaRow(id, b, "video/mp4")
    }.toDS()
    val got = Multimodal.decodeGifFrames(Multimodal.encodeGif(media))
      .collect().map(r => (r.doc_id, r.frame_idx) -> (r.pixel_md5, r.mean_luma))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    payloads.foreach { case (id, b) =>
      val expect = GoldenGen.gifGolden("k", b, md)
      expect.foreach { e =>
        got((id, e.frame_idx)) shouldBe ((e.pixel_md5, e.mean_luma))
      }
      // geometry must vary enough to cover the de-interlace trap
      val (_, h, _) = Multimodal.gifLaw(b)
      h should be <= 8
    }
  }

  test("m09 image embedding: container-insensitive, brightness-scaling near-parallel, law parity") {
    import spark.implicits._
    def img(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(11, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 7; x <- 0 until 11) {
        val v = f(x, y) & 0xff
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, buf)
      buf.toByteArray
    }
    val a = img((x, y) => 30 + x * 17 + y * 5)
    val media = Seq(
      Multimodal.MediaRow(1L, enc(a, "png"), "image/png"),
      Multimodal.MediaRow(2L, enc(a, "bmp"), "image/bmp")).toDS()
    val out = Multimodal.embedImages(media).collect()
      .map(r => r.doc_id -> r.emb.toSeq).toMap
    // two containers of the SAME pixels embed IDENTICALLY
    out(1L) shouldBe out(2L)
    // a brightness-halved copy embeds near-parallel (cosine > 0.99)
    // but NOT equal — the semantic-dup class exact hashing misses
    val dim = img((x, y) => (30 + x * 17 + y * 5) / 2)
    val dimEmb = Multimodal.embedImages(
      Seq(Multimodal.MediaRow(3L, enc(dim, "png"), "image/png")).toDS())
      .collect().head.emb
    dimEmb.toSeq should not be out(1L)
    val (u, v) = (out(1L).map(_.toDouble), dimEmb.map(_.toDouble))
    val cos = u.zip(v).map { case (x, y) => x * y }.sum /
      (math.sqrt(u.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    cos should be > 0.99
    // law parity: the golden generator's vector (law pixels, no
    // decode) equals the decode-path vector for a law-synthesized PNG
    val payload = "the golden law parity probe".getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.io.ByteArrayOutputStream()
    val g = GoldenGen.imageGolden("k", payload, md, buf)
    val lawMedia = Multimodal.encodePng(
      Seq(Multimodal.MediaRow(7L, payload, "text/plain")).toDS())
    val got = Multimodal.embedImages(lawMedia).collect().head
    got.emb.mkString(" ") shouldBe g.grid_emb
    got.emb.foldLeft(0L)((s, x) => s + x * x) shouldBe g.grid_nrm2
  }

  test("q97 image semantic dedup: verbatim re-crawls and flat frames condemn; distinct images keep") {
    import spark.implicits._
    // doc_ids ≡ 0 (mod 3) land in the image-mime class. 0/3 share a
    // text (identical pixels -> identical centered vector); 6/9 are
    // 16-char constant strings whose byte sums are ≡ 0 (mod 16), so
    // the law gives 1×1 FLAT frames at different brightness — both
    // map to the canonical unit axis (the centered-zero guard) and
    // the later one condemns against the earlier; 12 is distinct.
    val texts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (6L, "pppppppppppppppp"),
      (9L, "xxxxxxxxxxxxxxxx"),
      (12L, "completely different content with other bytes here"))
    val docs = texts.toDF("doc_id", "text")
      .withColumn("n_chars", expr("length(text)"))
    // the two flat docs really are 1×1 under the law
    Multimodal.imageLaw("pppppppppppppppp".getBytes("UTF-8"))._1 shouldBe 1
    Multimodal.imageLaw("pppppppppppppppp".getBytes("UTF-8"))._2 shouldBe 1
    val out = graft.operators.Similarity.semanticDedup(
        Multimodal.imageSemanticFrame(docs), tau = 0.9, nCells = 48)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Int]("keep"), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    out(0L)._1 shouldBe 1
    out(3L) shouldBe ((0, Some(0L)))   // verbatim pixels, cosine 1
    out(6L)._1 shouldBe 1
    out(9L) shouldBe ((0, Some(6L)))   // flat-vs-flat, unit-axis cosine 1
    out(12L)._1 shouldBe 1
  }

  test("committed golden parquet is NOT stale: recomputed law values match for a corpus sample") {
    // The media oracles trust /root/repo/golden; a law change without
    // `runMain graft.GoldenGen` would only surface at driver grading.
    // This guard recomputes every golden family from the laws for a
    // sample of gate-SF documents and compares against the committed
    // artifact — stale goldens fail HERE, in the test suite.
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").limit(40).as[String].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new java.io.ByteArrayOutputStream()
    def key(payload: Array[Byte]): String = {
      md.reset(); md.update(payload); graft.Exact.hex(md.digest())
    }
    val img = spark.read.parquet("/root/repo/golden/image.parquet")
      .collect().map(r => r.getString(0) -> r).toMap
    val aud = spark.read.parquet("/root/repo/golden/audio.parquet")
      .collect().map(r => r.getString(0) -> r).toMap
    val gif = spark.read.parquet("/root/repo/golden/gif.parquet")
      .collect().groupBy(_.getString(0))
    docs.foreach { t =>
      val payload = t.getBytes("UTF-8")
      val k = key(payload)
      val gi = GoldenGen.imageGolden(k, payload, md, buf)
      val ri = img(k)
      (ri.getInt(1), ri.getInt(2), ri.getInt(3), ri.getString(4),
        ri.getDouble(5), ri.getString(6), ri.getString(7), ri.getLong(8)) shouldBe
        ((gi.width, gi.height, gi.n_bytes, gi.pixel_md5, gi.mean_luma,
          gi.dhash, gi.grid_emb, gi.grid_nrm2))
      val ga = GoldenGen.audioGolden(k, payload, md, buf)
      val ra = aud(k)
      (ra.getLong(3), ra.getInt(5), ra.getString(6), ra.getDouble(7),
        ra.getString(9), ra.getString(10)) shouldBe
        ((ga.n_frames, ga.n_bytes, ga.pcm_md5, ga.rms, ga.afp, ga.env_emb))
      val gg = GoldenGen.gifGolden(k, payload, md)
        .map(x => (x.frame_idx, x.pixel_md5, x.mean_luma)).toSet
      gif(k).map(r => (r.getInt(1), r.getString(5), r.getDouble(6))).toSet shouldBe gg
    }
  }

  test("m06 unparseable payload fails loudly with the doc id") {
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(77L,
      Array[Byte](9, 9, 9, 9, 9, 9), "image/gif")).toDS()
    val ex = intercept[Exception] {
      Multimodal.decodeGifFrames(junk).collect()
    }
    ex.getMessage should include("77")
  }

  test("m06 summary: every video-mime doc contributes >= 1 sampled frame of a real GIF") {
    val docs = tables.documents
    val expectedDocs = Multimodal.binaryWithMeta(docs)
      .filter(col("meta.mime") === "video/mp4").count()
    val rows = Multimodal.gifFrameSummary(docs).collect()
    rows.map(_.getAs[Long]("doc_id")).distinct.length.toLong shouldBe expectedDocs
    rows.foreach { r =>
      r.getAs[Int]("n_frames") should be >= 2
      r.getAs[Int]("frame_idx") % 2 shouldBe 0 // default stride
      r.getAs[String]("pixel_md5") should fullyMatch regex "[0-9a-f]{32}"
    }
  }

  test("m03 respects the frame cap and stays partition-preserving") {
    import spark.implicits._
    val media = Multimodal.binaryWithMeta(tables.documents)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow].repartition(3)
    val frames = Multimodal.sampleFrames(media)
    frames.rdd.getNumPartitions shouldBe 3
    val perDoc = frames.collect().groupBy(_.doc_id).values.map(_.length)
    perDoc.max should be <= 4
    perDoc.min should be >= 1
  }
}

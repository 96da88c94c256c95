package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Multimodal

/** GOLDEN ORACLE generator for the media queries (m04–m08, s13) — the
  * round-12 verdict's top task: no SQL engine decodes PNG/RIFF/GIF, so
  * those six queries were rows-only-checked. This main emits the
  * expected outputs as committed parquet ("golden") tables that the
  * DuckDB oracles can SELECT from, flipping them to full
  * rows+schema+hash checks.
  *
  * What makes the golden an ORACLE rather than a tautology: every
  * value in it derives from the synthesis LAWS
  * ([[Multimodal.imageLaw]]/[[Multimodal.pcmLaw]]/[[Multimodal.gifLaw]]
  * — the pure payload-bytes → pixels/PCM/frames functions the fixture
  * synthesizer is DEFINED by) — never from the decode path. The
  * declared queries reach the same values only by round-tripping
  * through the real JDK codecs (`ImageIO`, `javax.sound.sampled`, the
  * GIF sequence reader), so the driver's hash compare of query output
  * against golden IS an independent proof that encode→decode
  * reproduces the law bit-exactly, at every grading SF. The one
  * exception is each container's byte count (`n_bytes`): a codec
  * OUTPUT size, unknowable from the law, so the golden takes it from
  * the shared render stage ([[Multimodal.renderPng]]/
  * [[Multimodal.renderWav]]) — the fixture synthesizer recording its
  * own output size, the same validate-what-landed discipline as s10.
  *
  * Golden rows are keyed by `md5(text)` — a pure function of the
  * document's payload — NOT by doc_id or scale factor: the oracle SQL
  * joins `documents` on DuckDB's own `md5(d.text)`, so one committed
  * golden serves every SF whose texts it covers (sf0.001 and sf0.01
  * share doc_ids but not texts — a doc-keyed golden would silently
  * grade the wrong expectation; a text-keyed one cannot). An SF with
  * unseen texts makes the join DROP rows and the driver's row-count
  * gate fail LOUDLY — regenerate with that SF dir added.
  *
  * Usage: runMain graft.GoldenGen <outDir> <sfDir> [sfDir...]
  * (committed output lives in /root/repo/golden; regenerate whenever
  * a synthesis law or the test corpus changes).
  */
object GoldenGen {

  case class ImageGolden(text_md5: String, width: Int, height: Int,
                         n_bytes: Int, pixel_md5: String, mean_luma: Double,
                         dhash: String, grid_emb: String, grid_nrm2: Long)
  case class AudioGolden(text_md5: String, channels: Int, sample_rate: Int,
                         n_frames: Long, duration_ms: Long, n_bytes: Int,
                         pcm_md5: String, rms: Double, n_samples: Int,
                         afp: String, env_emb: String)
  case class GifGolden(text_md5: String, frame_idx: Int, n_frames: Int,
                       width: Int, height: Int, pixel_md5: String,
                       mean_luma: Double)

  /** m04/m07 expectations from the image law alone (the PNG container
    * is rendered only for its byte count). */
  private[graft] def imageGolden(key: String, payload: Array[Byte],
                                 md: MessageDigest,
                                 buf: java.io.ByteArrayOutputStream): ImageGolden = {
    val (w, h, px) = Multimodal.imageLaw(payload)
    val png = Multimodal.renderPng(w, h, px, buf)
    md.reset()
    var lumaSum = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      md.update((rgb >> 16).toByte); md.update((rgb >> 8).toByte)
      md.update(rgb.toByte)
      lumaSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      i += 1
    }
    val emb = Multimodal.gridLuma(w, h, 8, (x, y) => px(y * w + x))
    ImageGolden(key, w, h, png.length, Exact.hex(md.digest()),
      lumaSum.toDouble / (3.0 * w * h),
      Multimodal.dhashBits(w, h, (x, y) => px(y * w + x)),
      emb.mkString(" "), emb.foldLeft(0L)((a, x) => a + x * x))
  }

  /** m05/m08 expectations from the PCM law alone (the RIFF container
    * is rendered only for its byte count; the sample-rate/channel
    * constants are the synthesizer's declared format). */
  private[graft] def audioGolden(key: String, payload: Array[Byte],
                                 md: MessageDigest,
                                 buf: java.io.ByteArrayOutputStream): AudioGolden = {
    val pcm = Multimodal.pcmLaw(payload)
    val n = pcm.length / 2
    val wav = Multimodal.renderWav(pcm, 8000f, buf)
    md.reset(); md.update(pcm)
    // same sample extraction + integer sum-of-squares as decodeAudio,
    // but over the LAW bytes — one IEEE division and sqrt, bit-stable
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff) // little-endian
      sumSq += s.toLong * s.toLong
      i += 1
    }
    AudioGolden(key, 1, 8000, n.toLong, n.toLong * 1000L / 8000L, wav.length,
      Exact.hex(md.digest()),
      if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n), n,
      Multimodal.envelopeBits(pcm, bigEndian = false),
      Multimodal.envelopeEnergies(pcm, 64, bigEndian = false).mkString(" "))
  }

  /** m06 expectations from the GIF law alone — one row per SAMPLED
    * frame (decodeGifFrames's default stride 2). */
  private[graft] def gifGolden(key: String, payload: Array[Byte],
                               md: MessageDigest): Seq[GifGolden] = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val (w, h, n) = Multimodal.gifLaw(bytes)
    (0 until n by 2).map { f =>
      md.reset()
      var lumaSum = 0L
      var i = 0
      while (i < w * h) {
        val v = Multimodal.gifPixelLaw(bytes, f, i)
        md.update(v.toByte); md.update(v.toByte); md.update(v.toByte)
        lumaSum += 3L * v
        i += 1
      }
      GifGolden(key, f, n, w, h, Exact.hex(md.digest()),
        lumaSum.toDouble / (3.0 * w * h))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GoldenGen <outDir> <sfDir> [sfDir...]")
    val outDir = args.head
    val sfDirs = args.tail
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val texts = sfDirs.map(d => spark.read.parquet(s"$d/documents.parquet")
        .select(col("text"))).reduce(_ union _)
      .distinct().as[String]

    def md5hex(md: MessageDigest, b: Array[Byte]): String = {
      md.reset(); md.update(b); Exact.hex(md.digest())
    }

    val images = texts.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      val buf = new java.io.ByteArrayOutputStream(1 << 12)
      it.map { t =>
        val payload = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        imageGolden(md5hex(md, payload), payload, md, buf)
      }
    }
    images.coalesce(1).write.mode("overwrite").parquet(s"$outDir/image.parquet")

    val audio = texts.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      val buf = new java.io.ByteArrayOutputStream(1 << 12)
      it.map { t =>
        val payload = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        audioGolden(md5hex(md, payload), payload, md, buf)
      }
    }
    audio.coalesce(1).write.mode("overwrite").parquet(s"$outDir/audio.parquet")

    val gif = texts.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { t =>
        val payload = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        gifGolden(md5hex(md, payload), payload, md)
      }
    }
    gif.coalesce(1).write.mode("overwrite").parquet(s"$outDir/gif.parquet")

    println(s"golden written to $outDir from ${sfDirs.mkString(", ")}")
    spark.stop()
  }
}

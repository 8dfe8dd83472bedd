package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode/feature-extract
  * entry points.
  *
  * The decode ([[decodeFrame]]), resize ([[resizeBytes]]) and feature
  * ([[extractFeatures]]) kernels are REAL for image payloads
  * (PNG/JPEG/BMP/GIF through the JDK-built-in `javax.imageio`:
  * actual dimensions, bilinear thumbnail resampling, luminance
  * histograms) and fall back to clearly-marked deterministic fakes
  * for payloads the JDK has no codec for (audio/video containers, and
  * the synthetic text-as-bytes corpus); everything around them —
  * schema, batch iteration shape, partition-parallel execution,
  * metadata extraction as pushdown-friendly Columns — is the real
  * Spark plumbing a production audio/video decoder would drop into.
  *
  * Scale notes: payload bytes stay columnar (never in a groupBy key or
  * join key); metadata extraction is pure Column work so scans prune
  * to metadata-only when frames aren't needed; the decode path is
  * `mapPartitions` (one decoder init per partition, batch-amortized —
  * the Scala analog of a Pandas-UDF-over-`mapInPandas` kernel).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, format_id: Long,
                       width: Long, height: Long, n_frames: Long)

  val FrameBytes = 32

  /** Testdata adapter: treat each document's text bytes as an opaque
    * media payload (the real pipeline reads e.g. a parquet of jpeg
    * blobs with the same shape). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Metadata as pure Columns — the oracle-checkable surface. The
    * width/height/format derivations are deterministic fakes standing
    * in for container-header parsing. */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        (ascii(substring(col("text"), 1, 1)) % 4).cast("long").as("format_id"))
      .withColumn("width", lit(64L) + col("n_bytes") % 640)
      .withColumn("height", lit(64L) + (col("n_bytes") * 7) % 480)
      .withColumn("n_frames",
        floor(col("n_bytes") / lit(FrameBytes.toDouble)).cast("long") + 1)

  /** format_id values for payloads [[decodeFrame]] decodes for real
    * (JDK `javax.imageio` formats); fake-path ids stay in 0..3. */
  val FormatPng = 10L
  val FormatJpeg = 11L
  val FormatBmp = 12L
  val FormatGif = 13L

  private def sniffImageFormat(bytes: Array[Byte]): Option[Long] = {
    @inline def b(i: Int) = bytes(i) & 0xff
    if (bytes.length < 4) None
    else if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some(FormatPng)
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some(FormatJpeg)
    else if (b(0) == 'B' && b(1) == 'M') Some(FormatBmp)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some(FormatGif)
    else None
  }

  /** Decode kernel. Real image payloads (PNG/JPEG/BMP/GIF by magic
    * bytes) decode through the JDK's `javax.imageio` — actual pixel
    * dimensions, no external codec needed. Anything else (the
    * synthetic text-as-bytes corpus, audio/video containers the JDK
    * can't read) falls back to a clearly-marked deterministic fake so
    * the distributed plumbing stays testable on any payload; a
    * production audio/video path would slot an ffmpeg-JNI branch in
    * front of the fallback. */
  private[ext] def decodeFrame(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val real = sniffImageFormat(bytes).flatMap { fmt =>
      // ImageIO.read returns null (or throws) on payloads that pass
      // the magic sniff but aren't valid images — the JDK readers
      // throw UNCHECKED exceptions (IndexOutOfBounds, NegativeArraySize,
      // IllegalArgument, CMMException) on corrupt data, not just
      // IOException, so catch NonFatal: any decode failure means
      // "undecodable", fall through to the fake.
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
          .map(img => MediaMeta(-1L, n, fmt,
            img.getWidth.toLong, img.getHeight.toLong, 1L))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    real.getOrElse {
      // deterministic fake for non-image payloads (shape-compatible
      // stand-in; see scaladoc)
      val b0 = if (bytes.isEmpty) 0L else (bytes(0) & 0xff).toLong
      MediaMeta(-1L, n, b0 % 4, 64L + n % 640, 64L + (n * 7) % 480,
        n / FrameBytes + 1)
    }
  }

  /** Partition-parallel decode over the binary column: the Scala
    * analog of a Pandas UDF via mapInPandas — one kernel per
    * partition, streaming over the rows, never collecting. */
  def decodeAll(media: DataFrame): Dataset[MediaMeta] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[MediaMeta]
    media.as[MediaRecord].mapPartitions { it =>
      // decoder init would happen once per partition, here:
      it.map(r => decodeFrame(r.media).copy(doc_id = r.doc_id))
    }
  }

  case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Long,
                       channels: Long, sample_bits: Long, n_samples: Long,
                       duration_ms: Long)

  /** Audio decode kernel. RIFF/WAVE payloads parse through the JDK's
    * `javax.sound.sampled.AudioSystem` — actual header sample rate,
    * channel count, sample width, and frame count, no external codec
    * and no audio device needed. Undecodable payloads fall back to a
    * clearly-marked deterministic fake (rate/frames derived from byte
    * length — distinguishable from any real header, so a scored query
    * over real WAV bytes goes red if this path ever fires). */
  private[ext] def decodeAudio(bytes: Array[Byte]): AudioMeta = {
    val n = bytes.length.toLong
    val real =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val f = ais.getFormat
        val rate = f.getSampleRate.toLong
        val frames = ais.getFrameLength
        Some(AudioMeta(-1L, n, rate, f.getChannels.toLong,
          f.getSampleSizeInBits.toLong, frames,
          if (rate > 0) frames * 1000L / rate else 0L))
      } catch { case scala.util.control.NonFatal(_) => None }
    real.getOrElse(
      AudioMeta(-1L, n, 8000L + n % 7, 1L + n % 2, 8L, n, 0L))
  }

  /** Partition-parallel audio decode over the binary column — same
    * kernel shape as [[decodeAll]]. */
  def decodeAudioAll(media: DataFrame): Dataset[AudioMeta] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[AudioMeta]
    media.as[MediaRecord].mapPartitions { it =>
      it.map(r => decodeAudio(r.media).copy(doc_id = r.doc_id))
    }
  }

  case class FrameInfo(doc_id: Long, frame_id: Long, n_bytes: Long,
                       width: Long, height: Long, delay_cs: Long)

  /** REAL multi-frame inventory — the probe step of a video pipeline
    * (frame count, per-frame dimensions, per-frame delay), parsed
    * from the actual container bytes with the JDK's `javax.imageio`
    * sequence reader (animated GIF: the one multi-frame format the
    * JDK both writes and reads; the per-frame delay lives in each
    * frame's GraphicControlExtension, in centiseconds — exact
    * integers, no float crosses the oracle boundary).
    *
    * Same partition-parallel `mapPartitions` kernel shape as
    * [[decodeAll]]: reader init per payload, all parallelism is scan
    * parallelism. A payload that fails to parse emits NO rows — the
    * scored query's oracle predicts exact frame rows, so a fallback
    * would hide breakage; absence is the visible failure mode. */
  def frameInventory(media: DataFrame): Dataset[FrameInfo] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[FrameInfo]
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Vector.empty }
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            // allowSearch: the GIF reader must walk the sequence to
            // count frames — bounded by the payload, not the corpus
            val n = rd.getNumImages(/* allowSearch = */ true)
            (0 until n).map { i =>
              val md = rd.getImageMetadata(i)
              val root = md.getAsTree(md.getNativeMetadataFormatName)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              val gces = root.getElementsByTagName("GraphicControlExtension")
              val delay =
                if (gces.getLength == 0) 0L
                else gces.item(0)
                  .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                  .getAttribute("delayTime") match {
                    case "" => 0L
                    case v  => v.toLong
                  }
              FrameInfo(r.doc_id, i.toLong, r.media.length.toLong,
                rd.getWidth(i).toLong, rd.getHeight(i).toLong, delay)
            }.toVector
          } catch {
            // NonFatal, not just IOException — see decodeFrame
            case scala.util.control.NonFatal(_) => Vector.empty
          } finally { rd.dispose(); iis.close() }
        }
      }
    }
  }

  case class MediaHash(doc_id: Long, dhash: Long)

  /** Difference-hash (dHash-64) kernel: decode → integer luminance →
    * exact box means over a 9×8 grid → one bit per horizontally
    * adjacent block pair ("right mean > left mean"), packed LSB-first
    * as bit (by·8 + bx). All-integer arithmetic (luminance is the
    * exact (299r+587g+114b)/1000; block sums divide by the true block
    * pixel count), so the hash is bit-identical on any JVM — no
    * resampling library in the loop. Undecodable payloads emit NO
    * hash (the frameInventory discipline: absence is the visible
    * failure mode, never a fake).
    * (private[graft]: ExtSpec checks bit-for-bit formula equality.) */
  private[graft] def dHash64(bytes: Array[Byte]): Option[Long] =
    decodeImage(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val by = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val bx = math.min(8, x * 9 / w)
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          sums(by)(bx) += lum
          cnts(by)(bx) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          val l = sums(by)(bx) / math.max(1L, cnts(by)(bx))
          val r = sums(by)(bx + 1) / math.max(1L, cnts(by)(bx + 1))
          if (r > l) hash |= 1L << (by * 8 + bx)
          bx += 1
        }
        by += 1
      }
      hash
    }

  case class ThumbCell(doc_id: Long, cx: Long, cy: Long,
                       n_px: Long, sum_lum: Long)

  /** Thumbnail (box-mean resize) kernel: decode → integer luminance →
    * tw×th cell sums with the same `x·tw/w` binning as [[dHash64]]'s
    * blocks. Emits exact integer (count, sum) per cell so the
    * downstream mean is reproducible arithmetic, not a resampling
    * implementation detail — the contract that lets a SQL oracle
    * replay a RESIZE of a real decoded PNG. */
  private[graft] def thumbCells(doc: Long, bytes: Array[Byte],
                                tw: Int, th: Int): Seq[ThumbCell] =
    decodeImage(bytes).toSeq.flatMap { img =>
      val w = img.getWidth; val h = img.getHeight
      val sums = Array.ofDim[Long](th, tw)
      val cnts = Array.ofDim[Long](th, tw)
      var y = 0
      while (y < h) {
        val cy = math.min(th - 1, y * th / h)
        var x = 0
        while (x < w) {
          val cx = math.min(tw - 1, x * tw / w)
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          sums(cy)(cx) += lum
          cnts(cy)(cx) += 1
          x += 1
        }
        y += 1
      }
      for { cy <- 0 until th; cx <- 0 until tw }
        yield ThumbCell(doc, cx.toLong, cy.toLong,
          cnts(cy)(cx), sums(cy)(cx))
    }

  /** Partition-parallel thumbnails over the binary column. */
  def thumbnailAll(media: DataFrame, tw: Int, th: Int): Dataset[ThumbCell] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[ThumbCell]
    media.select(col("doc_id"), col("media")).as[MediaRecord]
      .mapPartitions(_.flatMap(r => thumbCells(r.doc_id, r.media, tw, th)))
  }

  /** Partition-parallel dHash over the binary column — the content-
    * hash step of multimodal dedup; same kernel shape as
    * [[decodeAll]]. */
  def dhashAll(media: DataFrame): Dataset[MediaHash] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[MediaHash]
    media.as[MediaRecord].mapPartitions(
      _.flatMap(r => dHash64(r.media).map(MediaHash(r.doc_id, _))))
  }

  case class AudioFp(doc_id: Long, fingerprint: Long)

  /** Audio content fingerprint: decode the PCM stream for real
    * (javax.sound.sampled, 16-bit little-endian), split the sample
    * sequence into 8 equal index ranges, take each range's mean
    * absolute amplitude (exact integer sums and divisions), and emit
    * one bit per adjacent-range comparison — the energy-envelope
    * analog of [[dHash64]]'s block comparisons, 7 bits packed
    * LSB-first. All-integer, so bit-identical on any JVM; undecodable
    * payloads emit NO fingerprint (no fallback). */
  private[graft] def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.isBigEndian) None
      else {
        val data = ais.readAllBytes()
        val nVals = data.length / 2
        if (nVals < 8) None
        else {
          val sums = new Array[Long](8)
          val cnts = new Array[Long](8)
          var j = 0
          while (j < nVals) {
            val v = ((data(2 * j) & 0xff) | (data(2 * j + 1) << 8)).toShort
            val c = (j.toLong * 8 / nVals).toInt
            sums(c) += math.abs(v.toLong)
            cnts(c) += 1
            j += 1
          }
          var fp = 0L
          var i = 0
          while (i < 7) {
            if (sums(i + 1) / cnts(i + 1) > sums(i) / cnts(i))
              fp |= 1L << i
            i += 1
          }
          Some(fp)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-parallel audio fingerprint — same kernel shape as
    * [[dhashAll]]. */
  def audioFpAll(media: DataFrame): Dataset[AudioFp] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[AudioFp]
    media.as[MediaRecord].mapPartitions(
      _.flatMap(r => audioFingerprint(r.media).map(AudioFp(r.doc_id, _))))
  }

  case class MediaResized(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  private def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    sniffImageFormat(bytes).flatMap { _ =>
      // NonFatal, not just IOException — see decodeFrame's comment
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Resize kernel. Image payloads get a REAL resample: decode →
    * bilinear scale to the largest square grid that fits `outLen` →
    * grayscale pixel bytes, zero-padded to exactly `outLen` (output
    * size is constant per call — the property the downstream batch
    * shape relies on). Non-image payloads keep the deterministic
    * stride-sample fallback. */
  private[ext] def resizeBytes(bytes: Array[Byte], outLen: Int): Array[Byte] =
    decodeImage(bytes) match {
      case Some(img) =>
        val s = math.max(1, math.sqrt(outLen.toDouble).toInt)
        val out = new java.awt.image.BufferedImage(
          s, s, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, s, s, null)
        g.dispose()
        val px = out.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        java.util.Arrays.copyOf(px, outLen)
      case None =>
        if (bytes.isEmpty) new Array[Byte](outLen)
        else Array.tabulate(outLen)(i =>
          bytes(((i.toLong * bytes.length) / outLen).toInt))
    }

  /** Feature kernel. Image payloads get a REAL visual feature: a
    * dim-bin luminance histogram over the decoded pixels, L1-
    * normalized. Non-image payloads keep the deterministic byte-
    * histogram fallback (a production deploy swaps in an embedding
    * model here; the histogram keeps the distributed path testable
    * end-to-end with the same shape). */
  private[ext] def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImage(bytes) match {
      case Some(img) =>
        val h = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            h(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = math.max(1f, (img.getWidth * img.getHeight).toFloat)
        h.map(_ / n)
      case None =>
        val h = new Array[Float](dim)
        bytes.foreach(b => h((b & 0xff) % dim) += 1f)
        val n = math.max(1f, bytes.length.toFloat)
        h.map(_ / n)
    }

  /** Partition-parallel resize: same mapPartitions shape as
    * [[decodeAll]] (kernel init once per partition). */
  def resizeAll(media: DataFrame, outLen: Int = 64): Dataset[MediaResized] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[MediaResized]
    media.as[MediaRecord].mapPartitions(_.map(r =>
      MediaResized(r.doc_id, resizeBytes(r.media, outLen))))
  }

  /** Partition-parallel feature extraction; output feeds
    * [[graft.ext.VectorSearch]] directly (multimodal → ANN path). */
  def featuresAll(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val encIn = Encoders.product[MediaRecord]
    implicit val encOut = Encoders.product[MediaFeatures]
    media.as[MediaRecord].mapPartitions(_.map(r =>
      MediaFeatures(r.doc_id, extractFeatures(r.media, dim))))
  }
}

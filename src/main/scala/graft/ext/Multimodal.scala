package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode/feature-extract
  * entry points.
  *
  * The decode kernel ([[decodeFrame]]) decodes real image payloads
  * (PNG/JPEG/BMP/GIF) through the JDK-built-in `javax.imageio` and
  * falls back to a clearly-marked deterministic fake for payloads the
  * JDK has no codec for (audio/video containers, and the synthetic
  * text-as-bytes corpus); everything around it — schema, batch
  * iteration shape, partition-parallel execution, metadata extraction
  * as pushdown-friendly Columns — is the real Spark plumbing a
  * production audio/video decoder would drop into.
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
      // ImageIO.read returns null (or throws) on truncated payloads —
      // treat both as undecodable and fall through to the fake.
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
          .map(img => MediaMeta(-1L, n, fmt,
            img.getWidth.toLong, img.getHeight.toLong, 1L))
      } catch { case _: java.io.IOException => None }
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

  /** Frame sampling plumbing: byte offsets of every k-th fixed-size
    * frame (stub for video frame extraction — offsets are real, the
    * frame decode is [[decodeFrame]]). */
  def frameOffsets(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("doc_id"),
      transform(
        sequence(lit(0),
          floor(octet_length(col("media")) / lit(FrameBytes * everyK)).cast("int")),
        i => i.cast("long") * (FrameBytes * everyK)).as("frame_offsets"))

  case class MediaResized(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** STUB resize kernel: nearest-neighbor stride-sample of the payload
    * to a fixed length (a real implementation resamples decoded
    * pixels). Output size is constant per call — the property the
    * downstream batch shape relies on. */
  private[ext] def resizeBytes(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    // ??? <- real decoder+bilinear resample goes here
    if (bytes.isEmpty) new Array[Byte](outLen)
    else Array.tabulate(outLen)(i =>
      bytes(((i.toLong * bytes.length) / outLen).toInt))
  }

  /** STUB feature kernel: dim-bin byte histogram, L1-normalized (a
    * real kernel runs a vision/audio embedding model). Deterministic,
    * so the distributed path is testable end-to-end. */
  private[ext] def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real model inference goes here
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

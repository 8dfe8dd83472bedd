package graft.io

import org.apache.spark.sql.SparkSession

/** Real-image fixture for the scored multimodal decode query
  * (q_multimodal_decode).
  *
  * The synthetic testdata has no image payloads, so the real
  * `javax.imageio` decode path ([[graft.ext.Multimodal.decodeFrame]])
  * would otherwise only ever exercise its deterministic-fake fallback
  * in a scored query. This renders a small parquet of REAL encoded
  * images (PNG/JPEG/BMP/GIF — the four formats the JDK both writes and
  * reads) whose dimensions are pure arithmetic in `doc_id`, once per
  * sf dir under the [[DialectFixtures]] marker protocol. The DuckDB
  * oracle reads the same parquet for `n_bytes` and predicts
  * format/width/height from the [[widthOf]]/[[heightOf]] constants —
  * so the CORRECTNESS row goes red if the imageio plumbing breaks and
  * the decode falls back to the fake (whose dimensions are derived
  * from byte length, not the encoded pixels).
  *
  * Scale note: the fixture is deliberately tiny (the scored surface is
  * the decode correctness, not decode throughput); the decode itself
  * runs through the same partition-parallel `mapPartitions` kernel a
  * 100 TB media table would use.
  */
object MediaFixtures {
  val NDocs = 64

  /** Encoded formats, cycled by doc_id; index i maps to format_id
    * 10 + i (see [[graft.ext.Multimodal.FormatPng]] etc.). */
  val Formats = Seq("png", "jpg", "bmp", "gif")

  def widthOf(id: Long): Long = 8L + (id * 3) % 24
  def heightOf(id: Long): Long = 8L + (id * 5) % 24

  def mediaPath(dir: String): String =
    s"${DialectFixtures.BaseDir}/${DialectFixtures.leaf(dir)}/media"

  /** Encode one image: a deterministic RGB gradient at the id-derived
    * dimensions, written with the JDK encoder for the id's format. */
  private[io] def encode(id: Long): Array[Byte] = {
    val w = widthOf(id).toInt
    val h = heightOf(id).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 8 % 256) << 16) | ((y * 8 % 256) << 8)
          | ((x + y) % 256))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val fmt = Formats((id % Formats.length).toInt)
    if (!javax.imageio.ImageIO.write(img, fmt, out))
      throw new IllegalStateException(s"no JDK encoder for $fmt")
    out.toByteArray
  }

  /** Render the fixture parquet (once per sf dir; marker-protected
    * against cross-dir collisions like the dialect fixtures) and
    * return its directory path. */
  def write(spark: SparkSession, dir: String): String = {
    val path = mediaPath(dir)
    DialectFixtures.once(path, dir) {
      import spark.implicits._
      (0L until NDocs.toLong).map(id => (id, encode(id)))
        .toDF("doc_id", "media")
        .repartition(4)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}

/** Real-audio fixture for the scored audio decode query
  * (q_multimodal_audio) — the WAV analog of [[MediaFixtures]].
  *
  * The JDK both writes and reads RIFF/WAVE PCM through
  * `javax.sound.sampled` (no audio device needed to parse a stream),
  * so the audio decode path can be REAL the way the image path is:
  * this renders a parquet of actual WAV payloads whose sample rate /
  * channel count / sample count are pure arithmetic in `doc_id`, and
  * the oracle predicts those from the constants while reading only
  * `n_bytes` from the same parquet. The CORRECTNESS row goes red if
  * the `AudioSystem` plumbing breaks and the decode falls back to the
  * deterministic fake (whose rate/frames derive from byte length, not
  * the WAV header).
  */
object AudioFixtures {
  val NDocs = 64

  /** Sample rates cycled by doc_id (all standard PCM rates). */
  val Rates = Seq(8000, 16000, 22050, 44100)

  def rateOf(id: Long): Long = Rates((id % Rates.length).toInt).toLong
  def channelsOf(id: Long): Long = 1L + id % 2
  def samplesOf(id: Long): Long = 64L + (id * 37) % 512

  def audioPath(dir: String): String =
    s"${DialectFixtures.BaseDir}/${DialectFixtures.leaf(dir)}/audio"

  /** Encode one WAV: deterministic 16-bit little-endian PCM at the
    * id-derived geometry, written with the JDK WAVE encoder.
    * (private[graft]: ExtSpec round-trips it through the decode.) */
  private[graft] def encode(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val ch = channelsOf(id).toInt
    val nS = samplesOf(id).toInt
    val data = new Array[Byte](nS * 2 * ch)
    var k = 0
    while (k < nS * ch) {
      // deterministic sawtooth; content is irrelevant to the metadata
      // decode, it just has to be stable bytes
      val v = (((id * 131 + k * 37) % 65536) - 32768).toInt
      data(2 * k) = (v & 0xff).toByte
      data(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new AudioFormat(rateOf(id).toFloat, 16, ch,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nS.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Render the fixture parquet (marker-protected, once per sf dir). */
  def write(spark: SparkSession, dir: String): String = {
    val path = audioPath(dir)
    DialectFixtures.once(path, dir) {
      import spark.implicits._
      (0L until NDocs.toLong).map(id => (id, encode(id)))
        .toDF("doc_id", "media")
        .repartition(4)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}

/** Real multi-frame "video" fixture for the scored frame-inventory
  * query (q_multimodal_frames) — the animated-GIF analog of
  * [[MediaFixtures]]/[[AudioFixtures]].
  *
  * True video containers (mp4/mkv) need codecs the JDK doesn't ship,
  * but the JDK both WRITES and READS multi-frame animated GIF through
  * `javax.imageio` — frame count, per-frame dimensions, and per-frame
  * delay (GraphicControlExtension, centiseconds) — which is exactly
  * the frame-inventory shape a video pipeline's probe step produces.
  * Frame count, dimensions, and per-frame delays are pure arithmetic
  * in (doc_id, frame_id); the oracle predicts every field from those
  * constants while reading only doc_id/n_bytes from the same parquet,
  * so the CORRECTNESS row goes red if the sequence parser breaks (a
  * failed parse emits no rows — there is deliberately NO fallback).
  */
object VideoFixtures {
  val NDocs = 48

  def framesOf(id: Long): Long = 2L + id % 5
  def widthOf(id: Long): Long = 8L + (id * 3) % 16
  def heightOf(id: Long): Long = 8L + (id * 5) % 16
  /** Per-FRAME delay in centiseconds (GIF's native unit — exact). */
  def delayOf(id: Long, frame: Long): Long = 5L + (id + 3 * frame) % 10

  def videoPath(dir: String): String =
    s"${DialectFixtures.BaseDir}/${DialectFixtures.leaf(dir)}/video"

  private def child(root: javax.imageio.metadata.IIOMetadataNode,
                    name: String): javax.imageio.metadata.IIOMetadataNode = {
    val found = root.getElementsByTagName(name)
    if (found.getLength > 0)
      found.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    else {
      val n = new javax.imageio.metadata.IIOMetadataNode(name)
      root.appendChild(n)
      n
    }
  }

  /** Encode one animated GIF: framesOf(id) gradient frames at the
    * id-derived dimensions, each frame carrying its own
    * GraphicControlExtension delay. (private[graft]: specs round-trip
    * it through the inventory parser.) */
  private[graft] def encode(id: Long): Array[Byte] = {
    val w = widthOf(id).toInt
    val h = heightOf(id).toInt
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < framesOf(id).toInt) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // frame index shifts the gradient so frames differ
          img.setRGB(x, y, (((x * 8 + f * 32) % 256) << 16)
            | (((y * 8) % 256) << 8) | ((x + y + f) % 256))
          x += 1
        }
        y += 1
      }
      val md = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      val fmt = md.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = child(root, "GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayOf(id, f.toLong).toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Render the fixture parquet (marker-protected, once per sf dir). */
  def write(spark: SparkSession, dir: String): String = {
    val path = videoPath(dir)
    DialectFixtures.once(path, dir) {
      import spark.implicits._
      (0L until NDocs.toLong).map(id => (id, encode(id)))
        .toDF("doc_id", "media")
        .repartition(4)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}

/** Block-constant image fixture for the scored perceptual-hash
  * near-dup query (q_image_phash) — the DEDUP member of the
  * multimodal family ([[MediaFixtures]] scores decode,
  * [[VideoFixtures]] frame walks; this scores content hashing).
  *
  * Each base id renders three REAL PNGs built from a 9×8 grid of
  * constant-gray blocks whose levels are pure arithmetic in
  * (id, bx, by): variant 0 the base grid, variant 1 a +8 brightness
  * shift (every inter-block comparison is preserved — the classic
  * perceptual-hash invariance), variant 2 a horizontal mirror of the
  * grid (its own comparison pattern). Because a dHash bit is exactly
  * "right block mean > left block mean" and block means of constant
  * blocks are the constants themselves, the ENTIRE downstream answer
  * — every 64-bit hash, every banded candidate pair, every hamming
  * distance — is replayable from this formula in SQL, while the
  * engine side must earn it through real PNG encode → javax.imageio
  * decode → integer luminance → box means. Any pixel-path breakage
  * (wrong decode, wrong grayscale weights, off-by-one block bounds)
  * lands cell-visibly red.
  *
  * Levels stay in [0, 191] so the +8 shift never clips at 255.
  */
object PhashFixtures {
  val NDocs = 48
  /** Block side in pixels: images are 9·Cell × 8·Cell, so integer box
    * means are exact (no partial blocks). */
  val Cell = 4

  /** The grid level formula the oracle replays. */
  def levelOf(id: Long, v: Long, bx: Long, by: Long): Int = {
    val x = if (v == 2L) 8L - bx else bx
    ((id * 7 + x * 13 + by * 29) % 192 + (if (v == 1L) 8L else 0L)).toInt
  }

  def phashPath(dir: String): String =
    s"${DialectFixtures.BaseDir}/${DialectFixtures.leaf(dir)}/phash"

  /** (private[graft]: ExtSpec round-trips it through the dHash.) */
  private[graft] def encode(id: Long, v: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9 * Cell, 8 * Cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8 * Cell) {
      var x = 0
      while (x < 9 * Cell) {
        val g = levelOf(id, v, x / Cell, y / Cell)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", out))
      throw new IllegalStateException("no JDK PNG encoder")
    out.toByteArray
  }

  /** Render the fixture parquet: img_id = id*3 + variant. */
  def write(spark: SparkSession, dir: String): String = {
    val path = phashPath(dir)
    DialectFixtures.once(path, dir) {
      import spark.implicits._
      (for { id <- 0L until NDocs.toLong; v <- 0L to 2L }
        yield (id * 3 + v, encode(id, v)))
        .toDF("doc_id", "media")
        .repartition(4)
        .write.mode("overwrite").parquet(path)
    }
    path
  }
}

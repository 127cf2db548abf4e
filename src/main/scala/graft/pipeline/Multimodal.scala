package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as batched per-partition transforms
  * (`mapPartitions` — the Scala analogue of arrow-batched `mapInPandas`).
  *
  * IMAGES are handled by REAL JDK codecs (javax.imageio decode,
  * java.awt bilinear resampling): decode, resize, grid features, and
  * perceptual-hash near-dup all operate on actual pixels. AUDIO/VIDEO
  * have no JDK codec, so their decode step is a deterministic stub
  * (`fakeDecode`) behind the same batch contract — schema, batch
  * iteration, partitioning, null-safety are real and tested; swap the
  * stub for an ffmpeg pipe without touching the plumbing. */
object Multimodal {

  /** Metadata schema carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),     // e.g. "png", "wav"
    StructField("byte_len", LongType),
    StructField("content_md5", StringType)))

  /** Decoded-feature schema produced by the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** Attach a metadata struct to a binary payload column — declarative,
    * codegen'd (no decode needed for metadata). */
  def withMetadata(df: DataFrame, payload: String, modality: String,
      format: String): DataFrame =
    df.withColumn("meta", struct(
      lit(modality).as("modality"),
      lit(format).as("format"),
      octet_length(col(payload)).cast("long").as("byte_len"),
      md5(col(payload)).as("content_md5")))

  /** REAL image decoder: javax.imageio (JDK-bundled — PNG/JPEG/BMP/GIF),
    * no external libraries. Returns null for undecodable payloads. */
  private[pipeline] def imageDecode(bytes: Array[Byte]): Row = {
    if (bytes == null) null
    else {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          val raster = img.getRaster
          val channels = raster.getNumBands
          var sum = 0.0
          var n = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < channels) {
                sum += raster.getSample(x, y, b); n += 1; b += 1
              }
              x += 1
            }
            y += 1
          }
          Row(img.getWidth, img.getHeight, channels,
            if (n > 0) sum / n else 0.0)
        }
      } catch { case _: java.io.IOException => null }
    }
  }

  /** STUB decoder: deterministic fake features from payload bytes — the
    * fallback for modalities with no JDK codec (audio/video), keeping
    * the batch contract testable on synthetic payloads. */
  private def fakeDecode(bytes: Array[Byte]): Row = {
    if (bytes == null) Row(null, null, null, null)
    else {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.floorMod(h, 960)          // fake width 64..1023
      val ht = 64 + math.floorMod(h >> 10, 960)   // fake height
      val mean = bytes.iterator.map(b => (b & 0xff).toDouble).sum /
        math.max(bytes.length, 1)
      Row(w, ht, 3, mean)
    }
  }

  /** Batched decode over partitions: one decoder instance per partition
    * (the expensive init — codec context, model weights — amortizes over
    * the whole batch, exactly like arrow-batched `mapInPandas`). Appends a
    * `decoded` struct column. `real = true` routes through the
    * javax.imageio image decoder (undecodable payloads fall back to the
    * deterministic stub so the pipeline stays total). */
  def decodeBatched(df: DataFrame, payload: String,
      real: Boolean = false): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", decodedSchema))
    val payloadIdx = df.schema.fieldIndex(payload)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        val bytes = if (r.isNullAt(payloadIdx)) null
          else r.getAs[Array[Byte]](payloadIdx)
        val decoded =
          if (real) Option(imageDecode(bytes)).getOrElse(fakeDecode(bytes))
          else fakeDecode(bytes)
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }

  /** Deterministic frame sampling for video-like payloads: pick every
    * `stride`-th chunk of `chunkSize` bytes as a "frame" — the partition/
    * schema shape of real frame extraction. */
  def sampleFrames(df: DataFrame, payload: String, chunkSize: Int,
      stride: Int): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0),
          greatest(floor(octet_length(col(payload)) /
            (chunkSize * stride)).cast("int") - 1, lit(0))),
        i => col(payload).substr((i * chunkSize * stride + 1).cast("int"),
          lit(chunkSize))))

  // ---- real image kernels (JDK-only: javax.imageio + java.awt) ----------

  /** Decode + scale to `w`×`h` grayscale, row-major double[0,255] pixels.
    * The shared kernel under resize / features / perceptual hash. Null for
    * undecodable payloads. Graphics2D bilinear scaling — real resampling,
    * not a stub. */
  private def grayscaleGrid(bytes: Array[Byte], w: Int, h: Int)
      : Array[Double] = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = gray.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val out = new Array[Double](w * h)
    val raster = gray.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    out
  }

  /** Re-encode an image payload at `w`×`h` (PNG bytes out). Real
    * java.awt bilinear resize in a batched partition map — the
    * train-data "resize to model input" step. Undecodable rows → null. */
  def resizeImages(df: DataFrame, payload: String, w: Int, h: Int,
      out: String = "resized"): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else {
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) null
        else {
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          bos.toByteArray
        }
      }
    }
    df.withColumn(out, resize(col(payload)))
  }

  /** Feature-extract: `grid`×`grid` grayscale intensities normalized to
    * [0,1], as a dense Float vector — a real pixel-space embedding that
    * feeds the ANN / embedding-dedup operators (`Similarity.cosine`,
    * `Dedup.embeddingPairsLsh`) directly. */
  def imageFeatures(df: DataFrame, payload: String, grid: Int = 8,
      out: String = "features"): DataFrame = {
    val feats = udf { bytes: Array[Byte] =>
      val px = grayscaleGrid(bytes, grid, grid)
      if (px == null) null else px.map(v => (v / 255.0).toFloat)
    }
    df.withColumn(out, feats(col(payload)))
  }

  /** Perceptual average-hash (aHash): 8×8 grayscale downsample, bit i set
    * iff pixel i is strictly above the image mean — 64-bit signature where
    * near-identical images differ in few bits. Bit order: row-major, pixel
    * 0 = LSB. */
  def aHash64(bytes: Array[Byte]): java.lang.Long = {
    val px = grayscaleGrid(bytes, 8, 8)
    if (px == null) null
    else {
      val mean = px.sum / 64.0
      var sig = 0L
      var i = 0
      while (i < 64) { if (px(i) > mean) sig |= (1L << i); i += 1 }
      sig
    }
  }

  /** Deterministic synthetic PNG: the leading `whiteCols` (of `w`/8)
    * column blocks white, the rest black. Real, decodable PNG bytes for
    * gates and specs that need image payloads without binary fixtures.
    * Block-aligned patterns make the 8×8 aHash/feature values exactly
    * predictable (each downsampled pixel lands inside one uniform
    * block). */
  def syntheticPng(whiteCols: Int, w: Int = 64, h: Int = 64)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val block = w / 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x / block < whiteCols) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image near-duplicate pairs: perceptual aHash signatures through the
    * same prefix-bucket LSH + hamming-verify machinery as text SimHash
    * (`Dedup.signaturePairs`) — (id_a, id_b, dist) with dist <= maxDist. */
  def imagePairs(df: DataFrame, id: String, payload: String,
      prefixBits: Int = 16, maxDist: Int = 6,
      maxBucketSize: Int = 10000): DataFrame = {
    val hash = udf { bytes: Array[Byte] => aHash64(bytes) }
    val sigs = df.select(col(id).as("doc"),
      hash(col(payload)).as("sig"))
      .filter(col("sig").isNotNull)
    Dedup.signaturePairs(sigs, prefixBits, maxDist, maxBucketSize)
  }
}

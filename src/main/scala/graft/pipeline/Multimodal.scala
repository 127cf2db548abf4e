package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as batched per-partition transforms
  * (`mapPartitions` — the Scala analogue of arrow-batched `mapInPandas`).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `fakeDecode` produces a deterministic "decoded" feature
  * struct derived from the payload bytes. The Spark-side contract — schema,
  * batch iteration, partitioning, null-safety — is real and tested; swap
  * `fakeDecode` for an actual codec (JNI/javax.imageio/ffmpeg pipe) without
  * touching the plumbing. */
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
}

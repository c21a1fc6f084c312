package graft.images

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (north-star: treat image/audio/video
  * as opaque `binary` columns with typed metadata, decode/extract at the
  * edge).
  *
  * Two decoders share one seam: [[decodeImage]] is the REAL codec path
  * (JDK `javax.imageio` — PNG/JPEG/GIF/BMP, no native deps), and
  * [[decodeStub]] is a clearly-marked DETERMINISTIC FAKE (bytes →
  * pseudo-pixels) kept for raw-byte formula assets and as the seam demo
  * for codecs the JDK lacks (video/audio → ffmpeg JNI). Everything around
  * them — schema contract, per-partition batching, metadata propagation,
  * frame sampling — is identical, so swapping stub↔real is one call.
  *
  * Schema contract for a multimodal asset table:
  * `(asset_id long, media_type string, x_dim int, y_dim int,
  *   n_channels int, n_frames int, content binary)`.
  */
object MultimodalOps {

  /** Deterministic synthetic binary assets for tests/demos. */
  def syntheticAssets(spark: org.apache.spark.sql.SparkSession, n: Int,
      x: Int, y: Int, c: Int, frames: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map { id =>
      val len = x * y * c * frames
      val bytes = Array.tabulate[Byte](len)(i => ((id * 131 + i * 17) % 256).toByte)
      (id, if (frames > 1) "video" else "image", x, y, c, frames, bytes)
    }.toDF("asset_id", "media_type", "x_dim", "y_dim", "n_channels",
      "n_frames", "content")
  }

  /** STUB DECODER (deterministic fake): interprets the binary content as
    * raw unsigned bytes and scales to [0,1] pixels in the ImageOps layout.
    * Runs per partition over an iterator — the exact seam where a real
    * codec call sits. Frame 0 only; see [[frameSample]] for video. */
  def decodeStub(df: DataFrame): Dataset[ImageOps.Img] = {
    import df.sparkSession.implicits._
    df.select(col("asset_id"), col("x_dim"), col("y_dim"),
        col("n_channels"), col("content"))
      .as[(Long, Int, Int, Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, x, y, c, bytes) =>
          val n = x * y * c
          val px = new Array[Double](n)
          var i = 0
          while (i < n) {
            px(i) = (bytes(i % bytes.length) & 0xff) / 255.0
            i += 1
          }
          ImageOps.Img(id, x, y, c, px)
        }
      }
  }

  /** Deterministic PNG-ENCODED synthetic assets: byte (r,g,b interleaved,
    * row-major) `i` of image `id` is the image family's pixel formula
    * ((id*31 + i*7) mod 256), actually pushed through the JDK's
    * `javax.imageio` PNG encoder on EXECUTORS (mapPartitions), so the
    * decode path below exercises a real codec on real compressed bytes.
    * PNG is lossless: the round trip reproduces the formula exactly,
    * which is what lets a codec-free SQL oracle verify the pixels. */
  def encodedAssets(spark: org.apache.spark.sql.SparkSession, n: Int,
      x: Int, y: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.min(n, 8)).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { id =>
        val img = new java.awt.image.BufferedImage(
          x, y, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var py = 0
        while (py < y) {
          var px = 0
          while (px < x) {
            val base = (py * x + px) * 3
            def v(k: Int): Int = ((id * 31 + (base + k) * 7) % 256).toInt
            img.setRGB(px, py, (v(0) << 16) | (v(1) << 8) | v(2))
            px += 1
          }
          py += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", x, y, 3, 1, bos.toByteArray)
      }
    }.toDF("asset_id", "media_type", "x_dim", "y_dim", "n_channels",
      "n_frames", "content")
  }

  /** REAL image decode (ref: loaders/ImageNetLoader + ImageLoaderUtils):
    * `javax.imageio` reads PNG/JPEG/GIF/BMP from the binary content column
    * — JDK-only, no native deps. Same signature and output layout as
    * [[decodeStub]] (row-major interleaved [0,1] doubles), so swapping
    * stub↔real in a pipeline is a one-call change. Dimensions come from
    * the DECODED image, not the metadata columns — the codec is the truth.
    * Per-partition iterator seam: one codec init per partition, streaming
    * over assets, never materializing a partition's images at once. */
  def decodeImage(df: DataFrame): Dataset[ImageOps.Img] = {
    import df.sparkSession.implicits._
    df.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"asset $id: bytes are not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          val px = new Array[Double](w * h * 3)
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              val rgb = img.getRGB(xx, yy)
              val base = (yy * w + xx) * 3
              px(base) = ((rgb >> 16) & 0xff) / 255.0
              px(base + 1) = ((rgb >> 8) & 0xff) / 255.0
              px(base + 2) = (rgb & 0xff) / 255.0
              xx += 1
            }
            yy += 1
          }
          ImageOps.Img(id, w, h, 3, px)
        }
      }
  }

  /** Decoded audio row: id, rate, and the PCM samples as exact ints. */
  case class Wav(id: Long, sample_rate: Int, n_samples: Int,
      samples: Array[Int])

  /** Deterministic WAV-ENCODED synthetic audio assets: PCM16 sample `s`
    * of asset `id` is ((id·31 + s·7) mod 65536) − 32768 — integer-exact —
    * pushed through the JDK's `javax.sound.sampled` WAV writer on
    * EXECUTORS. WAV is containerized raw PCM (lossless), so the decode
    * below reproduces the formula exactly and a codec-free SQL oracle can
    * verify every sample. Mono 16-bit little-endian at `rate` Hz. */
  def encodedWavAssets(spark: org.apache.spark.sql.SparkSession, n: Int,
      nSamples: Int, rate: Int = 16000): DataFrame = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.min(n, 8)).mapPartitions { it =>
      it.map { id =>
        val pcm = new Array[Byte](nSamples * 2)
        var s = 0
        while (s < nSamples) {
          val v = (((id * 31 + s * 7) % 65536) - 32768).toInt
          pcm(2 * s) = (v & 0xff).toByte // little-endian
          pcm(2 * s + 1) = ((v >> 8) & 0xff).toByte
          s += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, "audio", nSamples, 1, 1, 1, bos.toByteArray)
      }
    }.toDF("asset_id", "media_type", "x_dim", "y_dim", "n_channels",
      "n_frames", "content")
  }

  /** REAL audio decode (JDK `javax.sound.sampled` — WAV/AIFF/AU, no
    * native deps): parses the container, returns the PCM16 samples as
    * EXACT ints (no float conversion — sample values are the portable
    * truth the oracle checks). Same per-partition iterator seam as
    * [[decodeImage]]; dimensions come from the DECODED header, not the
    * metadata columns. Mono 16-bit signed; little- or big-endian per the
    * container's declared format. */
  def decodeWav(df: DataFrame): Dataset[Wav] = {
    import df.sparkSession.implicits._
    df.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"asset $id: expected mono PCM16, got $fmt")
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val out = new Array[Int](n)
          var s = 0
          if (fmt.isBigEndian)
            while (s < n) {
              out(s) = ((raw(2 * s) << 8) | (raw(2 * s + 1) & 0xff)).toShort.toInt
              s += 1
            }
          else
            while (s < n) {
              out(s) = (((raw(2 * s + 1) & 0xff) << 8) | (raw(2 * s) & 0xff)).toShort.toInt
              s += 1
            }
          Wav(id, fmt.getSampleRate.toInt, n, out)
        }
      }
  }

  /** Resize by integer-factor average pooling (the decode-free resize a
    * data pipeline does before featurization). Pure array expressions on
    * decoded images. */
  def resizeAvgPool(df: DataFrame, factor: Int): DataFrame = {
    val xo = floor(col("x_dim") / factor).cast("int")
    val yo = floor(col("y_dim") / factor).cast("int")
    val resized =
      flatten(transform(sequence(lit(0), yo - 1), py =>
        flatten(transform(sequence(lit(0), xo - 1), px =>
          transform(sequence(lit(0), col("n_channels") - 1), c =>
            aggregate(
              flatten(transform(sequence(lit(0), lit(factor - 1)), dy =>
                transform(sequence(lit(0), lit(factor - 1)), dx =>
                  element_at(col("image"),
                    ((py * factor + dy) * col("x_dim") + px * factor + dx)
                      * col("n_channels") + c + 1)))),
              lit(0.0), (a, v) => a + v) / (factor * factor))))))
    df.withColumn("image", resized)
      .withColumn("x_dim", xo)
      .withColumn("y_dim", yo)
  }

  /** Frame sampling for video assets: emit every `step`-th frame as its own
    * row (frame_id, content slice). Binary slicing via substring — no
    * decode needed to partition work by frame. */
  def frameSample(df: DataFrame, step: Int): DataFrame = {
    val frameBytes = col("x_dim") * col("y_dim") * col("n_channels")
    df.withColumn("frame_id",
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))))
      .withColumn("content",
        expr("substring(content, cast(frame_id * x_dim * y_dim * n_channels as int) + 1, " +
          "cast(x_dim * y_dim * n_channels as int))"))
      .withColumn("frame_id", col("frame_id").cast("long"))
      .withColumn("n_frames", lit(1))
  }

  /** Per-image feature extraction demo: decoded image → grayscale → 2×2
    * max-pool → flat feature vector. The composition every multimodal
    * training pipeline runs between storage and the feature store. */
  def featurize(assets: DataFrame): DataFrame = {
    val imgs = decodeStub(assets).toDF()
      .withColumnRenamed("id", "asset_id")
    ImageOps.vectorize(ImageOps.pool(ImageOps.grayScale(imgs), 2))
  }
}

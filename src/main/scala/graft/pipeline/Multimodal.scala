package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL: [[decodeImages]] runs JDK ImageIO (PNG) inside the
  * batched `mapPartitions`, and [[syntheticImages]] encodes genuine PNGs
  * whose pixels are a pure arithmetic function of (id, x, y) — so the
  * encode→decode roundtrip is verifiable against a SQL oracle computing the
  * same channel sums directly. Audio decode is REAL too:
  * [[syntheticAudio]]/[[decodeAudio]] round-trip 16-bit PCM through the
  * RIFF/WAV container via JDK `javax.sound.sampled`, with the sample
  * function mirrored in SQL the same way. Video is a REAL container parse +
  * per-frame PNG decode ([[syntheticVideo]]/[[decodeVideoFrames]], the
  * simplified MJPEG shape); only an inter-frame CODEC (H.264 etc.) stays
  * out of scope — no codec libs exist in this container — with
  * [[decodeStub]] as the deterministic stand-in where a codec would sit.
  * Everything around all three — schema, partition-batched iteration,
  * column pruning (metadata reads never touch the blob), output shape — is
  * the real Spark plumbing a production decoder (JNI/FFmpeg/Pandas-UDF
  * equivalent) drops into.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType)
    )), nullable = true)
  ))

  /** Deterministic fake "decode": FEATURE-DIM floats rolled from a 64-bit
    * FNV-1a over the blob. Stands in for a real decoder; same bytes → same
    * features, so tests are stable.
    */
  val FeatureDim = 8
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val out = new Array[Float](FeatureDim)
    var j = 0
    var s = h
    while (j < FeatureDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(j) = ((s >>> 40).toInt & 0xffff).toFloat / 65536.0f - 0.5f
      j += 1
    }
    out
  }

  /** Feature extraction over the binary column, batched per partition —
    * the `mapPartitions` shape a vectorized decoder (Arrow batches in
    * PySpark's `mapInPandas`) uses. Blob column is only deserialized here,
    * never shuffled onward: output carries features + metadata only.
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex("media_id")
    val modIdx = df.schema.fieldIndex("modality")
    val cIdx = df.schema.fieldIndex("content")
    val rdd = df.rdd.mapPartitions { it =>
      // batch loop: real decoders amortize per-batch setup (model load,
      // codec contexts) — keep the shape even though the stub needs none
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val bytes =
            if (row.isNullAt(cIdx)) Array.empty[Byte]
            else row.getAs[Array[Byte]](cIdx)
          Row(row.getLong(idIdx), row.getString(modIdx),
            bytes.length.toLong, decodeStub(bytes))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize"/"frame-sample" stub: emits one row per sampled frame index with
    * a per-frame feature slice — the fan-out shape of video frame sampling
    * (row explodes to `numFrames` rows, blob read once).
    */
  def frameSample(df: DataFrame, numFrames: Int): DataFrame = {
    val feats = extractFeatures(df)
    feats.select(col("media_id"), col("modality"),
        posexplode(transform(sequence(lit(0), lit(numFrames - 1)),
          i => concat(col("media_id"), lit(":"), i))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_key", col("col")).drop("col")
  }

  /** "Resize" stub: per-partition batched media transform — the decode →
    * transform → re-encode shape of an image/video resize, with the codec
    * stubbed to a deterministic byte fold. Metadata is updated for real
    * (target dimensions, derived mime); content becomes a stand-in payload
    * whose length scales with the target area, so downstream size
    * accounting exercises realistic numbers. Blob read once, output carries
    * the transformed blob + new meta only.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val modIdx = df.schema.fieldIndex("modality")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", mediaSchema("meta").dataType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val bytes =
            if (row.isNullAt(cIdx)) Array.empty[Byte]
            else row.getAs[Array[Byte]](cIdx)
          // deterministic stand-in for the re-encoded payload: roll the
          // decode-stub features into width*height/64 bytes
          val n = math.max(1, width * height / 64)
          val seedFeats = decodeStub(bytes)
          val out = new Array[Byte](n)
          var i = 0
          while (i < n) {
            out(i) = (java.lang.Float.floatToIntBits(
              seedFeats(i % FeatureDim)) >>> (8 * (i % 4))).toByte
            i += 1
          }
          Row(row.getLong(idIdx), row.getString(modIdx), out,
            Row(width, height, null, "application/x-resized"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: ImageIO decode → nearest-neighbor resample →
    * PNG re-encode, batched per partition — the full decode → transform →
    * re-encode media pipeline on genuine pixels (the codec-less
    * [[resizeStub]] keeps only the plumbing shape for modalities whose
    * codecs don't exist in this container). Nearest-neighbor uses pure
    * integer source coordinates (`srcX = x·srcW / dstW`), so the resized
    * pixels of a [[syntheticImages]] input remain arithmetic functions of
    * (id, x, y) and the whole decode→resize→re-encode→decode chain is
    * provable by a SQL oracle. Undecodable/null blobs emit null content
    * (corrupt files are data, not errors); blobs are read once and never
    * shuffled — output carries the re-encoded payload + new meta only.
    */
  def resizeImages(df: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"bad target ${width}x$height")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("meta", mediaSchema("meta").dataType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val resized: Array[Byte] =
            if (row.isNullAt(cIdx)) null
            else try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](cIdx)))
              if (img == null) null
              else {
                val out = new java.awt.image.BufferedImage(
                  width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
                var y = 0
                while (y < height) {
                  var x = 0
                  while (x < width) {
                    out.setRGB(x, y, img.getRGB(
                      x * img.getWidth / width, y * img.getHeight / height))
                    x += 1
                  }
                  y += 1
                }
                pngBytes(out)
              }
            } catch { case _: Exception => null }
          Row(id, resized,
            if (resized == null) null
            else Row(width, height, null, "image/png"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- real image decode (JDK ImageIO — no extra deps) --------------------

  /** Deterministic pixel function shared by the PNG synthesizer and the SQL
    * oracle: channel values are pure arithmetic over (id, x, y), so the
    * decoded channel sums are provable without re-encoding in SQL. */
  private[pipeline] def pxR(base: Int, x: Int, y: Int): Int = (base + 3 * x + 5 * y) % 256
  private[pipeline] def pxG(base: Int, x: Int, y: Int): Int = (2 * base + x + 7 * y) % 256
  private[pipeline] def pxB(base: Int, x: Int, y: Int): Int = (base + x * y) % 256
  private[pipeline] def imgW(id: Long): Int = (8 + id % 9).toInt
  private[pipeline] def imgH(id: Long): Int = (8 + id % 7).toInt

  /** The id column coerced to long, shared by every synthesizer. */
  private def idAsLong(row: Row, idIdx: Int): Long = row.get(idIdx) match {
    case l: Long => l
    case i: Int  => i.toLong
    case other   => other.toString.toLong
  }

  /** One rendered frame of the shared pixel function — the single source the
    * image and video synthesizers (and through them the SQL oracles) share. */
  private def renderFrame(base: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pxR(base, x, y) << 16) | (pxG(base, x, y) << 8) | pxB(base, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Exact per-channel pixel sums — the decode-side twin of [[renderFrame]]. */
  private def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Shared PNG-synthesizer core: one row per id, optional in-place
    * perturbation of the rendered frame before encoding, ids shifted by
    * `idOffset` in the output. */
  private def synthImages(df: DataFrame, idCol: String, idOffset: Long,
      perturb: java.awt.image.BufferedImage => Unit): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", mediaSchema("meta").dataType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = idAsLong(row, idIdx)
          val (w, h) = (imgW(id), imgH(id))
          val img = renderFrame((id % 256).toInt, w, h)
          perturb(img)
          Row(id + idOffset, "image", pngBytes(img),
            Row(w, h, null, "image/png"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a REAL PNG per row (dimensions and pixels derived from the
    * id): `java.awt.BufferedImage` → `javax.imageio` PNG bytes, batched per
    * partition like any media transcode. PNG is lossless, so downstream
    * [[decodeImages]] recovers the exact pixel function. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame =
    synthImages(df, idCol, idOffset = 0L, perturb = _ => ())

  /** REAL image decode over the binary column: `ImageIO.read` per blob inside
    * the batched per-partition loop, emitting decoded dimensions and exact
    * per-channel pixel sums (integer math — oracle-stable). Undecodable or
    * null blobs yield null dims/sums rather than failing the partition, the
    * posture a 100 TB media scan needs (corrupt files are data, not errors).
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val img =
            if (row.isNullAt(cIdx)) null
            else
              // NonFatal, not just IOException: javax.imageio plugins throw
              // RuntimeExceptions (IllegalArgument, CMM, index) on malformed
              // bytes — corrupt files are data, not task failures
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](cIdx)))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Row(id, null, null, null, null, null)
          else {
            val (sr, sg, sb) = channelSums(img)
            Row(id, img.getWidth, img.getHeight, sr, sg, sb)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** [[syntheticImages]] with one perturbed pixel (lowest blue bit of
    * (0,0) flipped) and ids offset by [[PerturbOffset]] — the planted
    * "near-duplicate under noise" fixture for the perceptual-hash gate. */
  val PerturbOffset = 100000L
  def syntheticImagesPerturbed(df: DataFrame, idCol: String): DataFrame =
    synthImages(df, idCol, idOffset = PerturbOffset,
      perturb = img => img.setRGB(0, 0, img.getRGB(0, 0) ^ 1))

  /** Average-hash (aHash) perceptual image fingerprint — the image
    * near-dup signal: decode, partition the frame into an 8×8 grid by
    * floor boundaries, and set bit (8j+i) when cell (i,j)'s mean
    * gray (r+g+b) exceeds the whole-image mean. The comparison is the
    * integer cross-multiplication `cellSum · totalCount > totalSum ·
    * cellCount` — no float, so the 64-bit hash is bit-deterministic.
    * Re-encodes, crops, and single-pixel noise move cell means only
    * marginally → small hamming distance; exact re-renders hash
    * identically. Candidate generation at corpus scale rides the same
    * pigeonhole machinery as SimHash (16-bit quarters → bucket join);
    * undecodable blobs yield a null hash (corrupt files are data).
    */
  def imageHashes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val img =
            if (row.isNullAt(cIdx)) null
            else
              // NonFatal for the same reason as [[decodeImages]]: decoder
              // plugins surface malformed data as RuntimeExceptions too
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](cIdx)))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 8 || img.getHeight < 8)
            Row(id, null)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val cs = new Array[Long](64)
            val cn = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                val cell = (y * 8 / h) * 8 + (x * 8 / w)
                cs(cell) += gray; cn(cell) += 1
                x += 1
              }
              y += 1
            }
            val totS = cs.sum; val totN = cn.sum
            var hash = 0L; var i = 0
            while (i < 64) {
              if (cs(i) * totN > totS * cn(i)) hash |= (1L << i)
              i += 1
            }
            Row(id, hash)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- real audio decode (JDK javax.sound.sampled — no extra deps) --------

  /** Deterministic 16-bit PCM sample function shared by the WAV synthesizer
    * and the SQL oracle: pure integer arithmetic over (id, sample index),
    * so decoded sample sums are provable in SQL. All operands stay
    * non-negative before the shift, keeping Scala `%` and DuckDB `%`
    * aligned. */
  private[pipeline] def pcmSample(id: Long, i: Int): Int =
    (((id * 31 + 7L * i * i + 13L * i) % 65536) - 32768).toInt
  private[pipeline] def audioSamples(id: Long): Int = (200 + id % 101).toInt
  private[pipeline] val AudioRateHz = 8000

  /** Synthesize a REAL RIFF/WAV blob per row (16-bit signed mono PCM at
    * [[AudioRateHz]]; length and samples derived from the id) via
    * `javax.sound.sampled` — the audio twin of [[syntheticImages]]. WAV is
    * lossless PCM, so [[decodeAudio]] recovers the exact sample function. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", mediaSchema("meta").dataType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = idAsLong(row, idIdx)
          val n = audioSamples(id)
          val pcm = new Array[Byte](n * 2) // 16-bit mono little-endian
          var i = 0
          while (i < n) {
            val s = pcmSample(id, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            AudioRateHz.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Row(id, "audio", bos.toByteArray,
            Row(null, null, n.toLong * 1000L / AudioRateHz, "audio/wav"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio decode over the binary column: `AudioSystem` parses the WAV
    * header (format, rate, frame count) and streams the PCM frames inside
    * the batched per-partition loop, emitting integer-exact sample sums.
    * Like [[decodeImages]], undecodable or null blobs yield null fields —
    * corrupt media is data, not an error, at scan scale.
    */
  def decodeAudio(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sum_s", LongType),
      StructField("sum_abs", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val decoded =
            if (row.isNullAt(cIdx)) None
            else
              try {
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](cIdx)))
                val fmt = ais.getFormat
                val bytes = ais.readAllBytes()
                // a parseable header can still declare a zero/negative rate
                // (crafted fmt chunk) — corrupt, not a division crash
                if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                    fmt.getSampleRate <= 0f) None
                else {
                  val n = bytes.length / 2
                  var (sum, sumAbs) = (0L, 0L)
                  var i = 0
                  while (i < n) {
                    // respect the header's declared endianness
                    val s =
                      if (fmt.isBigEndian)
                        ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
                      else
                        ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
                    sum += s; sumAbs += math.abs(s.toLong)
                    i += 1
                  }
                  val rate = fmt.getSampleRate.toInt
                  Some((n.toLong, rate, n.toLong * 1000L / rate, sum, sumAbs))
                }
              } catch {
                // UnsupportedAudioFileException is checked, but malformed
                // headers also surface as RuntimeExceptions from the parser
                case scala.util.control.NonFatal(_) => None
              }
          decoded match {
            case Some((n, rate, durMs, sum, sumAbs)) =>
              Row(id, n, rate, durMs, sum, sumAbs)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- real video-container frame decode (PNG frames, MJPEG-style) --------

  /** Frames per synthetic video — small fan-out, varies per id so the
    * sampler's stride logic is exercised. */
  private[pipeline] def videoFrames(id: Long): Int = (2 + id % 4).toInt
  private[pipeline] val VideoMagic = 0x47465631 // "GFV1"

  /** Synthesize a REAL multi-frame video container per row: `GFV1` magic +
    * frame count, then length-prefixed PNG frames (the simplified
    * MJPEG-in-AVI shape: video as a packed sequence of intra-coded
    * images). Every frame is a genuine PNG of the shared (id, x, y) pixel
    * function with a per-frame base shift, so sampled-frame channel sums
    * are SQL-provable. An inter-frame codec (H.264) stays out of scope —
    * no codec libs in this container — but the container parse, frame
    * indexing, and per-frame decode below are real.
    */
  def syntheticVideo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", mediaSchema("meta").dataType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(256).flatMap { batch =>
        batch.map { row =>
          val id = idAsLong(row, idIdx)
          val (w, h) = (imgW(id), imgH(id))
          val nf = videoFrames(id)
          val bos = new java.io.ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(bos)
          dos.writeInt(VideoMagic)
          dos.writeInt(nf)
          var k = 0
          while (k < nf) {
            val base = ((id + 131L * k) % 256).toInt
            val fb = pngBytes(renderFrame(base, w, h))
            dos.writeInt(fb.length)
            dos.write(fb)
            k += 1
          }
          dos.flush()
          Row(id, "video", bos.toByteArray,
            Row(w, h, nf.toLong * 40L, "video/x-graft-frames")) // 25 fps
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame sampling over the video-container column: parse the packed
    * container, decode every `stride`-th PNG frame with ImageIO, and emit
    * one row per sampled frame with its decoded dimensions and exact
    * channel sums — the row-explodes-to-frames shape of production frame
    * sampling, with the blob read once per video. Containers that fail the
    * magic check (or frames that fail to decode) yield a single null row,
    * keeping corrupt media data rather than a task failure.
    */
  def decodeVideoFrames(df: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex("media_id")
    val cIdx = df.schema.fieldIndex("content")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val nullRow = (id: Long) => Seq(Row(id, null, null, null, null, null, null))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.flatMap { row =>
          val id = row.getLong(idIdx)
          if (row.isNullAt(cIdx)) nullRow(id)
          else try {
            val dis = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](cIdx)))
            if (dis.readInt() != VideoMagic) nullRow(id)
            else {
              // a negative count/length word means a corrupt container —
              // emit the null marker row, never a crash or a silent drop
              val nf = dis.readInt()
              if (nf < 0) nullRow(id)
              else (0 until nf).flatMap { k =>
                val len = dis.readInt()
                if (len < 0) throw new java.io.IOException(s"bad frame len $len")
                if (k % stride != 0) {
                  dis.skipNBytes(len.toLong) // skipped frames: no alloc/copy
                  None
                } else {
                  val fb = new Array[Byte](len)
                  dis.readFully(fb)
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(fb))
                  if (img == null) Some(Row(id, k, null, null, null, null, null))
                  else {
                    val (sr, sg, sb) = channelSums(img)
                    Some(Row(id, k, img.getWidth, img.getHeight, sr, sg, sb))
                  }
                }
              }
            }
            // NonFatal: truncated containers raise EOF/IOException, but a
            // corrupt embedded frame can throw RuntimeExceptions from the
            // PNG plugin — either way the video is data, not a task failure
          } catch { case scala.util.control.NonFatal(_) => nullRow(id) }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthetic media table derived from any (id, text) frame — test fixture
    * builder so plumbing tests run without real media files. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    df.select(
      col(idCol).cast("long").as("media_id"),
      modality.as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        (pmod(col(idCol), lit(10000)) + 1000).cast("long").as("duration_ms"),
        lit("application/octet-stream").as("mime")).as("meta"))
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque BINARY
  * columns plus typed metadata, processed in partition-sized batches.
  *
  * IMAGE decode is REAL: [[imageChannelStats]] decodes PNG/JPEG/BMP/GIF
  * binaries through `javax.imageio` inside `mapPartitions` (one reader
  * context per partition), and [[imagesFromText]] encodes real PNGs, so
  * the pair round-trips actual codec bytes end-to-end (oracle-gated by
  * q107: the DuckDB side computes the expected pixel sums from the
  * source text without ever touching PNG). AUDIO decode is REAL too:
  * [[audioSampleStats]] parses RIFF/WAVE PCM through
  * `javax.sound.sampled` (in the JDK), paired with [[wavFromText]] and
  * oracle-gated by q116 the same way. VIDEO decode is REAL as of
  * round 8: [[videoFrameStats]] iterates the frame sequence of
  * animated GIF89a binaries (a true multi-frame container + LZW codec
  * in the JDK), paired with [[videosFromText]]'s lossless indexed
  * encode and oracle-gated by q135. [[decodeStub]] remains only as
  * the placeholder for codec families OUTSIDE the JDK (H.264/mp4
  * etc.): deterministic fake features keep the schema, batch shape,
  * partitioning and typed mapPartitions signature real and testable;
  * a production build swaps `decodeStub` for an FFI codec call and
  * nothing else changes.
  *
  * Scale design (100 TB):
  *   - binaries stay columnar (Parquet BINARY) and are NEVER collected;
  *   - feature extraction is mapPartitions (one codec init per partition,
  *     not per row — the expensive part of real decoders);
  *   - `spark.sql.files.maxPartitionBytes` governs batch size; assets
  *     should be written with a row-group size that keeps a partition's
  *     binaries within executor memory (~128 MB default is fine for
  *     thumbnails; shard large videos into chunked rows).
  */
object Multimodal {

  /** Typed asset row: media bytes + minimal metadata. */
  final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, duration_ms: Long)

  /** Extracted feature row (stub: byte-derived). */
  final case class AssetFeatures(asset_id: Long, kind: String,
                                 n_bytes: Long, content_hash: String,
                                 feature: Array[Double])

  /** Deterministic fake "decode": 8 doubles derived from evenly-spaced
    * byte probes. STUB for the audio/video decoders (no such codecs in
    * this environment — images decode for real, see
    * [[imageChannelStats]]); deterministic so tests and re-runs
    * agree. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    if (n == 0) Array.fill(8)(0.0)
    else Array.tabulate(8) { i =>
      val probe = bytes(math.min(n - 1, i * n / 8)) & 0xff
      probe / 255.0
    }
  }

  /** Build an asset table from any DataFrame with an id and a binary
    * column (here: documents' text bytes stand in for media bytes). */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      // deterministic fake modality assignment (pmod: a negative id
      // must map to a valid 1-based index and positive dimensions —
      // the same hardening the byte encoders apply)
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id"), lit(640L)) + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480L)) + 48).cast("int").as("height"),
      (col("doc_id") * 40 + 1000).as("duration_ms"))

  /** Batched feature extraction: typed mapPartitions so a real codec
    * initializes once per partition. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init would happen here (codec handles, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        md.reset()
        val hash = md.digest(a.bytes).map("%02x".format(_)).mkString
        AssetFeatures(a.asset_id, a.kind, a.bytes.length.toLong, hash,
          decodeStub(a.bytes))
      }
    }
  }

  /** One decoded image's channel statistics (sums are exact BIGINTs so
    * the oracle compare is drift-free). */
  final case class ImageStats(asset_id: Long, w: Int, h: Int,
                              sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic pixel rule shared by the PNG encoder and the q107
    * oracle: channel c of pixel i is the code point of
    * `text[(3*i + c) mod len]` masked to a byte — so the expected
    * channel sums are computable from the TEXT alone, while the engine
    * must round-trip real PNG bytes to reproduce them. */
  /** ImageIO's stream "cache" defaults to a TEMP FILE on disk per
    * created image input/output stream — ImageIO.read/write and
    * createImageInput/OutputStream each pay a file create+delete PER
    * IMAGE (thumbnail-sized assets here, so the syscalls dwarf the
    * pixel work; r15 opt, guide §1.2 per-task work). Heap-buffer the
    * streams instead: JVM-wide, idempotent, called executor-side at
    * the top of every codec mapPartitions closure. */
  private def disableImageIoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def pixelByte(text: String, i: Int, c: Int): Int =
    text.charAt((3 * i + c) % text.length).toInt & 0xff

  /** Encode one real PNG per row: a (4 + id%5) x (3 + id%4) truecolor
    * image whose pixels derive from the row's text by [[pixelByte]].
    * Runs in `mapPartitions` (one encoder context per partition); PNG
    * is lossless, so decode recovers the exact pixel values. Rows with
    * empty text are dropped (no pixels to derive). */
  def imagesFromText(docs: DataFrame, textCol: String, idCol: String)
  : DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("asset_id"),
        col(textCol).cast("string").as("text"))
      .where(length(col("text")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { case (id, text) =>
          // floorMod: a negative id must not yield zero/negative
          // dimensions (same hardening as videosFromText/wavFromText)
          val w = 4 + java.lang.Math.floorMod(id, 5L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 4L).toInt
          val im = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < w * h) {
            val rgb = (pixelByte(text, i, 0) << 16) |
              (pixelByte(text, i, 1) << 8) | pixelByte(text, i, 2)
            im.setRGB(i % w, i / w, rgb)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(im, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("asset_id", "png")
  }

  /** REAL image decode: read each binary through `javax.imageio`
    * (PNG/JPEG/BMP/GIF) and emit exact per-channel pixel sums plus the
    * decoded dimensions. mapPartitions so reader setup amortizes per
    * partition; undecodable binaries fail loudly (a curation pipeline
    * must not silently count garbage as pixels). */
  def imageChannelStats(images: DataFrame, bytesCol: String,
                        idCol: String): Dataset[ImageStats] = {
    import images.sparkSession.implicits._
    images.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { case (id, bytes) =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(im != null, s"asset $id: undecodable image bytes")
          val (w, h) = (im.getWidth, im.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < w * h) {
            val rgb = im.getRGB(i % w, i / w)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            i += 1
          }
          ImageStats(id, w, h, sr, sg, sb)
        }
      }
  }

  /** One decoded image's perceptual average-hash (exact integers, so
    * the oracle compare is drift-free). */
  final case class ImageHash(asset_id: Long, w: Int, h: Int, ahash: Long)

  /** Perceptual average-hash over REAL decoded pixels: per-pixel
    * integer luminance L_i = r+g+b, bit i set iff n*L_i > sum(L) —
    * strictly-above-mean decided in exact integer arithmetic (no
    * float mean), so engine and oracle agree bit-for-bit. Images here
    * are at most 8x6 = 48 pixels, so the hash fits one BIGINT; a
    * production variant downsamples to 8x8 first (the classic aHash)
    * — the decode/threshold/pack pipeline is identical. */
  def imageAHash(images: DataFrame, bytesCol: String,
                 idCol: String): Dataset[ImageHash] = {
    import images.sparkSession.implicits._
    images.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { case (id, bytes) =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(im != null, s"asset $id: undecodable image bytes")
          val (w, h) = (im.getWidth, im.getHeight)
          val n = w * h
          require(n <= 64, s"asset $id: ${w}x$h exceeds one-long aHash")
          val lum = new Array[Long](n)
          var tot = 0L
          var i = 0
          while (i < n) {
            val rgb = im.getRGB(i % w, i / w)
            lum(i) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)
            tot += lum(i)
            i += 1
          }
          var hash = 0L
          i = 0
          while (i < n) {
            if (n * lum(i) > tot) hash |= (1L << i)
            i += 1
          }
          ImageHash(id, w, h, hash)
        }
      }
  }

  /** One nearest-neighbour thumbnail's exact checksum (see
    * [[imageThumbnail]]). */
  final case class Thumb(asset_id: Long, w: Int, h: Int, w2: Int,
                         h2: Int, checksum: Long)

  /** Nearest-neighbour half-size thumbnail over REAL decoded pixels —
    * the resize step of an image-ingest pipeline, verified without
    * shipping the thumbnail: thumb pixel (x,y) is source pixel
    * (2x, 2y) (ceil-half dimensions), and the emitted checksum is the
    * exact integer Σ (j+1)·lum_j over thumb pixels in row-major order
    * (lum = r+g+b). Because the PNGs come from [[imagesFromText]]'s
    * lossless pixel rule, the oracle recomputes the identical checksum
    * from the TEXT alone while the engine must decode real codec
    * bytes. One ImageIO context per partition, as [[imageAHash]]. */
  def imageThumbnail(images: DataFrame, bytesCol: String,
                     idCol: String): Dataset[Thumb] = {
    import images.sparkSession.implicits._
    images.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { case (id, bytes) =>
          val im = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(im != null, s"asset $id: undecodable image bytes")
          val (w, h) = (im.getWidth, im.getHeight)
          val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
          var checksum = 0L
          var j = 0
          while (j < w2 * h2) {
            val (x2, y2) = (j % w2, j / w2)
            val rgb = im.getRGB(2 * x2, 2 * y2)
            val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)
            checksum += (j + 1).toLong * lum
            j += 1
          }
          Thumb(id, w, h, w2, h2, checksum)
        }
      }
  }

  /** One decoded video frame's channel statistics (exact integers, so
    * the oracle compare is drift-free). */
  final case class VideoFrameStats(asset_id: Long, frame: Int, w: Int,
                                   h: Int, sum_r: Long, sum_g: Long,
                                   sum_b: Long)

  /** Frame-f pixel rule shared by the GIF encoder and the q135 oracle:
    * channel c of pixel i in frame f is the code point of
    * `text[(3*i + c + 7*f) mod len]` masked to a byte (the 7*f offset
    * makes every frame distinct). Same BMP/ASCII-only caveat as
    * [[pixelByte]]. */
  private def framePixelByte(text: String, i: Int, c: Int,
                             f: Int): Int =
    text.charAt((3 * i + c + 7 * f) % text.length).toInt & 0xff

  /** Encode one REAL multi-frame video per row: a (2 + id%3)-frame
    * animated GIF89a of (4 + id%5) x (3 + id%4) frames whose pixels
    * derive from the row's text by [[framePixelByte]]. Each frame is
    * written as an INDEXED image over its own exact color palette
    * (<= 48 distinct colors per frame, far under GIF's 256), so the
    * LZW encode is LOSSLESS and decode recovers exact pixel values —
    * a real container + codec round trip through `javax.imageio`, the
    * same move as [[imagesFromText]]/[[wavFromText]]. Interlacing is
    * explicitly disabled: the JDK's GIF pipeline mis-rounds the
    * 4-pass row schedule on frames shorter than 8 rows (row order
    * comes back permuted), and progressive encoding buys nothing for
    * thumbnail-sized frames. */
  def videosFromText(docs: DataFrame, textCol: String, idCol: String)
  : DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("asset_id"),
        col(textCol).cast("string").as("text"))
      .where(length(col("text")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        import javax.imageio._
        import java.awt.image.{BufferedImage, IndexColorModel}
        // one writer per partition (codec-init amortization)
        val wr = ImageIO.getImageWritersByFormatName("gif").next()
        val param = wr.getDefaultWriteParam
        param.setProgressiveMode(ImageWriteParam.MODE_DISABLED)
        it.map { case (id, text) =>
          // floorMod: a negative id must not yield zero/negative
          // dimensions or frame counts (same hardening as wavFromText)
          val w = (4 + math.floorMod(id, 5L)).toInt
          val h = (3 + math.floorMod(id, 4L)).toInt
          val nf = (2 + math.floorMod(id, 3L)).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = ImageIO.createImageOutputStream(bos)
          wr.setOutput(ios)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val n = w * h
            val rgbs = Array.tabulate(n) { i =>
              (framePixelByte(text, i, 0, f) << 16) |
                (framePixelByte(text, i, 1, f) << 8) |
                framePixelByte(text, i, 2, f)
            }
            val pal = rgbs.distinct
            val idx = pal.zipWithIndex.toMap
            val cm = new IndexColorModel(8, pal.length,
              pal.map(p => ((p >> 16) & 0xff).toByte),
              pal.map(p => ((p >> 8) & 0xff).toByte),
              pal.map(p => (p & 0xff).toByte))
            val im = new BufferedImage(w, h,
              BufferedImage.TYPE_BYTE_INDEXED, cm)
            var i = 0
            while (i < n) {
              im.getRaster.setSample(i % w, i / w, 0, idx(rgbs(i)))
              i += 1
            }
            wr.writeToSequence(new IIOImage(im, null, null), param)
            f += 1
          }
          wr.endWriteSequence()
          ios.close()
          (id, bos.toByteArray)
        }
      }
      .toDF("asset_id", "gif")
  }

  /** REAL video decode: parse each binary as an animated GIF through
    * `javax.imageio`, iterate the frame sequence and emit exact
    * per-frame channel sums plus decoded dimensions. mapPartitions so
    * reader setup amortizes per partition; undecodable binaries fail
    * loudly. */
  def videoFrameStats(videos: DataFrame, bytesCol: String,
                      idCol: String): Dataset[VideoFrameStats] = {
    import videos.sparkSession.implicits._
    videos.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        import javax.imageio._
        val rd = ImageIO.getImageReadersByFormatName("gif").next()
        it.flatMap { case (id, bytes) =>
          val iis = ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            rd.setInput(iis)
            val nf = rd.getNumImages(true)
            require(nf > 0, s"asset $id: undecodable GIF bytes")
            (0 until nf).map { f =>
              val im = rd.read(f)
              val (w, h) = (im.getWidth, im.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var i = 0
              while (i < w * h) {
                val rgb = im.getRGB(i % w, i / w)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                i += 1
              }
              VideoFrameStats(id, f, w, h, sr, sg, sb)
            }
          } finally iis.close()
        }
      }
  }

  /** One decoded audio clip's exact PCM statistics (integer sums, so
    * the oracle compare is drift-free). */
  final case class AudioStats(asset_id: Long, n_samples: Long,
                              sample_rate: Long, sum_samples: Long,
                              sum_abs: Long)

  /** Deterministic sample rule shared by the WAV encoder and the q116
    * oracle: sample i is the code point of `text[i mod len]` masked to
    * a byte, centered and scaled to 16-bit — so the expected sample
    * sums are computable from the TEXT alone, while the engine must
    * round-trip real RIFF/WAVE bytes to reproduce them.
    *
    * BMP/ASCII-ONLY ASSUMPTION (shared with `pixelByte` above): this
    * indexes UTF-16 code units (charAt/length) while the DuckDB oracle
    * uses unicode()/length() code points. Identical for the generator's
    * BMP-safe vocab; a supplementary-plane char (emoji) would desync
    * index modulus AND value. If the corpus ever goes non-BMP, switch
    * both sides to code-point iteration together. */
  private def sampleValue(text: String, i: Int): Int =
    ((text.charAt(i % text.length).toInt & 0xff) - 128) * 256

  /** Encode one real WAV clip per row: 160 + (id%5)*40 samples of
    * 16-bit mono PCM at 8 kHz derived from the row's text by
    * [[sampleValue]], written through `javax.sound.sampled`
    * (RIFF/WAVE is in the JDK — no external codecs needed, same move
    * as [[imagesFromText]]). PCM is lossless, so decode recovers the
    * exact sample values. Rows with empty text are dropped. */
  def wavFromText(docs: DataFrame, textCol: String, idCol: String)
  : DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("asset_id"),
        col(textCol).cast("string").as("text"))
      .where(length(col("text")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        import javax.sound.sampled._
        // one format object per partition (codec-init amortization)
        val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false)
        it.map { case (id, text) =>
          // floorMod: a negative id must not yield n < 160 (Scala % can
          // be negative; the oracle mirrors generate_series over the
          // same non-negative n)
          val n = 160 + math.floorMod(id, 5L).toInt * 40
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = sampleValue(text, i)
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("asset_id", "wav")
  }

  /** REAL audio decode: parse each binary as RIFF/WAVE through
    * `javax.sound.sampled`, read the PCM frames back and emit the
    * exact sample count, rate, sum and abs-sum. mapPartitions so
    * decoder setup amortizes per partition; undecodable or
    * unexpected-format binaries fail loudly. */
  def audioSampleStats(audio: DataFrame, bytesCol: String,
                       idCol: String): Dataset[AudioStats] = {
    import audio.sparkSession.implicits._
    audio.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled._
        it.map { case (id, bytes) =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          // close on EVERY exit, including the format require throwing
          // (fail-loudly must not leak the stream)
          val (fmt, data) = try {
            val f = ais.getFormat
            require(f.getSampleSizeInBits == 16 && f.getChannels == 1
                && !f.isBigEndian
                && f.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
              s"asset $id: unexpected WAV format $f")
            (f, ais.readAllBytes())
          } finally ais.close()
          val n = data.length / 2
          var (sum, sabs) = (0L, 0L)
          var i = 0
          while (i < n) {
            val v = (((data(2 * i + 1) & 0xff) << 8) |
              (data(2 * i) & 0xff)).toShort.toInt
            sum += v
            sabs += math.abs(v)
            i += 1
          }
          AudioStats(id, n.toLong, fmt.getSampleRate.toLong, sum, sabs)
        }
      }
  }

  /** Deterministic "resize" STUB: sample the source binary at
    * `outW*outH` evenly spaced byte offsets and emit the sampled bytes
    * as the resized payload (nearest-neighbor over the byte grid — a
    * real build swaps the sampler for a codec scale call; the
    * Spark-side shape is what matters: one native codegen'd gather
    * over BINARY, no UDF, no collect, linear in output size).
    * Requires [[graft.functions.GraftFunctions.register]] on the
    * session (idempotent; every query entry point does it). */
  def resizeStub(bytes: org.apache.spark.sql.Column, outW: Int,
                 outH: Int): org.apache.spark.sql.Column =
    call_function("binary_resample", bytes, lit(outW * outH))

  /** Deterministic frame sampling: n evenly spaced `frameLen`-byte chunks
    * ("frames") sliced out of the binary — pure Column ops, no UDF
    * (Substring supports BinaryType natively). */
  def frameSample(bytes: org.apache.spark.sql.Column, n: Int,
                  frameLen: Int = 16): org.apache.spark.sql.Column = {
    val len = octet_length(bytes).cast("long")
    transform(sequence(lit(0), lit(n - 1)), i => {
      val off = (floor(i.cast("double") * len.cast("double") / n)
        .cast("int") + 1)
      bytes.substr(off, lit(frameLen))
    })
  }
}

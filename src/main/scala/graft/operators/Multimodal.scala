package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) are carried as
 * opaque BINARY columns with a typed metadata struct; feature extraction
 * runs as partition-batched typed transforms.
 *
 * IMAGES and AUDIO decode for real: the JDK ships a PNG codec
 * (`javax.imageio`) and a WAV/PCM container parser
 * (`javax.sound.sampled`), so [[decodeImageFeatures]] and
 * [[decodeAudioFeatures]] run actual container decodes in the batched
 * loop. VIDEO codecs are NOT available in this environment, so that
 * decode step is STUBBED with a deterministic byte-level featurizer
 * (16-bin byte histogram) — see [[decodeStub]]. The Spark-side plumbing
 * (binary schema, metadata propagation, batched mapPartitions signature,
 * flat feature output) is real and oracle-tested either way: over the
 * ASCII `documents` corpus, byte == character code, so plain SQL
 * reproduces the byte histogram, and PNG/PCM are lossless, so plain SQL
 * reproduces the decoded pixel/sample features from the synthesis
 * arithmetic.
 */
object Multimodal {

  final val Bins = 16

  /** documents -> (doc_id, blob BINARY, meta STRUCT<lang,source,n_chars>). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /**
   * STUB decode: a real deployment would decode the codec here
   * (JPEG -> pixels, PCM -> frames) inside the same partition-batched
   * loop; the byte histogram stands in deterministically.
   */
  def decodeStub(blob: Array[Byte]): Array[Long] = {
    val h = new Array[Long](Bins)
    var i = 0
    while (i < blob.length) { h((blob(i) & 0xFF) % Bins) += 1; i += 1 }
    h
  }

  // frame-sampling geometry: fixed-length frames at a fixed stride
  // (overlapping), capped per document — the video/audio sampling shape
  final val FrameLen = 64
  final val FrameStride = 48
  final val MaxFrames = 8

  /** First 15 hex digits of the MD5 as a 60-bit Long — the same portable
    * fingerprint both engines can compute (DuckDB:
    * CAST('0x' || substr(md5(x),1,15) AS BIGINT)). */
  def md5Prefix15(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFF); i += 1 }
    v >>> 4 // keep the top 60 bits = first 15 hex chars
  }

  /**
   * Frame sampling over the opaque blob: up to [[MaxFrames]] fixed-stride
   * slices per document, each fingerprinted — the batched shape of video
   * frame-sample / audio window extraction (a real deployment decodes the
   * container and samples decoded frames in this same loop; the byte
   * slices stand in deterministically). Flat output
   * (doc_id, frame_idx, frame_len, frame_hash) — over the ASCII corpus
   * byte slices == substrings, so plain SQL reproduces the fingerprints.
   */
  def frameSample(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          (0 until MaxFrames).iterator
            .filter(_ * FrameStride < blob.length)
            .map { k =>
              val start = k * FrameStride
              val end = math.min(start + FrameLen, blob.length)
              val fr = java.util.Arrays.copyOfRange(blob, start, end)
              (id, k, end - start, md5Prefix15(fr))
            }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_len", "frame_hash")
  }

  /** Dense feature vector per document from the flat histogram rows:
    * (doc_id, fvec ARRAY<FLOAT>[Bins]) — missing buckets are zero.
    * Counts are small integers, so the float cast is exact and cosine
    * scoring over these vectors is oracle-reproducible. */
  def featureVectors(feats: DataFrame): DataFrame =
    feats.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
        .as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(Bins - 1)),
          b => coalesce(element_at(col("m"), b), lit(0L)).cast("float"))
          .as("fvec"))

  // ---- real image decode (JDK ImageIO; PNG codec ships in every JRE) ----

  final val ImgW = 16
  final val ImgH = 16
  final val PixBins = 16

  /** Deterministic 8-bit grayscale pixel for (id, x, y): pure BIGINT
    * arithmetic (products stay far below 2^63) that DuckDB reproduces
    * term-for-term — the image twin of the vector fixtures' counter-based
    * synthesis, so decoded features are hash-matchable. */
  def pixel(id: Long, x: Int, y: Int): Int =
    (((id * 2654435761L + x * 40503L + y * 69621L) % 2147483647L) % 256L).toInt

  /** (doc_id) -> (doc_id, img BINARY): each document's deterministic
    * grayscale [[ImgW]]x[[ImgH]] image, PNG-ENCODED (a real compressed
    * image container, not a byte stand-in). Encoder byte output may vary
    * across JDKs; that is irrelevant downstream because PNG is lossless —
    * only the decoded pixels are consumed. */
  def renderImageBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file spooling
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            ImgW, ImgH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val r = img.getRaster
          var y = 0
          while (y < ImgH) {
            var x = 0
            while (x < ImgW) { r.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "img")
  }

  /**
   * REAL image decode + featurize, partition-batched: PNG-decode each
   * blob with the JDK codec, histogram the decoded pixels into
   * [[PixBins]] buckets. Flat (doc_id, bucket, cnt) rows. Decoding is
   * lossless, so over [[renderImageBlobs]] output the histogram equals
   * the closed-form synthesis arithmetic — the DuckDB oracle states it
   * without ever seeing a PNG. Fails loudly on an undecodable blob
   * (a silent skip would under-count and still hash-match nothing).
   */
  def decodeImageFeatures(imgs: DataFrame): DataFrame = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.select(col("doc_id"), col("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, blob) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob))
          require(img != null, s"undecodable image blob for doc_id=$id")
          val r = img.getRaster
          val h = new Array[Long](PixBins)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              h(r.getSample(x, y, 0) * PixBins / 256) += 1
              x += 1
            }
            y += 1
          }
          (0 until PixBins).iterator
            .filter(h(_) > 0L)
            .map(b => (id, b.toLong, h(b)))
        }
      }
      .toDF("doc_id", "bucket", "cnt")
  }

  // ---- real video-frame decode (demux + per-frame JDK PNG decode) -------

  final val VideoFrames = 4
  final val FrameW = 8
  final val FrameH = 8

  /** Deterministic 8-bit grayscale pixel for (id, frame, x, y). */
  def framePixel(id: Long, f: Int, x: Int, y: Int): Int =
    (((id * 2654435761L + f * 1013904223L + x * 40503L + y * 69621L)
      % 2147483647L) % 256L).toInt

  /** (doc_id) -> (doc_id, video BINARY): a length-prefixed container of
    * [[VideoFrames]] PNG-encoded frames ([int32-BE len][png bytes] per
    * frame) — the demux-then-decode shape of a real video pipeline with
    * a lossless intra-frame codec. True inter-frame codecs (H.264 etc.)
    * are not in the JDK; this is the honest JDK-only equivalent. */
  def renderVideoBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          var f = 0
          while (f < VideoFrames) {
            val img = new java.awt.image.BufferedImage(
              FrameW, FrameH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val r = img.getRaster
            var y = 0
            while (y < FrameH) {
              var x = 0
              while (x < FrameW) { r.setSample(x, y, 0, framePixel(id, f, x, y)); x += 1 }
              y += 1
            }
            val frame = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", frame)
            val bytes = frame.toByteArray
            out.writeInt(bytes.length)
            out.write(bytes)
            f += 1
          }
          out.flush()
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "video")
  }

  /**
   * REAL video-frame decode, partition-batched: demux the length-
   * prefixed container, PNG-decode every frame with the JDK codec, and
   * emit per-frame pixel sums (doc_id, frame, psum, n) — exact BIGINT
   * aggregates of the lossless round-trip, so the oracle states the
   * synthesis arithmetic in closed form. Fails loudly on a truncated
   * container or an undecodable frame.
   */
  def decodeVideoFeatures(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, blob) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(blob))
          Iterator.continually(in.available())
            .takeWhile(_ > 0)
            .zipWithIndex
            .map { case (_, f) =>
              val len = in.readInt()
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              require(img != null, s"undecodable frame $f for doc_id=$id")
              val r = img.getRaster
              var psum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) { psum += r.getSample(x, y, 0); x += 1 }
                y += 1
              }
              (id, f.toLong, psum, img.getWidth.toLong * img.getHeight)
            }.toList
        }
      }
      .toDF("doc_id", "frame", "psum", "n")
  }

  // ---- inter-frame (temporal-predictive) video codec --------------------
  //
  // The intra path above stores every frame as an independent PNG. Real
  // video codecs exploit TEMPORAL redundancy: predict each frame from the
  // previous reconstruction and entropy-code only the residual. The JDK
  // ships no H.264-class codec, but the predictive STRUCTURE is fully
  // buildable with JDK parts: key frame as a real PNG, then per-pixel
  // mod-256 residuals against the previously RECONSTRUCTED frame,
  // Deflate-entropy-coded. Decode carries the sequential frame dependency
  // every temporal codec imposes (a P-frame is meaningless without its
  // predecessor), and the round-trip is lossless.

  /** Temporally-correlated pixel stream: a static base image with one
    * inverted column sweeping across the frame (the classic test-pattern
    * sprite) — consecutive frames differ in at most 2 of [[FrameW]]
    * columns, so P-frame residuals are sparse and genuinely compress. */
  def interPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val b = framePixel(id, 0, x, y)
    if (x == f % FrameW) (b + 128) % 256 else b
  }

  private def interFramePixels(id: Long, f: Int): Array[Byte] = {
    val px = new Array[Byte](FrameW * FrameH)
    var y = 0
    while (y < FrameH) {
      var x = 0
      while (x < FrameW) {
        px(y * FrameW + x) = interPixel(id, f, x, y).toByte; x += 1
      }
      y += 1
    }
    px
  }

  /** (doc_id) -> (doc_id, video BINARY): [int32-BE len][byte type]
    * [payload] per frame, where type 'K' payload is a PNG key frame and
    * type 'P' payload is the Deflate-coded mod-256 residual against the
    * previous reconstructed frame. */
  def renderVideoBlobsInter(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          var prev: Array[Byte] = null
          var f = 0
          while (f < VideoFrames) {
            val cur = interFramePixels(id, f)
            if (f == 0) {
              val img = new java.awt.image.BufferedImage(
                FrameW, FrameH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val r = img.getRaster
              var i = 0
              while (i < cur.length) {
                r.setSample(i % FrameW, i / FrameW, 0, cur(i) & 0xFF); i += 1
              }
              val png = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", png)
              val bytes = png.toByteArray
              out.writeInt(bytes.length); out.writeByte('K'); out.write(bytes)
            } else {
              val resid = new Array[Byte](cur.length)
              var i = 0
              while (i < cur.length) {
                resid(i) = ((cur(i) - prev(i)) & 0xFF).toByte; i += 1
              }
              val d = new java.util.zip.Deflater(
                java.util.zip.Deflater.BEST_SPEED)
              d.setInput(resid); d.finish()
              val buf = new Array[Byte](resid.length * 2 + 64)
              val n = d.deflate(buf)
              require(d.finished(), s"residual deflate overflow doc_id=$id")
              d.end()
              out.writeInt(n); out.writeByte('P'); out.write(buf, 0, n)
            }
            prev = cur
            f += 1
          }
          out.flush()
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "video")
  }

  /** REAL temporal decode: PNG-decode the key frame, then sequentially
    * inflate each P-frame residual and add it mod 256 to the previous
    * reconstruction — the frame-dependency chain of a real inter-frame
    * codec. Emits the same (doc_id, frame, psum, n) feature rows as the
    * intra path; fails loudly on a truncated container, an unknown frame
    * type, or a residual of the wrong size. */
  def decodeVideoFeaturesInter(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, blob) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(blob))
          var prev: Array[Byte] = null
          Iterator.continually(in.available())
            .takeWhile(_ > 0)
            .zipWithIndex
            .map { case (_, f) =>
              val len = in.readInt()
              val kind = in.readByte()
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val cur: Array[Byte] = kind.toChar match {
                case 'K' =>
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(bytes))
                  require(img != null, s"undecodable key frame for doc_id=$id")
                  val px = new Array[Byte](img.getWidth * img.getHeight)
                  val r = img.getRaster
                  var i = 0
                  while (i < px.length) {
                    px(i) = r.getSample(i % img.getWidth, i / img.getWidth, 0)
                      .toByte
                    i += 1
                  }
                  px
                case 'P' =>
                  require(prev != null, s"P-frame before key frame doc_id=$id")
                  val inf = new java.util.zip.Inflater()
                  inf.setInput(bytes)
                  val resid = new Array[Byte](prev.length)
                  val n = inf.inflate(resid)
                  require(n == prev.length && inf.finished(),
                    s"residual size $n != ${prev.length} doc_id=$id frame=$f")
                  inf.end()
                  val px = new Array[Byte](prev.length)
                  var i = 0
                  while (i < px.length) {
                    px(i) = ((prev(i) + resid(i)) & 0xFF).toByte; i += 1
                  }
                  px
                case other =>
                  sys.error(s"unknown frame type $other doc_id=$id frame=$f")
              }
              prev = cur
              var psum = 0L
              var i = 0
              while (i < cur.length) { psum += cur(i) & 0xFF; i += 1 }
              (id, f.toLong, psum, cur.length.toLong)
            }.toList
        }
      }
      .toDF("doc_id", "frame", "psum", "n")
  }

  // ---- real audio decode (JDK javax.sound.sampled; WAV/PCM built in) ----

  final val AudioSamples = 256   // samples per document
  final val AudioWin = 64        // energy-window length
  final val AudioRate = 8000f

  /** Deterministic signed 16-bit PCM sample for (id, i): BIGINT
    * arithmetic DuckDB reproduces term-for-term. */
  def sample16(id: Long, i: Int): Int =
    ((((id * 2654435761L + i * 48271L) % 2147483647L) % 65536L) - 32768L).toInt

  /** (doc_id) -> (doc_id, wav BINARY): each document's deterministic
    * [[AudioSamples]]-sample mono 16-bit little-endian PCM in a genuine
    * WAV container (written through the JDK audio system, not by hand). */
  def renderAudioBlobs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        import javax.sound.sampled._
        val fmt = new AudioFormat(AudioRate, 16, 1, true, false)
        it.map { id =>
          val pcm = new Array[Byte](AudioSamples * 2)
          var i = 0
          while (i < AudioSamples) {
            val s = sample16(id, i)
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          AudioSystem.write(
            new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
              AudioSamples.toLong),
            AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "wav")
  }

  /**
   * REAL audio decode + featurize, partition-batched: parse each WAV
   * container through the JDK audio system (header, format, frame
   * stream), reconstruct the 16-bit samples, and emit per-window energy
   * (doc_id, win, energy, n) — the audio-fingerprint shape. PCM is
   * lossless, so over [[renderAudioBlobs]] output the energies equal the
   * closed-form synthesis arithmetic (sums of squares stay < 2^36, exact
   * in BIGINT on both engines). Fails loudly on an unparseable container
   * or an unexpected format.
   */
  def decodeAudioFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled._
        it.flatMap { case (id, blob) =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(blob))
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
            !f.isBigEndian && f.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
            s"unexpected audio format for doc_id=$id: $f")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val nWin = (n + AudioWin - 1) / AudioWin
          val energy = new Array[Long](nWin)
          val cnt = new Array[Long](nWin)
          var i = 0
          while (i < n) {
            val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toLong
            energy(i / AudioWin) += s * s
            cnt(i / AudioWin) += 1
            i += 1
          }
          (0 until nWin).iterator.map(w => (id, w.toLong, energy(w), cnt(w)))
        }
      }
      .toDF("doc_id", "win", "energy", "n")
  }

  /** Batched feature extraction: flat (doc_id, bucket, cnt) rows. */
  def features(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val h = decodeStub(blob)
          (0 until Bins).iterator
            .filter(h(_) > 0L)
            .map(b => (id, b, h(b)))
        }
      }
      .toDF("doc_id", "bucket", "cnt")
  }
}

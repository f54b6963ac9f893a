package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) are carried as
 * opaque BINARY columns with a typed metadata struct; feature extraction
 * runs as partition-batched typed transforms.
 *
 * The actual media codecs are NOT available in this environment, so the
 * decode step is STUBBED with a deterministic byte-level featurizer
 * (16-bin byte histogram) — see [[decodeStub]]. The Spark-side plumbing
 * (binary schema, metadata propagation, batched mapPartitions signature,
 * flat feature output) is real and oracle-tested: over the ASCII
 * `documents` corpus, byte == character code, so plain SQL reproduces the
 * histogram.
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

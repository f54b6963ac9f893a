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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fp16
import java.util.zip.Deflater

/**
 * Lossless-compression model for the reduced representation
 * (`/root/reference/ANNCode.py:668-704`, paper §3.3/§4.3): the kept
 * fp16 bit-planes (sign, top exponent bits, top mantissa bits) are
 * bit-sliced across scalars, packed, and deflated; the measured
 * compressed bytes/vector can replace the naive bit-count in bandwidth
 * accounting (`red_bytes_override`).
 *
 * Unlike the reference (one zlib blob over the whole DB), compression
 * runs per partition-chunk (paper §3.3 prescribes 4-16 KB pages), so the
 * measurement parallelizes and the same code path would run on a 1000-
 * executor scan. Output: one row
 * (keep_e, keep_m, n_vecs, naive_bytes_per_vec, comp_bytes_per_vec, ratio).
 */
object BitplaneCompress {

  final val ChunkRows = 1024

  /** Pack the kept planes of `words` (one fp16 word per scalar) into a
    * bit-plane-major byte array. */
  def packBitplanes(words: Array[Int], keepE: Int, keepM: Int): Array[Byte] = {
    val nPlanes = 1 + keepE + keepM
    val n = words.length
    val bytesPerPlane = (n + 7) / 8
    val out = new Array[Byte](nPlanes * bytesPerPlane)
    var p = 0
    while (p < nPlanes) {
      var s = 0
      while (s < n) {
        val w = words(s)
        val bit =
          if (p == 0) (w >> 15) & 1                                  // sign
          else if (p <= keepE) (w >> (10 + Fp16.ExpBits - p)) & 1    // exp MSB->LSB
          else (w >> (Fp16.ManBits - (p - keepE))) & 1               // mant MSB->LSB
        if (bit == 1) {
          val idx = p * bytesPerPlane + (s >> 3)
          out(idx) = (out(idx) | (0x80 >> (s & 7))).toByte
        }
        s += 1
      }
      p += 1
    }
    out
  }

  def deflateLen(data: Array[Byte], level: Int): Long = {
    val d = new Deflater(level)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  /** Raw totals (n_vecs, compressed_bytes) of the reduced representation —
    * kept as exact integers so the metrics override and its oracle SQL can
    * reproduce the same `comp/n` division tree bit-for-bit. */
  def measureTotals(vectors: DataFrame, d: Int, keepE: Int, keepM: Int,
                    level: Int = 6): (Long, Long) = {
    val row = chunks(vectors, d, keepE, keepM, level)
      .agg(sum(col("n_vecs")).as("n"), sum(col("comp_bytes")).as("c"))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  private def chunks(vectors: DataFrame, d: Int, keepE: Int, keepM: Int,
                     level: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec")).as[Array[Float]]
      .mapPartitions { it =>
        it.grouped(ChunkRows).map { chunk =>
          val words = new Array[Int](chunk.length * d)
          var i = 0
          chunk.foreach { v =>
            var j = 0
            while (j < d) { words(i) = Fp16.floatToHalfBits(v(j)); i += 1; j += 1 }
          }
          val packed = packBitplanes(words, keepE, keepM)
          (chunk.length.toLong, deflateLen(packed, level))
        }
      }
      .toDF("n_vecs", "comp_bytes")
  }

  /**
   * Per-plane set-bit totals of the PACKED bit-plane representation:
   * (plane INT, n_ones BIGINT), one row per kept plane (sign, keepE
   * exponent planes MSB->LSB, keepM mantissa planes MSB->LSB). Computed
   * by popcounting the bytes [[packBitplanes]] actually emits — a layout
   * bug (wrong plane order, wrong bit position, padding leakage) changes
   * these totals — then summed globally, so the result is partitioning-
   * invariant (chunk padding bits are zero and contribute nothing). This
   * is the pre-Deflater half of the compression model on the
   * hash-matched oracle surface; only the zlib call itself stays
   * rows-only (`q_compress_ratio`).
   */
  def planePopcounts(vectors: DataFrame, d: Int, keepE: Int, keepM: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val nPlanes = 1 + keepE + keepM
    vectors.select(col("vec")).as[Array[Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](nPlanes)
        it.grouped(ChunkRows).foreach { chunk =>
          val words = new Array[Int](chunk.length * d)
          var i = 0
          chunk.foreach { v =>
            var j = 0
            while (j < d) { words(i) = Fp16.floatToHalfBits(v(j)); i += 1; j += 1 }
          }
          val packed = packBitplanes(words, keepE, keepM)
          val bpp = packed.length / nPlanes
          var p = 0
          while (p < nPlanes) {
            var b = 0; var s = 0L
            while (b < bpp) {
              s += java.lang.Integer.bitCount(packed(p * bpp + b) & 0xFF); b += 1
            }
            acc(p) += s; p += 1
          }
        }
        Iterator.single(acc)
      }
      .flatMap(_.zipWithIndex.map { case (n, p) => (p, n) })
      .toDF("plane", "n_ones")
      .groupBy(col("plane")).agg(sum(col("n_ones")).as("n_ones"))
  }

  /** Measure average compressed bytes/vec of the reduced representation
    * of `vectors` (id, vec ARRAY<FLOAT>). */
  def measure(vectors: DataFrame, d: Int, keepE: Int, keepM: Int,
              level: Int = 6): DataFrame = {
    val perChunk = chunks(vectors, d, keepE, keepM, level)
    val naive = (1 + keepE + keepM) * d / 8.0
    perChunk.agg(
      sum(col("n_vecs")).as("n_vecs"),
      sum(col("comp_bytes")).as("comp_bytes"))
      .select(
        lit(keepE).as("keep_e"), lit(keepM).as("keep_m"), col("n_vecs"),
        lit(naive).as("naive_bytes_per_vec"),
        (col("comp_bytes").cast("double") / col("n_vecs")).as("comp_bytes_per_vec"),
        (lit(naive) * col("n_vecs") / col("comp_bytes").cast("double")).as("ratio"))
  }
}

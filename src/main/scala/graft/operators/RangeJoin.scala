package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join as a binned equi-join — the scale-correct form of
 * "right rows within [leftTs - before, leftTs + after] of each left row"
 * (Flink's interval join; absent from OSS Spark, which plans a non-equi
 * time predicate as a broadcast-nested-loop or sort-merge theta join).
 *
 * Each left row is exploded over the time bins its interval touches
 * (ceil(span/binWidth)+1 of them) and equi-joined on (keys..., bin)
 * against the right side's single bin; the exact predicate then trims the
 * candidates. Candidate volume scales with rows × bins-per-interval,
 * never the per-key cross product, and the equi-join shuffles/broadcasts
 * like any other. Pick binWidth >= before+after for <= 2 bins per row.
 */
object RangeJoin {

  /** Exact floorDiv over LongType: Spark's `/` casts longs to DOUBLE,
    * which silently loses precision past 2^53 (this repo's native epoch
    * unit is NANOSECONDS, ~1.7e18) — a boundary row binned off-by-one on
    * one side only would DROP a true match, because the exact predicate
    * below can only trim false positives. Integral `div` truncates toward
    * zero; adjust by the remainder sign for floor semantics (binWidth>0). */
  private def floorDiv(x: Column, binWidth: Long): Column = {
    val q = call_function("div", x, lit(binWidth)) // IntegralDivide: exact on longs
    val r = x % lit(binWidth)
    when(r < 0, q - 1).otherwise(q).cast("long")
  }

  def interval(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               before: Long, after: Long, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(before >= 0 && after >= 0, "interval bounds must be non-negative")
    val lo = col(leftTs) - before
    val hi = col(leftTs) + after
    val l = left.withColumn("__bin",
      explode(sequence(floorDiv(lo, binWidth), floorDiv(hi, binWidth))))
    val r = right.withColumn("__bin", floorDiv(col(rightTs), binWidth))
    l.join(r, keys :+ "__bin")
      .filter(col(rightTs) >= lo && col(rightTs) <= hi)  // inclusive ends
      .drop("__bin")
  }
}

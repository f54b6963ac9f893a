package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for skewed aggregation: the classic two-phase shape for a
 * hot group key at scale. Phase 1 aggregates on (key, salt) — the salt is
 * derived deterministically from a caller-chosen spread column, so one
 * hot key's rows fan out over `nSalts` reducers instead of funneling into
 * a single task — phase 2 combines the partials on the bare key.
 *
 * Correct for algebraic aggregates (count + sums here): they reassociate
 * exactly, and on integer domains the salted result is bit-identical to
 * the direct aggregation (oracle-checkable). AQE's skew-join handling
 * covers joins; this covers the groupBy side, where Spark's map-side
 * partial aggregation already helps but cannot split a hot REDUCER key —
 * salting can.
 */
object Salt {

  /**
   * Salted count + sums per key: `sums` are (column, outputName) pairs,
   * the count lands in `countAs`. `spread` should vary within a key
   * (an id or timestamp column), never a constant.
   */
  def sumsAndCount(df: DataFrame, keys: Seq[String], spread: Column,
                   nSalts: Int, countAs: String,
                   sums: Seq[(Column, String)]): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val partials = sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__s$i") }
    val finals = sums.zipWithIndex.map { case ((_, name), i) =>
      sum(col(s"__s$i")).as(name)
    }
    df.withColumn("__salt", pmod(hash(spread), lit(nSalts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), partials: _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as(countAs), finals: _*)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/**
 * Disaggregated vector storage (paper §3.3, SURVEY §7 step 7): the
 * full-precision vector, its truncated-precision copy, the raw fp16
 * words, and the Delta sidecar live as SEPARATE Parquet columns of one
 * table. Parquet is columnar, so a reduced-pass scan that selects only
 * (id, rvec, delta) physically reads only those column chunks — the
 * paper's "fetch only the kept bit-planes" becomes ordinary column
 * pruning, and ZSTD page compression plays the role of its §4.3
 * compression stage. [[assertPruned]] verifies the pruning holds in the
 * optimized plan (cheap insurance against accidental SELECT *).
 */
object Disaggregated {

  /** Materialize (id, vec, rvec, rword, delta) as one Parquet table,
    * sorted by id within files so id-equi-joins benefit from row-group
    * min/max skipping on the rescore fetch. The reduction keeps the full
    * exponent (reference refinement semantics: keep_e is an accounting
    * parameter, not a data transform — see Fp16.deltaFromExp). */
  def write(vectors: DataFrame, path: String, keepM: Int): Unit =
    vectors.select(
        col("id"),
        col("vec"),
        VectorOps.reduceVec(col("vec"), 5, keepM).as("rvec"),
        VectorOps.reduceVecWords(col("vec"), 5, keepM).as("rword"),
        VectorOps.deltaVec(col("vec"), keepM).as("delta"))
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(path)

  /** Reduced-pass scan: only the cheap columns. */
  def readReduced(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("rvec"), col("delta"))

  /** Full-precision fetch side for survivor rescoring. */
  def readFull(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("vec"))

  /** Throw unless the optimized plan's Parquet ReadSchema contains
    * exactly `expected` (column pruning reached the scan). */
  def assertPruned(df: DataFrame, expected: Set[String]): Unit = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    require(scans.nonEmpty, "no parquet scan in plan")
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      require(read == expected,
        s"column pruning failed: scan reads $read, expected $expected")
    }
  }
}

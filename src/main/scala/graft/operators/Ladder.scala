package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The RUNG LADDER — the reference's headline figure as one hash-checked
 * table: recall@k against the exact scan for every precision rung,
 * keyed by the cheap-pass bytes each rung reads per scanned vector
 * (reference: ANNCode.py's bandwidth-vs-recall trade swept over
 * reduced-precision configurations). One row per rung,
 * (rung, bytes_per_vec, hits, recall), the Pareto axis the whole
 * engine exists to walk: PQ 4 B -> BQ 8 B -> SQ4 d/2 -> SQ8 d ->
 * prefix 4*dp -> exact 4*d.
 *
 * Scale shape: every arm is an already-bounded top-k result (nq*k
 * rows), so the union carries <= arms*nq*k rows, the ground-truth join
 * is broadcast-sized, and the output is |arms| rows — the whole
 * comparison costs no more than running the rungs themselves.
 */
object Ladder {

  /**
   * arms: (rung name, cheap-pass bytes/vec, top-k result with qid/id
   * columns). gt: the exact top-k (same shape). Output one row per arm
   * with hits = |arm ∩ gt| and recall = hits / nqK — integer hits and
   * one division of identical operands, so the doubles are
   * bit-deterministic across engines.
   */
  def recallTable(spark: SparkSession, arms: Seq[(String, Int, DataFrame)],
                  gt: DataFrame, nqK: Int): DataFrame = {
    import spark.implicits._
    require(arms.nonEmpty && nqK > 0)
    val tagged = arms.map { case (name, bytes, df) =>
      df.select(lit(name).as("rung"), lit(bytes).as("bytes_per_vec"),
        col("qid"), col("id"))
    }.reduce(_.union(_))
    val hits = tagged
      .join(gt.select(col("qid"), col("id")), Seq("qid", "id"))
      .groupBy(col("rung"), col("bytes_per_vec"))
      .agg(count(lit(1)).as("hits"))
    // left-join the static rung list so a zero-hit rung still gets a row
    val base = arms.map(a => (a._1, a._2)).toDF("rung", "bytes_per_vec")
    base.join(hits, Seq("rung", "bytes_per_vec"), "left")
      .select(col("rung"), col("bytes_per_vec"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          lit(nqK.toDouble)).as("recall"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Window, Aggregator}
import org.apache.spark.sql.functions._

/**
 * Group-wise top-K (the reference's per-query K-heap,
 * `/root/reference/ANNCode.py:285-298` + call sites).
 *
 * Two physical forms with identical results:
 *
 *  - [[TopK.window]]: `row_number` over a qid-partitioned window. Fully
 *    SQL-expressible (the DuckDB oracle mirrors it 1:1). Shuffles all
 *    N*Q scored rows — fine for correctness runs.
 *
 *  - [[TopK.aggregate]]: a typed [[Aggregator]] holding a bounded heap,
 *    with partial merge on the map side. At scale only K rows per
 *    (partition, qid) cross the shuffle instead of N — this is the
 *    100 TB path (equivalent to numpy `argpartition` seeding,
 *    `ANNCode.py:339`).
 *
 * Ordering is total: (score desc|asc, id asc) so results are
 * deterministic under ties in both engines.
 */
object TopK {

  /** (qid, rank, id, score) rows, rank 1..k, best first. */
  def window(scored: DataFrame, k: Int, ascending: Boolean = false,
             qidCol: String = "qid", idCol: String = "id",
             scoreCol: String = "score"): DataFrame = {
    val ord =
      if (ascending) Seq(col(scoreCol).asc, col(idCol).asc)
      else Seq(col(scoreCol).desc, col(idCol).asc)
    val w = Window.partitionBy(col(qidCol)).orderBy(ord: _*)
    scored
      // project BEFORE the window: only (qid, id, score) crosses the
      // shuffle, not whatever wide columns the caller scored with
      .select(col(qidCol), col(idCol), col(scoreCol))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col(scoreCol))
  }

  // ---- scalable Aggregator form -----------------------------------------

  /** Bounded top-k buffer; keeps best k by (score, then smaller id wins ties). */
  final case class TopKAgg(k: Int, ascending: Boolean)
      extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {

    private def better(a: (Long, Double), b: (Long, Double)): Boolean =
      if (a._2 != b._2) { if (ascending) a._2 < b._2 else a._2 > b._2 }
      else a._1 < b._1

    private def sorted(buf: Array[(Long, Double)]): Array[(Long, Double)] =
      buf.sortWith(better)

    def zero: Array[(Long, Double)] = Array.empty

    def reduce(buf: Array[(Long, Double)], x: (Long, Double)): Array[(Long, Double)] =
      if (buf.length < k) buf :+ x
      else {
        // replace current worst if x beats it (heap-free: k is tiny)
        var worst = 0
        var i = 1
        while (i < buf.length) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
        if (better(x, buf(worst))) { buf(worst) = x; buf } else buf
      }

    def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
      sorted(a ++ b).take(k)

    def finish(buf: Array[(Long, Double)]): Array[(Long, Double)] = sorted(buf)

    def bufferEncoder: Encoder[Array[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Same output contract as [[window]], via partial-aggregating heap. */
  def aggregate(scored: DataFrame, k: Int, ascending: Boolean = false,
                qidCol: String = "qid", idCol: String = "id",
                scoreCol: String = "score"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = udaf(TopKAgg(k, ascending))
    scored
      .groupBy(col(qidCol))
      .agg(agg(col(idCol), col(scoreCol)).as("topk"))
      .select(col(qidCol), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col(qidCol), (col("pos") + 1).cast("int").as("rank"),
        col("pair._1").as(idCol), col("pair._2").as(scoreCol))
  }
}

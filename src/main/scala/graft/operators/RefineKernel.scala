package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Exact-semantics refinement kernel: the reference's sequential
 * tighten-as-you-go scan (`/root/reference/ANNCode.py:307-647`, candidate
 * ordering O2 at `:348-351`) as a `mapPartitions` block operator.
 *
 * Per partition and per query:
 *   1. reduced scores for all partition rows (cheap columns only);
 *   2. candidates walked in best-first reduced order;
 *   3. running threshold tau = worst of the local top-K full scores so
 *      far; a candidate whose cushion-adjusted reduced score cannot beat
 *      tau is rejected WITHOUT touching the full-precision vector;
 *   4. survivors are rescored at full precision and fed to the local heap.
 *
 * Only the per-partition local top-K survivors (~K + epsilon rows per
 * (partition, query)) leave the partition; [[TopK.aggregate]] merges them.
 * This is the shuffle-minimal 100 TB path: no N*Q row explosion, no
 * global window sort — the exchange carries O(partitions * Q * K) rows.
 *
 * Recall can only exceed the static-tau relational form (tau only
 * tightens), so the zero-miss guarantee carries over.
 */
object RefineKernel {

  final case class VecRow(id: Long, vec: Array[Float], rvec: Array[Float],
                          delta: Array[Float])
  final case class QRow(qid: Long, qvec: Array[Float])
  final case class Cand(qid: Long, id: Long, score: Double)

  private[operators] def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private[operators] def norm(a: Array[Float]): Double = {
    math.max(math.sqrt(dotD(a, a)), 1e-12)
  }

  /** Candidate rows surviving the sequential kernel, ready for global top-K merge. */
  def fetchedCandidates(vectors: DataFrame, queries: DataFrame,
                        p: Refine.Params): Dataset[Cand] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qs: Array[QRow] = queries.select(col("qid"), col("qvec"))
      .as[QRow].collect().sortBy(_.qid)
    val bq = spark.sparkContext.broadcast(qs)
    val pp = p

    vectors.select(col("id"), col("vec"), col("rvec"), col("delta"))
      .as[VecRow]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val kern = new PartitionKernel(rows, pp)
          bq.value.iterator.flatMap(q => kern.topKFor(q.qid, q.qvec))
        }
      }
  }

  /**
   * The per-(partition block, query) running-tau walk: reduced pass,
   * best-first candidate order, cushion rejection, bounded heap. Shared
   * by the Dataset kernel above and the physical operator
   * (org.apache.spark.sql.graft.KernelPlan.RefineKernelExec).
   */
  def localTopK(rows: Array[VecRow], qQid: Long, qv: Array[Float],
                p: Refine.Params): Iterator[Cand] = {
    if (rows.isEmpty) Iterator.empty
    else {
      val k = p.k
      val mode = p.mode
      val alpha = p.alpha
      val hoeffC = p.hoeffConst
      val isCos = p.isCos
      val nq = norm(qv)

          // reduced pass: s_hat (+ per-row cushion ingredients)
          val n = rows.length
          val sHat = new Array[Double](n)
          var i = 0
          while (i < n) {
            val r = rows(i)
            sHat(i) =
              if (isCos) dotD(r.rvec, qv) / (norm(r.rvec) * nq)
              else {
                var s = 0.0; var j = 0
                while (j < qv.length) {
                  val d = qv(j).toDouble - r.rvec(j).toDouble; s += d * d; j += 1
                }
                s
              }
            i += 1
          }
          // best-first order (desc for cos, asc for l2), ties by id
          val order = Array.range(0, n).sortBy(i0 =>
            if (isCos) (-sHat(i0), rows(i0).id) else (sHat(i0), rows(i0).id))

          // local heap of (score, id); worst tracked linearly (k is small).
          // Total order is (score, id asc) — the same tie-break as
          // TopK.window/aggregate, so heavy score ties at the K boundary
          // resolve identically in every execution path.
          val hs = Array.fill(k)(if (isCos) Double.NegativeInfinity else Double.PositiveInfinity)
          val hi = Array.fill(k)(Long.MaxValue)
          var filled = 0
          // a beats b under (score, id asc)?
          def beats(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
            if (sa != sb) { if (isCos) sa > sb else sa < sb } else ia < ib
          def worstIdx: Int = {
            var w = 0; var j = 1
            while (j < k) {
              if (beats(hs(w), hi(w), hs(j), hi(j))) w = j
              j += 1
            }
            w
          }
          var tau = if (isCos) Double.NegativeInfinity else Double.PositiveInfinity

          def fullScore(r: VecRow): Double =
            if (isCos) dotD(r.vec, qv) / (norm(r.vec) * nq)
            else {
              var s = 0.0; var j = 0
              while (j < qv.length) {
                val d = qv(j).toDouble - r.vec(j).toDouble; s += d * d; j += 1
              }
              s
            }

          def cushion(r: VecRow, i0: Int): Double = mode match {
            case "cos_l1" =>
              var s = 0.0; var j = 0
              while (j < qv.length) { s += math.abs(qv(j).toDouble) * r.delta(j); j += 1 }
              alpha * s / nq
            case "cos_hoeff" =>
              var s = 0.0; var j = 0
              while (j < qv.length) { val t = qv(j).toDouble * r.delta(j); s += t * t; j += 1 }
              hoeffC * math.sqrt(s) / nq
            case "cos_l2" =>
              val b2 = 2.0 - 2.0 * dotD(r.vec, r.rvec) / (norm(r.vec) * norm(r.rvec))
              alpha * math.sqrt(math.max(0.0, b2))
            case "l2_sym" =>
              var s = 0.0; var j = 0
              while (j < qv.length) {
                val a = qv(j).toDouble - r.rvec(j).toDouble
                val l = math.max(math.abs(a) - r.delta(j), 0.0); s += l * l; j += 1
              }
              s
            case "l2_tz" =>
              var s = 0.0; var j = 0
              while (j < qv.length) {
                val a = qv(j).toDouble - r.rvec(j).toDouble
                val sg = if (r.rvec(j) < 0 ||
                  (r.rvec(j) == 0.0f && 1.0f / r.rvec(j) < 0)) -1.0 else 1.0
                val b = a * sg
                val d = r.delta(j).toDouble
                s += (if (b <= 0.0) a * a
                      else if (b < d) 0.0
                      else (math.abs(a) - d) * (math.abs(a) - d))
                j += 1
              }
              s
            case "l2_hoeff" =>
              var s = 0.0; var j = 0
              while (j < qv.length) {
                val t = (qv(j).toDouble - r.rvec(j).toDouble) * r.delta(j); s += t * t; j += 1
              }
              sHat(i0) - 2.0 * hoeffC * math.sqrt(s)
          }

          var oi = 0
          while (oi < order.length) {
            val i0 = order(oi)
            val r = rows(i0)
            val reject =
              if (filled < k) false
              else if (isCos) sHat(i0) + cushion(r, i0) < tau
              else cushion(r, i0) > tau
            if (!reject) {
              val s = fullScore(r)
              val w = worstIdx
              if (filled < k || beats(s, r.id, hs(w), hi(w))) {
                hs(w) = s; hi(w) = r.id
                if (filled < k) filled += 1
                tau = hs(worstIdx)
              }
            }
            oi += 1
          }
          // only the local top-K leaves the partition: anything evicted
          // here is beaten by >= K rows and cannot be in the global top-K
          // (inserts land in arbitrary empty slots, so filter by id)
          (0 until k).iterator.filter(hi(_) != Long.MaxValue)
            .map(j => Cand(qQid, hi(j), hs(j)))
    }
  }

  /** Final refined top-K via partial kernels + aggregator merge:
    * (qid, rank, id, score). */
  def topk(vectors: DataFrame, queries: DataFrame, p: Refine.Params): DataFrame =
    TopK.aggregate(fetchedCandidates(vectors, queries, p).toDF(),
      p.k, ascending = !p.isCos)
}

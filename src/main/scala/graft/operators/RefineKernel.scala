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
 *
 * [[PartitionKernel]] is constructed once per (partition, param-set) and
 * amortizes across the whole query matrix: the row block is decoded once,
 * query-independent quantities (row norms, the cos_l2 cushion — which
 * does not depend on the query at all) are precomputed once, and the
 * per-query score/order/heap buffers are allocated once and reused, so
 * the per-query cost is the two array passes and the index sort, with no
 * per-query allocation beyond the emitted ~K candidates.
 */
object RefineKernel {

  final case class VecRow(id: Long, vec: Array[Float], rvec: Array[Float],
                          delta: Array[Float])
  final case class QRow(qid: Long, qvec: Array[Float])
  final case class Cand(qid: Long, id: Long, score: Double)

  /** Hard cap on the query side: the kernel collects Q to the driver and
    * broadcasts it (the reference's Q is an in-RAM matrix too, ~tens of
    * rows), so an unbounded query relation here would be a silent driver
    * OOM. 64k rows * (8B qid + D floats) stays comfortably in driver
    * memory; beyond that, use the relational [[Refine]] path, which never
    * collects Q. */
  final val MaxQueryRows: Int = 1 << 16

  /** Collect the query matrix with the cap enforced (limit cap+1 so the
    * overflow check never pulls an unbounded relation either). */
  def collectQueries(queries: DataFrame): Array[QRow] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries.select(col("qid"), col("qvec"))
      .limit(MaxQueryRows + 1).as[QRow].collect()
    require(qs.length <= MaxQueryRows,
      s"kernel query side exceeds MaxQueryRows=$MaxQueryRows rows; " +
        "use the relational Refine path for large query relations")
    qs.sortBy(_.qid)
  }

  private[operators] def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private[operators] def norm(a: Array[Float]): Double = {
    math.max(math.sqrt(dotD(a, a)), 1e-12)
  }

  /**
   * Per-partition kernel state shared across the query matrix. Not
   * thread-safe (one instance per task, as used by `mapPartitions`).
   */
  final class PartitionKernel(rows: Array[VecRow], p: Refine.Params) {
    private val n = rows.length
    private val k = p.k
    private val mode = p.mode
    private val alpha = p.alpha
    private val hoeffC = p.hoeffConst
    private val isCos = p.isCos

    // ---- query-independent precompute (once per partition) ----
    // cos full/reduced scores divide by the row norms every time; the
    // cos_l2 cushion alpha*sqrt(max(0, 2-2*cos(vec,rvec))) is entirely
    // query-free. Same expression trees as before, so values (and the
    // DuckDB oracle hashes) are bit-identical.
    private val vnorm: Array[Double] = if (isCos) new Array[Double](n) else null
    private val rnorm: Array[Double] = if (isCos) new Array[Double](n) else null
    private val cosL2Cushion: Array[Double] =
      if (mode == "cos_l2") new Array[Double](n) else null
    locally {
      if (isCos) {
        var i = 0
        while (i < n) {
          val r = rows(i)
          vnorm(i) = norm(r.vec)
          rnorm(i) = norm(r.rvec)
          if (cosL2Cushion != null) {
            val b2 = 2.0 - 2.0 * dotD(r.vec, r.rvec) / (vnorm(i) * rnorm(i))
            cosL2Cushion(i) = alpha * math.sqrt(math.max(0.0, b2))
          }
          i += 1
        }
      }
    }

    // ---- reusable per-query buffers (no per-query allocation) ----
    private val sHat = new Array[Double](n)
    private val order = new Array[Int](n)
    // local heap of (score, id); worst tracked linearly (k is small).
    // Total order is (score, id asc) — the same tie-break as
    // TopK.window/aggregate, so heavy score ties at the K boundary
    // resolve identically in every execution path.
    private val hs = new Array[Double](k)
    private val hi = new Array[Long](k)

    // a beats b under (score, id asc)? Double.compare gives a total
    // order (NaN greatest, -0.0 < 0.0) identical to the boxed-tuple
    // sortBy the old implementation used, so degenerate inputs
    // (zero-norm vectors -> NaN scores) order the same on every path.
    private def beats(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) { if (isCos) c > 0 else c < 0 } else ia < ib
    }

    private def worstIdx: Int = {
      var w = 0; var j = 1
      while (j < k) {
        if (beats(hs(w), hi(w), hs(j), hi(j))) w = j
        j += 1
      }
      w
    }

    /** order(a) before order(b) in the best-first walk: desc sHat for
      * cos, asc for l2, ties by row id asc. */
    private def walksBefore(a: Int, b: Int): Boolean = {
      val c = java.lang.Double.compare(sHat(a), sHat(b))
      if (c != 0) { if (isCos) c > 0 else c < 0 }
      else rows(a).id < rows(b).id
    }

    /** In-place quicksort of `order` under [[walksBefore]] — primitive
      * indices, no boxing/tuple allocation (the former
      * `Array.range(0,n).sortBy` allocated a boxed tuple per row per
      * query). Median-of-three pivots, insertion sort below 24. */
    private def sortOrder(): Unit = {
      def swap(i: Int, j: Int): Unit = {
        val t = order(i); order(i) = order(j); order(j) = t
      }
      def insertion(lo: Int, hi0: Int): Unit = {
        var i = lo + 1
        while (i <= hi0) {
          val v = order(i); var j = i - 1
          while (j >= lo && walksBefore(v, order(j))) {
            order(j + 1) = order(j); j -= 1
          }
          order(j + 1) = v; i += 1
        }
      }
      def qsort(lo0: Int, hi0: Int): Unit = {
        var lo = lo0; var hi = hi0
        while (hi - lo > 24) {
          val mid = lo + (hi - lo) / 2
          if (walksBefore(order(mid), order(lo))) swap(lo, mid)
          if (walksBefore(order(hi), order(lo))) swap(lo, hi)
          if (walksBefore(order(hi), order(mid))) swap(mid, hi)
          val pivot = order(mid)
          var i = lo; var j = hi
          while (i <= j) {
            while (walksBefore(order(i), pivot)) i += 1
            while (walksBefore(pivot, order(j))) j -= 1
            if (i <= j) { swap(i, j); i += 1; j -= 1 }
          }
          // recurse into the smaller half, loop on the larger
          if (j - lo < hi - i) { qsort(lo, j); lo = i }
          else { qsort(i, hi); hi = j }
        }
        insertion(lo, hi)
      }
      if (n > 1) qsort(0, n - 1)
    }

    private def fullScore(i0: Int, qv: Array[Float], nq: Double): Double = {
      val r = rows(i0)
      if (isCos) dotD(r.vec, qv) / (vnorm(i0) * nq)
      else {
        var s = 0.0; var j = 0
        while (j < qv.length) {
          val d = qv(j).toDouble - r.vec(j).toDouble; s += d * d; j += 1
        }
        s
      }
    }

    private def cushion(i0: Int, qv: Array[Float], nq: Double): Double = {
      val r = rows(i0)
      mode match {
        case "cos_l1" =>
          var s = 0.0; var j = 0
          while (j < qv.length) { s += math.abs(qv(j).toDouble) * r.delta(j); j += 1 }
          alpha * s / nq
        case "cos_hoeff" =>
          var s = 0.0; var j = 0
          while (j < qv.length) { val t = qv(j).toDouble * r.delta(j); s += t * t; j += 1 }
          hoeffC * math.sqrt(s) / nq
        case "cos_l2" =>
          cosL2Cushion(i0)
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
    }

    /** The running-tau walk for one query over this partition's block.
      * Results are materialized (the shared heap buffers are reused by
      * the next call). */
    def topKFor(qid: Long, qv: Array[Float]): Iterator[Cand] =
      walkFor(qid, qv, null)

    /** [[topKFor]]'s walk, additionally recording every FETCHED candidate
      * (full-precision access) into `fetchSink` when non-null — the
      * kernel-path bandwidth accounting surface. On a single-partition
      * input the fetch set is provably a subset of the relational
      * static-tau0 fetch set ([[Refine.fetched]]): the first K walked
      * candidates ARE the relational seeds (same reduced order, same
      * tie-break), so after the seed fill tau == tau0 exactly and only
      * tightens; any candidate the static filter rejects, the running
      * filter rejects too. */
    def fetchedFor(qid: Long, qv: Array[Float]): Iterator[Cand] = {
      val sink = new scala.collection.mutable.ArrayBuffer[Cand]()
      walkFor(qid, qv, sink)
      sink.iterator
    }

    private def walkFor(qid: Long, qv: Array[Float],
                        fetchSink: scala.collection.mutable.ArrayBuffer[Cand])
        : Iterator[Cand] = {
      if (n == 0) return Iterator.empty
      val nq = norm(qv)

      // reduced pass: s_hat over the cheap columns only
      var i = 0
      while (i < n) {
        val r = rows(i)
        sHat(i) =
          if (isCos) dotD(r.rvec, qv) / (rnorm(i) * nq)
          else {
            var s = 0.0; var j = 0
            while (j < qv.length) {
              val d = qv(j).toDouble - r.rvec(j).toDouble; s += d * d; j += 1
            }
            s
          }
        order(i) = i
        i += 1
      }
      sortOrder()

      // reset the heap
      java.util.Arrays.fill(hs, if (isCos) Double.NegativeInfinity else Double.PositiveInfinity)
      java.util.Arrays.fill(hi, Long.MaxValue)
      var filled = 0
      var tau = if (isCos) Double.NegativeInfinity else Double.PositiveInfinity

      var oi = 0
      while (oi < n) {
        val i0 = order(oi)
        val r = rows(i0)
        val reject =
          if (filled < k) false
          else if (isCos) sHat(i0) + cushion(i0, qv, nq) < tau
          else cushion(i0, qv, nq) > tau
        if (!reject) {
          val s = fullScore(i0, qv, nq)
          if (fetchSink != null) fetchSink += Cand(qid, r.id, s)
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
      val out = new scala.collection.mutable.ArrayBuffer[Cand](k)
      var j = 0
      while (j < k) {
        if (hi(j) != Long.MaxValue) out += Cand(qid, hi(j), hs(j))
        j += 1
      }
      out.iterator
    }
  }

  /** Candidate rows surviving the sequential kernel, ready for global top-K merge. */
  def fetchedCandidates(vectors: DataFrame, queries: DataFrame,
                        p: Refine.Params): Dataset[Cand] =
    runKernel(vectors, queries, p, emitAllFetched = false)

  /**
   * Every candidate the kernel FETCHES at full precision, as
   * (qid, id, score) rows — the kernel-path bandwidth-accounting surface
   * (the reference counts exactly these accesses, ANNCode.py:316-318).
   * On a single-partition input this is provably a subset of
   * [[Refine.fetched]]'s static-tau0 fetch set (see
   * [[PartitionKernel.fetchedFor]]); under partitioning each partition
   * additionally pays its own K seed fills, so compare like for like.
   */
  def fetchedAll(vectors: DataFrame, queries: DataFrame,
                 p: Refine.Params): Dataset[Cand] =
    runKernel(vectors, queries, p, emitAllFetched = true)

  /**
   * [[fetchedAll]] for SEVERAL param sets in ONE pass over the data,
   * tagged with a `mode` discriminator column: the partition block is
   * decoded once and every mode's walk runs against the shared row
   * array. The per-mode walks themselves are inherent (reduced order
   * differs across cos/l2 families), but the row decode, the Spark job,
   * and the scan are paid once instead of once per mode — on the
   * single-partition invariant query that halves the sequential wall.
   */
  def fetchedAllMulti(vectors: DataFrame, queries: DataFrame,
                      ps: Seq[Refine.Params]): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qs: Array[QRow] = collectQueries(queries)
    val bq = spark.sparkContext.broadcast(qs)
    val pps = ps.toArray
    vectors.select(col("id"), col("vec"), col("rvec"), col("delta"))
      .as[VecRow]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else pps.iterator.flatMap { p =>
          val kern = new PartitionKernel(rows, p)
          bq.value.iterator.flatMap(q =>
            kern.fetchedFor(q.qid, q.qvec).map(c =>
              (p.mode, c.qid, c.id, c.score)))
        }
      }
      .toDF("mode", "qid", "id", "score")
  }

  private def runKernel(vectors: DataFrame, queries: DataFrame,
                        p: Refine.Params, emitAllFetched: Boolean): Dataset[Cand] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val qs: Array[QRow] = collectQueries(queries)
    val bq = spark.sparkContext.broadcast(qs)
    val pp = p

    vectors.select(col("id"), col("vec"), col("rvec"), col("delta"))
      .as[VecRow]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val kern = new PartitionKernel(rows, pp)
          bq.value.iterator.flatMap(q =>
            if (emitAllFetched) kern.fetchedFor(q.qid, q.qvec)
            else kern.topKFor(q.qid, q.qvec))
        }
      }
  }

  /**
   * One-query convenience wrapper over [[PartitionKernel]] — kept for
   * callers outside the batched matrix path; the batched paths construct
   * the kernel once and amortize the precompute across queries.
   */
  def localTopK(rows: Array[VecRow], qQid: Long, qv: Array[Float],
                p: Refine.Params): Iterator[Cand] =
    if (rows.isEmpty) Iterator.empty
    else new PartitionKernel(rows, p).topKFor(qQid, qv)

  /** Final refined top-K via partial kernels + aggregator merge:
    * (qid, rank, id, score). */
  def topk(vectors: DataFrame, queries: DataFrame, p: Refine.Params): DataFrame =
    TopK.aggregate(fetchedCandidates(vectors, queries, p).toDF(),
      p.k, ascending = !p.isCos)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/**
 * Similarity search over an embedding column (`embeddings`:
 * vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
 *
 * - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query side
 *   into a cross join; the database side streams. The score folds in
 *   array order with a DOUBLE accumulator (bit-reproducible; the oracle
 *   emits the same left-associated 64-term sum).
 * - [[ivfTopK]]: partition-pruned variant — candidates restricted to the
 *   query's coarse cell (`label` stands in for a k-means cell id; at
 *   100 TB the table is partitioned/bucketed by cell so each query scans
 *   only its cell's partitions).
 * - [[nearDupPairs]]: embedding-cosine near-duplicate detection, blocked
 *   by cell — an equi-join on the blocking key, never all-pairs.
 */
object Ann {

  private def fn(c: Column): Column = graft.functions.VectorOps.fnorm(c)

  /** Queries = the `nq` smallest vec_ids (with labels + hoisted norm). */
  def queriesOf(emb: DataFrame, nq: Int): DataFrame =
    emb.orderBy(col("vec_id")).limit(nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"), norm2Sq(col("embedding")).as("qn2"))

  /** Candidate side with the norm hoisted out of the join. */
  private def candSide(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"), col("embedding"), col("label"),
      norm2Sq(col("embedding")).as("n2"))

  private def score: Column =
    dot(col("embedding"), col("qvec")) / (fn(col("n2")) * fn(col("qn2")))

  def bruteTopK(emb: DataFrame, nq: Int, k: Int): DataFrame = {
    val q = broadcast(queriesOf(emb, nq))
    val scored = candSide(emb).crossJoin(q).withColumn("score", score)
    TopK.window(scored, k)
  }

  /**
   * SCORE-DISTRIBUTION HISTOGRAM over the query-corpus cosine scores —
   * the calibration artifact for every threshold in the engine (cascade
   * tier cuts, near-dup tau, range-search radius): bucket =
   * floor(score * binScale), counted. One streaming pass over the
   * broadcast-cross-join scores folding map-side into at most
   * 2*binScale+1 groups — the reduction is a few hundred bytes per
   * partition regardless of corpus size, which is why this is the
   * cheapest possible full-corpus statistic at 100 TB. floor of the
   * same exact score doubles both engines compute, so the bucketing is
   * bit-deterministic. Output: (bucket, n).
   */
  def scoreHistogram(emb: DataFrame, nq: Int, binScale: Int): DataFrame = {
    require(binScale >= 1, s"binScale $binScale")
    val q = broadcast(queriesOf(emb, nq))
    candSide(emb).crossJoin(q).withColumn("score", score)
      .select(floor(col("score") * lit(binScale)).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** IVF-style: only candidates in the query's cell are scored. */
  def ivfTopK(emb: DataFrame, nq: Int, k: Int): DataFrame = {
    val q = broadcast(queriesOf(emb, nq))
    val scored = candSide(emb).join(q, col("label") === col("qlabel"))
      .withColumn("score", score)
    TopK.window(scored, k)
  }

  /**
   * Same-cell pairs with cosine >= threshold: (id_a, id_b, cos).
   *
   * Candidate generation blocks on (cell, angle-to-pivot band) — the
   * scale-correct analogue of norm banding for the cosine metric (cosine
   * is scale-invariant, so norms constrain nothing; the angle to a fixed
   * pivot direction does). By the spherical triangle inequality,
   * cos(a,b) >= t implies |theta_a - theta_b| <= acos(t), so joining each
   * row's band against all bands within reach = ceil(acos(t)/w) + 1 (the
   * +1 absorbs floor/float edges) has EXACT recall; the cosine test is a
   * post-filter. Band occupancy — not the O(N) cell block size — bounds
   * the join, and the expansion factor is the fixed 2*reach+1. Pruning
   * power scales with threshold tightness: at near-dup thresholds
   * (t >= 0.9, theta <= 26 deg) most of the sphere is out of reach; the
   * fixture's loose t=0.25 keeps every band reachable but exercises the
   * same bounded plan shape. The DuckDB oracle stays all-pairs-in-cell;
   * results are identical.
   */
  def nearDupPairs(emb: DataFrame, minCos: Double,
                   bandDeg: Double = 5.0): DataFrame = {
    val thetaMax = math.toDegrees(math.acos(minCos))
    val reach = math.ceil(thetaMax / bandDeg).toInt + 1
    val side = emb.select(col("label"), col("vec_id"), col("embedding"),
        norm2Sq(col("embedding")).as("n2"))
      .withColumn("band",
        floor(degrees(acos(least(lit(1.0), greatest(lit(-1.0),
          element_at(col("embedding"), 1).cast("double") / fn(col("n2"))))))
          / bandDeg).cast("int"))
    val a = side.select(col("label"), col("vec_id").as("id_a"),
        col("embedding").as("va"), col("n2").as("na2"),
        explode(sequence(col("band") - reach, col("band") + reach)).as("jband"))
    val b = side.select(col("label"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("n2").as("nb2"), col("band").as("jband"))
    // one row per candidate pair (the b side carries a single band), so
    // no distinct is needed after the join
    a.join(b, Seq("label", "jband")).filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        dot(col("va"), col("vb")) / (fn(col("na2")) * fn(col("nb2"))))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}

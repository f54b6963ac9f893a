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

  /** IVF-style: only candidates in the query's cell are scored. */
  def ivfTopK(emb: DataFrame, nq: Int, k: Int): DataFrame = {
    val q = broadcast(queriesOf(emb, nq))
    val scored = candSide(emb).join(q, col("label") === col("qlabel"))
      .withColumn("score", score)
    TopK.window(scored, k)
  }

  /** Same-cell pairs with cosine >= threshold: (id_a, id_b, cos). */
  def nearDupPairs(emb: DataFrame, minCos: Double): DataFrame = {
    val a = emb.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("va"), norm2Sq(col("embedding")).as("na2"))
    val b = emb.select(col("label"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), norm2Sq(col("embedding")).as("nb2"))
    a.join(b, "label").filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        dot(col("va"), col("vb")) / (fn(col("na2")) * fn(col("nb2"))))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}

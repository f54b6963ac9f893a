package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/**
 * Binary quantization: each vector collapses to ONE 64-bit sign-bit
 * word ([[VecExprs.SignPack]]), the cheap ranking pass is a Hamming
 * scan — `bit_count(code XOR qcode)`, two machine instructions per
 * candidate over 8 bytes/vector (a 32x read cut vs the float vector,
 * the most aggressive rung of the precision ladder) — and a
 * rerank-deep cut feeds the exact full-precision rescore, mirroring
 * the SQ8/PQ two-phase discipline.
 *
 * Sign-bit Hamming distance is the classic 1-bit estimator of angular
 * distance (Charikar's SRP-LSH): P[sign bit differs] = theta / pi per
 * hyperplane. Everything in the cheap pass is exact integer
 * arithmetic, so both engines agree trivially; approximation comes
 * from the code itself and the rerank cut only.
 *
 * At 100 TB the code column is the at-rest sketch: an 8-byte column
 * scan (with the float vectors never touched) that any executor can
 * burn through at memory bandwidth, then a broadcast-joined rescore of
 * rerank * NQ survivors.
 */
object Bq {

  /** (qid, rank, id, score) with full-precision scores.
    *
    * `d` is the embedding dimension: one 64-bit code word holds at most
    * 64 sign bits, so d > 64 is rejected HERE at plan-build (the same
    * place the SQL oracle rejects it) rather than at execution time
    * inside generated code via [[VecExprs.checkBits]].
    */
  def topk(emb: DataFrame, nq: Int, k: Int, rerank: Int, d: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    require(d >= 1 && d <= 64,
      s"binary quantization packs sign bits into ONE 64-bit word; d=$d not in [1,64]")
    val V = graft.functions.VectorOps
    val codes = emb.select(col("vec_id").as("id"),
      VecExprs.signPack(col("embedding")).as("code"))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val qc = broadcast(q.select(col("qid"),
      VecExprs.signPack(col("qvec")).as("qcode")))
    val cheap = codes.crossJoin(qc)
      .withColumn("score", bit_count(col("code").bitwiseXOR(col("qcode"))))
    val cand = TopK.window(cheap, rerank, ascending = true)
      .select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // d is a CONTRACT with the data, not just a plan-build bound: a
    // caller passing d=64 over wider embeddings would otherwise sail
    // past the [1,64] check and only trip VecExprs.checkBits inside
    // generated code. The filter passes every row (assert_true yields
    // NULL) or fails the job with the width mismatch spelled out.
    val codes = emb
      .filter(assert_true(size(col("embedding")) === d,
        lit(s"binary quantization: embedding width != declared d=$d")).isNull)
      .select(col("vec_id").as("id"),
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

  /**
   * Multi-word binary quantization — BQ at the engine's REALISTIC widths
   * (the reference evaluates D=128-3072; one 64-bit word caps [[topk]]
   * at d<=64): ceil(d/64) sign words per vector, Hamming = the sum of
   * per-word `bit_count(XOR)` — still exact integer arithmetic, still
   * 1 bit/dim at rest (8*words bytes/row, a 32x read cut at any width).
   * Operates on generic (id, vec) / (qid, qvec) frames so the realistic-
   * width fixtures plug in directly.
   */
  def topkWide(vectors: DataFrame, queries: DataFrame, k: Int, rerank: Int,
               d: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    require(d >= 1, s"d=$d")
    val words = (d + 63) / 64
    val V = graft.functions.VectorOps
    def wordCols(v: org.apache.spark.sql.Column, prefix: String) =
      (0 until words).map(w =>
        VecExprs.signPack(slice(v, w * 64 + 1, 64)).as(s"${prefix}_$w"))
    val codes = vectors
      .filter(assert_true(size(col("vec")) === d,
        lit(s"binary quantization: vec width != declared d=$d")).isNull)
      .select(col("id") +: wordCols(col("vec"), "c"): _*)
    val qc = broadcast(queries.select(col("qid") +:
      wordCols(col("qvec"), "q"): _*))
    val ham = (0 until words).map(w =>
      bit_count(col(s"c_$w").bitwiseXOR(col(s"q_$w")))).reduceLeft(_ + _)
    val cheap = codes.crossJoin(qc).withColumn("score", ham)
    val cand = TopK.window(cheap, rerank, ascending = true)
      .select(col("qid"), col("id"))
    val rescored = vectors
      .select(col("id"), col("vec"), V.norm2Sq(col("vec")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(queries.select(col("qid"), col("qvec").as("qvec_"),
        V.norm2Sq(col("qvec")).as("qn2_"))), Seq("qid"))
      .withColumn("score", V.dot(col("vec"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  // --- codes at rest ----------------------------------------------------

  /** Bump when the at-rest code layout changes. */
  private val CodesLayoutVersion = 1

  /** Bump when the wide at-rest code layout changes. */
  private val WideCodesLayoutVersion = 1

  /**
   * Multi-word sign codes AT REST at realistic width: (id, vec, c_0 ..
   * c_{w-1}) with one BIGINT column per 64-dim word — 8*ceil(d/64)
   * bytes/row for the cheap Hamming pass (16 at D=128), the float
   * vector untouched until the rescore fetch. Source is the same
   * deterministic fixture slice the in-memory wide rung runs on.
   */
  def ensureWideCodesFixture(spark: SparkSession, sfDir: String, d: Int,
                             keepM: Int, keyMod: Int): String = {
    import java.nio.file.{Files, Paths}
    val words = (d + 63) / 64
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bqwide_v${WideCodesLayoutVersion}_${safe}_d${d}_mod$keyMod" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "bqwide-")
      graft.Fixture.fp16VectorsModCached(spark, sfDir, d, keepM, keyMod)
        .select(col("id") +: col("vec") +: (0 until words).map(w =>
          VecExprs.signPack(slice(col("vec"), w * 64 + 1, 64)).as(s"c_$w")): _*)
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"bq wide codes publish failed: $path")
    }
    path.toString
  }

  /**
   * Wide BQ top-k OFF THE AT-REST CODES — the at-rest twin of
   * [[topkWide]] on the same fixture slice, returning identical rows:
   * the cheap pass scans only (id, c_*), the rescore only (id, vec).
   */
  def topkWideAtRest(spark: SparkSession, sfDir: String, nq: Int, k: Int,
                     rerank: Int, d: Int, keepM: Int, keyMod: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val words = (d + 63) / 64
    val V = graft.functions.VectorOps
    val path = ensureWideCodesFixture(spark, sfDir, d, keepM, keyMod)
    val stored = spark.read.parquet(path)
    // queries = the nq smallest ids (Fixture.queries semantics), read
    // from the same at-rest table
    val q = stored.orderBy(col("id")).limit(nq)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val qc = broadcast(q.select(col("qid") +: (0 until words).map(w =>
      VecExprs.signPack(slice(col("qvec"), w * 64 + 1, 64)).as(s"q_$w")): _*))
    val ham = (0 until words).map(w =>
      bit_count(col(s"c_$w").bitwiseXOR(col(s"q_$w")))).reduceLeft(_ + _)
    val cheap = stored
      .select(col("id") +: (0 until words).map(w => col(s"c_$w")): _*)
      .crossJoin(qc).withColumn("score", ham)
    val cand = TopK.window(cheap, rerank, ascending = true)
      .select(col("qid"), col("id"))
    val rescored = stored
      .select(col("id"), col("vec"), V.norm2Sq(col("vec")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.select(col("qid"), col("qvec").as("qvec_"),
        V.norm2Sq(col("qvec")).as("qn2_"))), Seq("qid"))
      .withColumn("score", V.dot(col("vec"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * Materialize the sign codes AT REST: (id, vec, code) with the 64-bit
   * sign word as a real BIGINT column beside the full-precision vector —
   * the cheap Hamming pass reads 8 bytes/row of column chunks and never
   * touches the float vector (the [[graft.sources.Disaggregated
   * .writeInt8]] discipline at the ladder's coarsest rung). Sorted by id
   * within files for row-group skipping on the rescore fetch. Immutable
   * version-named dir, atomic scratch publish.
   */
  def ensureCodesFixture(spark: SparkSession, sfDir: String, d: Int): String = {
    import java.nio.file.{Files, Paths}
    require(d >= 1 && d <= 64,
      s"binary quantization packs sign bits into ONE 64-bit word; d=$d not in [1,64]")
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bqcodes_v${CodesLayoutVersion}_${safe}_d${d}" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "bqcodes-")
      graft.Tables.embeddings(spark, sfDir)
        .filter(assert_true(size(col("embedding")) === d,
          lit(s"binary quantization: embedding width != declared d=$d")).isNull)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          VecExprs.signPack(col("embedding")).as("code"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"bq codes publish failed: $path")
    }
    path.toString
  }

  /**
   * BQ top-k OFF THE AT-REST CODES — the at-rest twin of [[topk]],
   * returning identical rows: the cheap pass scans only (id, code), the
   * rescore fetch only (id, vec) for the rerank*NQ survivors. PlanSpec
   * asserts no scan reads both columns.
   */
  def topkAtRest(spark: SparkSession, sfDir: String, emb: DataFrame,
                 nq: Int, k: Int, rerank: Int, d: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val path = ensureCodesFixture(spark, sfDir, d)
    val stored = spark.read.parquet(path) // (id, vec, code)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val qc = broadcast(q.select(col("qid"),
      VecExprs.signPack(col("qvec")).as("qcode")))
    val cheap = stored.select(col("id"), col("code")).crossJoin(qc)
      .withColumn("score", bit_count(col("code").bitwiseXOR(col("qcode"))))
    val cand = TopK.window(cheap, rerank, ascending = true)
      .select(col("qid"), col("id"))
    val rescored = stored
      .select(col("id"), col("vec"), V.norm2Sq(col("vec")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("vec"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }
}

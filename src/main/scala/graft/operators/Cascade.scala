package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/**
 * The PRECISION-ON-DEMAND CASCADE: the reference's thesis — "read the
 * cheap representation first, fetch precision only where the answer is
 * still in doubt" (paper §3, `ANNCode.py:288-318`) — stated as one
 * pipeline across all three rungs of the quantization ladder instead of
 * one rung at a time:
 *
 *   tier 1 (1 bit/dim):  sign-word Hamming scan over the WHOLE corpus —
 *                        8 bytes/vector at d=64 — cut to rerank1;
 *   tier 2 (1 byte/dim): int8 quantized cosine over ONLY the rerank1*Q
 *                        survivors, cut to rerank2;
 *   tier 3 (4 bytes/dim): exact full-precision rescore of the rerank2*Q
 *                        survivors, top-k.
 *
 * Each tier reads ~4x the bytes/vector of the previous one over a
 * geometrically shrinking candidate set, so total bytes moved stay near
 * the 1-bit scan's while final scores are exact — the "progressive
 * refinement" the paper's bit-plane layout exists for (§3.3), realized
 * with the standard BQ and SQ8 codes. Every tier's arithmetic is exact
 * (integer Hamming; dyadic k/2^s dequantized cosine; fixed-order exact
 * rescore), so the DuckDB oracle mirrors the cascade bit-for-bit, and
 * the approximation comes from the two cuts only.
 *
 * At 100 TB the cascade is the query shape that wins: tier 1 is a
 * memory-bandwidth scan of an 8-byte column, tiers 2 and 3 are
 * broadcast-joined point fetches of bounded survivor sets (rerank1*Q and
 * rerank2*Q rows), never corpus scans. [[topkAtRest]] runs it off a
 * single disaggregated layout where each tier's column is physically
 * separate — PlanSpec asserts each tier's scan reads ONLY its column.
 */
object Cascade {

  /** (qid, rank, id, score) with full-precision scores; d <= 64 (one
    * sign word), |component|*2^scaleLog2 <= 127 (int8 codes). */
  def topk(emb: DataFrame, nq: Int, k: Int, d: Int, scaleLog2: Int,
           rerank1: Int, rerank2: Int): DataFrame = {
    require(rerank1 >= rerank2 && rerank2 >= k,
      s"cascade cuts must narrow: rerank1 $rerank1 >= rerank2 $rerank2 >= k $k")
    require(d >= 1 && d <= 64,
      s"tier-1 sign code is ONE 64-bit word; d=$d not in [1,64]")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val qc = broadcast(q.select(col("qid"),
      VecExprs.signPack(col("qvec")).as("qcode")))
    // tier 1: corpus-wide 1-bit Hamming scan (same width contract as
    // Bq.topk: the filter fails the job loudly on a d mismatch)
    val codes = emb
      .filter(assert_true(size(col("embedding")) === d,
        lit(s"cascade tier 1: embedding width != declared d=$d")).isNull)
      .select(col("vec_id").as("id"),
        VecExprs.signPack(col("embedding")).as("code"))
    val t1 = TopK.window(
        codes.crossJoin(qc)
          .withColumn("score", bit_count(col("code").bitwiseXOR(col("qcode")))),
        rerank1, ascending = true)
      .select(col("qid"), col("id"))
    // tier 2: int8 quantized cosine over the tier-1 survivors only —
    // the same dyadic k/2^s dequantization as Ivf.topkSq8, derived
    // map-side here (stored as real byte codes in the at-rest twin)
    val mid = emb
      .select(col("vec_id").as("id"),
        transform(col("embedding"),
          x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float"))
          .as("q8"))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
      .join(broadcast(t1), Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
    val t2 = TopK.window(mid, rerank2).select(col("qid"), col("id"))
    // tier 3: exact rescore of the rerank2*Q survivors
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(t2), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * The cascade at REALISTIC width (d > 64): tier 1 uses ceil(d/64)
   * sign words per vector ([[Bq.topkWide]]'s multi-word Hamming — the
   * sum of per-word popcounts, still exact integer arithmetic, still
   * 1 bit/dim), tiers 2-3 as [[topk]]. Operates on generic (id, vec) /
   * (qid, qvec) frames so the realistic-width fixture slices plug in.
   */
  def topkWide(vectors: DataFrame, queries: DataFrame, k: Int, d: Int,
               scaleLog2: Int, rerank1: Int, rerank2: Int): DataFrame = {
    require(rerank1 >= rerank2 && rerank2 >= k,
      s"cascade cuts must narrow: rerank1 $rerank1 >= rerank2 $rerank2 >= k $k")
    require(d >= 1, s"d=$d")
    val words = (d + 63) / 64
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    def wordCols(v: org.apache.spark.sql.Column, prefix: String) =
      (0 until words).map(w =>
        VecExprs.signPack(slice(v, w * 64 + 1, 64)).as(s"${prefix}_$w"))
    val codes = vectors
      .filter(assert_true(size(col("vec")) === d,
        lit(s"cascade tier 1: vec width != declared d=$d")).isNull)
      .select(col("id") +: wordCols(col("vec"), "c"): _*)
    val qc = broadcast(queries.select(col("qid") +:
      wordCols(col("qvec"), "q"): _*))
    val ham = (0 until words).map(w =>
      bit_count(col(s"c_$w").bitwiseXOR(col(s"q_$w")))).reduceLeft(_ + _)
    val t1 = TopK.window(codes.crossJoin(qc).withColumn("score", ham),
        rerank1, ascending = true)
      .select(col("qid"), col("id"))
    val q = queries.select(col("qid"), col("qvec"),
      V.norm2Sq(col("qvec")).as("qn2"))
    val mid = vectors
      .select(col("id"),
        transform(col("vec"),
          x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float"))
          .as("q8"))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
      .join(broadcast(t1), Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
    val t2 = TopK.window(mid, rerank2).select(col("qid"), col("id"))
    val rescored = vectors
      .select(col("id"), col("vec"), V.norm2Sq(col("vec")).as("n2"))
      .join(broadcast(t2), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("vec"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * The reference's bandwidth accounting (`ANNCode.py:316-318`: every
   * refine op returns (preds, saving, fpr)) applied to the CASCADE: one
   * row with the end-to-end recall against the exact top-k and the
   * per-tier byte ledger — tier 1 pays 8 bytes for every (query,
   * vector) pair, tier 2 d bytes for each tier-1 survivor, tier 3 4d
   * bytes for each tier-2 survivor — and the saving vs the brute
   * baseline 4d*N*Q. Counts are exact integers off the same persisted
   * scans the result ranking consumes; save is one double division both
   * engines evaluate identically.
   */
  def metrics(emb: DataFrame, nq: Int, k: Int, d: Int, scaleLog2: Int,
              rerank1: Int, rerank2: Int): DataFrame = {
    require(rerank1 >= rerank2 && rerank2 >= k,
      s"cascade cuts must narrow: rerank1 $rerank1 >= rerank2 $rerank2 >= k $k")
    require(d >= 1 && d <= 64,
      s"tier-1 sign code is ONE 64-bit word; d=$d not in [1,64]")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val qc = broadcast(q.select(col("qid"),
      VecExprs.signPack(col("qvec")).as("qcode")))
    val codes = emb.select(col("vec_id").as("id"),
      VecExprs.signPack(col("embedding")).as("code"))
    val t1 = Dedup.persistScoped(TopK.window(
        codes.crossJoin(qc)
          .withColumn("score", bit_count(col("code").bitwiseXOR(col("qcode")))),
        rerank1, ascending = true)
      .select(col("qid"), col("id")))
    val mid = emb
      .select(col("vec_id").as("id"),
        transform(col("embedding"),
          x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float"))
          .as("q8"))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
      .join(broadcast(t1), Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
    val t2 = Dedup.persistScoped(
      TopK.window(mid, rerank2).select(col("qid"), col("id")))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(t2), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    val truth = Ann.bruteTopK(emb, nq, k).select(col("qid"), col("id"))
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    val t1N = t1.agg(count(lit(1)).as("fetched_mid"))
    val t2N = t2.agg(count(lit(1)).as("fetched_full"))
    val bFull = 4L * d
    val denom = (bFull * nq).toDouble
    TopK.window(rescored, k)
      .select(col("qid"), col("id"))
      .join(broadcast(truth), Seq("qid", "id"))
      .agg(count(lit(1)).as("hits"))
      .crossJoin(nTot).crossJoin(t1N).crossJoin(t2N)
      .select(col("hits"),
        (col("hits").cast("double") / lit(k * nq)).as("recall"),
        (col("n_total") * lit(nq.toLong)).as("cand"),
        col("fetched_mid"), col("fetched_full"),
        (col("n_total") * lit(8L * nq)).as("bytes_t1"),
        (col("fetched_mid") * lit(d.toLong)).as("bytes_t2"),
        (col("fetched_full") * lit(bFull)).as("bytes_t3"),
        (lit(1.0) -
          (col("n_total") * lit(8L * nq) + col("fetched_mid") * lit(d.toLong) +
            col("fetched_full") * lit(bFull)).cast("double") /
          (col("n_total").cast("double") * lit(denom))).as("save"))
  }

  // --- the full ladder at rest ------------------------------------------

  /** Bump when the ladder layout changes. */
  private val LadderLayoutVersion = 1

  /**
   * Materialize the FULL precision ladder as one disaggregated table:
   * (id, code BIGINT, c8 ARRAY<TINYINT>, vec ARRAY<FLOAT>) — 8 bytes,
   * d bytes, and 4d bytes per row in physically separate Parquet column
   * chunks (paper §3.3's bit-plane disaggregation with the standard BQ /
   * SQ8 / float rungs as the planes). Column pruning makes each cascade
   * tier pay exactly its own rung's bytes. int8 codes are range-checked
   * at write (fails loudly rather than wrapping past ±127); id-sorted
   * within files for row-group skipping on the survivor fetches.
   * Immutable version-named dir, atomic scratch publish.
   */
  def ensureLadderFixture(spark: SparkSession, sfDir: String, d: Int,
                          scaleLog2: Int): String = {
    import java.nio.file.{Files, Paths}
    require(d >= 1 && d <= 64, s"one sign word: d=$d not in [1,64]")
    val s = math.pow(2.0, scaleLog2)
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ladder_v${LadderLayoutVersion}_${safe}_d${d}_s${scaleLog2}" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "ladder-")
      graft.Tables.embeddings(spark, sfDir)
        .filter(assert_true(size(col("embedding")) === d,
          lit(s"ladder: embedding width != declared d=$d")).isNull)
        .select(col("vec_id").as("id"),
          VecExprs.signPack(col("embedding")).as("code"),
          transform(col("embedding"), { x =>
            val kq = floor(x * s + lit(0.5))
            when(abs(kq) > 127, raise_error(concat(
              lit(s"ladder: int8 code overflow at scale 2^$scaleLog2: k="),
              kq.cast("string")))).otherwise(kq).cast("byte")
          }).as("c8"),
          col("embedding").as("vec"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"ladder publish failed: $path")
    }
    path.toString
  }

  /**
   * The cascade OFF THE AT-REST LADDER — hash-equal to [[topk]]: tier 1
   * scans only (id, code), tier 2 fetches only (id, c8) for its
   * survivors, tier 3 only (id, vec). The stored byte code dequantizes
   * to the same dyadic k/2^s float as the in-memory expression, so the
   * two paths agree bit-for-bit.
   */
  def topkAtRest(spark: SparkSession, sfDir: String, emb: DataFrame,
                 nq: Int, k: Int, d: Int, scaleLog2: Int,
                 rerank1: Int, rerank2: Int): DataFrame = {
    require(rerank1 >= rerank2 && rerank2 >= k,
      s"cascade cuts must narrow: rerank1 $rerank1 >= rerank2 $rerank2 >= k $k")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val path = ensureLadderFixture(spark, sfDir, d, scaleLog2)
    val stored = spark.read.parquet(path)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val qc = broadcast(q.select(col("qid"),
      VecExprs.signPack(col("qvec")).as("qcode")))
    val t1 = TopK.window(
        stored.select(col("id"), col("code")).crossJoin(qc)
          .withColumn("score", bit_count(col("code").bitwiseXOR(col("qcode")))),
        rerank1, ascending = true)
      .select(col("qid"), col("id"))
    val mid = stored
      .select(col("id"),
        transform(col("c8"),
          c => (c.cast("double") / s).cast("float")).as("q8"))
      .join(broadcast(t1), Seq("id"))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
    val t2 = TopK.window(mid, rerank2).select(col("qid"), col("id"))
    val rescored = stored
      .select(col("id"), col("vec"))
      .join(broadcast(t2), Seq("id"))
      .withColumn("n2", V.norm2Sq(col("vec")))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("vec"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }
}

package graft.oracle

/**
 * DuckDB oracle SQL for similarity search over `embeddings`
 * (vec_id BIGINT, embedding FLOAT[64], label INT).
 *
 * Spark folds dot products in array order with a DOUBLE accumulator
 * (`aggregate` left fold); these oracles emit the same sum as an explicit
 * left-associated 64-term chain, so DOUBLE scores are bit-identical.
 */
object EmbOracle {

  /** Explicit left-fold dot product of two FLOAT[] columns, in DOUBLE. */
  def dotE(a: String, b: String, d: Int): String =
    (1 to d).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  /** [[dotE]] over an index sub-range (1-based, inclusive) — the tail
    * fold of the width-axis refinement. */
  def dotERange(a: String, b: String, from: Int, to: Int): String =
    (from to to).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  private def fn(x: String) = s"GREATEST(sqrt($x), 1e-12)"

  /** norms CTE: nrm(vec_id, n2). MATERIALIZED — every consumer joins it
    * at least twice (candidate side + query side) and DuckDB re-evaluates
    * plain CTEs per reference. `name` lets a nested sub-oracle (e.g.
    * [[bruteSql]] embedded inside a sweep) avoid the duplicate-alias
    * error DuckDB raises for same-named materialized CTEs in scope. */
  def nrmCte(d: Int, name: String = "nrm"): String =
    s"$name AS MATERIALIZED (SELECT vec_id, ${dotE("embedding", "embedding", d)} AS n2 FROM embeddings)"

  def bruteSql(d: Int, nq: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |${nrmCte(d, "nrmb")},
       |sc AS (SELECT q.qid, e.vec_id AS id, ${dotE("e.embedding", "q.qv", d)} AS dp
       |       FROM embeddings e CROSS JOIN q),
       |scored AS (SELECT sc.qid, sc.id,
       |    sc.dp / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM sc JOIN nrmb ni ON sc.id = ni.vec_id JOIN nrmb nq2 ON sc.qid = nq2.vec_id),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score FROM ranked WHERE rnk <= $k""".stripMargin

  /**
   * Cursor pagination ([[graft.operators.Search.searchAfter]]): the
   * engine resumes page N from the previous page's last (score, id)
   * cursor; under the (score DESC, id ASC) total order that is provably
   * the rank slice ((page-1)·k, page·k] of one global ranking, which is
   * what this oracle emits — rank re-based to the page-local 1..k the
   * API returns.
   */
  def pageSql(d: Int, nq: Int, k: Int, page: Int): String = {
    val lo = (page - 1) * k
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |${nrmCte(d, "nrmb")},
       |sc AS (SELECT q.qid, e.vec_id AS id, ${dotE("e.embedding", "q.qv", d)} AS dp
       |       FROM embeddings e CROSS JOIN q),
       |scored AS (SELECT sc.qid, sc.id,
       |    sc.dp / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM sc JOIN nrmb ni ON sc.id = ni.vec_id JOIN nrmb nq2 ON sc.qid = nq2.vec_id),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk - $lo AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk > $lo AND rnk <= ${page * k}""".stripMargin
  }

  /** Score-distribution histogram ([[graft.operators.Ann
    * .scoreHistogram]]): bucket = floor(score * binScale) over every
    * query-corpus cosine — floor of the identical score doubles, so the
    * bucketing is bit-deterministic. */
  def scoreHistogramSql(d: Int, nq: Int, binScale: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |${nrmCte(d)},
       |sc AS (SELECT q.qid, e.vec_id AS id, ${dotE("e.embedding", "q.qv", d)} AS dp
       |       FROM embeddings e CROSS JOIN q),
       |scored AS (SELECT sc.qid, sc.id,
       |    sc.dp / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM sc JOIN nrm ni ON sc.id = ni.vec_id JOIN nrm nq2 ON sc.qid = nq2.vec_id)
       |SELECT CAST(FLOOR(score * $binScale) AS INTEGER) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM scored GROUP BY 1""".stripMargin

  /** Matryoshka prefix rung ([[graft.operators.Ann.prefixTopK]] and its
    * at-rest twin — the stored prefix column holds the identical floats,
    * so ONE oracle serves both): cheap rank by cosine over the first
    * `dp` components (the same left-fold chain truncated at dp terms),
    * cut to `rerank` per query under the (score DESC, id ASC) total
    * order, then exact full-width rescore. Prefix norms are their own
    * MATERIALIZED CTE — referenced twice (candidate + query side). */
  def prefixSql(d: Int, dp: Int, nq: Int, k: Int, rerank: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |npfx AS MATERIALIZED (SELECT vec_id, ${dotE("embedding", "embedding", dp)} AS n2p FROM embeddings),
       |${nrmCte(d)},
       |cs AS (SELECT q.qid, e.vec_id AS id, ${dotE("e.embedding", "q.qv", dp)} AS dpp
       |       FROM embeddings e CROSS JOIN q),
       |cscore AS (SELECT cs.qid, cs.id,
       |    cs.dpp / (${fn("ni.n2p")} * ${fn("nq2.n2p")}) AS cscore
       |  FROM cs JOIN npfx ni ON cs.id = ni.vec_id JOIN npfx nq2 ON cs.qid = nq2.vec_id),
       |cand AS (SELECT qid, id FROM (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cscore DESC, id ASC) AS crnk
       |  FROM cscore) t WHERE t.crnk <= $rerank),
       |resc AS (SELECT c.qid, c.id,
       |    ${dotE("e.embedding", "q.qv", d)} / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM cand c JOIN embeddings e ON c.id = e.vec_id
       |    JOIN q ON c.qid = q.qid
       |    JOIN nrm ni ON c.id = ni.vec_id JOIN nrm nq2 ON c.qid = nq2.vec_id),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM resc)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score FROM ranked WHERE rnk <= $k""".stripMargin

  /** Weighted fold term: the engine's MRL corpus applies EXACT
    * power-of-two float scalings, so `CAST(a[i] AS DOUBLE) * w_i` (w_i
    * an exact decimal) equals the double of the scaled float. */
  private def wTerm(a: String, i: Int, w: Option[Seq[String]]): String =
    w match {
      case Some(ws) => s"(CAST($a[$i] AS DOUBLE)*${ws(i - 1)})"
      case None     => s"CAST($a[$i] AS DOUBLE)"
    }

  /** [[dotERange]] with optional exact per-dimension weights. */
  def dotEWRange(a: String, b: String, from: Int, to: Int,
                 w: Option[Seq[String]]): String =
    (from to to).map(i => s"${wTerm(a, i, w)}*${wTerm(b, i, w)}")
      .mkString("(", " + ", ")")

  /** Bandwidth ledger of the ZERO-MISS width refinement
    * ([[graft.operators.Ann.prefixRefineMetrics]]): the seed/tau0/
    * survive pipeline mirrored relationally — the cushion's dyadic
    * safety constants (1+2^-20, 2^-20) written as their exact finite
    * decimals so both engines hold the identical doubles — then the
    * same driver-side accounting arithmetic in the same operation
    * order. recall is the literal 1.0 the zero-miss proof guarantees:
    * an engine value below it hash-mismatches, which is the point.
    * Two arms, composed as sibling subqueries: the raw isotropic corpus
    * and the MRL energy-decayed corpus (exact decimal weights). */
  def prefixRefineMetricsSql(d: Int, dp: Int, nq: Int, k: Int): String = {
    val wMrl = (0 until d).map(j =>
      new java.math.BigDecimal(1.0 / (1L << (j / 8))).toPlainString)
    s"""WITH a_iso AS (SELECT * FROM (${metricsArmSql(d, dp, nq, k, "iso", None)})),
       |a_mrl AS (SELECT * FROM (${metricsArmSql(d, dp, nq, k, "mrl", Some(wMrl))}))
       |SELECT * FROM a_iso UNION ALL SELECT * FROM a_mrl""".stripMargin
  }

  private def metricsArmSql(d: Int, dp: Int, nq: Int, k: Int,
                            corpus: String, w: Option[Seq[String]]): String = {
    val nqK = nq * k
    val bRed = s"${4 * dp + 16}.0"
    val bFull = s"${4 * d}.0"
    val c1 = "1.00000095367431640625"  // 1 + 2^-20, exact
    val c2 = "0.00000095367431640625"  // 2^-20, exact
    def dotW(a: String, b: String, to: Int) = dotEWRange(a, b, 1, to, w)
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |nrm AS MATERIALIZED (SELECT vec_id,
       |    ${dotW("embedding", "embedding", d)} AS n2 FROM embeddings),
       |ntl AS MATERIALIZED (SELECT vec_id,
       |    ${dotEWRange("embedding", "embedding", dp + 1, d, w)} AS n2t FROM embeddings),
       |sc AS MATERIALIZED (SELECT q.qid, e.vec_id AS id,
       |    ${dotW("e.embedding", "q.qv", dp)} / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS s_hat,
       |    (sqrt(nt.n2t) * sqrt(ntq.n2t) * $c1 + $c2)
       |      / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS cush
       |  FROM embeddings e CROSS JOIN q
       |  JOIN nrm ni ON e.vec_id = ni.vec_id JOIN nrm nq2 ON q.qid = nq2.vec_id
       |  JOIN ntl nt ON e.vec_id = nt.vec_id JOIN ntl ntq ON q.qid = ntq.vec_id),
       |seeds AS MATERIALIZED (SELECT qid, id FROM (SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |  FROM sc) t WHERE t.rn <= $k),
       |tau AS MATERIALIZED (SELECT s.qid,
       |    MIN(${dotW("e.embedding", "q.qv", d)} / (${fn("ni.n2")} * ${fn("nq2.n2")})) AS tau0
       |  FROM seeds s JOIN embeddings e ON s.id = e.vec_id
       |    JOIN q ON s.qid = q.qid
       |    JOIN nrm ni ON s.id = ni.vec_id JOIN nrm nq2 ON s.qid = nq2.vec_id
       |  GROUP BY s.qid),
       |surv AS (SELECT COUNT(*) AS n_surv
       |  FROM sc LEFT JOIN seeds ON sc.qid = seeds.qid AND sc.id = seeds.id
       |  JOIN tau ON sc.qid = tau.qid
       |  WHERE seeds.id IS NULL AND sc.s_hat + sc.cush >= tau.tau0),
       |nv AS (SELECT COUNT(*) AS n_v FROM embeddings)
       |SELECT '$corpus' AS corpus, 'cos_prefix' AS mode, $dp AS d_prefix,
       |  CAST($nqK + surv.n_surv AS BIGINT) AS n_fetched,
       |  CAST(1.0 AS DOUBLE) AS recall,
       |  1.0 - (($bRed * CAST(nv.n_v AS DOUBLE)) * $nq
       |           + $bFull * CAST($nqK + surv.n_surv AS DOUBLE))
       |        / (($bFull * CAST(nv.n_v AS DOUBLE)) * $nq) AS save,
       |  CAST(surv.n_surv AS DOUBLE) / (CAST(nv.n_v AS DOUBLE) * $nq) AS fpr
       |FROM surv, nv""".stripMargin
  }

  def ivfSql(d: Int, nq: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel FROM embeddings
       |           ORDER BY vec_id LIMIT $nq),
       |${nrmCte(d)},
       |sc AS (SELECT q.qid, e.vec_id AS id, ${dotE("e.embedding", "q.qv", d)} AS dp
       |       FROM embeddings e JOIN q ON e.label = q.qlabel),
       |scored AS (SELECT sc.qid, sc.id,
       |    sc.dp / (${fn("ni.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM sc JOIN nrm ni ON sc.id = ni.vec_id JOIN nrm nq2 ON sc.qid = nq2.vec_id),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score FROM ranked WHERE rnk <= $k""".stripMargin

  /**
   * Multi-probe SRP-LSH bucketed retrieval ([[graft.operators.Lsh
   * .topk]] and its at-rest twin — the stored bucket column holds the
   * identical keys, so ONE oracle serves both): each vector's P-bit
   * bucket is a CASE-bit sum over hyperplane sign tests (the engine's
   * exact integer hyperplane components embedded as string-cast DOUBLE
   * literals, each dot a left-fold chain matching the Spark column
   * term-for-term), the probe set is the query's own bucket plus the P
   * Hamming-1 flips (`xor(b0, 2^p)`), candidates come from the bucket
   * equi-join, and the exact cosine rescore ranks them.
   */
  /** The P-bit SRP bucket key of `a` as a SQL expression — each sign
    * bit a left-fold DOUBLE dot chain against the engine's exact
    * integer hyperplane literals, matching the Spark column
    * term-for-term. */
  private def lshBucketExpr(a: String, d: Int, nPlanes: Int): String = {
    def planeDot(p: Int): String =
      (1 to d).map(i => s"CAST($a[$i] AS DOUBLE)*" +
        OracleGen.dlit(graft.operators.Lsh.planeComponent(p, i - 1)))
        .mkString("(", " + ", ")")
    (0 until nPlanes).map(p =>
      s"CASE WHEN ${planeDot(p)} > 0.0" +
        s" THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString("(", " + ", ")")
  }

  /** `updatedNegMod` > 0: the UPSERT view — candidate-side vectors with
    * id ≡ 0 (mod it) are negated through BOTH the bucket hash and the
    * rescore (the engine's re-hashed delta), while the query side and
    * its probe buckets stay on the raw relation (queries are external)
    * and norms are shared (negation preserves them bit-for-bit). */
  def lshSql(d: Int, nPlanes: Int, nq: Int, k: Int,
             excludeMod: Int = 0, updatedNegMod: Int = 0): String = {
    require(excludeMod == 0 || updatedNegMod == 0,
      "deletes and upserts are separate fixture commits")
    val bucketExpr = lshBucketExpr("e.embedding", d, nPlanes)
    val flips = (0 until nPlanes).map(p =>
      s"SELECT qid, xor(b0, CAST(${1L << p} AS BIGINT)) AS bucket FROM qb")
      .mkString(" UNION ALL ")
    // merge-on-read deletes cut CANDIDATES only: the probe buckets still
    // derive from every vector's code (a deleted vector's own query —
    // queries are the external relation — keeps its bucket), mirroring
    // the engine's layout-side anti-join
    val excl = if (excludeMod <= 0) ""
      else s" WHERE c.id % $excludeMod <> 0"
    val src = if (updatedNegMod > 0) "embu" else "embeddings"
    val embuCte =
      if (updatedNegMod <= 0) ""
      else s"""embu AS (SELECT vec_id,
              |    CASE WHEN vec_id % $updatedNegMod = 0
              |      THEN list_transform(embedding, x -> -x)
              |      ELSE embedding END AS embedding
              |  FROM embeddings),
              |qcodes AS MATERIALIZED (SELECT e.vec_id AS id, $bucketExpr AS bucket
              |  FROM embeddings e),
              |""".stripMargin
    val qbSrc = if (updatedNegMod > 0) "qcodes" else "codes"
    s"""WITH ${embuCte}codes AS MATERIALIZED (SELECT e.vec_id AS id, $bucketExpr AS bucket
       |  FROM $src e),
       |${nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qb AS MATERIALIZED (SELECT q.qid, c.bucket AS b0 FROM q JOIN $qbSrc c ON c.id = q.qid),
       |probes AS (SELECT qid, b0 AS bucket FROM qb UNION ALL $flips),
       |cand AS (SELECT p.qid, c.id FROM probes p JOIN codes c ON c.bucket = p.bucket$excl),
       |scored AS (SELECT r.qid, r.id,
       |    ${dotE("e.embedding", "qe.embedding", d)} / (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM cand r JOIN $src e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * LSH probe-depth tuning sweep ([[graft.operators.Lsh.probeSweep]]):
   * every candidate pair carries the unique depth that admits it (0 for
   * the query's own bucket, p+1 for the flip of bit p), each depth f in
   * 0..P is a `reqd <= f` cut + per-query rank, hits against the brute
   * top-k. Counts are exact integers; recall is one exact division.
   */
  def lshTuneSql(d: Int, nPlanes: Int, nq: Int, k: Int): String = {
    val bucketExpr = lshBucketExpr("e.embedding", d, nPlanes)
    val flips = (0 until nPlanes).map(p =>
      s"SELECT qid, ${p + 1} AS reqd, xor(b0, CAST(${1L << p} AS BIGINT))" +
        " AS bucket FROM qb").mkString(" UNION ALL ")
    s"""WITH codes AS MATERIALIZED (SELECT e.vec_id AS id, $bucketExpr AS bucket
       |  FROM embeddings e),
       |${nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qb AS MATERIALIZED (SELECT q.qid, c.bucket AS b0 FROM q JOIN codes c ON c.id = q.qid),
       |probes AS (SELECT qid, 0 AS reqd, b0 AS bucket FROM qb UNION ALL $flips),
       |cand AS MATERIALIZED (SELECT p.qid, c.id, p.reqd,
       |    ${dotE("e.embedding", "qe.embedding", d)} / (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM probes p JOIN codes c ON c.bucket = p.bucket
       |  JOIN embeddings e ON e.vec_id = c.id
       |  JOIN embeddings qe ON qe.vec_id = p.qid
       |  JOIN nrm ne ON ne.vec_id = c.id JOIN nrm nq2 ON nq2.vec_id = p.qid),
       |gt AS MATERIALIZED (SELECT qid, id FROM (${bruteSql(d, nq, k)})),
       |fs AS (SELECT UNNEST(generate_series(0, $nPlanes)) AS nflips),
       |ranked AS (SELECT f.nflips, c.qid, c.id,
       |    row_number() OVER (PARTITION BY f.nflips, c.qid
       |      ORDER BY c.score DESC, c.id ASC) AS rnk
       |  FROM fs f JOIN cand c ON c.reqd <= f.nflips),
       |hits AS (SELECT r.nflips, COUNT(*) AS hits
       |  FROM ranked r JOIN gt ON gt.qid = r.qid AND gt.id = r.id
       |  WHERE r.rnk <= $k GROUP BY r.nflips),
       |cands AS (SELECT f.nflips, COUNT(*) AS cands
       |  FROM fs f JOIN cand c ON c.reqd <= f.nflips GROUP BY f.nflips)
       |SELECT CAST(f.nflips AS INTEGER) AS nflips,
       |  CAST(f.nflips + 1 AS INTEGER) AS buckets,
       |  cn.cands, COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / ${(nq * k).toDouble} AS recall
       |FROM fs f JOIN cands cn ON cn.nflips = f.nflips
       |LEFT JOIN hits h ON h.nflips = f.nflips""".stripMargin
  }

  /** The sweep plus the operating-point flag
    * ([[graft.operators.Lsh.probeSweepPick]]): chosen = the min depth
    * meeting the recall floor, else the full shell. */
  def lshTunePickSql(d: Int, nPlanes: Int, nq: Int, k: Int,
                     recallFloor: Double): String =
    s"""WITH t AS MATERIALIZED (SELECT * FROM (${lshTuneSql(d, nPlanes, nq, k)})),
       |pick AS (SELECT COALESCE(
       |    (SELECT MIN(nflips) FROM t WHERE recall >= ${OracleGen.dlit(recallFloor)}),
       |    (SELECT MAX(nflips) FROM t)) AS ch)
       |SELECT t.nflips, t.buckets, t.cands, t.hits, t.recall,
       |  (t.nflips = pick.ch) AS chosen
       |FROM t, pick""".stripMargin

  /** Radius-tau pick ([[graft.operators.Ann.rangeTauPick]]): the
    * histogram rows with the above-cumulative count and the chosen
    * flag — lowest bucket whose cumulative fits the budget, top bucket
    * as fallback. Exact integers end to end. */
  def rangeTauPickSql(d: Int, nq: Int, binScale: Int,
                      budget: Long): String =
    s"""WITH h AS MATERIALIZED (SELECT * FROM (${scoreHistogramSql(d, nq, binScale)})),
       |wc AS (SELECT bucket, n,
       |  CAST(SUM(n) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum FROM h),
       |pick AS (SELECT COALESCE(
       |  (SELECT MIN(bucket) FROM wc WHERE cum <= $budget),
       |  (SELECT MAX(bucket) FROM wc)) AS ch)
       |SELECT wc.bucket, wc.n, wc.cum, (wc.bucket = pick.ch) AS chosen
       |FROM wc, pick""".stripMargin

  /** Embedding QA ([[graft.operators.Ann.normOutliers]]): the global
    * vec_id-ordered folds of (norm, norm²) mirror the engine's
    * [[graft.operators.TrainFold]] stats scan; mean/sd re-derive via
    * the identical arithmetic, the flag predicate operand-for-operand. */
  def normOutliersSql(d: Int, zTau: Double): String =
    s"""WITH ${nrmCte(d)},
       |nn AS MATERIALIZED (SELECT vec_id, ${fn("n2")} AS norm FROM nrm),
       |m0 AS (SELECT COUNT(*) AS n,
       |  list_reduce(list(norm ORDER BY vec_id), (a, v) -> a + v)
       |    / CAST(COUNT(*) AS DOUBLE) AS mean
       |  FROM nn),
       |ms AS (SELECT m0.mean, GREATEST(sqrt(GREATEST(
       |    (SELECT list_reduce(list((norm - m0.mean) * (norm - m0.mean)
       |       ORDER BY vec_id), (a, v) -> a + v) FROM nn)
       |    / CAST(m0.n AS DOUBLE), 0.0)), 1e-12) AS sd
       |  FROM m0)
       |SELECT vec_id, norm, (norm - mean) / sd AS z
       |FROM nn, ms WHERE ABS(norm - mean) > ${OracleGen.dlit(zTau)} * sd""".stripMargin

  def nearDupSql(d: Int, minCos: Double): String =
    s"""WITH ${nrmCte(d)},
       |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotE("a.embedding", "b.embedding", d)} AS dp
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id),
       |scored AS (SELECT p.id_a, p.id_b,
       |    p.dp / (${fn("na.n2")} * ${fn("nb.n2")}) AS cos
       |  FROM pairs p JOIN nrm na ON p.id_a = na.vec_id JOIN nrm nb ON p.id_b = nb.vec_id)
       |SELECT id_a, id_b, cos FROM scored WHERE cos >= $minCos""".stripMargin
}

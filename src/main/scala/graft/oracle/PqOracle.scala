package graft.oracle

import graft.operators.{Ivf, Pq}

/**
 * DuckDB oracle for [[graft.operators.Pq]] (IVF-PQ): the coarse-cell
 * assignment/probe CTEs mirror [[IvfOracle]], the per-subspace code
 * assignment and the query-side ADC table are explicit left-fold chains
 * over dyadic codebook literals (exact at every conversion step), and
 * the reconstruction norms are driver-computed exact dyadic doubles
 * embedded via [[OracleGen.dlit]].
 */
object PqOracle {

  private def fn(x: String) = s"GREATEST(sqrt($x), 1e-12)"

  /** Codebook literal for (m,c,j), float-cast like the engine stores it.
    * The printed double must parse as DOUBLE first — a bare decimal
    * literal is DECIMAL in DuckDB, and DECIMAL -> FLOAT can land 1 ulp
    * off the float the engine stores (the component is float-exact, so
    * DOUBLE -> FLOAT is). */
  private def cb(m: Int, c: Int, j: Int, sub: Int): String =
    s"CAST(CAST(${OracleGen.dlit(Pq.component(m, c, j, sub))} AS FLOAT) AS DOUBLE)"

  /** Left-fold ||x_sub_m - cb(m,c)||^2 chain over alias's embedding. */
  private def subDistExpr(alias: String, m: Int, c: Int, sub: Int): String =
    (0 until sub).map { j =>
      val x = s"CAST($alias.embedding[${m * sub + j + 1}] AS DOUBLE)"
      s"($x - ${cb(m, c, j, sub)})*($x - ${cb(m, c, j, sub)})"
    }.mkString("(", " + ", ")")

  /** Left-fold dot(q_sub_m, cb(m,c)) chain. */
  private def adcExpr(alias: String, m: Int, c: Int, sub: Int): String =
    (0 until sub).map { j =>
      s"CAST($alias.embedding[${m * sub + j + 1}] AS DOUBLE)*${cb(m, c, j, sub)}"
    }.mkString("(", " + ", ")")

  /**
   * Twin of [[graft.operators.Pq.trainStep]]: per-subspace code
   * assignment over the dyadic init codebooks (the same exact-literal
   * CASE/LEAST chains as [[topkSql]]), then per-(m, code, j) means with
   * the sum as list_reduce over vec_id-ordered component lists — the
   * same left fold the engine's sort_array + aggregate performs.
   */
  def trainStepSql(d: Int, mSub: Int, codes: Int,
                   sampleEvery: Int = 1): String = {
    val sub = d / mSub
    // sampled training (sampleEvery > 1): the Lloyd pass sees only the
    // counter-keyed sample — the engine's trainSet filter, mirrored
    val samplePred =
      if (sampleEvery <= 1) "" else s" WHERE e.vec_id % $sampleEvery = 0"
    val pqDistCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${subDistExpr("e", m, c, sub)} AS d_${m}_$c").mkString(",\n  ")
    val codeCols = (0 until mSub).map { m =>
      val least0 = "LEAST(" +
        (0 until codes).map(c => s"d_${m}_$c").mkString(", ") + ")"
      s"CASE " + (0 until codes)
        .map(c => s"WHEN d_${m}_$c = $least0 THEN $c").mkString(" ") +
        s" END AS code_$m"
    }.mkString(",\n  ")
    val codeCase = "CASE CAST(tm.m AS INTEGER) " + (0 until mSub)
      .map(m => s"WHEN $m THEN en.code_$m").mkString(" ") + " END"
    s"""WITH pqd AS MATERIALIZED (SELECT e.vec_id, $pqDistCols FROM embeddings e$samplePred),
       |enc AS MATERIALIZED (SELECT vec_id, $codeCols FROM pqd)
       |SELECT CAST(tm.m AS INTEGER) AS m, $codeCase AS code,
       |  CAST(tj.j AS INTEGER) AS j, COUNT(*) AS n,
       |  list_reduce(list(CAST(e.embedding[tm.m * $sub + tj.j] AS DOUBLE)
       |      ORDER BY e.vec_id), (acc, v) -> acc + v)
       |    / CAST(COUNT(*) AS DOUBLE) AS mean
       |FROM enc en JOIN embeddings e ON e.vec_id = en.vec_id
       |CROSS JOIN generate_series(0, ${mSub - 1}) AS tm(m)
       |CROSS JOIN generate_series(1, $sub) AS tj(j)
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /**
   * Twin of [[graft.operators.Pq.distortion]]: per-subspace init vs
   * retrained SSE — init distances off the dyadic-codebook LEAST,
   * trained distances re-derived from the [[trainStepSql]] means CTE
   * with a per-(vector, subspace) MIN, both summed as vec_id-ordered
   * list_reduce folds (matching the engine's sort_array + aggregate).
   */
  def distortionSql(d: Int, mSub: Int, codes: Int): String = {
    val sub = d / mSub
    val pqDistCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${subDistExpr("e", m, c, sub)} AS d_${m}_$c").mkString(",\n  ")
    val diArms = (0 until mSub).map { m =>
      val least0 = "LEAST(" +
        (0 until codes).map(c => s"d_${m}_$c").mkString(", ") + ")"
      s"SELECT vec_id, $m AS m, $least0 AS di FROM pqd"
    }.mkString("\nUNION ALL ")
    s"""WITH km AS MATERIALIZED (SELECT * FROM (${trainStepSql(d, mSub, codes)})),
       |pqd AS MATERIALIZED (SELECT e.vec_id, $pqDistCols FROM embeddings e),
       |di AS MATERIALIZED ($diArms),
       |cdp AS MATERIALIZED (SELECT e.vec_id, km.m, km.code,
       |    list_reduce(list(
       |      (CAST(e.embedding[km.m * $sub + km.j] AS DOUBLE) - km.mean)
       |        * (CAST(e.embedding[km.m * $sub + km.j] AS DOUBLE) - km.mean)
       |      ORDER BY km.j), (acc, v) -> acc + v) AS d2
       |  FROM embeddings e CROSS JOIN km
       |  GROUP BY e.vec_id, km.m, km.code),
       |dt AS MATERIALIZED (SELECT vec_id, m, MIN(d2) AS dt FROM cdp
       |  GROUP BY vec_id, m)
       |SELECT di.m AS m, COUNT(*) AS n,
       |  list_reduce(list(di.di ORDER BY di.vec_id), (a, v) -> a + v) AS init_sse,
       |  list_reduce(list(dt.dt ORDER BY di.vec_id), (a, v) -> a + v) AS trained_sse
       |FROM di JOIN dt ON dt.vec_id = di.vec_id AND dt.m = di.m
       |GROUP BY di.m""".stripMargin
  }

  /**
   * IVF-PQ served with the RETRAINED codebooks
   * ([[graft.operators.Pq.topkTrained]]): the trained means re-derived
   * as a CTE ([[trainStepSql]] hash-matches them — the same doubles the
   * engine collects and bakes in as literals), then trained encode
   * (argmin over j-ordered distance folds, ties to the smaller code),
   * trained ADC table, rerank cut, exact rescore. Every float chain —
   * subspace distances, table entries, reconstruction norms, the
   * over-subspace sums — is a list_reduce in the engine's fold order
   * (j within subspace, m across), so both engines round identically.
   */
  def trainedTopkSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                     mSub: Int, codes: Int, rerank: Int,
                     sampleEvery: Int = 1): String = {
    val sub = d / mSub
    def cellDistExpr(cell: Int): String =
      (0 until d).map { j =>
        val cv = Ivf.centroidComponent(cell, j)
        val c = s"CAST(CAST(${OracleGen.dlit(cv)} AS FLOAT) AS DOUBLE)"
        s"(CAST(e.embedding[${j + 1}] AS DOUBLE) - $c)*(CAST(e.embedding[${j + 1}] AS DOUBLE) - $c)"
      }.mkString("(", " + ", ")")
    val distCols = (0 until nCells)
      .map(c => s"${cellDistExpr(c)} AS c$c").mkString(",\n  ")
    val leastExpr = "LEAST(" + (0 until nCells).map(c => s"c$c").mkString(", ") + ")"
    val argmin = "CASE " + (0 until nCells)
      .map(c => s"WHEN c$c = m THEN $c").mkString(" ") + " END"
    val probeCase = "CASE t.cell " + (0 until nCells)
      .map(c => s"WHEN $c THEN a.c$c").mkString(" ") + " END"
    val cellsValues = (0 until nCells).map(c => s"($c)").mkString(",")
    s"""WITH km AS MATERIALIZED (SELECT * FROM (${trainStepSql(d, mSub,
           codes, sampleEvery)})),
       |asg0 AS MATERIALIZED (SELECT e.vec_id, $distCols FROM embeddings e),
       |asg AS MATERIALIZED (SELECT vec_id, $argmin AS cell
       |        FROM (SELECT *, $leastExpr AS m FROM asg0)),
       |${EmbOracle.nrmCte(d)},
       |cdp AS MATERIALIZED (SELECT e.vec_id, km.m, km.code,
       |    list_reduce(list(
       |      (CAST(e.embedding[km.m * $sub + km.j] AS DOUBLE) - km.mean)
       |        * (CAST(e.embedding[km.m * $sub + km.j] AS DOUBLE) - km.mean)
       |      ORDER BY km.j), (acc, v) -> acc + v) AS d2
       |  FROM embeddings e CROSS JOIN km
       |  GROUP BY e.vec_id, km.m, km.code),
       |encT AS MATERIALIZED (SELECT vec_id, m, code FROM (SELECT vec_id, m, code,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
       |  FROM cdp) t WHERE t.rn = 1),
       |n2c AS MATERIALIZED (SELECT m, code,
       |    list_reduce(list(mean * mean ORDER BY j), (acc, v) -> acc + v) AS n2
       |  FROM km GROUP BY m, code),
       |n2v AS MATERIALIZED (SELECT en.vec_id,
       |    list_reduce(list(n2c.n2 ORDER BY en.m), (acc, v) -> acc + v) AS n2hat
       |  FROM encT en JOIN n2c ON n2c.m = en.m AND n2c.code = en.code
       |  GROUP BY en.vec_id),
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qt AS MATERIALIZED (SELECT q.qid, km.m, km.code,
       |    list_reduce(list(CAST(qe.embedding[km.m * $sub + km.j] AS DOUBLE) * km.mean
       |      ORDER BY km.j), (acc, v) -> acc + v) AS tv
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid CROSS JOIN km
       |  GROUP BY q.qid, km.m, km.code),
       |qp0 AS (SELECT q.qid, t.cell, $probeCase AS d2
       |  FROM q JOIN asg0 a ON a.vec_id = q.qid
       |  CROSS JOIN (VALUES $cellsValues) AS t(cell)),
       |qp AS (SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |      row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cell ASC) AS pr
       |    FROM qp0) WHERE pr <= $nprobe),
       |cand AS (SELECT qp.qid, a.vec_id AS id
       |  FROM qp JOIN asg a ON a.cell = qp.cell),
       |cheap AS (SELECT c.qid, c.id,
       |    list_reduce(list(qt.tv ORDER BY en.m), (acc, v) -> acc + v)
       |      / (${fn("n2v.n2hat")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM cand c
       |  JOIN encT en ON en.vec_id = c.id
       |  JOIN qt ON qt.qid = c.qid AND qt.m = en.m AND qt.code = en.code
       |  JOIN n2v ON n2v.vec_id = c.id
       |  JOIN nrm nq2 ON nq2.vec_id = c.qid
       |  GROUP BY c.qid, c.id, n2v.n2hat, nq2.n2),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * Binary-quantization pipeline ([[graft.operators.Bq]]): sign-bit
   * code words as exact integer CASE sums (bit 63's 1L<<63 term is the
   * negative two's-complement literal; left-fold partial sums stay in
   * BIGINT range because bits 0..62 total 2^63 - 1), Hamming cheap rank
   * via bit_count(xor(...)), rerank cut, exact rescore.
   */
  def bqSql(d: Int, nq: Int, k: Int, rerank: Int): String = {
    require(d <= 64, s"sign-pack code is one 64-bit word, d=$d")
    val codeExpr = (0 until d).map { j =>
      s"CASE WHEN e.embedding[${j + 1}] > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")
    s"""WITH codes AS (SELECT e.vec_id AS id, $codeExpr AS code FROM embeddings e),
       |${EmbOracle.nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qc AS (SELECT q.qid, c.code AS qcode FROM q JOIN codes c ON c.id = q.qid),
       |cheap AS (SELECT qc.qid, c.id,
       |    bit_count(xor(c.code, qc.qcode)) AS ham
       |  FROM codes c CROSS JOIN qc),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY ham ASC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * The three-tier precision-on-demand cascade
   * ([[graft.operators.Cascade.topk]]): tier 1 is [[bqSql]]'s sign-word
   * Hamming scan cut to rerank1; tier 2 dequantizes int8 codes (the
   * exact dyadic k/2^s of [[IvfOracle.sq8Sql]]) over those survivors and
   * cuts to rerank2; tier 3 is the exact cosine rescore. Every tier's
   * arithmetic is exact, so the oracle mirrors the cascade bit-for-bit.
   */
  def cascadeSql(d: Int, nq: Int, k: Int, scaleLog2: Int,
                 rerank1: Int, rerank2: Int): String =
    s"""WITH ${cascadeCtes(d, nq, scaleLog2, rerank1, rerank2)},
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM t2 r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin

  /** Shared CTE chain of the cascade oracle, through the tier-2 cut. */
  private def cascadeCtes(d: Int, nq: Int, scaleLog2: Int,
                          rerank1: Int, rerank2: Int): String = {
    require(d <= 64, s"sign-pack code is one 64-bit word, d=$d")
    val scale = math.pow(2.0, scaleLog2)
    val codeExpr = (0 until d).map { j =>
      s"CASE WHEN e.embedding[${j + 1}] > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")
    // dequantized component + folds, as in IvfOracle.sq8Sql
    def dq(alias: String, i: Int): String =
      s"CAST(CAST(FLOOR(CAST($alias.embedding[$i] AS DOUBLE)*$scale + 0.5)/$scale" +
        s" AS FLOAT) AS DOUBLE)"
    val qdot = (1 to d).map(i => s"${dq("e", i)}*CAST(qe.embedding[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")
    val n2q8 = (1 to d).map(i => s"${dq("e", i)}*${dq("e", i)}")
      .mkString("(", " + ", ")")
    s"""codes AS (SELECT e.vec_id AS id, $codeExpr AS code FROM embeddings e),
       |${EmbOracle.nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qc AS (SELECT q.qid, c.code AS qcode FROM q JOIN codes c ON c.id = q.qid),
       |t1c AS (SELECT qc.qid, c.id,
       |    bit_count(xor(c.code, qc.qcode)) AS ham
       |  FROM codes c CROSS JOIN qc),
       |t1 AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY ham ASC, id ASC) AS rn
       |    FROM t1c) WHERE rn <= $rerank1),
       |q8n AS (SELECT e.vec_id, $n2q8 AS n2q8 FROM embeddings e),
       |t2c AS (SELECT s.qid, s.id,
       |    $qdot / (${fn("q8.n2q8")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM t1 s
       |  JOIN embeddings e ON e.vec_id = s.id
       |  JOIN embeddings qe ON qe.vec_id = s.qid
       |  JOIN q8n q8 ON q8.vec_id = s.id
       |  JOIN nrm nq2 ON nq2.vec_id = s.qid),
       |t2 AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM t2c) WHERE rn <= $rerank2)""".stripMargin
  }

  /**
   * The cascade's bandwidth ledger ([[graft.operators.Cascade.metrics]]):
   * end-to-end recall against the exact top-k plus exact per-tier byte
   * counts — tier 1 8 bytes per (query, vector) pair, tier 2 d bytes per
   * tier-1 survivor, tier 3 4d bytes per tier-2 survivor — and the
   * saving vs the brute 4d*N*Q baseline.
   */
  def cascadeMetricsSql(d: Int, nq: Int, k: Int, scaleLog2: Int,
                        rerank1: Int, rerank2: Int): String = {
    val bFull = 4L * d
    val denom = OracleGen.dlit((bFull * nq).toDouble)
    s"""WITH ${cascadeCtes(d, nq, scaleLog2, rerank1, rerank2)},
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM t2 r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |fin AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |    FROM scored) WHERE rnk <= $k),
       |bt AS (SELECT qid, id FROM (${EmbOracle.bruteSql(d, nq, k)})),
       |h AS (SELECT COUNT(*) AS hits FROM fin JOIN bt
       |  ON bt.qid = fin.qid AND bt.id = fin.id),
       |n AS (SELECT COUNT(*) AS n_total FROM embeddings),
       |m1 AS (SELECT COUNT(*) AS fetched_mid FROM t1),
       |m2 AS (SELECT COUNT(*) AS fetched_full FROM t2)
       |SELECT CAST(h.hits AS BIGINT) AS hits,
       |  CAST(h.hits AS DOUBLE) / ${k * nq} AS recall,
       |  CAST(n.n_total * $nq AS BIGINT) AS cand,
       |  CAST(m1.fetched_mid AS BIGINT) AS fetched_mid,
       |  CAST(m2.fetched_full AS BIGINT) AS fetched_full,
       |  CAST(n.n_total * ${8L * nq} AS BIGINT) AS bytes_t1,
       |  CAST(m1.fetched_mid * $d AS BIGINT) AS bytes_t2,
       |  CAST(m2.fetched_full * $bFull AS BIGINT) AS bytes_t3,
       |  1.0 - (CAST(n.n_total * ${8L * nq} + m1.fetched_mid * $d +
       |              m2.fetched_full * $bFull AS DOUBLE) /
       |         (CAST(n.n_total AS DOUBLE) * $denom)) AS save
       |FROM h, n, m1, m2""".stripMargin
  }

  /** Cell-centroid literal for (g, j), float-cast like the engine. */
  private def cc(g: Int, j: Int): String =
    s"CAST(CAST(${OracleGen.dlit(Ivf.centroidComponent(g, j))} AS FLOAT) AS DOUBLE)"

  /**
   * Multi-word BQ at realistic width over the SYNTHESIZED fixture domain
   * ([[graft.operators.Bq.topkWide]] on `Fixture.fp16VectorsModCached`):
   * long-form (key, j, v) synthesis like [[RefineOracle]], sign words as
   * exact integer sums of per-bit literals grouped by word (bit 63's
   * 1L<<63 term is the negative two's-complement literal, exactly like
   * [[bqSql]]), per-word popcount Hamming, rerank cut, exact cosine
   * rescore (fp16-exact dyadic sums — order-independent, so SQL SUM
   * equals the engine's codegen fold bit-for-bit).
   */
  def bqWideSql(d: Int, nq: Int, k: Int, rerank: Int, keyMod: Int): String = {
    val words = (d + 63) / 64
    val bitsValues = (0 until d)
      .map(j => s"($j, CAST(${1L << (j % 64)} AS BIGINT))").mkString(",")
    // CAST the SUM back to BIGINT: DuckDB widens SUM(BIGINT) to HUGEINT,
    // and xor/bit_count over int128 operate on a different bit pattern
    // for negative words (the engine's word is 64-bit two's complement)
    val cwCols = (0 until words).map { w =>
      s"CAST(SUM(CASE WHEN vd.j >= ${64 * w} AND vd.j < ${64 * (w + 1)}" +
        s" AND vd.v > 0 THEN b.bitval ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS c_$w"
    }.mkString(",\n  ")
    val qCols = (0 until words).map(w => s"cw.c_$w AS q_$w").mkString(", ")
    // DuckDB's bit_count returns a 1-byte int (C int8_t): two words'
    // popcounts can sum past 127, so widen each term before adding
    val hamExpr = (0 until words)
      .map(w => s"CAST(bit_count(xor(cw.c_$w, qc.q_$w)) AS INTEGER)")
      .mkString("(", " + ", ")")
    s"""WITH ${OracleGen.keysAndDims(d, keyMod)},
       |vd AS (SELECT key, j, CAST(${OracleGen.fp16Comp} AS DOUBLE) AS v
       |  FROM keys CROSS JOIN dims),
       |bits AS (SELECT j, bitval FROM (VALUES $bitsValues) AS t(j, bitval)),
       |cw AS (SELECT vd.key, $cwCols
       |  FROM vd JOIN bits b ON b.j = vd.j GROUP BY vd.key),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qc AS (SELECT qk.qkey, $qCols FROM qk JOIN cw ON cw.key = qk.qkey),
       |nv AS (SELECT key, SUM(v*v) AS n2 FROM vd GROUP BY key),
       |cheap AS (SELECT qc.qkey AS qid, cw.key AS id, $hamExpr AS ham
       |  FROM cw CROSS JOIN qc),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY ham ASC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |pair AS (SELECT qd.qkey AS qid, vd.key AS id, SUM(qd.qv*vd.v) AS dxq
       |  FROM qd JOIN vd ON qd.j = vd.j GROUP BY 1, 2),
       |scored AS (SELECT r.qid, r.id,
       |    p.dxq / (${fn("nv.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r JOIN pair p ON p.qid = r.qid AND p.id = r.id
       |  JOIN nv ON nv.key = r.id
       |  JOIN nv nq2 ON nq2.key = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * The cascade at REALISTIC width over the SYNTHESIZED fixture domain
   * ([[graft.operators.Cascade.topkWide]] on `Fixture.fp16VectorsModCached`):
   * [[bqWideSql]]'s multi-word sign-code tier 1, an int8-dequant mid
   * tier (the exact dyadic k/2^s of [[IvfOracle.sq8Sql]], here as a SUM
   * over (key, j) rows — dequant products have <= 19 significant bits
   * on a bounded exponent range, so the unordered SUM is exact and
   * equals the engine's ordered fold bit-for-bit, the same argument as
   * this file's fp16 rescore SUMs), and the exact cosine rescore.
   */
  def cascadeWideSql(d: Int, nq: Int, k: Int, scaleLog2: Int,
                     rerank1: Int, rerank2: Int, keyMod: Int): String = {
    val words = (d + 63) / 64
    val scale = math.pow(2.0, scaleLog2)
    val bitsValues = (0 until d)
      .map(j => s"($j, CAST(${1L << (j % 64)} AS BIGINT))").mkString(",")
    val cwCols = (0 until words).map { w =>
      s"CAST(SUM(CASE WHEN vd.j >= ${64 * w} AND vd.j < ${64 * (w + 1)}" +
        s" AND vd.v > 0 THEN b.bitval ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS c_$w"
    }.mkString(",\n  ")
    val qCols = (0 until words).map(w => s"cw.c_$w AS q_$w").mkString(", ")
    val hamExpr = (0 until words)
      .map(w => s"CAST(bit_count(xor(cw.c_$w, qc.q_$w)) AS INTEGER)")
      .mkString("(", " + ", ")")
    s"""WITH ${OracleGen.keysAndDims(d, keyMod)},
       |vd AS (SELECT key, j, CAST(${OracleGen.fp16Comp} AS DOUBLE) AS v
       |  FROM keys CROSS JOIN dims),
       |bits AS (SELECT j, bitval FROM (VALUES $bitsValues) AS t(j, bitval)),
       |cw AS (SELECT vd.key, $cwCols
       |  FROM vd JOIN bits b ON b.j = vd.j GROUP BY vd.key),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qc AS (SELECT qk.qkey, $qCols FROM qk JOIN cw ON cw.key = qk.qkey),
       |t1c AS (SELECT qc.qkey AS qid, cw.key AS id, $hamExpr AS ham
       |  FROM cw CROSS JOIN qc),
       |t1 AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY ham ASC, id ASC) AS rn
       |    FROM t1c) WHERE rn <= $rerank1),
       |dqd AS (SELECT key, j,
       |    CAST(CAST(FLOOR(v*$scale + 0.5)/$scale AS FLOAT) AS DOUBLE) AS dq
       |  FROM vd),
       |q8n AS (SELECT key, SUM(dq*dq) AS n2q8 FROM dqd GROUP BY key),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |nqt AS (SELECT qkey, SUM(qv*qv) AS nq2 FROM qd GROUP BY qkey),
       |mpair AS (SELECT qd.qkey AS qid, dqd.key AS id, SUM(qd.qv*dqd.dq) AS dpq
       |  FROM qd JOIN dqd ON qd.j = dqd.j GROUP BY 1, 2),
       |t2c AS (SELECT r.qid, r.id,
       |    p.dpq / (${fn("q8.n2q8")} * ${fn("nqt.nq2")}) AS s_hat
       |  FROM t1 r JOIN mpair p ON p.qid = r.qid AND p.id = r.id
       |  JOIN q8n q8 ON q8.key = r.id
       |  JOIN nqt ON nqt.qkey = r.qid),
       |t2 AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM t2c) WHERE rn <= $rerank2),
       |nv AS (SELECT key, SUM(v*v) AS n2 FROM vd GROUP BY key),
       |pair AS (SELECT qd.qkey AS qid, vd.key AS id, SUM(qd.qv*vd.v) AS dxq
       |  FROM qd JOIN vd ON qd.j = vd.j GROUP BY 1, 2),
       |scored AS (SELECT r.qid, r.id,
       |    p.dxq / (${fn("nv.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM t2 r JOIN pair p ON p.qid = r.qid AND p.id = r.id
       |  JOIN nv ON nv.key = r.id
       |  JOIN nv nq2 ON nq2.key = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * RESIDUAL IVF-PQ at realistic width over the SYNTHESIZED fixture
   * domain ([[graft.operators.Pq.topkResidual]] on
   * `Fixture.fp16VectorsModCached` slices): the fully-RELATIONAL long
   * form of [[topkResidualSql]] — at D=1024 the column-indexed form
   * would embed ~20k wide expressions, so instead the coarse centroids
   * and PQ codebook are generated as (index, component) relations from
   * their integer-mod hash formulas (`Ivf.centroidComponent`,
   * [[Pq.component]] — note m*sub + j' is just the global dim index, so
   * the codebook is (code, j)-addressable), and every fold becomes a SUM
   * over exact dyadic products (order-independent, engine-identical).
   * The residual keeps the engine's ONE rounding step:
   * r = CAST(v - c AS FLOAT).
   */
  def topkResidualWideSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                          mSub: Int, codes: Int, rerank: Int,
                          keyMod: Int): String = {
    val sub = d / mSub
    val aMul = graft.operators.Dedup.AMul
    val p = 2147483647L
    val cellsValues = (0 until nCells).map(g => s"($g)").mkString(",")
    val codesValues = (0 until codes).map(c => s"($c)").mkString(",")
    // exact dyadic components from the hash formulas (k/512 and k/2048
    // are float-exact, so the engine's FLOAT literal cast is a no-op)
    val ccomp = s"CAST(((g*$aMul + (j+1)*48271) % $p) % 1024 - 512 AS DOUBLE)/512.0"
    val cbcomp = s"CAST(((code*$aMul + (j+1)*48271 + 1299709) % $p) % 1024 - 512 AS DOUBLE)/2048.0"
    s"""WITH ${OracleGen.keysAndDims(d, keyMod)},
       |vd AS (SELECT key, j, CAST(${OracleGen.fp16Comp} AS DOUBLE) AS v
       |  FROM keys CROSS JOIN dims),
       |cells AS (SELECT g FROM (VALUES $cellsValues) AS t(g)),
       |ccomp AS (SELECT g, j, $ccomp AS c FROM cells CROSS JOIN dims),
       |pqcomp AS (SELECT code, j, (j // $sub) AS m, $cbcomp AS cb
       |  FROM (VALUES $codesValues) AS t(code) CROSS JOIN dims),
       |celld AS (SELECT vd.key, cc.g, SUM((vd.v - cc.c)*(vd.v - cc.c)) AS d2
       |  FROM vd JOIN ccomp cc ON cc.j = vd.j GROUP BY 1, 2),
       |asg AS (SELECT key, g AS cell FROM (
       |    SELECT key, g,
       |      row_number() OVER (PARTITION BY key ORDER BY d2 ASC, g ASC) AS rn
       |    FROM celld) WHERE rn = 1),
       |rvd AS (SELECT vd.key, vd.j, (vd.j // $sub) AS m, a.cell,
       |    CAST(CAST(vd.v - cc.c AS FLOAT) AS DOUBLE) AS r
       |  FROM vd JOIN asg a ON a.key = vd.key
       |  JOIN ccomp cc ON cc.g = a.cell AND cc.j = vd.j),
       |pqd AS (SELECT rv.key, rv.m, pc.code,
       |    SUM((rv.r - pc.cb)*(rv.r - pc.cb)) AS d2
       |  FROM rvd rv JOIN pqcomp pc ON pc.j = rv.j GROUP BY 1, 2, 3),
       |enc AS (SELECT key, m, code FROM (
       |    SELECT key, m, code,
       |      row_number() OVER (PARTITION BY key, m ORDER BY d2 ASC, code ASC) AS rn
       |    FROM pqd) WHERE rn = 1),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |nqt AS (SELECT qkey, SUM(qv*qv) AS nq2 FROM qd GROUP BY qkey),
       |qcelld AS (SELECT qd.qkey, cc.g, SUM((qd.qv - cc.c)*(qd.qv - cc.c)) AS d2
       |  FROM qd JOIN ccomp cc ON cc.j = qd.j GROUP BY 1, 2),
       |qp AS (SELECT qkey, g AS cell FROM (
       |    SELECT qkey, g,
       |      row_number() OVER (PARTITION BY qkey ORDER BY d2 ASC, g ASC) AS pr
       |    FROM qcelld) WHERE pr <= $nprobe),
       |qcdot AS (SELECT qd.qkey, cc.g, SUM(qd.qv * cc.c) AS qc
       |  FROM qd JOIN ccomp cc ON cc.j = qd.j GROUP BY 1, 2),
       |adc AS (SELECT qd.qkey, pc.m, pc.code, SUM(qd.qv * pc.cb) AS t
       |  FROM qd JOIN pqcomp pc ON pc.j = qd.j GROUP BY 1, 2, 3),
       |celln2 AS (SELECT g, SUM(c*c) AS n2c FROM ccomp GROUP BY g),
       |cbn2 AS (SELECT m, code, SUM(cb*cb) AS n2cb FROM pqcomp GROUP BY 1, 2),
       |crossd AS (SELECT cc.g, pc.m, pc.code, SUM(cc.c * pc.cb) AS cx
       |  FROM ccomp cc JOIN pqcomp pc ON pc.j = cc.j GROUP BY 1, 2, 3),
       |cand AS (SELECT qp.qkey, s.key, s.cell
       |  FROM qp JOIN asg s ON s.cell = qp.cell),
       |num AS (SELECT c.qkey, c.key, SUM(a.t) AS tsum,
       |    SUM(2.0*x.cx + b.n2cb) AS rterm
       |  FROM cand c JOIN enc e ON e.key = c.key
       |  JOIN adc a ON a.qkey = c.qkey AND a.m = e.m AND a.code = e.code
       |  JOIN crossd x ON x.g = c.cell AND x.m = e.m AND x.code = e.code
       |  JOIN cbn2 b ON b.m = e.m AND b.code = e.code
       |  GROUP BY 1, 2),
       |cheap AS (SELECT n.qkey AS qid, n.key AS id,
       |    (q1.qc + n.tsum) /
       |      (${fn("c2.n2c + n.rterm")} * ${fn("nqt.nq2")}) AS s_hat
       |  FROM num n
       |  JOIN cand cd ON cd.qkey = n.qkey AND cd.key = n.key
       |  JOIN qcdot q1 ON q1.qkey = n.qkey AND q1.g = cd.cell
       |  JOIN celln2 c2 ON c2.g = cd.cell
       |  JOIN nqt ON nqt.qkey = n.qkey),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |nv AS (SELECT key, SUM(v*v) AS nx2 FROM vd GROUP BY key),
       |pair AS (SELECT qd.qkey AS qid, vd.key AS id, SUM(qd.qv*vd.v) AS dxq
       |  FROM qd JOIN vd ON qd.j = vd.j GROUP BY 1, 2),
       |scored AS (SELECT r.qid, r.id,
       |    p.dxq / (${fn("nv.nx2")} * ${fn("nqt.nq2")}) AS score
       |  FROM rr r JOIN pair p ON p.qid = r.qid AND p.id = r.id
       |  JOIN nv ON nv.key = r.id
       |  JOIN nqt ON nqt.qkey = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * RESIDUAL IVF-PQ mirror ([[graft.operators.Pq.topkResidual]]): the
   * residual elements r_j = CAST((x_j as double) - c_cell_j AS FLOAT)
   * are materialized as columns with the SAME single rounding step the
   * engine performs, codes are the argmin folds over those columns, and
   * the cheap score adds the per-cell dot(q, c_cell) fold and the exact
   * dyadic reconstruction-norm literals selected by (cell, code_m).
   */
  def topkResidualSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                      mSub: Int, codes: Int, rerank: Int): String =
    residualSqlCore(d, nq, k, nCells, nprobe, mSub, codes, rerank,
      (alias, j) => s"CAST($alias.embedding[${j + 1}] AS DOUBLE)")

  /**
   * Twin of [[graft.operators.Pq.topkResidualOpq]] — the composed
   * "OPQ,IVF,PQ" string: [[topkResidualSql]]'s pipeline with every
   * ENCODE-side component access routed through the fixed signed
   * permutation (sign_j * embedding[perm_j], negation float-exact);
   * norms and the exact rescore stay on the original vectors, the
   * [[topkPermutedSql]] discipline.
   */
  def topkResidualOpqSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                         mSub: Int, codes: Int, rerank: Int): String = {
    val (perm, sign) = Pq.permutation(d)
    residualSqlCore(d, nq, k, nCells, nprobe, mSub, codes, rerank,
      (alias, j) => {
        val neg = if (sign(j) < 0) "-" else ""
        s"${neg}CAST($alias.embedding[${perm(j) + 1}] AS DOUBLE)"
      })
  }

  /** [[topkResidualSql]] with transformed-space component rendering
    * `tc(alias, j)` (identity for the plain residual rung). */
  private def residualSqlCore(d: Int, nq: Int, k: Int, nCells: Int,
                              nprobe: Int, mSub: Int, codes: Int, rerank: Int,
                              tc: (String, Int) => String): String = {
    val sub = d / mSub
    def cellDistExpr(cell: Int): String =
      (0 until d).map { j =>
        val c = cc(cell, j)
        s"(${tc("e", j)} - $c)*(${tc("e", j)} - $c)"
      }.mkString("(", " + ", ")")
    val distCols = (0 until nCells)
      .map(c => s"${cellDistExpr(c)} AS c$c").mkString(",\n  ")
    val leastExpr = "LEAST(" + (0 until nCells).map(c => s"c$c").mkString(", ") + ")"
    val argmin = "CASE " + (0 until nCells)
      .map(c => s"WHEN c$c = m THEN $c").mkString(" ") + " END"
    val probeCase = "CASE t.cell " + (0 until nCells)
      .map(c => s"WHEN $c THEN a.c$c").mkString(" ") + " END"
    val cellsValues = (0 until nCells).map(c => s"($c)").mkString(",")
    // residual columns r1..rd: one float-rounding step, cell-selected
    val rCols = (0 until d).map { j =>
      val cellCase = "CASE a.cell " + (0 until nCells)
        .map(g => s"WHEN $g THEN ${cc(g, j)}").mkString(" ") + " END"
      s"CAST(CAST(${tc("e", j)} - ($cellCase) AS FLOAT) AS DOUBLE) AS r${j + 1}"
    }.mkString(",\n  ")
    def subDistExprR(m: Int, c: Int): String =
      (0 until sub).map { j =>
        val x = s"rv.r${m * sub + j + 1}"
        s"($x - ${cb(m, c, j, sub)})*($x - ${cb(m, c, j, sub)})"
      }.mkString("(", " + ", ")")
    val pqDistCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${subDistExprR(m, c)} AS d_${m}_$c").mkString(",\n  ")
    val codeCols = (0 until mSub).map { m =>
      val least0 = "LEAST(" +
        (0 until codes).map(c => s"d_${m}_$c").mkString(", ") + ")"
      s"CASE " + (0 until codes)
        .map(c => s"WHEN d_${m}_$c = $least0 THEN $c").mkString(" ") +
        s" END AS code_$m"
    }.mkString(",\n  ")
    def adcExprT(m: Int, c: Int): String =
      (0 until sub).map { j =>
        s"${tc("qe", m * sub + j)}*${cb(m, c, j, sub)}"
      }.mkString("(", " + ", ")")
    val adcCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${adcExprT(m, c)} AS t_${m}_$c").mkString(",\n  ")
    // per-cell dot(q, c_cell) folds on the query side
    val qcCols = (0 until nCells).map { g =>
      (0 until d).map { j =>
        s"${tc("qe", j)}*${cc(g, j)}"
      }.mkString("(", " + ", ")") + s" AS qc_$g"
    }.mkString(",\n  ")
    val qcCase = "CASE en.cell " + (0 until nCells)
      .map(g => s"WHEN $g THEN qt.qc_$g").mkString(" ") + " END"
    val pickSum = (0 until mSub).map { m =>
      "CASE en.code_" + m + " " + (0 until codes)
        .map(c => s"WHEN $c THEN qt.t_${m}_$c").mkString(" ") + " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    val n2cellCase = "CASE en.cell " + (0 until nCells)
      .map(g => s"WHEN $g THEN ${OracleGen.dlit(Pq.cellN2(g, d))}")
      .mkString(" ") + " END"
    val n2termSum = (0 until mSub).map { m =>
      "CASE en.cell*" + codes + " + en.code_" + m + " " +
        (for (g <- 0 until nCells; c <- 0 until codes)
          yield s"WHEN ${g * codes + c} THEN " +
            OracleGen.dlit(Pq.reconN2Term(g, m, c, sub))).mkString(" ") +
        " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH asg0 AS (SELECT e.vec_id, $distCols FROM embeddings e),
       |asg AS (SELECT vec_id, $argmin AS cell
       |        FROM (SELECT *, $leastExpr AS m FROM asg0)),
       |${EmbOracle.nrmCte(d)},
       |rv AS (SELECT e.vec_id, a.cell, $rCols
       |  FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
       |pqd AS (SELECT rv.vec_id, rv.cell, $pqDistCols FROM rv),
       |enc AS (SELECT vec_id, cell, $codeCols FROM pqd),
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qt AS (SELECT q.qid, $qcCols,
       |  $adcCols
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid),
       |qp0 AS (SELECT q.qid, t.cell, $probeCase AS d2
       |  FROM q JOIN asg0 a ON a.vec_id = q.qid
       |  CROSS JOIN (VALUES $cellsValues) AS t(cell)),
       |qp AS (SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |      row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cell ASC) AS pr
       |    FROM qp0) WHERE pr <= $nprobe),
       |cand AS (SELECT qp.qid, en.vec_id AS id, en.cell,
       |    ${(0 until mSub).map(m => s"en.code_$m").mkString(", ")}
       |  FROM qp JOIN enc en ON en.cell = qp.cell),
       |cheap AS (SELECT en.qid, en.id,
       |    (($qcCase) + $pickSum) /
       |      (${fn(s"(($n2cellCase) + $n2termSum)")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM cand en
       |  JOIN qt ON qt.qid = en.qid
       |  JOIN nrm nq2 ON nq2.vec_id = en.qid),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * Twin of [[graft.operators.Pq.topkSphericalResidual]] (and its
   * at-rest twin — identical semantics): the spherical unit centroids
   * re-derived relationally ([[IvfOracle.kmeansSphericalStepSql]]),
   * float-rounded once (`uf`), then every stage of the composed rung —
   * angular assignment/probing, residual float-rounding, dyadic-PQ
   * argmin, the ADC cosine estimate with its derived constants
   * (|u|^2, 2·crossdot + |cb|^2) — expressed as `list_reduce` folds in
   * the engine's exact j-/m-order over the same doubles. The dyadic PQ
   * codebook enters as a (m, c, j, comp) VALUES relation of exact
   * literals.
   */
  def sphericalResidualSql(d: Int, nq: Int, k: Int, nCells: Int,
                           nprobe: Int, mSub: Int, codes: Int,
                           rerank: Int, excludeMod: Int = 0,
                           updatedNegMod: Int = 0,
                           sampleEvery: Int = 1): String = {
    if (updatedNegMod > 0)
      require(excludeMod == 0,
        "updatedNegMod composes with the plain pipeline only")
    val sub = d / mSub
    // merge-on-read deletes cut CANDIDATES (before the rerank cut) while
    // the trained units and assignment stay stale — the engine's shape
    val excl = if (excludeMod <= 0) ""
      else s"\n  WHERE en.vec_id % $excludeMod <> 0"
    // merge-on-read UPSERT: candidate-side vectors updated to -v for
    // vec_id ≡ 0 mod `updatedNegMod` (negation float-exact,
    // norm-preserving — the nrm CTE stays valid); the model (skm/uf)
    // trains on the ORIGINAL corpus — stale, the engine's contract.
    // Queries stay untouched (qsd/adc read the raw embeddings).
    def tcJ(idx: String): String =
      if (updatedNegMod <= 0) s"CAST(e.embedding[$idx] AS DOUBLE)"
      else s"(CASE WHEN e.vec_id % $updatedNegMod = 0" +
        s" THEN -CAST(e.embedding[$idx] AS DOUBLE)" +
        s" ELSE CAST(e.embedding[$idx] AS DOUBLE) END)"
    val rescoreDot = (1 to d).map(i =>
      s"${tcJ(i.toString)}*CAST(qe.embedding[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")
    val pqcRows = (for (m <- 0 until mSub; c <- 0 until codes;
                        i <- 0 until sub)
      yield s"($m, $c, ${m * sub + i + 1}, " +
        s"${OracleGen.dlit(Pq.component(m, c, i, sub))})").mkString(", ")
    val cbnRows = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"($m, $c, ${OracleGen.dlit(Pq.centroidN2(m, c, sub))})")
      .mkString(", ")
    s"""WITH skm AS MATERIALIZED (SELECT * FROM (${IvfOracle.kmeansSphericalStepSql(d, nCells, sampleEvery)})),
       |uf AS MATERIALIZED (SELECT cell, j,
       |    CAST(CAST(unit AS FLOAT) AS DOUBLE) AS u FROM skm),
       |${EmbOracle.nrmCte(d)},
       |pqc(m, c, j, comp) AS (VALUES $pqcRows),
       |cbn(m, c, n2) AS (VALUES $cbnRows),
       |scd AS MATERIALIZED (SELECT e.vec_id, uf.cell,
       |    list_reduce(list(${tcJ("uf.j")} * uf.u
       |      ORDER BY uf.j), (a, v) -> a + v) AS sd
       |  FROM embeddings e CROSS JOIN uf GROUP BY e.vec_id, uf.cell),
       |sasg AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sd DESC, cell ASC) AS rn
       |  FROM scd) t WHERE t.rn = 1),
       |rsd AS MATERIALIZED (SELECT e.vec_id, a.cell, uf.j,
       |    CAST(CAST(${tcJ("uf.j")} - uf.u AS FLOAT) AS DOUBLE) AS rv
       |  FROM embeddings e JOIN sasg a ON a.vec_id = e.vec_id
       |  JOIN uf ON uf.cell = a.cell),
       |pqd AS MATERIALIZED (SELECT r.vec_id, r.cell, p.m, p.c,
       |    list_reduce(list((r.rv - p.comp)*(r.rv - p.comp) ORDER BY r.j),
       |      (a, v) -> a + v) AS d2
       |  FROM rsd r JOIN pqc p ON p.j = r.j
       |  GROUP BY r.vec_id, r.cell, p.m, p.c),
       |enc AS MATERIALIZED (SELECT vec_id, cell, m, c AS code FROM (
       |    SELECT vec_id, cell, m, c,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, c ASC) AS rn
       |    FROM pqd) t WHERE t.rn = 1),
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qsd AS MATERIALIZED (SELECT q.qid, uf.cell,
       |    list_reduce(list(CAST(qe.embedding[uf.j] AS DOUBLE) * uf.u
       |      ORDER BY uf.j), (a, v) -> a + v) AS sd
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid
       |  CROSS JOIN uf GROUP BY q.qid, uf.cell),
       |qp AS (SELECT qid, cell, sd FROM (SELECT c.qid, c.cell, c.sd,
       |    row_number() OVER (PARTITION BY c.qid ORDER BY c.sd DESC, c.cell ASC) AS pr
       |  FROM qsd c) t WHERE t.pr <= $nprobe),
       |adc AS MATERIALIZED (SELECT q.qid, p.m, p.c,
       |    list_reduce(list(CAST(qe.embedding[p.j] AS DOUBLE) * p.comp
       |      ORDER BY p.j), (a, v) -> a + v) AS t
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid
       |  CROSS JOIN pqc p GROUP BY q.qid, p.m, p.c),
       |n2c AS (SELECT cell, list_reduce(list(u*u ORDER BY j),
       |    (a, v) -> a + v) AS v FROM uf GROUP BY cell),
       |crd AS (SELECT u.cell, p.m, p.c,
       |    list_reduce(list(u.u * p.comp ORDER BY u.j), (a, v) -> a + v) AS cd
       |  FROM uf u JOIN pqc p ON p.j = u.j GROUP BY u.cell, p.m, p.c),
       |rcn AS MATERIALIZED (SELECT crd.cell, crd.m, crd.c,
       |    2.0 * crd.cd + cb.n2 AS v
       |  FROM crd JOIN cbn cb ON cb.m = crd.m AND cb.c = crd.c),
       |chp AS MATERIALIZED (SELECT qp.qid, en.vec_id AS id, en.cell, qp.sd,
       |    list_reduce(list(ad.t ORDER BY en.m), (a, v) -> a + v) AS psum,
       |    list_reduce(list(rc.v ORDER BY en.m), (a, v) -> a + v) AS rsum
       |  FROM qp JOIN enc en ON en.cell = qp.cell
       |  JOIN adc ad ON ad.qid = qp.qid AND ad.m = en.m AND ad.c = en.code
       |  JOIN rcn rc ON rc.cell = en.cell AND rc.m = en.m AND rc.c = en.code$excl
       |  GROUP BY qp.qid, en.vec_id, en.cell, qp.sd),
       |cheap AS (SELECT c.qid, c.id,
       |    (c.sd + c.psum) / (${fn("n.v + c.rsum")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM chp c JOIN n2c n ON n.cell = c.cell
       |  JOIN nrm nq2 ON nq2.vec_id = c.qid),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    $rescoreDot /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * The composed cosine string at REALISTIC width
   * ([[graft.operators.Pq.topkSphericalResidual]] on
   * `Fixture.fp16VectorsModCached` slices — `q_ann_ivf_spherical_pq_d1024`):
   * [[sphericalResidualSql]]'s pipeline re-expressed over the
   * synthesized (key, j, v) relation the other wide oracles use
   * ([[topkResidualWideSql]]'s domain), because at D=1024 the
   * element-indexed form would embed ~20k-wide expression strings.
   *
   * Fold discipline (what must be ORDERED vs what may be a plain SUM):
   * products of two GRID values — fp16 components x dyadic centroid/
   * codebook components, or fp16 x fp16 — are exact in DOUBLE and so
   * are their sums (order-free: init assignment dots, ADC table, query
   * norms, rescore dots — the [[topkResidualWideSql]] argument). Any
   * fold involving the TRAINED units (arbitrary 24-bit floats after
   * the stored-codebook rounding) or the float-rounded residuals is
   * inexact and must replay the engine's j-order: `list_reduce(list(..
   * ORDER BY j))` for the unit norms, cross-dots, assignment/probe
   * dots, and PQ encode distances — exactly [[sphericalResidualSql]]'s
   * discipline. The init-centroid norms are the engine's driver-side
   * literals (exact sums + one correctly-rounded sqrt on both sides).
   */
  def sphericalResidualWideSql(d: Int, nq: Int, k: Int, nCells: Int,
                               nprobe: Int, mSub: Int, codes: Int,
                               rerank: Int, keyMod: Int): String = {
    val sub = d / mSub
    val aMul = graft.operators.Dedup.AMul
    val p = 2147483647L
    val cellsValues = (0 until nCells).map(g => s"($g)").mkString(",")
    val codesValues = (0 until codes).map(c => s"($c)").mkString(",")
    val cnormValues = (0 until nCells).map(g =>
      s"($g, ${OracleGen.dlit(graft.operators.Ivf.sphericalInitNorm(g, d))})")
      .mkString(", ")
    val ccomp = s"CAST(((g*$aMul + (j+1)*48271) % $p) % 1024 - 512 AS DOUBLE)/512.0"
    val cbcomp = s"CAST(((code*$aMul + (j+1)*48271 + 1299709) % $p) % 1024 - 512 AS DOUBLE)/2048.0"
    s"""WITH ${OracleGen.keysAndDims(d, keyMod)},
       |vd AS MATERIALIZED (SELECT key, j, CAST(${OracleGen.fp16Comp} AS DOUBLE) AS v
       |  FROM keys CROSS JOIN dims),
       |cells AS (SELECT g FROM (VALUES $cellsValues) AS t(g)),
       |ccomp AS (SELECT g, j, $ccomp AS c FROM cells CROSS JOIN dims),
       |cnorm(g, nrm) AS (VALUES $cnormValues),
       |pqcomp AS (SELECT code, j, (j // $sub) AS m, $cbcomp AS cb
       |  FROM (VALUES $codesValues) AS t(code) CROSS JOIN dims),
       |s0 AS (SELECT vd.key, cc.g, SUM(vd.v * cc.c) AS dp
       |  FROM vd JOIN ccomp cc ON cc.j = vd.j GROUP BY 1, 2),
       |sasg0 AS MATERIALIZED (SELECT key, g AS cell FROM (
       |    SELECT s0.key, s0.g,
       |      row_number() OVER (PARTITION BY s0.key
       |        ORDER BY s0.dp / cn.nrm DESC, s0.g ASC) AS rn
       |    FROM s0 JOIN cnorm cn ON cn.g = s0.g) t WHERE t.rn = 1),
       |smj AS MATERIALIZED (SELECT a.cell, vd.j, COUNT(*) AS n,
       |    SUM(vd.v) / CAST(COUNT(*) AS DOUBLE) AS mean
       |  FROM sasg0 a JOIN vd ON vd.key = a.key GROUP BY a.cell, vd.j),
       |sss AS (SELECT cell, list_reduce(list(mean * mean ORDER BY j),
       |    (acc, x) -> acc + x) AS ss FROM smj GROUP BY cell),
       |uf AS MATERIALIZED (SELECT smj.cell, smj.j,
       |    CAST(CAST(smj.mean / ${fn("sss.ss")} AS FLOAT) AS DOUBLE) AS u
       |  FROM smj JOIN sss ON sss.cell = smj.cell),
       |n2c AS (SELECT cell, list_reduce(list(u*u ORDER BY j),
       |    (acc, x) -> acc + x) AS v FROM uf GROUP BY cell),
       |cbn2 AS (SELECT m, code, SUM(cb*cb) AS n2cb FROM pqcomp GROUP BY 1, 2),
       |crd AS (SELECT u.cell, p.m, p.code,
       |    list_reduce(list(u.u * p.cb ORDER BY u.j), (acc, x) -> acc + x) AS cd
       |  FROM uf u JOIN pqcomp p ON p.j = u.j GROUP BY u.cell, p.m, p.code),
       |rcn AS MATERIALIZED (SELECT crd.cell, crd.m, crd.code,
       |    2.0 * crd.cd + cb.n2cb AS v
       |  FROM crd JOIN cbn2 cb ON cb.m = crd.m AND cb.code = crd.code),
       |scd AS MATERIALIZED (SELECT vd.key, uf.cell,
       |    list_reduce(list(vd.v * uf.u ORDER BY uf.j), (acc, x) -> acc + x) AS sd
       |  FROM vd JOIN uf ON uf.j = vd.j GROUP BY vd.key, uf.cell),
       |sasg AS MATERIALIZED (SELECT key, cell FROM (SELECT key, cell,
       |    row_number() OVER (PARTITION BY key ORDER BY sd DESC, cell ASC) AS rn
       |  FROM scd) t WHERE t.rn = 1),
       |rvd AS MATERIALIZED (SELECT vd.key, vd.j, a.cell,
       |    CAST(CAST(vd.v - u.u AS FLOAT) AS DOUBLE) AS rv
       |  FROM vd JOIN sasg a ON a.key = vd.key
       |  JOIN uf u ON u.cell = a.cell AND u.j = vd.j),
       |pqd AS MATERIALIZED (SELECT r.key, r.cell, p.m, p.code,
       |    list_reduce(list((r.rv - p.cb)*(r.rv - p.cb) ORDER BY r.j),
       |      (acc, x) -> acc + x) AS d2
       |  FROM rvd r JOIN pqcomp p ON p.j = r.j
       |  GROUP BY r.key, r.cell, p.m, p.code),
       |enc AS MATERIALIZED (SELECT key, cell, m, code FROM (
       |    SELECT key, cell, m, code,
       |      row_number() OVER (PARTITION BY key, m ORDER BY d2 ASC, code ASC) AS rn
       |    FROM pqd) t WHERE t.rn = 1),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |nqt AS (SELECT qkey, SUM(qv*qv) AS nq2 FROM qd GROUP BY qkey),
       |qsd AS MATERIALIZED (SELECT q.qkey, uf.cell,
       |    list_reduce(list(q.qv * uf.u ORDER BY uf.j), (acc, x) -> acc + x) AS sd
       |  FROM qd q JOIN uf ON uf.j = q.j GROUP BY q.qkey, uf.cell),
       |qp AS (SELECT qkey, cell, sd FROM (SELECT qkey, cell, sd,
       |    row_number() OVER (PARTITION BY qkey ORDER BY sd DESC, cell ASC) AS pr
       |  FROM qsd) t WHERE t.pr <= $nprobe),
       |adc AS MATERIALIZED (SELECT q.qkey, p.m, p.code, SUM(q.qv * p.cb) AS t
       |  FROM qd q JOIN pqcomp p ON p.j = q.j GROUP BY q.qkey, p.m, p.code),
       |chp AS MATERIALIZED (SELECT qp.qkey, en.key AS id, en.cell, qp.sd,
       |    list_reduce(list(ad.t ORDER BY en.m), (acc, x) -> acc + x) AS psum,
       |    list_reduce(list(rc.v ORDER BY en.m), (acc, x) -> acc + x) AS rsum
       |  FROM qp JOIN enc en ON en.cell = qp.cell
       |  JOIN adc ad ON ad.qkey = qp.qkey AND ad.m = en.m AND ad.code = en.code
       |  JOIN rcn rc ON rc.cell = en.cell AND rc.m = en.m AND rc.code = en.code
       |  GROUP BY qp.qkey, en.key, en.cell, qp.sd),
       |cheap AS (SELECT c.qkey AS qid, c.id,
       |    (c.sd + c.psum) / (${fn("n.v + c.rsum")} * ${fn("nqt.nq2")}) AS s_hat
       |  FROM chp c JOIN n2c n ON n.cell = c.cell
       |  JOIN nqt ON nqt.qkey = c.qkey),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) t WHERE t.rn <= $rerank),
       |nv AS (SELECT key, SUM(v*v) AS n2 FROM vd GROUP BY key),
       |pair AS (SELECT r.qid, r.id, SUM(qd.qv * vd.v) AS dp
       |  FROM rr r JOIN qd ON qd.qkey = r.qid
       |  JOIN vd ON vd.key = r.id AND vd.j = qd.j
       |  GROUP BY r.qid, r.id),
       |scored AS (SELECT p2.qid, p2.id,
       |    p2.dp / (${fn("nv.n2")} * ${fn("nqt.nq2")}) AS score
       |  FROM pair p2 JOIN nv ON nv.key = p2.id
       |  JOIN nqt ON nqt.qkey = p2.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * IVF-PQ with the OPQ-style signed-permutation pre-transform
   * ([[graft.operators.Pq.topkPermuted]]): every candidate/query-side
   * component e.embedding[j] is replaced by sign_j * e.embedding[perm_j]
   * (negation is float-exact), the coarse/PQ/ADC arithmetic runs in
   * transformed space, and the exact rescore stays on the ORIGINAL
   * vectors (the transform is orthogonal — cosine and norms invariant).
   */
  def topkPermutedSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                      mSub: Int, codes: Int, rerank: Int): String = {
    val sub = d / mSub
    val (perm, sign) = Pq.permutation(d)
    // transformed component t_j of alias's embedding, widened to DOUBLE
    def tc(alias: String, j: Int): String = {
      val neg = if (sign(j) < 0) "-" else ""
      s"${neg}CAST($alias.embedding[${perm(j) + 1}] AS DOUBLE)"
    }
    def cellDistExprT(cell: Int): String =
      (0 until d).map { j =>
        val c = cc(cell, j)
        s"(${tc("e", j)} - $c)*(${tc("e", j)} - $c)"
      }.mkString("(", " + ", ")")
    def subDistExprT(m: Int, c: Int): String =
      (0 until sub).map { j =>
        val x = tc("e", m * sub + j)
        s"($x - ${cb(m, c, j, sub)})*($x - ${cb(m, c, j, sub)})"
      }.mkString("(", " + ", ")")
    def adcExprT(m: Int, c: Int): String =
      (0 until sub).map { j =>
        s"${tc("qe", m * sub + j)}*${cb(m, c, j, sub)}"
      }.mkString("(", " + ", ")")
    val distCols = (0 until nCells)
      .map(c => s"${cellDistExprT(c)} AS c$c").mkString(",\n  ")
    val leastExpr = "LEAST(" + (0 until nCells).map(c => s"c$c").mkString(", ") + ")"
    val argmin = "CASE " + (0 until nCells)
      .map(c => s"WHEN c$c = m THEN $c").mkString(" ") + " END"
    val probeCase = "CASE t.cell " + (0 until nCells)
      .map(c => s"WHEN $c THEN a.c$c").mkString(" ") + " END"
    val cellsValues = (0 until nCells).map(c => s"($c)").mkString(",")
    val pqDistCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${subDistExprT(m, c)} AS d_${m}_$c").mkString(",\n  ")
    val codeCols = (0 until mSub).map { m =>
      val least0 = "LEAST(" +
        (0 until codes).map(c => s"d_${m}_$c").mkString(", ") + ")"
      s"CASE " + (0 until codes)
        .map(c => s"WHEN d_${m}_$c = $least0 THEN $c").mkString(" ") +
        s" END AS code_$m"
    }.mkString(",\n  ")
    val adcCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${adcExprT(m, c)} AS t_${m}_$c").mkString(",\n  ")
    val pickSum = (0 until mSub).map { m =>
      "CASE en.code_" + m + " " + (0 until codes)
        .map(c => s"WHEN $c THEN qt.t_${m}_$c").mkString(" ") + " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    val n2hatSum = (0 until mSub).map { m =>
      "CASE en.code_" + m + " " + (0 until codes)
        .map(c => s"WHEN $c THEN ${OracleGen.dlit(Pq.centroidN2(m, c, sub))}")
        .mkString(" ") + " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH asg0 AS (SELECT e.vec_id, $distCols FROM embeddings e),
       |asg AS (SELECT vec_id, $argmin AS cell
       |        FROM (SELECT *, $leastExpr AS m FROM asg0)),
       |${EmbOracle.nrmCte(d)},
       |pqd AS (SELECT e.vec_id, $pqDistCols FROM embeddings e),
       |enc AS (SELECT vec_id, $codeCols FROM pqd),
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qt AS (SELECT q.qid, $adcCols
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid),
       |qp0 AS (SELECT q.qid, t.cell, $probeCase AS d2
       |  FROM q JOIN asg0 a ON a.vec_id = q.qid
       |  CROSS JOIN (VALUES $cellsValues) AS t(cell)),
       |qp AS (SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |      row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cell ASC) AS pr
       |    FROM qp0) WHERE pr <= $nprobe),
       |cand AS (SELECT qp.qid, a.vec_id AS id
       |  FROM qp JOIN asg a ON a.cell = qp.cell),
       |cheap AS (SELECT c.qid, c.id,
       |    $pickSum / (${fn(s"($n2hatSum)")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM cand c
       |  JOIN enc en ON en.vec_id = c.id
       |  JOIN qt ON qt.qid = c.qid
       |  JOIN nrm nq2 ON nq2.vec_id = c.qid),
       |rr AS (SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * IVF-PQ under the TRAINED OPQ-lite pre-transform
   * ([[graft.operators.Pq.topkOpqTrained]]). The permutation is
   * DATA-DEPENDENT, so nothing about the transform can be baked as
   * literals: the oracle re-derives the per-dim variance keys with the
   * same id-ordered folds as the engine's [[graft.operators.TrainFold]]
   * (identical doubles → identical ranking → identical snake-draft
   * `pos ← src` map), and every transformed-space chain — coarse
   * distances, PQ encode distances, ADC entries, the m-ordered cheap
   * sums — becomes an ordered `list_reduce` over rows joined through
   * that map (same fold order as the engine's j-/m-ascending column
   * chains). Codebook/centroid constants ride in literal VALUES
   * tables; the exact rescore stays on the ORIGINAL vectors.
   */
  def opqTrainedTopkSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                        mSub: Int, codes: Int, rerank: Int,
                        sampleEvery: Int = 1): String = {
    val sub = d / mSub
    // sampled rotation training (sampleEvery > 1): the variance-stat
    // rows are cut to the counter-keyed sample — vrows feeds ONLY
    // vstats (tvec re-reads the full table), so the cut trains the
    // permutation and nothing else
    val trainPred = if (sampleEvery <= 1) ""
      else s"\n  WHERE e.vec_id % $sampleEvery = 0"
    // centroid table (cell, pos, cv) — positions are transformed-space
    val ctabVals = (for (c <- 0 until nCells; p <- 0 until d)
      yield s"($c, $p, ${cc(c, p)})").mkString(", ")
    // codebook table (m, code, j, cbv), j 0-based within the subspace
    val cbtVals = (for (m <- 0 until mSub; c <- 0 until codes;
                        j <- 0 until sub)
      yield s"($m, $c, $j, ${cb(m, c, j, sub)})").mkString(", ")
    // ||code||^2 table (m, code, n2v) — exact dyadic doubles
    val cn2Vals = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"($m, $c, ${OracleGen.dlit(Pq.centroidN2(m, c, sub))})")
      .mkString(", ")
    s"""WITH vrows AS MATERIALIZED (SELECT CAST(t.j AS INTEGER) AS j, e.vec_id,
       |    CAST(e.embedding[t.j] AS DOUBLE) AS x
       |  FROM embeddings e CROSS JOIN generate_series(1, $d) AS t(j)$trainPred),
       |vstats AS MATERIALIZED (SELECT j, COUNT(*) AS n,
       |    list_reduce(list(x ORDER BY vec_id), (a, v) -> a + v) AS s,
       |    list_reduce(list(x*x ORDER BY vec_id), (a, v) -> a + v) AS s2
       |  FROM vrows GROUP BY j),
       |rd AS (SELECT j - 1 AS src,
       |    row_number() OVER (
       |      ORDER BY (s2 - (s*s)/CAST(n AS DOUBLE)) DESC, j ASC) - 1 AS r0
       |  FROM vstats),
       |pmap AS MATERIALIZED (SELECT src, CAST(
       |    (CASE WHEN (r0 // $mSub) % 2 = 0 THEN r0 % $mSub
       |          ELSE ${mSub - 1} - (r0 % $mSub) END) * $sub + (r0 // $mSub)
       |    AS INTEGER) AS pos FROM rd),
       |tvec AS MATERIALIZED (SELECT e.vec_id, pm.pos,
       |    CAST(e.embedding[pm.src + 1] AS DOUBLE) AS tv
       |  FROM embeddings e CROSS JOIN pmap pm),
       |ctab AS (SELECT * FROM (VALUES $ctabVals) AS t(cell, pos, cv)),
       |cbt AS MATERIALIZED (SELECT * FROM (VALUES $cbtVals) AS t(m, code, j, cbv)),
       |cn2 AS (SELECT * FROM (VALUES $cn2Vals) AS t(m, code, n2v)),
       |asg0 AS MATERIALIZED (SELECT t.vec_id, c.cell,
       |    list_reduce(list((t.tv - c.cv)*(t.tv - c.cv) ORDER BY t.pos),
       |      (a, v) -> a + v) AS d2
       |  FROM tvec t JOIN ctab c ON c.pos = t.pos
       |  GROUP BY t.vec_id, c.cell),
       |asg AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
       |  FROM asg0) WHERE rn = 1),
       |pqd2 AS MATERIALIZED (SELECT t.vec_id, cb.m, cb.code,
       |    list_reduce(list((t.tv - cb.cbv)*(t.tv - cb.cbv) ORDER BY cb.j),
       |      (a, v) -> a + v) AS d2
       |  FROM tvec t JOIN cbt cb ON t.pos = cb.m * $sub + cb.j
       |  GROUP BY t.vec_id, cb.m, cb.code),
       |encr AS MATERIALIZED (SELECT vec_id, m, code FROM (SELECT vec_id, m, code,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
       |  FROM pqd2) WHERE rn = 1),
       |${EmbOracle.nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qp AS (SELECT qid, cell FROM (SELECT a.vec_id AS qid, a.cell,
       |    row_number() OVER (
       |      PARTITION BY a.vec_id ORDER BY a.d2 ASC, a.cell ASC) AS pr
       |  FROM asg0 a JOIN q ON a.vec_id = q.qid) WHERE pr <= $nprobe),
       |adc AS MATERIALIZED (SELECT q.qid, cb.m, cb.code,
       |    list_reduce(list(t.tv * cb.cbv ORDER BY cb.j), (a, v) -> a + v) AS ad
       |  FROM q JOIN tvec t ON t.vec_id = q.qid
       |  JOIN cbt cb ON t.pos = cb.m * $sub + cb.j
       |  GROUP BY q.qid, cb.m, cb.code),
       |cand AS (SELECT qp.qid, a.vec_id AS id FROM qp JOIN asg a ON a.cell = qp.cell),
       |cheap AS MATERIALIZED (SELECT c.qid, c.id,
       |    list_reduce(list(ad.ad ORDER BY en.m), (a, v) -> a + v) AS snum,
       |    list_reduce(list(cn2.n2v ORDER BY en.m), (a, v) -> a + v) AS n2hat
       |  FROM cand c
       |  JOIN encr en ON en.vec_id = c.id
       |  JOIN adc ad ON ad.qid = c.qid AND ad.m = en.m AND ad.code = en.code
       |  JOIN cn2 ON cn2.m = en.m AND cn2.code = en.code
       |  GROUP BY c.qid, c.id),
       |rr AS (SELECT qid, id FROM (
       |    SELECT ch.qid, ch.id,
       |      row_number() OVER (PARTITION BY ch.qid ORDER BY
       |        ch.snum / (${fn("ch.n2hat")} * ${fn("nq2.n2")}) DESC,
       |        ch.id ASC) AS rn
       |    FROM cheap ch JOIN nrm nq2 ON nq2.vec_id = ch.qid) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /**
   * The TRAINED composed production string — trained OPQ permutation +
   * IVF residual + PQ ([[graft.operators.Pq.topkResidualOpqTrained]]):
   * [[opqTrainedTopkSql]]'s chain (variance ranking -> snake-draft pmap
   * -> transformed tvec) with the residual stages inserted — per-position
   * residual rv = float(tv - c_cell) under the coarse assignment, PQ
   * encode over rv, and the cheap score's per-cell query dot + exact
   * dyadic reconstruction norms (cell-independent literals: the centroid
   * formulas are POSITION-based, so the (cell, m, code) terms are the
   * same dyadic values in any permuted space). Exact rescore on the
   * original vectors; every float chain an ordered fold.
   */
  def opqTrainedResidualSql(d: Int, nq: Int, k: Int, nCells: Int,
                            nprobe: Int, mSub: Int, codes: Int,
                            rerank: Int): String = {
    val sub = d / mSub
    val ctabVals = (for (c <- 0 until nCells; p <- 0 until d)
      yield s"($c, $p, ${cc(c, p)})").mkString(", ")
    val cbtVals = (for (m <- 0 until mSub; c <- 0 until codes;
                        j <- 0 until sub)
      yield s"($m, $c, $j, ${cb(m, c, j, sub)})").mkString(", ")
    val rn2Vals = (for (g <- 0 until nCells; m <- 0 until mSub;
                        c <- 0 until codes)
      yield s"($g, $m, $c, ${OracleGen.dlit(Pq.reconN2Term(g, m, c, sub))})")
      .mkString(", ")
    val celln2Vals = (0 until nCells)
      .map(g => s"($g, ${OracleGen.dlit(Pq.cellN2(g, d))})").mkString(", ")
    s"""WITH vrows AS MATERIALIZED (SELECT CAST(t.j AS INTEGER) AS j, e.vec_id,
       |    CAST(e.embedding[t.j] AS DOUBLE) AS x
       |  FROM embeddings e CROSS JOIN generate_series(1, $d) AS t(j)),
       |vstats AS MATERIALIZED (SELECT j, COUNT(*) AS n,
       |    list_reduce(list(x ORDER BY vec_id), (a, v) -> a + v) AS s,
       |    list_reduce(list(x*x ORDER BY vec_id), (a, v) -> a + v) AS s2
       |  FROM vrows GROUP BY j),
       |rd AS (SELECT j - 1 AS src,
       |    row_number() OVER (
       |      ORDER BY (s2 - (s*s)/CAST(n AS DOUBLE)) DESC, j ASC) - 1 AS r0
       |  FROM vstats),
       |pmap AS MATERIALIZED (SELECT src, CAST(
       |    (CASE WHEN (r0 // $mSub) % 2 = 0 THEN r0 % $mSub
       |          ELSE ${mSub - 1} - (r0 % $mSub) END) * $sub + (r0 // $mSub)
       |    AS INTEGER) AS pos FROM rd),
       |tvec AS MATERIALIZED (SELECT e.vec_id, pm.pos,
       |    CAST(e.embedding[pm.src + 1] AS DOUBLE) AS tv
       |  FROM embeddings e CROSS JOIN pmap pm),
       |ctab AS MATERIALIZED (SELECT * FROM (VALUES $ctabVals) AS t(cell, pos, cv)),
       |cbt AS MATERIALIZED (SELECT * FROM (VALUES $cbtVals) AS t(m, code, j, cbv)),
       |rn2 AS MATERIALIZED (SELECT * FROM (VALUES $rn2Vals) AS t(cell, m, code, v)),
       |cel AS (SELECT * FROM (VALUES $celln2Vals) AS t(cell, n2v)),
       |asg0 AS MATERIALIZED (SELECT t.vec_id, c.cell,
       |    list_reduce(list((t.tv - c.cv)*(t.tv - c.cv) ORDER BY t.pos),
       |      (a, v) -> a + v) AS d2
       |  FROM tvec t JOIN ctab c ON c.pos = t.pos
       |  GROUP BY t.vec_id, c.cell),
       |asg AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
       |  FROM asg0) WHERE rn = 1),
       |rv AS MATERIALIZED (SELECT t.vec_id, a.cell, t.pos,
       |    CAST(CAST(t.tv - c.cv AS FLOAT) AS DOUBLE) AS rv
       |  FROM tvec t JOIN asg a ON a.vec_id = t.vec_id
       |  JOIN ctab c ON c.cell = a.cell AND c.pos = t.pos),
       |pqd2 AS MATERIALIZED (SELECT t.vec_id, cb.m, cb.code,
       |    list_reduce(list((t.rv - cb.cbv)*(t.rv - cb.cbv) ORDER BY cb.j),
       |      (a, v) -> a + v) AS d2
       |  FROM rv t JOIN cbt cb ON t.pos = cb.m * $sub + cb.j
       |  GROUP BY t.vec_id, cb.m, cb.code),
       |encr AS MATERIALIZED (SELECT vec_id, m, code FROM (SELECT vec_id, m, code,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
       |  FROM pqd2) WHERE rn = 1),
       |${EmbOracle.nrmCte(d)},
       |q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qp AS (SELECT qid, cell FROM (SELECT a.vec_id AS qid, a.cell,
       |    row_number() OVER (
       |      PARTITION BY a.vec_id ORDER BY a.d2 ASC, a.cell ASC) AS pr
       |  FROM asg0 a JOIN q ON a.vec_id = q.qid) WHERE pr <= $nprobe),
       |adc AS MATERIALIZED (SELECT q.qid, cb.m, cb.code,
       |    list_reduce(list(t.tv * cb.cbv ORDER BY cb.j), (a, v) -> a + v) AS ad
       |  FROM q JOIN tvec t ON t.vec_id = q.qid
       |  JOIN cbt cb ON t.pos = cb.m * $sub + cb.j
       |  GROUP BY q.qid, cb.m, cb.code),
       |qc AS MATERIALIZED (SELECT q.qid, c.cell,
       |    list_reduce(list(t.tv * c.cv ORDER BY t.pos), (a, v) -> a + v) AS qcv
       |  FROM q JOIN tvec t ON t.vec_id = q.qid
       |  JOIN ctab c ON c.pos = t.pos
       |  GROUP BY q.qid, c.cell),
       |cand AS (SELECT qp.qid, a.vec_id AS id, a.cell
       |  FROM qp JOIN asg a ON a.cell = qp.cell),
       |cheap AS MATERIALIZED (SELECT c.qid, c.id,
       |    qc.qcv + list_reduce(list(ad.ad ORDER BY en.m), (a, v) -> a + v) AS snum,
       |    cel.n2v + list_reduce(list(rn2.v ORDER BY en.m), (a, v) -> a + v) AS n2hat
       |  FROM cand c
       |  JOIN encr en ON en.vec_id = c.id
       |  JOIN adc ad ON ad.qid = c.qid AND ad.m = en.m AND ad.code = en.code
       |  JOIN rn2 ON rn2.cell = c.cell AND rn2.m = en.m AND rn2.code = en.code
       |  JOIN qc ON qc.qid = c.qid AND qc.cell = c.cell
       |  JOIN cel ON cel.cell = c.cell
       |  GROUP BY c.qid, c.id, qc.qcv, cel.n2v),
       |rr AS (SELECT qid, id FROM (
       |    SELECT ch.qid, ch.id,
       |      row_number() OVER (PARTITION BY ch.qid ORDER BY
       |        ch.snum / (${fn("ch.n2hat")} * ${fn("nq2.n2")}) DESC,
       |        ch.id ASC) AS rn
       |    FROM cheap ch JOIN nrm nq2 ON nq2.vec_id = ch.qid) WHERE rn <= $rerank),
       |scored AS (SELECT r.qid, r.id,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN embeddings e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /** IVF-PQ pipeline: coarse probe -> ADC cheap rank -> rerank cut ->
    * exact rescore (tail identical to [[IvfOracle.sq8Sql]]).
    * `excludeMod` > 0 removes candidates with vec_id ≡ 0 (mod m) — the
    * tombstoned-delete twin; `langs` nonempty restricts candidates to
    * the metadata predicate and carries lang to the output (the
    * filtered-at-rest twin, like [[IvfOracle.topkSql]]'s);
    * `updatedNegMod` > 0 is the upsert twin — candidate-side vectors
    * with vec_id ≡ 0 (mod m) read as −v (cells, codes, and the rescore
    * fetch all see the update; negation preserves norms, so the shared
    * nrm relation and the UNTOUCHED query side stay exact). */
  /** `rerankRel` (with optional `relPath` to read the stored queries
    * table, kind 'rerank', depth in the pos column): the rerank cut
    * becomes PER QID — each query's own prefix of the shared cheap
    * ranking ([[graft.operators.Pq.topkAtRestMultiRerank]]). */
  def topkSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
              mSub: Int, codes: Int, rerank: Int, excludeMod: Int = 0,
              langs: Seq[String] = Nil, updatedNegMod: Int = 0,
              rerankRel: Seq[(Long, Int)] = Nil,
              relPath: Option[String] = None): String = {
    if (updatedNegMod > 0)
      require(excludeMod == 0 && langs.isEmpty,
        "updatedNegMod composes with the plain pipeline only")
    if (rerankRel.nonEmpty)
      require(excludeMod == 0 && langs.isEmpty && updatedNegMod == 0,
        "per-qid rerank composes with the plain pipeline only")
    val sub = d / mSub
    val candJoin =
      if (langs.isEmpty) ""
      else s"\n  JOIN documents dm ON a.vec_id = dm.doc_id" +
        s" AND dm.lang IN (${langs.map(l => s"'$l'").mkString(", ")})"
    val candWhere =
      if (excludeMod <= 0) "" else s"\n  WHERE a.vec_id % $excludeMod <> 0"
    val candSel = if (langs.isEmpty) "" else ", dm.lang"
    val cheapSel = if (langs.isEmpty) "" else ", c.lang"
    val langSel = if (langs.isEmpty) "" else ", lang"
    val rLangSel = if (langs.isEmpty) "" else ", r.lang"
    // coarse cells (same as IvfOracle.topkSql)
    def cellDistExpr(cell: Int): String =
      (0 until d).map { j =>
        val cv = Ivf.centroidComponent(cell, j)
        val c = s"CAST(CAST(${OracleGen.dlit(cv)} AS FLOAT) AS DOUBLE)"
        s"(CAST(e.embedding[${j + 1}] AS DOUBLE) - $c)*(CAST(e.embedding[${j + 1}] AS DOUBLE) - $c)"
      }.mkString("(", " + ", ")")
    val distCols = (0 until nCells)
      .map(c => s"${cellDistExpr(c)} AS c$c").mkString(",\n  ")
    val leastExpr = "LEAST(" + (0 until nCells).map(c => s"c$c").mkString(", ") + ")"
    val argmin = "CASE " + (0 until nCells)
      .map(c => s"WHEN c$c = m THEN $c").mkString(" ") + " END"
    val probeCase = "CASE t.cell " + (0 until nCells)
      .map(c => s"WHEN $c THEN a.c$c").mkString(" ") + " END"
    val cellsValues = (0 until nCells).map(c => s"($c)").mkString(",")
    // PQ encode: named subspace-distance cols, then per-subspace argmin
    val pqDistCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${subDistExpr("e", m, c, sub)} AS d_${m}_$c").mkString(",\n  ")
    val codeCols = (0 until mSub).map { m =>
      val least0 = "LEAST(" +
        (0 until codes).map(c => s"d_${m}_$c").mkString(", ") + ")"
      s"CASE " + (0 until codes)
        .map(c => s"WHEN d_${m}_$c = $least0 THEN $c").mkString(" ") +
        s" END AS code_$m"
    }.mkString(",\n  ")
    // query-side ADC table
    val adcCols = (for (m <- 0 until mSub; c <- 0 until codes)
      yield s"${adcExpr("qe", m, c, sub)} AS t_${m}_$c").mkString(",\n  ")
    // candidate-side picks: sum over subspaces of the code-selected
    // table entry / reconstruction norm, same left association as the
    // Scala reduceLeft
    val pickSum = (0 until mSub).map { m =>
      "CASE en.code_" + m + " " + (0 until codes)
        .map(c => s"WHEN $c THEN qt.t_${m}_$c").mkString(" ") + " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    val n2hatSum = (0 until mSub).map { m =>
      "CASE en.code_" + m + " " + (0 until codes)
        .map(c => s"WHEN $c THEN ${OracleGen.dlit(Pq.centroidN2(m, c, sub))}")
        .mkString(" ") + " END"
    }.reduceLeft((a, b) => s"($a + $b)")
    // the upsert twin: candidate-side reads (coarse assignment, PQ
    // encode, rescore fetch) switch to the updated view `embu`; the
    // query side (q, qe, and its probe distances via asgq) and the
    // shared norm relation (negation preserves norms) stay on the base
    val src = if (updatedNegMod > 0) "embu" else "embeddings"
    val embuCte =
      if (updatedNegMod <= 0) ""
      else s"""embu AS (SELECT vec_id,
              |    CASE WHEN vec_id % $updatedNegMod = 0
              |      THEN list_transform(embedding, x -> -x)
              |      ELSE embedding END AS embedding
              |  FROM embeddings),
              |""".stripMargin
    val qsideAsgCte =
      if (updatedNegMod <= 0) ""
      else s"asgq AS (SELECT e.vec_id, $distCols FROM embeddings e),\n"
    val qsideAsg = if (updatedNegMod > 0) "asgq" else "asg0"
    s"""WITH ${embuCte}asg0 AS (SELECT e.vec_id, $distCols FROM $src e),
       |asg AS (SELECT vec_id, $argmin AS cell
       |        FROM (SELECT *, $leastExpr AS m FROM asg0)),
       |${EmbOracle.nrmCte(d)},
       |pqd AS (SELECT e.vec_id, $pqDistCols FROM $src e),
       |enc AS (SELECT vec_id, $codeCols FROM pqd),
       |${qsideAsgCte}q AS (SELECT vec_id AS qid FROM embeddings ORDER BY vec_id LIMIT $nq),
       |qt AS (SELECT q.qid, $adcCols
       |  FROM q JOIN embeddings qe ON qe.vec_id = q.qid),
       |qp0 AS (SELECT q.qid, t.cell, $probeCase AS d2
       |  FROM q JOIN $qsideAsg a ON a.vec_id = q.qid
       |  CROSS JOIN (VALUES $cellsValues) AS t(cell)),
       |qp AS (SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |      row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, cell ASC) AS pr
       |    FROM qp0) WHERE pr <= $nprobe),
       |cand AS (SELECT qp.qid, a.vec_id AS id$candSel
       |  FROM qp JOIN asg a ON a.cell = qp.cell$candJoin$candWhere),
       |cheap AS (SELECT c.qid, c.id$cheapSel,
       |    $pickSum / (${fn(s"($n2hatSum)")} * ${fn("nq2.n2")}) AS s_hat
       |  FROM cand c
       |  JOIN enc en ON en.vec_id = c.id
       |  JOIN qt ON qt.qid = c.qid
       |  JOIN nrm nq2 ON nq2.vec_id = c.qid),
       |${if (rerankRel.isEmpty) "" else {
          val rows = rerankRel.map { case (qid, rr) => s"($qid, $rr)" }
            .mkString(", ")
          val body = relPath match {
            case Some(p) =>
              s"SELECT qid, pos AS rr FROM read_parquet('$p/*.parquet')" +
                s" WHERE kind = 'rerank'"
            case None =>
              s"SELECT CAST(qid AS BIGINT) AS qid, CAST(rr AS INTEGER) AS rr" +
                s"\n  FROM (VALUES $rows) AS v(qid, rr)"
          }
          s"rrel AS ($body),\n"
        }}rr AS (SELECT t.qid, t.id${
          if (langSel.isEmpty) "" else ", t.lang"} FROM (
       |    SELECT qid, id$langSel,
       |      row_number() OVER (PARTITION BY qid ORDER BY s_hat DESC, id ASC) AS rn
       |    FROM cheap) t${if (rerankRel.isEmpty) s" WHERE t.rn <= $rerank"
          else " JOIN rrel ON rrel.qid = t.qid WHERE t.rn <= rrel.rr"}),
       |scored AS (SELECT r.qid, r.id$rLangSel,
       |    ${EmbOracle.dotE("e.embedding", "qe.embedding", d)} /
       |      (${fn("ne.n2")} * ${fn("nq2.n2")}) AS score
       |  FROM rr r
       |  JOIN $src e ON e.vec_id = r.id
       |  JOIN embeddings qe ON qe.vec_id = r.qid
       |  JOIN nrm ne ON ne.vec_id = r.id
       |  JOIN nrm nq2 ON nq2.vec_id = r.qid),
       |ranked AS (SELECT qid, id$langSel, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, id ASC) AS rnk
       |  FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score$langSel
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }
}

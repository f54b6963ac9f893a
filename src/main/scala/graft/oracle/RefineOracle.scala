package graft.oracle

import graft.operators.Refine

/**
 * DuckDB oracle SQL for the six refinement modes (static-tau0 relational
 * semantics, mirroring [[graft.operators.Refine]] expression-tree for
 * expression-tree so DOUBLE results are bit-identical).
 *
 * Works on the fp16-exact fixture domain (components sgn*(1+m/1024)*2^s):
 * all pairwise aggregates below are sums of exact dyadic rationals, so
 * aggregation order cannot change the result, and every score/cushion is
 * a fixed tree of correctly-rounded ops (* / sqrt) over them.
 */
object RefineOracle {
  import OracleGen._

  private val g = "GREATEST" // fnorm(x) = GREATEST(sqrt(x), 1e-12)
  private def fn(x: String) = s"$g(sqrt($x), 1e-12)"

  /** Shared CTEs: synthesized full/reduced/delta components + norms. */
  def baseCtes(d: Int, nq: Int, keepM: Int, keyMod: Int = 1): String =
    baseCtesRvDv(d, nq, keyMod,
      s"CAST(${fp16ReducedComp(keepM)} AS DOUBLE)",
      s"CAST(${fp16DeltaComp(keepM)} AS DOUBLE)")

  /** [[baseCtes]] with caller-supplied SQL for the reduced component and
    * its element-wise error bound — the cheap-copy derivation is the only
    * thing the refine pipeline's algebra depends on. `rvSql`/`dvSql` may
    * reference the full component as `v` (the nested vraw select makes
    * the alias visible). */
  def baseCtesRvDv(d: Int, nq: Int, keyMod: Int,
                   rvSql: String, dvSql: String): String =
    s"""${keysAndDims(d, keyMod)},
       |vraw AS (SELECT key, j, CAST($fp16Comp AS DOUBLE) AS v
       |  FROM keys CROSS JOIN dims),
       |vd AS (SELECT key, j, v, $rvSql AS rv, $dvSql AS dv FROM vraw),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |nv AS (SELECT key, SUM(v*v) AS nx2, SUM(rv*rv) AS nr2, SUM(v*rv) AS xr
       |       FROM vd GROUP BY key),
       |nqt AS (SELECT qkey, SUM(qv*qv) AS nq2 FROM qd GROUP BY qkey)""".stripMargin

  /** Reduced/delta SQL for the int8 scalar-quantization rung
    * (Fixture.int8Vectors): rv = floor(v*2^s + 0.5) / 2^s, dv = the
    * constant half-step. Both exact dyadic rationals, so the quantized
    * pipeline stays bit-identical across engines. */
  def quantRvDv(scaleLog2: Int): (String, String) = {
    val s = math.pow(2.0, scaleLog2)
    (s"FLOOR(v * $s + 0.5) / $s", (0.5 / s).toString)
  }

  /** Pairwise aggregates needed by `mode`. */
  private def pairAggs(mode: String): String = {
    val a = "(qd.qv - vd.rv)" // l2 reduced residual
    mode match {
      case "cos_l1" =>
        """SUM(qd.qv*vd.v) AS dxq, SUM(qd.qv*vd.rv) AS drq,
          |    SUM(ABS(qd.qv)*vd.dv) AS l1c""".stripMargin
      case "cos_hoeff" =>
        """SUM(qd.qv*vd.v) AS dxq, SUM(qd.qv*vd.rv) AS drq,
          |    SUM((qd.qv*vd.dv)*(qd.qv*vd.dv)) AS hs2""".stripMargin
      case "cos_l2" =>
        "SUM(qd.qv*vd.v) AS dxq, SUM(qd.qv*vd.rv) AS drq"
      case "l2_sym" =>
        s"""SUM((qd.qv-vd.v)*(qd.qv-vd.v)) AS d2f, SUM($a*$a) AS d2h,
           |    SUM($g(ABS($a)-vd.dv, 0)*$g(ABS($a)-vd.dv, 0)) AS lb""".stripMargin
      case "l2_tz" =>
        s"""SUM((qd.qv-vd.v)*(qd.qv-vd.v)) AS d2f, SUM($a*$a) AS d2h,
           |    SUM(CASE WHEN $a*(CASE WHEN vd.rv < 0 THEN -1.0 ELSE 1.0 END) <= 0
           |             THEN $a*$a
           |             WHEN $a*(CASE WHEN vd.rv < 0 THEN -1.0 ELSE 1.0 END) < vd.dv
           |             THEN 0.0
           |             ELSE (ABS($a)-vd.dv)*(ABS($a)-vd.dv) END) AS lb""".stripMargin
      case "l2_hoeff" =>
        s"""SUM((qd.qv-vd.v)*(qd.qv-vd.v)) AS d2f, SUM($a*$a) AS d2h,
           |    SUM(($a*vd.dv)*($a*vd.dv)) AS ah2""".stripMargin
    }
  }

  /** s_hat, s_full, cushion column exprs over `pair p / nv / nqt q`.
    * `hcExpr`: per-qid Hoeffding-constant SQL expression overriding the
    * cos_hoeff literal (the precision-on-demand relation). */
  private def scoredExprs(p: Refine.Params,
                          hcExpr: Option[String] = None): (String, String, String) = {
    val sFullCos = s"p.dxq / (${fn("nv.nx2")} * ${fn("q.nq2")})"
    val sHatCos  = s"p.drq / (${fn("nv.nr2")} * ${fn("q.nq2")})"
    p.mode match {
      case "cos_l1" =>
        (sHatCos, sFullCos, s"${OracleGen.dlit(p.alpha)} * p.l1c / ${fn("q.nq2")}")
      case "cos_hoeff" =>
        (sHatCos, sFullCos,
          s"${hcExpr.getOrElse(OracleGen.dlit(p.hoeffConst))} * sqrt(p.hs2) / ${fn("q.nq2")}")
      case "cos_l2" =>
        (sHatCos, sFullCos,
          s"${OracleGen.dlit(p.alpha)} * sqrt($g(0.0, 2.0 - 2.0 * nv.xr / (${fn("nv.nx2")} * ${fn("nv.nr2")})))")
      case "l2_sym" | "l2_tz" => ("p.d2h", "p.d2f", "p.lb")
      case "l2_hoeff" =>
        ("p.d2h", "p.d2f",
          s"p.d2h - ${OracleGen.dlit(2.0 * p.hoeffConst)} * sqrt(p.ah2)")
    }
  }

  /** CTE chain from scored -> fetchset (seed ∪ cushion survivors).
    * `hcByRank`: per-query hoeffConst values INDEXED BY QUERY RANK (the
    * i-th smallest qid gets hcByRank(i)) — the precision-on-demand
    * relation; qids are fixture keys so the binding is rank-based on
    * both sides, each constant embedded as a double literal (the engine
    * computes them driver-side with the identical formula). */
  private def pipelineCtes(p: Refine.Params,
                           hcByRank: Option[Seq[Double]] = None): String = {
    val (sHat, sFull, cush) = scoredExprs(p,
      hcByRank.map(_ => "hcr.hc"))
    val (hatOrd, seedAgg, survive) =
      if (p.isCos) ("s_hat DESC, id ASC", "MIN", "r.s_hat + r.cush >= t.tau0")
      else ("s_hat ASC, id ASC", "MAX", "r.cush <= t.tau0")
    val hcrCte = hcByRank.map { hcs =>
      val rows = hcs.zipWithIndex.map { case (hc, i) =>
        s"($i, ${OracleGen.dlit(hc)})" }.mkString(", ")
      s"""hcr0 AS (SELECT CAST(qi AS BIGINT) AS qi, hc
         |  FROM (VALUES $rows) AS v(qi, hc)),
         |qkr AS (SELECT qkey,
         |    row_number() OVER (ORDER BY qkey) - 1 AS qi FROM qk),
         |hcr AS (SELECT qkr.qkey, hcr0.hc
         |  FROM qkr JOIN hcr0 ON hcr0.qi = qkr.qi),\n""".stripMargin
    }.getOrElse("")
    val hcrJoin =
      hcByRank.map(_ => " JOIN hcr ON hcr.qkey = p.qid").getOrElse("")
    s"""${hcrCte}pair AS (SELECT qd.qkey AS qid, vd.key AS id, ${pairAggs(p.mode)}
       |  FROM qd JOIN vd ON qd.j = vd.j GROUP BY 1, 2),
       |scored AS (SELECT p.qid, p.id, $sHat AS s_hat, $sFull AS s_full, $cush AS cush
       |  FROM pair p JOIN nv ON p.id = nv.key JOIN nqt q ON p.qid = q.qkey$hcrJoin),
       |rh AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY $hatOrd) AS rn
       |  FROM scored),
       |tau AS (SELECT qid, $seedAgg(CASE WHEN rn <= ${p.k} THEN s_full END) AS tau0
       |  FROM rh GROUP BY qid),
       |fetchset AS (SELECT r.qid, r.id, r.s_full FROM rh r JOIN tau t ON r.qid = t.qid
       |  WHERE r.rn <= ${p.k} OR $survive)""".stripMargin
  }

  /** Full refined-top-K oracle: (qid, rank INT, id, score DOUBLE). */
  def topkSql(d: Int, nq: Int, p: Refine.Params, keyMod: Int = 1): String =
    topkSqlFrom(baseCtes(d, nq, p.keepM, keyMod), p)

  /** [[topkSql]] with the Hoeffding constant bound PER QUERY RANK
    * ([[graft.operators.Refine.topkPerQidDelta]]): the i-th smallest
    * qid refines with hcByRank(i). */
  def topkPerQidDeltaSql(d: Int, nq: Int, p: Refine.Params,
                         hcByRank: Seq[Double],
                         keyMod: Int = 1): String =
    topkSqlFrom(baseCtes(d, nq, p.keepM, keyMod), p, Some(hcByRank))

  /** [[topkSql]] over a caller-derived cheap copy (e.g. the int8
    * quantization rung via [[quantRvDv]]). */
  def topkSqlRvDv(d: Int, nq: Int, p: Refine.Params, keyMod: Int,
                  rvSql: String, dvSql: String): String =
    topkSqlFrom(baseCtesRvDv(d, nq, keyMod, rvSql, dvSql), p)

  private def topkSqlFrom(base: String, p: Refine.Params,
                          hcByRank: Option[Seq[Double]] = None): String = {
    val ord = if (p.isCos) "s_full DESC, id ASC" else "s_full ASC, id ASC"
    s"""WITH $base,
       |${pipelineCtes(p, hcByRank)},
       |final AS (SELECT qid, id, s_full,
       |  row_number() OVER (PARTITION BY qid ORDER BY $ord) AS rnk FROM fetchset)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, s_full AS score
       |FROM final WHERE rnk <= ${p.k}""".stripMargin
  }

  /**
   * Accounting oracle for one mode: a single row
   * (mode, m_keep, delta, recall, save, fpr) — integer counts aggregated
   * first, single division at the end (ANNCode.py:316-318, 364-369).
   */
  def metricsSql(d: Int, nq: Int, p: Refine.Params, keyMod: Int = 1): String =
    metricsSqlWithRedBytes(d, nq, p, (p.bitsRed * d / 8.0).toString, keyMod)

  /** [[metricsSql]] with the reduced-bytes/vec term as a caller-supplied
    * SQL expression — the `red_bytes_override` composition
    * (ANNCode.py:317-318, 831-833): measured compressed bytes replace the
    * naive bit-count model. The expression must reproduce the Scala
    * side's exact double tree (e.g. `(CAST(c AS DOUBLE) / n)` for
    * `c.toDouble / n`). */
  def metricsSqlWithRedBytes(d: Int, nq: Int, p: Refine.Params,
                             bRed: String, keyMod: Int = 1): String =
    metricsSqlFrom(baseCtes(d, nq, p.keepM, keyMod), d, p, bRed)

  /** [[metricsSql]] over a caller-derived cheap copy (the int8 rung):
    * custom rv/dv SQL plus the rung's own reduced-bytes/vec model. */
  def metricsSqlRvDv(d: Int, nq: Int, p: Refine.Params, bRed: String,
                     keyMod: Int, rvSql: String, dvSql: String): String =
    metricsSqlFrom(baseCtesRvDv(d, nq, keyMod, rvSql, dvSql), d, p, bRed)

  private def metricsSqlFrom(base: String, d: Int, p: Refine.Params,
                             bRed: String): String = {
    val ord     = if (p.isCos) "s_full DESC, id ASC" else "s_full ASC, id ASC"
    val exactOrd =
      if (p.isCos) "s_exact DESC, id ASC" else "s_exact ASC, id ASC"
    val (_, sFull, _) = scoredExprs(p)
    val bFull = 16.0 * d / 8.0
    s"""WITH $base,
       |${pipelineCtes(p)},
       |final AS (SELECT qid, id,
       |  row_number() OVER (PARTITION BY qid ORDER BY $ord) AS rnk FROM fetchset),
       |exact0 AS (SELECT p.qid, p.id, $sFull AS s_exact
       |  FROM pair p JOIN nv ON p.id = nv.key JOIN nqt q ON p.qid = q.qkey),
       |exact AS (SELECT qid, id,
       |  row_number() OVER (PARTITION BY qid ORDER BY $exactOrd) AS rnk FROM exact0),
       |counts AS (SELECT
       |  (SELECT COUNT(*) FROM keys) AS nv_cnt,
       |  (SELECT COUNT(*) FROM qk) AS nq_cnt,
       |  (SELECT COUNT(*) FROM fetchset) AS fetched,
       |  (SELECT COUNT(*) FROM final f JOIN exact e
       |     ON f.qid = e.qid AND f.id = e.id
       |     WHERE f.rnk <= ${p.k} AND e.rnk <= ${p.k}) AS hits)
       |SELECT '${p.mode}' AS mode, ${p.keepM} AS m_keep,
       |  ${OracleGen.dlit(p.delta)} AS delta,
       |  CAST(hits AS DOUBLE) / (${p.k} * nq_cnt) AS recall,
       |  1.0 - ($bRed * nv_cnt * nq_cnt + $bFull * fetched) /
       |        ($bFull * nv_cnt * nq_cnt) AS save,
       |  CAST(fetched - ${p.k} * nq_cnt AS DOUBLE) / (CAST(nv_cnt AS DOUBLE) * nq_cnt) AS fpr
       |FROM counts""".stripMargin
  }

  /** All-modes metrics oracle: UNION ALL of per-mode metrics rows. */
  def allMetricsSql(d: Int, nq: Int, params: Seq[Refine.Params]): String =
    params.map(p => s"(${metricsSql(d, nq, p)})").mkString("\nUNION ALL\n")

  /**
   * Per-qid m_keep ledger oracle
   * ([[graft.operators.Refine.perQidMkeepMetrics]]): one full refine
   * pipeline PER DISTINCT TIER (the tier's own rv/dv derivation — the
   * qid's Δ/cushion really comes from its own mantissa budget),
   * restricted to the qids whose RANK carries that tier (refine qids
   * are fixture keys, so the binding is rank-based on both sides, the
   * [[topkPerQidDeltaSql]] discipline), per-qid counts, UNION ALL
   * across tiers. Byte/ratio trees mirror the engine's: integer counts
   * aggregated first, single multiplications/divisions at the end —
   * every product is integer-valued below 2^53, so the doubles are
   * exact on both engines.
   */
  def perQidMkeepMetricsSql(d: Int, nq: Int, k: Int, alpha: Double,
                            mkeepByRank: Seq[Int],
                            keyMod: Int = 1): String = {
    require(mkeepByRank.length == nq, s"need one tier per query rank")
    val bFull = 16.0 * d / 8.0
    val tiers = mkeepByRank.distinct.sorted
    val parts = tiers.map { m =>
      val p = Refine.Params("cos_l1", k = k, keepM = m, alpha = alpha)
      val ranks = mkeepByRank.zipWithIndex.filter(_._1 == m).map(_._2)
      val bRed = (1 + p.keepE + m) * d / 8.0
      val (_, sFull, _) = scoredExprs(p)
      s"""(WITH ${baseCtes(d, nq, m, keyMod)},
         |${pipelineCtes(p)},
         |qkr AS (SELECT qkey,
         |    row_number() OVER (ORDER BY qkey) - 1 AS qi FROM qk),
         |tq AS (SELECT qkey FROM qkr WHERE qi IN (${ranks.mkString(", ")})),
         |nvs AS (SELECT COUNT(*) AS nv FROM keys),
         |fc AS (SELECT f.qid, COUNT(*) AS fetched
         |  FROM fetchset f JOIN tq ON tq.qkey = f.qid GROUP BY f.qid),
         |final AS (SELECT qid, id,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY s_full DESC, id ASC) AS rnk FROM fetchset),
         |exact0 AS (SELECT p.qid, p.id, $sFull AS s_exact
         |  FROM pair p JOIN nv ON p.id = nv.key JOIN nqt q ON p.qid = q.qkey),
         |exact AS (SELECT qid, id,
         |  row_number() OVER (PARTITION BY qid
         |    ORDER BY s_exact DESC, id ASC) AS rnk FROM exact0),
         |hits AS (SELECT f.qid, COUNT(*) AS hits
         |  FROM final f JOIN exact e ON f.qid = e.qid AND f.id = e.id
         |  JOIN tq ON tq.qkey = f.qid
         |  WHERE f.rnk <= $k AND e.rnk <= $k GROUP BY f.qid)
         |SELECT fc.qid, $m AS m_keep, fc.fetched,
         |  ${dlit(bRed)} * CAST(nvs.nv AS DOUBLE) +
         |    ${dlit(bFull)} * CAST(fc.fetched AS DOUBLE) AS bytes_total,
         |  CAST(h.hits AS DOUBLE) / ${dlit(k.toDouble)} AS recall,
         |  1.0 - (${dlit(bRed)} * CAST(nvs.nv AS DOUBLE) +
         |      ${dlit(bFull)} * CAST(fc.fetched AS DOUBLE)) /
         |    (${dlit(bFull)} * CAST(nvs.nv AS DOUBLE)) AS save,
         |  CAST(fc.fetched - $k AS DOUBLE) / CAST(nvs.nv AS DOUBLE) AS fpr
         |FROM fc JOIN hits h ON h.qid = fc.qid CROSS JOIN nvs)""".stripMargin
    }
    parts.mkString("\nUNION ALL\n")
  }

  /**
   * Grid-search tuning oracle (Tune.tuneDelta): the grid's metrics rows
   * plus a `chosen` flag on the winner — max saving among rows meeting
   * the recall floor, best recall as fallback; ties at the winning
   * metric go to the smallest delta (the grid-order first-max tie-break
   * of the Scala side, whose grid is ascending).
   */
  def tuneSql(d: Int, nq: Int, mode: String, k: Int, keepM: Int,
              grid: Seq[Double], recallFloor: Double): String = {
    val params = grid.map(dl =>
      Refine.Params(mode, k = k, keepM = keepM, delta = dl))
    s"""WITH m AS MATERIALIZED (${allMetricsSql(d, nq, params)}),
       |flag AS MATERIALIZED (SELECT CASE
       |    WHEN MAX(CASE WHEN recall >= ${OracleGen.dlit(recallFloor)} THEN 1 ELSE 0 END) = 1
       |    THEN 1 ELSE 0 END AS any_meet FROM m),
       |sel AS MATERIALIZED (SELECT m.delta FROM m, flag
       |  WHERE flag.any_meet = 0 OR m.recall >= ${OracleGen.dlit(recallFloor)}
       |  ORDER BY CASE WHEN flag.any_meet = 1 THEN m.save ELSE m.recall END DESC,
       |    m.delta ASC
       |  LIMIT 1)
       |SELECT mode, m_keep, delta, recall, save, fpr,
       |  delta = (SELECT delta FROM sel) AS chosen
       |FROM m""".stripMargin
  }

  /**
   * Packed bit-plane popcount oracle ([[graft.operators.BitplaneCompress
   * .planePopcounts]]): the fixture component's fp16 word is pure integer
   * arithmetic — sign bit from the sign mix, exponent field 15+s with
   * s in {-1,0,1}, mantissa field = mant — so each kept plane's set-bit
   * total is a SUM of integer bit extractions DuckDB evaluates exactly.
   * Plane order matches packBitplanes: sign, exp MSB->LSB (bit 5-p of the
   * field for plane p), mantissa MSB->LSB (bit 10-(p-keepE) of mant).
   */
  def packedPopcountSql(d: Int, keepE: Int, keepM: Int): String = {
    import graft.Fixture.{SgnMul, SgnJ, ScMul, ScJ, BigP}
    val sInt = s"((((key*($ScMul + j*$ScJ) + j) % $BigP) % 3) - 1)"
    val signBit = s"(CASE WHEN ((key*($SgnMul + j*$SgnJ) + j) % $BigP) % 2 = 0 THEN 0 ELSE 1 END)"
    val planes = (0 until 1 + keepE + keepM).map { p =>
      val bit =
        if (p == 0) signBit
        else if (p <= keepE) s"(((15 + $sInt) >> ${5 - p}) & 1)"
        else s"(($mantExpr >> ${10 - (p - keepE)}) & 1)"
      s"SELECT $p AS plane, CAST(SUM($bit) AS BIGINT) AS n_ones FROM keys CROSS JOIN dims"
    }
    s"WITH ${keysAndDims(d)}\n" + planes.mkString("\nUNION ALL\n")
  }

  /** Precision-reduction projection oracle (P2-P4): flat rows
    * (id, j, v, rv, dv) for a bounded id set. */
  def reduceSql(d: Int, keepM: Int, maxId: Long): String =
    s"""WITH ${keysAndDims(d)},
       |vd AS (SELECT key, j,
       |  CAST($fp16Comp AS DOUBLE) AS v,
       |  CAST(${fp16ReducedComp(keepM)} AS DOUBLE) AS rv,
       |  CAST(${fp16DeltaComp(keepM)} AS DOUBLE) AS dv
       |  FROM keys CROSS JOIN dims)
       |SELECT key AS id, j, v, rv, dv FROM vd WHERE key <= $maxId""".stripMargin
}

package graft.oracle

/**
 * DuckDB oracle for [[graft.operators.Ladder]] — the cross-rung
 * recall-vs-bytes table. Each arm embeds the EXISTING per-rung oracle
 * verbatim as a sibling subquery: DuckDB scopes same-named MATERIALIZED
 * CTEs per subquery (only inner-vs-outer duplicates collide), so the
 * arms compose without renaming; the outer names all carry a `lad_`
 * prefix to stay clear of every inner materialized name.
 */
object LadderOracle {

  def rungLadderSql(d: Int, nq: Int, k: Int, nCells: Int, nprobe: Int,
                    pqM: Int, pqCodes: Int, pqRerank: Int, bqRerank: Int,
                    sq4ScaleLog2: Int, sq4Rerank: Int,
                    sq8ScaleLog2: Int, sq8Rerank: Int,
                    dPrefix: Int, prefixRerank: Int,
                    dPrefixZm: Int): String = {
    val nqK = nq * k
    val pfxName = s"prefix${dPrefix}_fp32"
    // the zero-miss width rung provably reproduces the exact scan
    // (Cauchy-Schwarz tail cushion — see Ann.prefixRefineTopK), so its
    // oracle arm IS the brute arm under its own rung key
    val zmName = s"prefix${dPrefixZm}_zeromiss"
    val zmBytes = 4 * dPrefixZm + 16
    def arm(sql: String) = s"(SELECT qid, id FROM ($sql))"
    s"""WITH lad_gt AS MATERIALIZED ${arm(EmbOracle.bruteSql(d, nq, k))},
       |lad_pq AS ${arm(PqOracle.topkSql(d, nq, k, nCells, nprobe, pqM, pqCodes, pqRerank))},
       |lad_bq AS ${arm(PqOracle.bqSql(d, nq, k, bqRerank))},
       |lad_sq4 AS ${arm(IvfOracle.sq4Sql(d, nq, k, nCells, nprobe, sq4ScaleLog2, sq4Rerank))},
       |lad_sq8 AS ${arm(IvfOracle.sq8Sql(d, nq, k, nCells, nprobe, sq8ScaleLog2, sq8Rerank))},
       |lad_pfx AS ${arm(EmbOracle.prefixSql(d, dPrefix, nq, k, prefixRerank))},
       |lad_u AS (
       |  SELECT 'pq_4b_code' AS rung, 4 AS bytes_per_vec, qid, id FROM lad_pq
       |  UNION ALL SELECT 'bq_1bit', 8, qid, id FROM lad_bq
       |  UNION ALL SELECT 'sq4_nibble', ${d / 2}, qid, id FROM lad_sq4
       |  UNION ALL SELECT 'sq8_int8', $d, qid, id FROM lad_sq8
       |  UNION ALL SELECT '$pfxName', ${4 * dPrefix}, qid, id FROM lad_pfx
       |  UNION ALL SELECT '$zmName', $zmBytes, qid, id FROM lad_gt
       |  UNION ALL SELECT 'exact_fp32', ${4 * d}, qid, id FROM lad_gt),
       |lad_hits AS (SELECT rung, bytes_per_vec, COUNT(*) AS hits
       |  FROM lad_u u JOIN lad_gt g ON u.qid = g.qid AND u.id = g.id
       |  GROUP BY rung, bytes_per_vec)
       |SELECT r.rung, r.bytes_per_vec, COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST($nqK AS DOUBLE) AS recall
       |FROM (VALUES ('pq_4b_code', 4), ('bq_1bit', 8),
       |  ('sq4_nibble', ${d / 2}), ('sq8_int8', $d),
       |  ('$pfxName', ${4 * dPrefix}), ('$zmName', $zmBytes),
       |  ('exact_fp32', ${4 * d}))
       |  AS r(rung, bytes_per_vec)
       |LEFT JOIN lad_hits h
       |  ON h.rung = r.rung AND h.bytes_per_vec = r.bytes_per_vec""".stripMargin
  }
}

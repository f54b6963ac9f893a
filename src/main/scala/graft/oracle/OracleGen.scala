package graft.oracle

import graft.Fixture

/**
 * DuckDB oracle SQL generators, mirroring [[graft.Fixture]] synthesis and
 * each Spark query's semantics 1:1. The driver executes these over the
 * same parquet tables (registered under their bare names) and hash-compares
 * rows, so:
 *
 *  - every computed column is aliased identically to the Spark output;
 *  - float scores are built from EXACT integer/dyadic partial sums through
 *    a fixed expression tree (ratios + sqrt only), so DOUBLE results are
 *    bit-identical across engines regardless of aggregation order;
 *  - rank columns are CAST to INT to match Spark's `row_number`.
 */
object OracleGen {
  import Fixture.{HMul, JMul, SgnMul, SgnJ, ScMul, ScJ, BigP}

  /** Exact DOUBLE literal: a bare decimal literal lands as DECIMAL and
    * its later DECIMAL->DOUBLE conversion double-rounds (measured: 7.5%
    * of random 17-digit constants off by one ulp); string->DOUBLE casts
    * are correctly rounded, and Java's `Double.toString` is shortest
    * round-trip, so this reproduces the JVM double bit-for-bit. */
  def dlit(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** VALUES list (0),(1),...,(d-1) for the dims CTE. */
  def dimsValues(d: Int): String = (0 until d).map(j => s"($j)").mkString(",")

  /** Shared CTE prefix: distinct lineitem keys + dim index table.
    * `keyMod > 1` restricts to the deterministic `key % keyMod == 0`
    * slice (mirrors Fixture.fp16VectorsModCached). */
  def keysAndDims(d: Int, keyMod: Int = 1): String = {
    val where =
      if (keyMod > 1) s" WHERE (l_orderkey*10 + l_linenumber) % $keyMod = 0"
      else ""
    s"""keys AS (SELECT DISTINCT l_orderkey*10 + l_linenumber AS key FROM lineitem$where),
       |dims AS (SELECT j FROM (VALUES ${dimsValues(d)}) AS t(j))""".stripMargin
  }

  /** Mixing hash — j in the multiplier (see Fixture.h). */
  private def hExpr =
    s"((key*($HMul + (j+1)*$JMul) + (j+1)*CAST(1013904223 AS BIGINT)) % $BigP)"

  /** Integer-domain component of (key, j) — see Fixture.intComponent. */
  val intComp = s"CAST(($hExpr % 1001) - 500 AS DOUBLE)"

  /** fp16-domain pieces (see Fixture.fp16Component). */
  val mantExpr  = s"($hExpr % 1024)"
  val sgnExpr   = s"(CASE WHEN ((key*($SgnMul + j*$SgnJ) + j) % $BigP) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
  // Fixture.scaleExp = ((key*(ScMul+j*ScJ)+j) % BigP) % 3 - 1 in {-1,0,1} -> {0.5,1.0,2.0}
  val scaleExpr = s"(CASE ((key*($ScMul + j*$ScJ) + j) % $BigP) % 3 WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 ELSE 2.0 END)"

  def fp16Comp: String = s"$sgnExpr * (1.0 + $mantExpr/1024.0) * $scaleExpr"
  def fp16ReducedComp(keepM: Int): String = {
    val dp = 1L << (10 - keepM)
    s"$sgnExpr * (1.0 + ($mantExpr - ($mantExpr % $dp))/1024.0) * $scaleExpr"
  }
  def fp16DeltaComp(keepM: Int): String = {
    // Delta = 2^(e-15-keepM), e = 15 + scale exponent -> scale * 2^-keepM
    val base = math.pow(2.0, -keepM)
    s"$scaleExpr * $base"
  }

  /**
   * Exact top-K over integer-domain vectors.
   * metric: "cos" (ratio form, desc) or "l2" (squared distance, asc).
   * Output: qid BIGINT, rank INT, id BIGINT, score DOUBLE.
   */
  def topkSql(d: Int, nq: Int, k: Int, metric: String): String = {
    val (scoreExpr, ord) = metric match {
      case "cos" =>
        ("sc.dp / (GREATEST(sqrt(nv.n2), 1e-12) * GREATEST(sqrt(nq.m2), 1e-12))",
          "score DESC, id ASC")
      case "l2" => ("sc.d2", "score ASC, id ASC")
    }
    val pairAgg = metric match {
      case "cos" => "SUM(qd.qv * vd.v) AS dp"
      case "l2"  => "SUM((qd.qv - vd.v) * (qd.qv - vd.v)) AS d2"
    }
    s"""WITH ${keysAndDims(d)},
       |vd AS (SELECT key, j, $intComp AS v FROM keys CROSS JOIN dims),
       |qk AS (SELECT key AS qkey FROM keys ORDER BY key LIMIT $nq),
       |qd AS (SELECT qkey, j, v AS qv FROM vd JOIN qk ON vd.key = qk.qkey),
       |nv AS (SELECT key, SUM(v*v) AS n2 FROM vd GROUP BY key),
       |nq AS (SELECT qkey, SUM(qv*qv) AS m2 FROM qd GROUP BY qkey),
       |sc AS (SELECT qd.qkey AS qid, vd.key AS id, $pairAgg
       |       FROM qd JOIN vd ON qd.j = vd.j GROUP BY 1, 2),
       |scored AS (SELECT sc.qid, sc.id, $scoreExpr AS score
       |           FROM sc JOIN nv ON sc.id = nv.key JOIN nq ON sc.qid = nq.qkey),
       |ranked AS (SELECT qid, id, score,
       |           row_number() OVER (PARTITION BY qid ORDER BY $ord) AS rnk
       |           FROM scored)
       |SELECT qid, CAST(rnk AS INTEGER) AS rank, id, score
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }
}

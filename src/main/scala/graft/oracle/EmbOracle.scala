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

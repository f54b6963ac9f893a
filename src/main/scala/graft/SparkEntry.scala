package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._
import graft.operators.{TopK, Refine}
import graft.oracle.{OracleGen, RefineOracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  // fixture parameters shared by Spark queries and oracle SQL
  final val D  = 8    // vector dims for lineitem-derived fixtures
  final val NQ = 10   // query rows
  final val K  = 10   // top-k
  final val KeepM = 6 // kept mantissa bits (reference CLI default)
  final val ReduceMaxId = 500L

  def refineParams(mode: String): Refine.Params =
    Refine.Params(mode, k = K, keepM = KeepM, keepE = 5, delta = 0.7, alpha = 1.0)

  /** Refined top-K for one of the six modes (static-tau0 semantics). */
  def qRefine(spark: SparkSession, dir: String, mode: String): DataFrame = {
    val v = Fixture.fp16Vectors(spark, dir, D, KeepM)
    val q = Fixture.queries(v, NQ).select(col("qid"), col("qvec"))
    Refine.topk(v, q, refineParams(mode))
  }

  /** Accounting metrics (recall/save/fpr) for all six modes. */
  def qRefineMetrics(spark: SparkSession, dir: String): DataFrame = {
    val v = Fixture.fp16Vectors(spark, dir, D, KeepM)
    val q = Fixture.queries(v, NQ).select(col("qid"), col("qvec"))
    Refine.Modes.map(m => Refine.metrics(v, q, refineParams(m), D))
      .reduce(_ unionByName _)
  }

  /** Precision-reduction projection (P2-P4): flat (id, j, v, rv, dv). */
  def qReducePrecision(spark: SparkSession, dir: String): DataFrame = {
    val v = Fixture.fp16Vectors(spark, dir, D, KeepM)
    v.filter(col("id") <= ReduceMaxId)
      .select(col("id"), col("rvec"), col("delta"),
        posexplode(col("vec")).as(Seq("j", "v0")))
      .select(col("id"), col("j"),
        col("v0").cast("double").as("v"),
        element_at(col("rvec"), col("j") + 1).cast("double").as("rv"),
        element_at(col("delta"), col("j") + 1).cast("double").as("dv"))
  }

  /** Flagship: exact cosine top-K on sf0.001 (SURVEY §7 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    qTopkCos(spark, "/root/testdata/sf0.001")

  private def fnorm(c: org.apache.spark.sql.Column) =
    greatest(sqrt(c), lit(1e-12))

  /** Exact cosine top-K: broadcast cross join + ratio score + window. */
  def qTopkCos(spark: SparkSession, dir: String): DataFrame = {
    val v = Fixture.vectors(spark, dir, D)
    val q = broadcast(Fixture.queries(v, NQ)
      .withColumn("nq2", norm2Sq(col("qvec"))))
    val scored = v.crossJoin(q)
      .withColumn("score",
        dot(col("vec"), col("qvec")) /
          (fnorm(norm2Sq(col("vec"))) * fnorm(col("nq2"))))
    TopK.window(scored, K)
  }

  /** Exact Euclidean top-K (ascending squared distance). */
  def qTopkL2(spark: SparkSession, dir: String): DataFrame = {
    val v = Fixture.vectors(spark, dir, D)
    val q = broadcast(Fixture.queries(v, NQ))
    val scored = v.crossJoin(q)
      .withColumn("score", l2DistSq(col("qvec"), col("vec")))
    TopK.window(scored, K, ascending = true)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_cos" -> ((s, dir) => qTopkCos(s, dir)),
    "q_topk_l2"  -> ((s, dir) => qTopkL2(s, dir)),
    "q_reduce_precision" -> ((s, dir) => qReducePrecision(s, dir)),
    "q_refine_metrics"   -> ((s, dir) => qRefineMetrics(s, dir)),
  ) ++ Refine.Modes.map(m =>
    s"q_refine_$m" -> ((s: SparkSession, dir: String) => qRefine(s, dir, m))
  ).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_topk_cos" -> OracleGen.topkSql(D, NQ, K, "cos"),
    "q_topk_l2"  -> OracleGen.topkSql(D, NQ, K, "l2"),
    "q_reduce_precision" -> RefineOracle.reduceSql(D, KeepM, ReduceMaxId),
    "q_refine_metrics"   ->
      RefineOracle.allMetricsSql(D, NQ, Refine.Modes.map(refineParams)),
  ) ++ Refine.Modes.map(m =>
    s"q_refine_$m" -> RefineOracle.topkSql(D, NQ, refineParams(m))
  ).toMap
}

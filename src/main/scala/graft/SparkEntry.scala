package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._
import graft.operators.{TopK, Refine}
import graft.oracle.OracleGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  // fixture parameters shared by Spark queries and oracle SQL
  final val D  = 8    // vector dims for lineitem-derived fixtures
  final val NQ = 10   // query rows
  final val K  = 10   // top-k

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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_topk_cos" -> OracleGen.topkSql(D, NQ, K, "cos"),
    "q_topk_l2"  -> OracleGen.topkSql(D, NQ, K, "l2"),
  )
}

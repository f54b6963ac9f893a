package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def audit(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val d = df; d.collect()
      val plan = d.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      println(s"[audit] $name shuffleExch=${n("ShuffleExchange")} bcast=${n("BroadcastExchange")} smj=${n("SortMergeJoin")} cart=${n("CartesianProduct")} bnlj=${n("BroadcastNestedLoop")} wscg=${n("WholeStageCodegen")}")
      graft.operators.Dedup.releaseIntermediates()
    }
    val emb = Tables.embeddings(spark, dir)
    import SparkEntry._
    audit("tune_nprobe_sq8")(graft.operators.Ivf.tuneNprobeSq8(emb, NQ, K, IvfCells, EmbD, TuneNprobes, EmbSq8ScaleLog2, Sq8Rerank))
    audit("pq_at_rest")(graft.operators.Pq.topkAtRest(spark, dir, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank))
    audit("pq_res_at_rest")(graft.operators.Pq.topkResidualAtRest(spark, dir, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank))
    audit("bq_at_rest")(graft.operators.Bq.topkAtRest(spark, dir, emb, NQ, K, BqRerank, EmbD))
    audit("bq_wide_at_rest")(graft.operators.Bq.topkWideAtRest(spark, dir, NQ, K, BqRerank, D128, KeepM, D128KeyMod))
    spark.stop()
  }
}

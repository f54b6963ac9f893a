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
    audit("cascade_at_rest")(graft.operators.Cascade.topkAtRest(spark, dir, emb, NQ, K, EmbD, EmbSq8ScaleLog2, CascadeR1, CascadeR2))
    audit("pq_delete") {
      val p = graft.operators.Pq.ensureCodesFixture(spark, dir, IvfCells, EmbD, PqM, PqCodes)
      val t = spark.read.parquet(graft.operators.Pq.ensureTombstones(spark, p, DeleteMod))
      graft.operators.Pq.topkOffCodesWithDeletes(spark, p, t, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
    }
    audit("pq_upsert")(graft.operators.Pq.topkAtRestUpserted(spark, dir, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank, UpsertMod))
    audit("knn_graph")(graft.operators.Ivf.knnGraph(emb, KnnJ, IvfCells, EmbD, IvfProbe))
    audit("prefix_at_rest")(graft.operators.Ann.prefixTopKAtRest(spark, dir, emb, NQ, K, EmbD, PrefixD, PrefixRerank))
    locally {
      // under a scope so the audit sees the live pipeline plan instead
      // of the bare-caller localCheckpoint pin
      val (df, rel) = graft.operators.Dedup.scopedRelease(
        graft.operators.Ann.prefixRefineTopKAtRest(spark, dir, emb, NQ, K,
          EmbD, PrefixRefineD))
      try audit("prefix_refine_at_rest")(df) finally rel()
    }
    audit("graph_search") {
      val g = graft.operators.Ivf.knnGraph(emb, KnnJ, IvfCells, EmbD, IvfProbe)
      graft.operators.Ivf.graphSearch(emb, g, NQ, K, GraphBeam, GraphRounds,
        IvfCells, EmbD)
    }
    spark.stop()
  }
}

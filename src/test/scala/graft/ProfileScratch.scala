package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch stage-by-stage profiler (test scope; not part of the library). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val s0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - s0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    val grams = Dedup.wordNgrams(docs, SparkEntry.Shingle)
    t("grams.count")(grams.count())
    val withTh = grams.withColumn("th", Dedup.strHash(col("gram")))
    t("strHash.count")(withTh.agg(max(col("th"))).collect())
    val sigs = Dedup.minhashSignatures(grams, SparkEntry.NumHashes)
    t("sigs.count")(sigs.count())
    t("sigs.count warm")(sigs.count())
    val pairs = Dedup.lshPairs(sigs, SparkEntry.Bands, SparkEntry.RowsPerBand)
    t("pairs.count")(pairs.count())
    t("pairs.count warm")(pairs.count())
    Dedup.releaseIntermediates()
    spark.stop()
  }
}

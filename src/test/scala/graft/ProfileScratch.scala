package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
      println(f"[prof] $name%-30s ${(System.nanoTime() - s0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    t("bpe cold")(graft.operators.TextOps.bpeUnits(docs).count())
    t("bpe warm")(graft.operators.TextOps.bpeUnits(docs).count())
    t("bpe warm2")(graft.operators.TextOps.bpeUnits(docs).count())
    spark.stop()
  }
}

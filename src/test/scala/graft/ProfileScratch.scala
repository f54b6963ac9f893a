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
    val path = t("ensureFixture")(
      graft.sources.Disaggregated.ensureFixture(spark, dir, SparkEntry.D, SparkEntry.KeepM))
    val stored = spark.read.parquet(path)
    t("stored.count")(stored.count())
    t("reduced scan")(graft.sources.Disaggregated.readReduced(spark, path).count())
    val q = Fixture.queries(stored.select(col("id"), col("vec")), SparkEntry.NQ)
      .select(col("qid"), col("qvec"))
    t("queries derive")(q.count())
    val df = SparkEntry.qRefineDisagg(spark, dir, "cos_l1")
    t("disagg cold")(df.count())
    t("disagg warm")(SparkEntry.qRefineDisagg(spark, dir, "cos_l1").count())
    t("disagg warm2")(SparkEntry.qRefineDisagg(spark, dir, "cos_l1").count())
    t("in-mem twin warm")(SparkEntry.queries("q_refine_cos_l1")(spark, dir).count())
    // D=128 attribution: fixture synthesis vs the refine pipeline itself
    // (codegen compile times logged at INFO by CodeGenerator)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.INFO)
    t("fix128 synthesize")(
      Fixture.fp16VectorsModCached(spark, dir, SparkEntry.D128,
        SparkEntry.KeepM, SparkEntry.D128KeyMod).count())
    t("d128 refine warm1")(SparkEntry.qRefineD128(spark, dir).count())
    t("d128 refine warm2")(SparkEntry.qRefineD128(spark, dir).count())
    spark.stop()
  }
}

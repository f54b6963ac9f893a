package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Ann, Ivf}

class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)
  import SparkEntry.{NQ, K, IvfCells, IvfProbe, EmbD, PqM, PqCodes, PqRerank}

  test("codebook is dyadic, float-exact, and in the corpus component range") {
    for (m <- 0 until PqM; c <- 0 until PqCodes; j <- 0 until EmbD / PqM) {
      val v = Pq.component(m, c, j, EmbD / PqM)
      assert(v >= -0.25 && v < 0.25)
      assert(v == v.toFloat.toDouble, "component must be float-exact")
      assert(v * 2048.0 == math.rint(v * 2048.0), "component must be k/2048")
    }
  }

  test("ivf-pq top-k: rescored scores are the exact full-precision scores") {
    val r = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect()
    assert(r.length == NQ * K)
    // every surfaced score must equal the brute-force exact score
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key),
        s"rescore for $key is not the exact score")
    }
  }

  test("ivf-pq results stay within the probed cells") {
    val r = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
    val asg = Ivf.assign(emb, IvfCells, EmbD).select(col("id"), col("cell"))
    val q = Ann.queriesOf(emb, NQ).select(col("qid"), col("qvec"))
    val probed = Ivf.probeCells(q, IvfCells, EmbD, IvfProbe)
      .select(col("qid"), col("cell"))
    val offCell = r.join(asg, Seq("id"))
      .join(probed, Seq("qid", "cell"), "left_anti")
    assert(offCell.count() == 0, "result outside the probed cells")
  }

  test("ivf-pq whole-stage code compiles (no Janino fallback)") {
    // the encode projection (128 l2Sq folds + 8 argmin CASE chains) and
    // the ADC pick projection are the new widest codegen trees — make
    // sure neither silently falls back to interpreted mode
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
    df.collect() // finalize AQE so the executed plan holds the real stages
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("ivf-pq is invariant under repartitioning") {
    val a = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val b = Pq.topk(emb.repartition(7), NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}

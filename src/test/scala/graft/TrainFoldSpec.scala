package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, TrainFold}

/**
 * The streaming sorted-group fold behind every hash-graded trained
 * statistic: O(1) per-group state (the scale contract — no
 * whole-occupancy collect_list buffer anywhere in the plan), bit-exact
 * agreement with the pinned id-ordered left fold (the determinism /
 * oracle contract), and partitioning invariance.
 */
class TrainFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // one group holding 50k ids — the shape whose whole-group
  // collect_list is the 100 TB OOM the sorted-group fold avoids;
  // 1/(id+1) values make the sum order-sensitive in the last ulps
  private val N = 50000
  private def corpus = spark.range(N).select(
    col("id"),
    (col("id") % 3).cast("int").as("g"),
    (lit(1.0) / (col("id") + 1).cast("double")).as("x"))

  test("bit-equal to the pinned id-ordered left fold; n correct") {
    val rows = TrainFold.orderedSums(corpus, Seq("g"), "id",
      Seq("x" -> "s")).collect()
      .map(r => r.getAs[Int]("g") -> (r.getAs[Long]("n"), r.getAs[Double]("s")))
      .toMap
    assert(rows.keySet == Set(0, 1, 2))
    for (g <- 0 to 2) {
      // the contract fold, replayed exactly: 0.0-init left fold in id order
      var expect = 0.0
      var cnt = 0L
      (0 until N).foreach { i =>
        if (i % 3 == g) { expect += 1.0 / (i + 1); cnt += 1 }
      }
      assert(rows(g)._1 == cnt)
      assert(rows(g)._2 == expect,
        s"group $g fold not bit-equal to the pinned left fold")
    }
  }

  test("no whole-group collect buffer in the plan (O(1) state)") {
    // the scale contract, pinned at the plan level: the fold must run
    // as a sorted-group streaming MapGroups over an external sort, not
    // as a collect_list aggregation whose buffer is the group
    val plan = TrainFold.orderedSums(corpus, Seq("g"), "id",
      Seq("x" -> "s")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"),
      "orderedSums plan materializes a whole group in one buffer")
    assert(plan.contains("MapGroups"), "expected a streaming group fold")
    val phys = Ivf.kmeansStep(Tables.embeddings(spark,
      "/root/testdata/sf0.001"), SparkEntry.IvfCells, SparkEntry.EmbD)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("collect_list"),
      "kmeansStep still collects whole cells into aggregation buffers")
    assert(phys.contains("Sort"), "expected the external sort under the fold")
  }

  test("bit-exact under any partitioning; multi-value; empty group list") {
    val df = corpus.withColumn("y", col("x") * col("x"))
    val base = TrainFold.orderedSums(df, Seq.empty, "id",
      Seq("x" -> "sx", "y" -> "sy")).collect()(0)
    assert(base.getAs[Long]("n") == N)
    for (p <- Seq(1, 57)) {
      val r = TrainFold.orderedSums(df.repartition(p), Seq.empty, "id",
        Seq("x" -> "sx", "y" -> "sy")).collect()(0)
      assert(r.getAs[Double]("sx") == base.getAs[Double]("sx") &&
        r.getAs[Double]("sy") == base.getAs[Double]("sy"),
        s"sorted-group fold not bit-stable at $p partitions")
    }
  }

  test("spherical k-means: unit centroids, occupancy partition, serve recovers brute at full probe") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    import SparkEntry.{IvfCells, EmbD, NQ, K}
    val step = Ivf.kmeansSphericalStep(emb, IvfCells, EmbD).collect()
    // occupancies partition the corpus
    val n = emb.count()
    val occ = step.groupBy(_.getInt(0))
      .map { case (_, rows) => rows.map(_.getAs[Long]("n")).distinct }
    occ.foreach(o => assert(o.size == 1, "n must be constant within a cell"))
    assert(occ.map(_.head).sum == n, "cell occupancies must partition")
    // the projected centroids are unit vectors (up to fp rounding)
    step.groupBy(_.getInt(0)).foreach { case (c, rows) =>
      val ss = rows.sortBy(_.getInt(1))
        .map(_.getAs[Double]("unit")).map(u => u * u).sum
      assert(math.abs(ss - 1.0) < 1e-9, s"cell $c unit norm^2 $ss != 1")
    }
    // step is invariant under repartitioning
    val again = Ivf.kmeansSphericalStep(emb.repartition(7), IvfCells, EmbD)
      .collect().map(_.toSeq).toSet
    assert(again == step.map(_.toSeq).toSet)
    // full probe over the spherical cells recovers the brute scan
    val cells = step.map(_.getInt(0)).distinct.length
    val full = Ivf.topkSpherical(emb, NQ, K, IvfCells, EmbD, nprobe = cells)
      .collect().map(_.toSeq).toSet
    val brute = graft.operators.Ann.bruteTopK(emb, NQ, K)
      .select(col("qid"), col("rank"), col("id"), col("score"))
      .collect().map(_.toSeq).toSet
    assert(full == brute, "full-probe spherical serve must equal brute")
  }

  test("spherical-PQ composed serve compiles whole-stage (no Janino fallback)") {
    // the composed rung stacks the spherical assignment's nCells x d
    // literal chains AND the PQ encode's mSub*codes subspace-distance
    // folds in one pipeline — the widest codegen tree in the engine;
    // a silent interpreted fallback would masquerade as contention
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    import SparkEntry.{IvfCells, EmbD, NQ, K, IvfProbe, PqM, PqCodes,
      PqRerank}
    val df = graft.operators.Pq.topkSphericalResidual(emb, NQ, K, IvfCells,
      EmbD, IvfProbe, PqM, PqCodes, PqRerank)
    df.collect()
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("spherical-PQ composed serve compiles whole-stage at D=1024") {
    // the reference's cosine datasets are 1024-3072 wide, and the
    // composed serve is the engine's widest whole-stage tree — width is
    // where it breaks first (the r14 build found the raw reduceLeft
    // assignment chains overflow the Column converter exactly here);
    // assert the D=1024 plan both runs and COMPILES (no Janino fallback)
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = SparkEntry.qAnnSphericalPqD1024(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty, "d1024 spherical serve returned no rows")
    // every query's rank-1 hit is itself at cosine ~1 (sanity of the
    // composed estimate + rescore at width)
    rows.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("qid") == r.getAs[Long]("id"),
        s"rank-1 self-hit missing at d1024: $r")
    }
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile at d1024 for:\n$subtree")
    }
  }

  test("spherical-PQ composed serve compiles whole-stage at D=3072") {
    // the reference's largest evaluated width — 384-dim PQ subspaces
    // over the spherical residuals; same guard as the d1024 twin
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = SparkEntry.qAnnSphericalPqD3072(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty, "d3072 spherical serve returned no rows")
    rows.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("qid") == r.getAs[Long]("id"),
        s"rank-1 self-hit missing at d3072: $r")
    }
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile at d3072 for:\n$subtree")
    }
  }

  test("stream-maintained spherical codes serve identical rows once drained") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    import SparkEntry.{IvfCells, EmbD, NQ, K, IvfProbe, PqM, PqCodes,
      PqRerank}
    val batch = graft.operators.Pq.topkSphericalResidualAtRest(spark, dir,
      emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val streamed = graft.operators.Pq.topkSphericalResidualOffCodes(spark,
      graft.streaming.StreamOps.ensureStreamSphericalCodes(spark, dir,
        IvfCells, EmbD, PqM, PqCodes),
      emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "drained spherical codes diverged from the batch build")
  }

  test("spherical serve compiles whole-stage (no Janino fallback)") {
    // the assignment projection stacks nCells literal dot chains of d
    // terms each — the widest new codegen tree after LSH's bucket sum;
    // a silent interpreted fallback would masquerade as contention
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    import SparkEntry.{IvfCells, EmbD, NQ, K, IvfProbe}
    val df = Ivf.topkSpherical(emb, NQ, K, IvfCells, EmbD, IvfProbe)
    df.collect() // finalize AQE so the executed plan holds the real stages
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }
}

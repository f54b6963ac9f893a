package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Refine, Sweep}
import graft.sources.{Disaggregated, VecFiles}

class StorageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("disaggregated layout: reduced scan prunes the full-precision column") {
    val path = java.nio.file.Files.createTempDirectory("disagg").toString + "/vecs"
    val v = Fixture.vectors(spark, dir, SparkEntry.D)
    Disaggregated.write(v, path, keepM = 6)

    val reduced = Disaggregated.readReduced(spark, path)
    Disaggregated.assertPruned(reduced, Set("id", "rvec", "delta"))
    val full = Disaggregated.readFull(spark, path)
    Disaggregated.assertPruned(full, Set("id", "vec"))

    // the stored reduced copy must round-trip the truncation semantics
    val row = spark.read.parquet(path).orderBy("id").limit(1).collect()(0)
    val vec  = row.getSeq[Float](row.fieldIndex("vec"))
    val rvec = row.getSeq[Float](row.fieldIndex("rvec"))
    vec.zip(rvec).foreach { case (x, r) =>
      assert(graft.functions.Fp16.reduceValue(x, 5, 6) == r)
    }
    // refinement runs end-to-end off the disaggregated table
    val stored = spark.read.parquet(path)
    val q = Fixture.queries(
      stored.select(col("id"), col("vec"), col("rvec"), col("delta")), 3)
      .select(col("qid"), col("qvec"))
    val topk = Refine.topk(stored, q, Refine.Params("cos_l1", k = 5, keepM = 6))
    assert(topk.count() == 15)
  }

  test("pushed filter reaches the parquet scan on the id fetch path") {
    val path = java.nio.file.Files.createTempDirectory("disagg2").toString + "/vecs"
    Disaggregated.write(Fixture.vectors(spark, dir, SparkEntry.D), path, 6)
    val fetch = Disaggregated.readFull(spark, path).filter(col("id") === 1234L)
    val scan = fetch.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("EqualTo(id,1234)"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
  }

  test("nprobe tuning sweeps round-trip the K1 CSV sink with sane operating points") {
    import SparkEntry.{NQ, K, IvfCells, EmbD, TuneNprobes, EmbSq8ScaleLog2, Sq8Rerank}
    val emb = Tables.embeddings(spark, dir)
    val (plain, release) = graft.operators.Dedup.scopedRelease(
      graft.operators.Ivf.tuneNprobe(emb, NQ, K, IvfCells, EmbD, TuneNprobes))
    val rows = plain.orderBy("nprobe").collect()
    release()
    assert(rows.length == TuneNprobes.length)
    // save falls as nprobe grows (more candidates scanned), recall rises
    // to exactly 1.0 at full probe; save hits exactly 0 there (every
    // candidate pays full bytes = the brute baseline)
    val saves = rows.map(_.getAs[Double]("save"))
    assert(saves.zip(saves.tail).forall { case (a, b) => a >= b })
    assert(rows.last.getAs[Double]("recall") == 1.0)
    assert(rows.last.getAs[Double]("save") == 0.0)
    // the two-phase rung keeps a positive saving even at full probe (its
    // cheap pass is 1 byte/dim, rescore bounded by rerank*Q)
    val (sq8, release2) = graft.operators.Dedup.scopedRelease(
      graft.operators.Ivf.tuneNprobeSq8(emb, NQ, K, IvfCells, EmbD,
        TuneNprobes, EmbSq8ScaleLog2, Sq8Rerank))
    val sq8rows = sq8.orderBy("nprobe").collect()
    release2()
    assert(sq8rows.last.getAs[Double]("save") > 0.5)
    sq8rows.foreach { r =>
      assert(r.getAs[Long]("bytes_cheap") == r.getAs[Long]("cand") * EmbD)
      assert(r.getAs[Long]("bytes_rescore") == r.getAs[Long]("fetched") * 4L * EmbD)
      assert(r.getAs[Long]("fetched") <= Sq8Rerank.toLong * NQ)
    }
    // the reference persists its sweep as a CSV artifact (sweep CSV,
    // ANNCode.py:735) — the nprobe sweep rides the same K1 sink
    val out = java.nio.file.Files.createTempDirectory("nprobe").toString
    graft.operators.Sweep.writeCsv(sq8, s"$out/csv")
    val back = spark.read.option("header", "true").csv(s"$out/csv")
    assert(back.columns.toSet == Set("nprobe", "hits", "recall", "cand",
      "fetched", "bytes_cheap", "bytes_rescore", "save"))
    assert(back.count() == TuneNprobes.length)
    // ... and the K2 sink renders its recall-vs-save operating curve
    // (the reference's {mode}_recall_vs_save.png shape, ANNCode.py:782)
    graft.operators.Plot.writeXyPng(s"$out/nprobe_recall_vs_save.png",
      sq8rows.map(_.getAs[Double]("save")).toSeq,
      sq8rows.map(_.getAs[Double]("recall")).toSeq,
      "Bandwidth saving", s"Recall@$K", "ivf-sq8: recall vs saving")
    val png = javax.imageio.ImageIO.read(
      new java.io.File(s"$out/nprobe_recall_vs_save.png"))
    assert(png.getWidth == 900 && png.getHeight == 600)
  }

  test("2-D tuning grid: monotone frontier, CSV round-trip, K2 curve") {
    import SparkEntry.{NQ, K, IvfCells, EmbD, TuneGridNprobes, TuneGridReranks,
      EmbSq8ScaleLog2}
    val emb = Tables.embeddings(spark, dir)
    val (grid, release) = graft.operators.Dedup.scopedRelease(
      graft.operators.Ivf.tuneGridSq8(emb, NQ, K, IvfCells, EmbD,
        TuneGridNprobes, TuneGridReranks, EmbSq8ScaleLog2))
    val rows = grid.orderBy("nprobe", "rerank").collect()
    release()
    assert(rows.length == TuneGridNprobes.length * TuneGridReranks.length)
    val byKey = rows.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    // recall is non-decreasing along BOTH axes (superset candidates /
    // superset survivors under an exact rescore can never lose a hit),
    // and save strictly falls with rerank at fixed nprobe (same cheap
    // bytes, more rescore bytes — until the fetch saturates)
    for (np <- TuneGridNprobes; Seq(r1, r2) <- TuneGridReranks.sorted.sliding(2)) {
      assert(byKey((np, r1)).getAs[Double]("recall") <=
        byKey((np, r2)).getAs[Double]("recall"))
      assert(byKey((np, r1)).getAs[Double]("save") >=
        byKey((np, r2)).getAs[Double]("save"))
    }
    // NOT asserted along the nprobe axis at fixed rerank: a deeper probe
    // adds candidates to the approximate sq8 cheap ranking, and a
    // fixed-depth rerank cut over that ranking can DISPLACE a true hit
    // from the cut — superset-of-candidates only implies monotone recall
    // when the cut depth grows with the candidate set (the rerank axis).
    // Empirically recall rises with nprobe on this fixture, but it is a
    // fixture property, not an invariant; assert only a loose no-collapse
    // expectation (deepest probe within 2 hits of the shallowest).
    for (rr <- TuneGridReranks) {
      val ns = TuneGridNprobes.sorted
      val first = byKey((ns.head, rr)).getAs[Long]("hits")
      val last = byKey((ns.last, rr)).getAs[Long]("hits")
      assert(last >= first - 2,
        s"rerank=$rr: hits collapsed ${first} -> ${last} as nprobe grew")
    }
    // K1 CSV artifact + K2 operating-surface curve, like the 1-D sweeps
    val out = java.nio.file.Files.createTempDirectory("grid").toString
    graft.operators.Sweep.writeCsv(grid, s"$out/csv")
    val back = spark.read.option("header", "true").csv(s"$out/csv")
    assert(back.columns.toSet == Set("nprobe", "rerank", "hits", "recall",
      "cand", "fetched", "bytes_cheap", "bytes_rescore", "save"))
    assert(back.count() == rows.length)
    graft.operators.Plot.writeXyPng(s"$out/grid_recall_vs_save.png",
      rows.map(_.getAs[Double]("save")).toSeq,
      rows.map(_.getAs[Double]("recall")).toSeq,
      "Bandwidth saving", s"Recall@$K", "ivf-sq8 2-D grid: recall vs saving")
    val png = javax.imageio.ImageIO.read(
      new java.io.File(s"$out/grid_recall_vs_save.png"))
    assert(png.getWidth == 900 && png.getHeight == 600)
  }

  test("rung ladder rides the CSV and PNG sinks (the headline figure)") {
    import SparkEntry.{NQ, K, PrefixD, PrefixRerank, BqRerank, EmbD}
    import graft.operators.{Ann, Bq, Ladder}
    val emb = Tables.embeddings(spark, dir)
    val gt = Ann.bruteTopK(emb, NQ, K)
    val ladder = Ladder.recallTable(spark, Seq(
      ("bq_1bit", 8, Bq.topk(emb, NQ, K, BqRerank, EmbD)),
      (s"prefix${PrefixD}_fp32", 4 * PrefixD,
        Ann.prefixTopK(emb, NQ, K, PrefixD, PrefixRerank)),
      ("exact_fp32", 4 * EmbD, gt)), gt, NQ * K)
    val rows = ladder.orderBy("bytes_per_vec").collect()
    assert(rows.length == 3)
    val out = java.nio.file.Files.createTempDirectory("ladder").toString
    // K1: the ladder as a CSV artifact
    graft.operators.Sweep.writeCsv(ladder, s"$out/csv")
    val back = spark.read.option("header", "true").csv(s"$out/csv")
    assert(back.columns.toSet == Set("rung", "bytes_per_vec", "hits", "recall"))
    assert(back.count() == 3)
    // K2: recall vs cheap-pass bytes — the reference's headline curve
    graft.operators.Plot.writeXyPng(s"$out/ladder_recall_vs_bytes.png",
      rows.map(_.getAs[Int]("bytes_per_vec").toDouble).toSeq,
      rows.map(_.getAs[Double]("recall")).toSeq,
      "Cheap-pass bytes/vec", s"Recall@$K", "rung ladder: recall vs bytes")
    val png = javax.imageio.ImageIO.read(
      new java.io.File(s"$out/ladder_recall_vs_bytes.png"))
    assert(png.getWidth == 900 && png.getHeight == 600)
  }

  test("sweep grid produces one metrics row per config with invariants") {
    val q = Fixture.queries(
      Fixture.fp16VectorsCached(spark, dir, SparkEntry.D, 6), 3)
      .select(col("qid"), col("qvec"))
    val grid = Sweep.Grid(modes = Seq("cos_l1", "l2_tz", "cos_hoeff"),
      keepMs = Seq(4, 8), k = 5)
    val mDf = Sweep.run(
      km => Fixture.fp16VectorsCached(spark, dir, SparkEntry.D, km), q,
      SparkEntry.D, grid)
    val m = mDf.collect()
    assert(m.length == 6) // 3 modes x 2 keepMs
    m.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // recall
      assert(r.getDouble(4) < 1.0)                           // save
    }
    // zero-miss rows must have recall exactly 1.0
    m.filter(r => r.getString(0) == "cos_l1" || r.getString(0) == "l2_tz")
      .foreach(r => assert(r.getDouble(3) == 1.0))
    // K1 CSV sink round-trips the grid; K2 plot sink renders it
    val out = java.nio.file.Files.createTempDirectory("sweep").toString
    Sweep.writeCsv(mDf, s"$out/csv")
    val back = spark.read.option("header", "true").csv(s"$out/csv")
    assert(back.count() == 6 && back.columns.toSeq ==
      Seq("mode", "m_keep", "delta", "recall", "save", "fpr"))
    assert(graft.operators.Plot.writeSweepPngs(mDf, s"$out/png", grid.k)
      .size == 6) // 3 modes x 2 charts
  }

  test("compressed-bytes override tightens the saving (O6 path)") {
    import graft.operators.BitplaneCompress
    val v = Fixture.fp16VectorsCached(spark, dir, SparkEntry.D, 6)
    val q = Fixture.queries(v, 3).select(col("qid"), col("qvec"))
    val measured = BitplaneCompress
      .measure(v.select(col("id"), col("vec")), SparkEntry.D, 5, 6)
      .collect()(0).getDouble(4)
    val p = Refine.Params("cos_l1", k = 5, keepM = 6)
    val naive = Refine.metrics(v, q, p, SparkEntry.D).collect()(0).getDouble(4)
    val overr = Refine.metrics(v, q, p, SparkEntry.D,
      redBytesOverride = Some(measured)).collect()(0).getDouble(4)
    // compressed reduced pages are smaller than the naive bit count ->
    // strictly more saving (paper §4.3 composition)
    assert(measured < 12.0, s"measured=$measured not < naive 12B")
    assert(overr > naive, s"override saving $overr <= naive $naive")
  }

  test("K2 plot sink renders the reference's two sweep charts per mode") {
    import spark.implicits._
    val metrics = Seq(
      ("cos_l1", 4, 0.0, 1.0, 0.61, 0.012),
      ("cos_l1", 6, 0.0, 1.0, 0.44, 0.007),
      ("cos_l1", 8, 0.0, 1.0, 0.21, 0.003),
      ("l2_hoeff", 4, 0.7, 0.96, 0.70, 0.020),
      ("l2_hoeff", 6, 0.7, 0.99, 0.52, 0.011))
      .toDF("mode", "m_keep", "delta", "recall", "save", "fpr")
    val out = java.nio.file.Files.createTempDirectory("plots").toString
    val paths = graft.operators.Plot.writeSweepPngs(metrics, out, k = 5)
    assert(paths.size == 4) // 2 modes x (recall_vs_save, fpr_vs_mbits)
    assert(paths.exists(_.endsWith("cos_l1_recall_vs_save.png")))
    assert(paths.exists(_.endsWith("l2_hoeff_fpr_vs_mbits.png")))
    paths.foreach { p =>
      val img = javax.imageio.ImageIO.read(new java.io.File(p))
      assert(img != null, s"$p is not a decodable PNG")
      assert(img.getWidth == 900 && img.getHeight == 600)
      // the series must actually be drawn: look for the marker color
      val series = new java.awt.Color(31, 119, 180).getRGB
      val drawn = (0 until img.getWidth by 3).exists(x =>
        (0 until img.getHeight by 3).exists(y => img.getRGB(x, y) == series))
      assert(drawn, s"$p has no series pixels")
    }
    // a single-point, constant-value series must not divide by zero
    graft.operators.Plot.writeXyPng(s"$out/one.png", Seq(0.5), Seq(1.0),
      "x", "y", "degenerate")
    assert(javax.imageio.ImageIO.read(new java.io.File(s"$out/one.png")) != null)
  }

  test("fvecs and header-bin sources reproduce the in-memory cosine topk") {
    val base = SparkEntry.qTopkCos(spark, dir).collect().map(_.toSeq).toSet
    val fv = SparkEntry.qTopkCosFvecsSource(spark, dir).collect().map(_.toSeq).toSet
    val hb = SparkEntry.qTopkCosBinSource(spark, dir).collect().map(_.toSeq).toSet
    val dp = SparkEntry.qTopkCosDispatch(spark, dir).collect().map(_.toSeq).toSet
    assert(fv == base, "fvecs round-trip diverged")
    assert(hb == base, "header-bin round-trip diverged")
    assert(dp == base, "S4 dispatcher (positional .vec) round-trip diverged")
    assert(base.size == SparkEntry.NQ * SparkEntry.K)
  }

  test("subsample is deterministic and exact-count") {
    val v = Fixture.vectors(spark, dir, SparkEntry.D)
    val a = VecFiles.subsample(v, 100).select("id").collect().map(_.getLong(0)).toSet
    val b = VecFiles.subsample(v.repartition(13), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.size == 100 && a == b)
  }
}

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

  test("residual ivf-pq at D=1024 compiles whole-stage (no Janino fallback)") {
    // the width row's entire point: the encode stage (8-branch residual
    // CASE over 1024-wide zip_with + 128 l2Sq folds + argmin chains) must
    // stay COMPILED where wide trees historically hit the 64KB cliff (r4)
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = SparkEntry.qAnnPqResD1024(spark, dir)
    df.collect()
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("wide cascade (D=128) compiles whole-stage (no Janino fallback)") {
    // two sign-pack folds + the 128-wide dequant transform + norm folds
    // stacked over the synthesis trees — the cascade's widest codegen
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = SparkEntry.qAnnCascadeWide(spark, dir)
    df.collect()
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("wide bq (D=128): exact rescores, agrees with single-word bq on d<=64") {
    import SparkEntry.BqRerank
    // parity on the embeddings table at d=64: topkWide's two-word path
    // degenerates to one word and must return exactly topk's rows
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qs = Ann.queriesOf(emb, NQ).select(col("qid"), col("qvec"))
    val wide = graft.operators.Bq.topkWide(vecs, qs, K, BqRerank, EmbD)
      .collect().map(_.toSeq).toSet
    val narrow = graft.operators.Bq.topk(emb, NQ, K, BqRerank, EmbD)
      .collect().map(_.toSeq).toSet
    assert(wide == narrow, "wide BQ at d=64 must equal single-word BQ")
    // and the D=128 fixture run returns full rows with exact rescores
    val r = SparkEntry.qAnnBqWide(spark, dir)
    val v128 = Fixture.fp16VectorsModCached(spark, dir, SparkEntry.D128,
      SparkEntry.KeepM, SparkEntry.D128KeyMod)
    val q128 = Fixture.queries(v128, NQ).select(col("qid"), col("qvec"))
    val exact = graft.operators.Refine.exactTopK(
      v128.select(col("id"), col("vec")), q128,
      SparkEntry.refineParams("cos_l2")).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    val rows = r.collect()
    assert(rows.length == NQ * K)
    rows.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      exact.get(key).foreach(s =>
        assert(row.getAs[Double]("score") == s,
          s"wide-bq rescore for $key is not the exact score"))
    }
  }

  test("shard-merged codes layout: file-level merge, rows equal the whole-corpus build") {
    import SparkEntry.PqShards
    val mergedPath = Pq.ensureMergedShardsFixture(spark, dir, IvfCells, EmbD,
      PqM, PqCodes, PqShards)
    // the merge is a FILE operation: parts from >= 2 distinct shards
    // coexist under the cell directories, bytes untouched
    val shardsSeen = new java.io.File(mergedPath).listFiles
      .filter(_.getName.startsWith("cell=")).flatMap(_.listFiles)
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.takeWhile(_ != '_')).distinct.sorted
    assert(shardsSeen.length >= 2,
      s"merged layout must carry parts from >= 2 shards, saw $shardsSeen")
    // row-identical to the whole-corpus build (encode is deterministic)
    val whole = Pq.ensureCodesFixture(spark, dir, IvfCells, EmbD, PqM, PqCodes)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("id"), col("cell"), col("code"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(rows(mergedPath).toSeq == rows(whole).toSeq,
      "shard-merged layout diverges from the whole-corpus build")
    // ... and the query off it equals the in-memory rung
    val got = Pq.topkOffCodes(spark, mergedPath, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("score"))).sortBy(x => (x._1, x._2))
    val mem = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes,
      PqRerank).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("score"))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == mem.toSeq, "query off merged layout diverges")
  }

  test("stream-maintained PQ codes layout equals the batch rung") {
    val a = graft.streaming.StreamOps.pqOverStream(spark, dir, emb,
      NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val b = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes,
      PqRerank).collect().map(_.toSeq).toSet
    assert(a == b && a.size == NQ * K,
      "streamed codes layout diverged from the batch rung")
    // the drain was genuinely incremental: multi-shard landing at one
    // file per trigger means the layout accumulated across microbatches
    val landing =
      graft.streaming.StreamOps.ensureShardedEmbLanding(spark, dir)
    val parts = new java.io.File(landing).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"landing has only $parts shard(s)")
  }

  test("stream-versioned delete log serves identical as-of snapshots") {
    import SparkEntry.DeleteMod
    def streamed(v: Int) = graft.streaming.StreamOps
      .pqDeletesAsOfOverStream(spark, dir, emb, NQ, K, IvfCells, EmbD,
        IvfProbe, PqM, PqCodes, PqRerank, DeleteMod, asOf = v)
      .collect().map(_.toSeq).toSet
    def batch(v: Int) = Pq.topkAtRestWithDeletesAsOf(spark, dir, emb,
      NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      DeleteMod, asOf = v).collect().map(_.toSeq).toSet
    // both snapshot endpoints and the mid snapshot agree with the
    // batch-built log (the drained rows are identical)
    (0 to 2).foreach(v => assert(streamed(v) == batch(v),
      s"streamed as-of $v diverged from the batch log"))
  }

  test("continuous top-k view: drained state equals the batch brute scan") {
    val view = graft.streaming.StreamOps
      .streamTopKViewOnce(spark, dir, emb, NQ, K)
      .collect().map(_.toSeq).toSet
    val brute = graft.operators.Ann.bruteTopK(emb, NQ, K)
      .select(col("qid"), col("rank"), col("id"), col("score"))
      .collect().map(_.toSeq).toSet
    assert(view == brute && view.size == NQ * K,
      "the incrementally-maintained view diverged from the batch scan")
    // the drain was genuinely incremental (multi-shard landing, one
    // file per trigger): cross-batch state merging was exercised
    val landing = graft.streaming.StreamOps
      .ensureShardedEmbLanding(spark, dir)
    val parts = new java.io.File(landing).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"landing has only $parts shard(s)")
  }

  test("as-of snapshots: endpoints equal the undeleted and fully-deleted serves") {
    import SparkEntry.DeleteMod
    def asOf(v: Int) = Pq.topkAtRestWithDeletesAsOf(spark, dir, emb,
      NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      DeleteMod, asOf = v).collect().map(_.toSeq).toSet
    // asOf 0 = the pre-delete snapshot = the plain at-rest serve
    val plain = Pq.topkAtRest(spark, dir, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(asOf(0) == plain, "asOf 0 must be the undeleted snapshot")
    // the latest commit = the full merge-on-read delete serve
    val deleted = Pq.topkAtRestWithDeletes(spark, dir, emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank, DeleteMod)
      .collect().map(_.toSeq).toSet
    assert(asOf(2) == deleted, "latest asOf must equal the plain delete serve")
    // the mid snapshot excludes exactly commit 1's ids and nothing else
    val mid = asOf(1)
    val midIds = mid.map(r => r(2).asInstanceOf[Long])
    assert(midIds.forall(_ % (2L * DeleteMod) != 0),
      "commit-1 tombstones must be gone at asOf 1")
    val commit2Only = plain.map(r => r(2).asInstanceOf[Long])
      .exists(id => id % DeleteMod == 0 && id % (2L * DeleteMod) != 0)
    if (commit2Only)
      assert(mid != deleted, "asOf 1 must still serve commit-2 victims")
  }

  test("upsert as-of snapshots: endpoints equal the pre-update and fully-upserted serves") {
    import SparkEntry.UpsertMod
    def asOf(v: Int) = Pq.topkAtRestUpsertedAsOf(spark, dir, emb,
      NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      UpsertMod, asOf = v).collect().map(_.toSeq).toSet
    // asOf 0 = the pre-update snapshot = the plain at-rest serve
    val plain = Pq.topkAtRest(spark, dir, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(asOf(0) == plain, "asOf 0 must be the pre-update snapshot")
    // the latest commit = the full merge-on-read upsert serve
    val upserted = Pq.topkAtRestUpserted(spark, dir, emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank, UpsertMod)
      .collect().map(_.toSeq).toSet
    assert(asOf(2) == upserted,
      "latest asOf must equal the plain upsert serve")
    // every snapshot equals RE-ENCODING the corpus at that snapshot's
    // values: asOf 1 = only ids ≡ 0 (mod 2·UpsertMod) updated
    def rebuilt(updMod: Long) = {
      val view = emb.select(col("vec_id"),
        when(col("vec_id") % updMod === 0,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      Pq.topkOffStored(
        Pq.encodeCodes(view, IvfCells, EmbD, PqM, PqCodes)
          .withColumnRenamed("embedding", "vec"),
        emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
        .collect().map(_.toSeq).toSet
    }
    assert(asOf(1) == rebuilt(2L * UpsertMod),
      "asOf 1 must equal the re-encode over the commit-1 view")
    // and the log is not degenerate: the three snapshots differ
    assert(asOf(0) != asOf(1) && asOf(1) != asOf(2),
      "upsert snapshots collapsed — vacuous fixture")
    // the SPHERICAL family's log brackets the same way (stale model)
    def sph(v: Int) = Pq.topkSphericalResidualAtRestUpsertedAsOf(spark,
      dir, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      UpsertMod, asOf = v).collect().map(_.toSeq).toSet
    val sphPlain = Pq.topkSphericalResidualAtRest(spark, dir, emb, NQ,
      K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val sphUps = Pq.topkSphericalResidualAtRestUpserted(spark, dir, emb,
      NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank, UpsertMod)
      .collect().map(_.toSeq).toSet
    assert(sph(0) == sphPlain && sph(2) == sphUps && sph(1) != sph(0),
      "spherical upsert snapshots do not bracket plain/upserted")
  }

  test("upsert merge: one file per cell, rows equal the merge-on-read view, base untouched") {
    import SparkEntry.UpsertMod
    val basePath = Pq.ensureCodesFixture(spark, dir, IvfCells, EmbD,
      PqM, PqCodes)
    def files(p: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = files(basePath)
    val merged = Pq.compactCodesUpsertMerge(spark, dir, IvfCells, EmbD,
      PqM, PqCodes, UpsertMod)
    assert(files(basePath) == before,
      "upsert merge touched a base code file")
    // one data file per cell after the OPTIMIZE
    val perCell = new java.io.File(merged).listFiles
      .filter(_.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles.count(_.getName.endsWith(".parquet")))
    assert(perCell.nonEmpty && perCell.forall(_._2 == 1),
      s"expected one file per cell after merge: ${perCell.toSeq}")
    // rows equal the merge-on-read view the upsert serve reads
    val cols = Seq("id", "cell", "vec", "code")
    val base = spark.read.parquet(basePath)
    val delta = spark.read.parquet(Pq.ensureUpsertDelta(spark, dir,
      IvfCells, EmbD, PqM, PqCodes, UpsertMod))
    val want = base.select(cols.head, cols.tail: _*)
      .join(delta.select(col("id")), Seq("id"), "left_anti")
      .unionByName(delta.select(cols.head, cols.tail: _*))
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(merged)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty,
      "merged layout != the merge-on-read view")
  }

  test("spherical as-of snapshots: endpoints equal the undeleted and fully-deleted serves") {
    import SparkEntry.DeleteMod
    // the L2 family's time-travel contract carried onto the composed
    // cosine layout: two as-of versions served off ONE immutable base
    // layout + one append-only versioned sidecar, hash-equal to the
    // per-version rebuilds (the plain at-rest and plain delete serves)
    def asOf(v: Int) = Pq.topkSphericalResidualAtRestWithDeletesAsOf(
      spark, dir, emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes,
      PqRerank, DeleteMod, asOf = v).collect().map(_.toSeq).toSet
    val plain = Pq.topkSphericalResidualAtRest(spark, dir, emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    assert(asOf(0) == plain, "asOf 0 must be the undeleted snapshot")
    val deleted = Pq.topkSphericalResidualAtRestWithDeletes(spark, dir,
      emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      DeleteMod).collect().map(_.toSeq).toSet
    assert(asOf(2) == deleted, "latest asOf must equal the plain delete serve")
    val mid = asOf(1)
    val midIds = mid.map(r => r(2).asInstanceOf[Long])
    assert(midIds.forall(_ % (2L * DeleteMod) != 0),
      "commit-1 tombstones must be gone at asOf 1")
    val commit2Only = plain.map(r => r(2).asInstanceOf[Long])
      .exists(id => id % DeleteMod == 0 && id % (2L * DeleteMod) != 0)
    if (commit2Only)
      assert(mid != deleted, "asOf 1 must still serve commit-2 victims")
  }

  test("streaming query serving equals the batch at-rest run") {
    val served = graft.streaming.StreamOps.annServeOverStream(spark, dir,
      emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val batch = Pq.topkAtRest(spark, dir, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    // per-query top-k is independent across queries, so the drained
    // union of per-microbatch pages is row-identical to the batch run
    assert(served == batch && served.size == NQ * K,
      "query-stream serve diverged from the batch at-rest run")
  }

  test("compacting the stream-maintained codes layout: fewer files, same rows") {
    val streamed = graft.streaming.StreamOps.ensureStreamPqCodes(
      spark, dir, IvfCells, EmbD, PqM, PqCodes)
    val compacted = graft.operators.Pq.compactCodesLayout(spark, streamed)
    def dataFiles(p: String): Int = {
      val root = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(root).count(_.getName.endsWith(".parquet"))
    }
    val (nS, nC) = (dataFiles(streamed), dataFiles(compacted))
    // 4 microbatches x cells before; one file per cell after
    assert(nC < nS, s"compaction did not reduce files: $nS -> $nC")
    assert(nC <= IvfCells, s"$nC files for $IvfCells cells")
    val a = Pq.topkOffCodes(spark, compacted, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    val b = Pq.topkOffCodes(spark, streamed, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a == b && a.size == NQ * K,
      "compaction changed query results")
  }

  test("cascade: approximation comes only from the cuts — full depth is exact") {
    import graft.operators.Cascade
    val n = emb.count().toInt
    // both cuts at corpus depth: every tier passes everything through,
    // so the exact rescore must reproduce the brute scan row-for-row
    val full = Cascade.topk(emb, NQ, K, EmbD, scaleLog2 = 7,
      rerank1 = n, rerank2 = n).collect().map(_.toSeq).toSet
    val brute = Ann.bruteTopK(emb, NQ, K).collect().map(_.toSeq).toSet
    assert(full == brute && full.size == NQ * K,
      "full-depth cascade diverged from brute")
    // and the cascade is invariant under repartitioning
    val a = Cascade.topk(emb, NQ, K, EmbD, 7, 60, 30)
      .collect().map(_.toSeq).toSet
    val b = Cascade.topk(emb.repartition(7), NQ, K, EmbD, 7, 60, 30)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == NQ * K,
      "cascade not invariant under repartitioning")
  }

  test("merge-on-read deletes: anti-join and physical compaction agree") {
    import org.apache.spark.sql.functions.col
    val mod = SparkEntry.DeleteMod
    val path = Pq.ensureCodesFixture(spark, dir, IvfCells, EmbD, PqM, PqCodes)
    val tombs = spark.read.parquet(Pq.ensureTombstones(spark, path, mod))
    assert(tombs.count() > 0, "delete set is empty — mod too large for sf")
    // merge-on-read: tombstones anti-joined at query time
    val a = Pq.topkOffCodesWithDeletes(spark, path, tombs, emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    // physical: compaction applies the deletes, then NO sidecar
    val compacted = Pq.compactCodesLayoutWithDeletes(spark, path, tombs)
    val b = Pq.topkOffCodes(spark, compacted, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a == b, "merge-on-read and compacted results diverge")
    // the tombstoned rows are physically gone...
    val left = spark.read.parquet(compacted)
      .filter(col("id") % mod === 0).count()
    assert(left == 0, s"$left tombstoned rows survive compaction")
    // ...and no surviving result row is a deleted id
    assert(a.forall(r => r(2).asInstanceOf[Long] % mod != 0))
    // deleting id 0 (a query's own self-hit) must change its top-1: the
    // delete is observable, not vacuous
    val full = Pq.topkOffCodes(spark, path, emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a != full, "delete had no observable effect")
  }

  test("stream-maintained knn graph equals the batch build, incrementally") {
    import org.apache.spark.sql.functions.col
    val j = SparkEntry.KnnJ
    val a = graft.streaming.StreamOps.knnGraphOverStream(spark, dir,
      j, IvfCells, EmbD, IvfProbe).collect().map(_.toSeq).toSet
    val b = graft.operators.Ivf.knnGraph(emb, j, IvfCells, EmbD, IvfProbe)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty,
      "stream-maintained knn graph diverged from the batch build")
    // the maintenance was genuinely incremental: edges landed across
    // multiple batches, AND some node was re-ranked in a later batch
    // than its first (the affected-node displacement path fired)
    val edgesDir = graft.streaming.StreamOps.ensureStreamKnnGraph(
      spark, dir, j, IvfCells, EmbD, IvfProbe) + "/edges"
    val ed = spark.read.parquet(edgesDir)
    val batches = ed.select(col("b")).distinct().count()
    assert(batches >= 2, s"graph built in $batches batch(es)")
    val reranked = ed.groupBy(col("qid"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("b")).as("nb"))
      .filter(col("nb") >= 2).count()
    assert(reranked > 0, "no node was ever re-ranked by a later arrival")
  }

  test("stream-maintained tombstone sidecar equals the batch delete set") {
    val mod = SparkEntry.DeleteMod
    val path = Pq.ensureCodesFixture(spark, dir, IvfCells, EmbD, PqM, PqCodes)
    val streamed = graft.streaming.StreamOps
      .ensureStreamTombstones(spark, path, mod)
    val batch = Pq.ensureTombstones(spark, path, mod)
    val a = spark.read.parquet(streamed).collect().map(_.getLong(0)).toSet
    val b = spark.read.parquet(batch).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty, "streamed delete set diverged from batch")
    // the drain was genuinely incremental: one appended file per trigger
    val parts = new java.io.File(streamed).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"streamed sidecar has only $parts file(s)")
  }

  test("wide bq rejects a width mismatch at execution, loudly") {
    import spark.implicits._
    // declared d=64 over 32-wide vectors: the assert_true filter must
    // fail the job with the mismatch spelled out, not silently pack a
    // half-empty word
    val vs = Seq.tabulate(20)(i => (i.toLong, Array.fill(32)(1.0f)))
      .toDF("id", "vec")
    val qs = vs.limit(2).select(col("id").as("qid"), col("vec").as("qvec"))
    val e = intercept[Exception] {
      graft.operators.Bq.topkWide(vs, qs, k = 2, rerank = 4, d = 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("width")),
      s"unexpected error: $e")
  }

  test("signPack packs sign bits exactly (incl. the sign bit at dim 63)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.VecExprs
    val v0 = Array.fill(64)(-1.0f)                       // code 0
    val v1 = Array.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)
    val v2 = Array.tabulate(64)(j => if (j == 63) 1.0f else 0.0f) // only bit 63
    val vz = Array.fill(64)(0.0f)                        // zeros are NOT positive
    val df = Seq((0L, v0), (1L, v1), (2L, v2), (3L, vz)).toDF("id", "embedding")
    val got = df.select(col("id"), VecExprs.signPack(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(0L -> 0L, 1L -> 0x5555555555555555L,
      2L -> Long.MinValue, 3L -> 0L)
    assert(got == expect)
    intercept[Exception] {
      Seq((0L, Array.fill(65)(1.0f))).toDF("id", "embedding")
        .select(VecExprs.signPack(col("embedding"))).collect()
    }
  }

  test("bq top-k: rescored scores are the exact full-precision scores") {
    import SparkEntry.BqRerank
    val r = graft.operators.Bq.topk(emb, NQ, K, BqRerank, EmbD).collect()
    assert(r.length == NQ * K)
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key))
    }
    val b = graft.operators.Bq.topk(emb.repartition(7), NQ, K, BqRerank, EmbD)
      .collect().map(_.toSeq).toSet
    assert(b == r.map(_.toSeq).toSet, "bq not invariant under repartitioning")
    // d > 64 is rejected at plan-build (one 64-bit code word), matching
    // the oracle's plan-build rejection — not deep inside generated code
    intercept[IllegalArgumentException] {
      graft.operators.Bq.topk(emb, NQ, K, BqRerank, 65)
    }
  }

  test("residual ivf-pq: exact rescores, invariant, full-depth equals plain IVF") {
    import SparkEntry.PqRerank
    val r = Pq.topkResidual(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect()
    assert(r.length == NQ * K)
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key))
    }
    val b = Pq.topkResidual(emb.repartition(7), NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(b == r.map(_.toSeq).toSet,
      "residual pq not invariant under repartitioning")
    // approximation comes ONLY from the rerank cut: at full rerank depth
    // the survivors are the whole probed candidate set, so the exact
    // rescore must reproduce the plain IVF scan row-for-row
    val full = Pq.topkResidual(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, emb.count().toInt).collect().map(_.toSeq).toSet
    val plain = Ivf.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe)
      .collect().map(_.toSeq).toSet
    assert(full == plain, "full-depth residual rerank != plain IVF")
  }

  test("opq+residual composition: exact rescores, full depth equals the opq rung") {
    import SparkEntry.PqRerank
    val r = Pq.topkResidualOpq(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect()
    assert(r.length == NQ * K)
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key),
        s"rescore for $key is not the exact score")
    }
    val b = Pq.topkResidualOpq(emb.repartition(7), NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(b == r.map(_.toSeq).toSet,
      "opq-residual not invariant under repartitioning")
    // both rungs probe the same transformed-space cells, and at full
    // rerank depth both exact-rescore the entire probed set — the
    // residual encode must change NOTHING there (codes only order the
    // cheap cut)
    val n = emb.count().toInt
    val fullRes = Pq.topkResidualOpq(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, n).collect().map(_.toSeq).toSet
    val fullOpq = Pq.topkPermuted(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, n).collect().map(_.toSeq).toSet
    assert(fullRes == fullOpq, "full-depth opq-residual != full-depth opq")
  }

  test("trained opq+residual: exact rescores, full depth equals the trained opq rung") {
    import SparkEntry.PqRerank
    val r = Pq.topkResidualOpqTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect()
    assert(r.length == NQ * K)
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key),
        s"rescore for $key is not the exact score")
    }
    val n = emb.count().toInt
    val fullRes = Pq.topkResidualOpqTrained(emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, n).collect().map(_.toSeq).toSet
    val fullOpq = Pq.topkOpqTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, n).collect().map(_.toSeq).toSet
    assert(fullRes == fullOpq,
      "full-depth trained opq-residual != full-depth trained opq")
  }

  test("trained opq+residual at rest: serve off the layout equals in-memory") {
    import SparkEntry.PqRerank
    val a = Pq.topkResidualOpqTrainedAtRest(spark, dir, emb, NQ, K, IvfCells,
      EmbD, IvfProbe, PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    val b = Pq.topkResidualOpqTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a == b && a.size == NQ * K,
      "trained composed at-rest serve diverged from the in-memory rung")
  }

  test("tuneNprobe grid matches independent per-nprobe scans, exact at full probe") {
    import SparkEntry.TuneNprobes
    try {
      val rows = Ivf.tuneNprobe(emb, NQ, K, IvfCells, EmbD, TuneNprobes)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows.keySet == TuneNprobes.toSet)
      val truth = Ann.bruteTopK(emb, NQ, K).collect()
        .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
      TuneNprobes.foreach { np =>
        // the shared-scan grid point must equal a from-scratch scan at np
        val ind = Ivf.topk(emb, NQ, K, IvfCells, EmbD, np).collect()
          .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
        val hits = ind.intersect(truth).size
        assert(rows(np) == ((hits.toLong, hits.toDouble / (K * NQ))), s"np=$np")
      }
      // candidate sets are nested in np and tie-breaks total-ordered, so
      // hits are monotone; probing every cell IS the exact scan
      val hitsAsc = TuneNprobes.sorted.map(rows(_)._1)
      assert(hitsAsc == hitsAsc.sorted)
      assert(rows(IvfCells)._2 == 1.0)
    } finally graft.operators.Dedup.releaseIntermediates()
  }

  test("ivf-pq is invariant under repartitioning") {
    val a = Pq.topk(emb, NQ, K, IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank)
      .collect().map(_.toSeq).toSet
    val b = Pq.topk(emb.repartition(7), NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("pq train step: deterministic fold at any parallelism, occupancy sums to N") {
    val n = emb.count()
    val a = Pq.trainStep(emb, PqM, PqCodes, EmbD).collect().map(_.toSeq).toSet
    // the ordered fold makes the float mean partition-count-invariant
    val b = Pq.trainStep(emb.repartition(7), PqM, PqCodes, EmbD)
      .collect().map(_.toSeq).toSet
    assert(a == b, "trained PQ means not invariant under repartitioning")
    val rows = a.toSeq.map(s => (s(0).asInstanceOf[Int],
      s(1).asInstanceOf[Int], s(2).asInstanceOf[Int],
      s(3).asInstanceOf[Long], s(4).asInstanceOf[Double]))
    // within every (subspace, dim) slice the code occupancies partition
    // the corpus
    rows.groupBy(r => (r._1, r._3)).foreach { case (_, g) =>
      assert(g.map(_._4).sum == n) }
    assert(rows.map(_._1).distinct.sorted == (0 until PqM))
    assert(rows.map(_._3).distinct.sorted == (1 to EmbD / PqM))
    assert(rows.forall(r => math.abs(r._5) < 1.0))
  }

  test("trained ivf-pq compiles whole-stage (no Janino fallback)") {
    // the trained encode projection is the widest tree of the training
    // family: up to 128 eight-term literal-chain distance folds + 8
    // argmin CASE chains over LIVE codes — a silent fallback to
    // interpreted mode would cost 10-40x at scale (the r11 trained-SQ8
    // lesson), so pin compilation
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = Pq.topkTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank)
    df.collect()
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("trained OPQ: valid, deterministic, variance-balancing permutation") {
    val p1 = Pq.trainedPermutation(emb, EmbD, PqM)
    assert(p1.sorted.toSeq == (0 until EmbD), "not a permutation")
    // training is an ordered fold -> partition-count-invariant
    val p2 = Pq.trainedPermutation(emb.repartition(7), EmbD, PqM)
    assert(p1.toSeq == p2.toSeq, "trained permutation not deterministic")
    // the training objective, on its own metric: per-subspace variance
    // spread no worse than the data-independent hash permutation's
    val v = emb.select(posexplode(col("embedding")))
      .groupBy("pos").agg(var_pop(col("col").cast("double")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sub = EmbD / PqM
    def spread(perm: Array[Int]): Double = {
      val sums = (0 until PqM).map(m =>
        (0 until sub).map(j => v(perm(m * sub + j))).sum)
      sums.max - sums.min
    }
    assert(spread(p1) <= spread(Pq.permutation(EmbD)._1),
      "variance-balanced allocation spread worse than the hash permutation")
    // the serve path stays exact-rescored
    val r = Pq.topkOpqTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect()
    assert(r.length == NQ * K)
  }

  test("trained OPQ allocation lowers PQ distortion on the graded corpus") {
    // graded at sf0.01 (the driver's verify scale): balanced variance
    // buys lower total quantization error than the hash permutation,
    // under both the dyadic codebooks and the retrained ones
    val emb01 = Tables.embeddings(spark, "/root/testdata/sf0.01")
    def sseOf(perm: Array[Int]): (Double, Double) = {
      val t = emb01.select(col("vec_id"),
        array(perm.indices.map(j =>
          element_at(col("embedding"), perm(j) + 1)): _*).as("embedding"))
      val rows = Pq.distortion(t, PqM, PqCodes, EmbD).collect()
      (rows.map(_.getDouble(2)).sum, rows.map(_.getDouble(3)).sum)
    }
    val (fixedInit, fixedTrained) = sseOf(Pq.permutation(EmbD)._1)
    val (optInit, optTrained) =
      sseOf(Pq.trainedPermutation(emb01, EmbD, PqM))
    assert(optInit <= fixedInit,
      s"trained OPQ init SSE $optInit > fixed $fixedInit")
    assert(optTrained <= fixedTrained,
      s"trained OPQ trained SSE $optTrained > fixed $fixedTrained")
  }

  test("D=1024 residual ivf-pq compiles whole-stage (no Janino fallback)") {
    // the widest expression trees in the suite: 128-dim subspace
    // distance folds, reconstruction norms, and ADC picks at D=1024 —
    // the exact shape of the r4 codegen cliff and the suspect for the
    // r11 48s concurrent bench row; pin compilation so a silent
    // interpreted-mode fallback can never masquerade as contention
    import org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats
    val df = SparkEntry.qAnnPqResD1024(spark, dir)
    df.collect()
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty, "expected whole-stage codegen subtrees")
    subtrees.foreach { case (subtree, _, stats) =>
      assert(stats != ByteCodeStats.UNAVAILABLE,
        s"whole-stage codegen failed to compile for:\n$subtree")
    }
  }

  test("pq distortion: training strictly reduces SSE in every subspace") {
    val rows = Pq.distortion(emb, PqM, PqCodes, EmbD).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == PqM)
    val n = emb.count()
    rows.foreach { case (m, cnt, init, trained) =>
      assert(cnt == n, s"subspace $m counted $cnt of $n vectors")
      assert(init > 0.0 && trained > 0.0)
      // Lloyd monotonicity: means minimize within-cluster SSE and
      // re-assignment only shrinks it further
      assert(trained <= init,
        s"subspace $m: training worsened SSE ($init -> $trained)")
    }
    // on this fixture the improvement is substantial, not epsilon
    val totalInit = rows.map(_._3).sum
    val totalTrained = rows.map(_._4).sum
    assert(totalTrained < 0.9 * totalInit,
      "training bought < 10% SSE — suspicious for a first Lloyd round")
    // deterministic at any parallelism (id-ordered folds)
    val again = Pq.distortion(emb.repartition(7), PqM, PqCodes, EmbD)
      .collect().map(_.toSeq).toSet
    assert(again == rows.map(r => Seq(r._1, r._2, r._3, r._4)).toSet)
  }

  test("trained ivf-pq: exact rescores, full-depth over full probes equals plain IVF") {
    val r = Pq.topkTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank).collect()
    assert(r.length == NQ * K)
    val brute = Ann.bruteTopK(emb, NQ, emb.count().toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key),
        s"trained-pq rescore for $key is not the exact score")
    }
    // approximation comes only from nprobe and the rerank cut: with
    // every cell probed and full-depth rerank the retrained quantizer
    // must reproduce the plain exact IVF scan row-for-row
    val full = Pq.topkTrained(emb, NQ, K, IvfCells, EmbD, IvfCells,
      PqM, PqCodes, emb.count().toInt).collect().map(_.toSeq).toSet
    val plain = Ivf.topk(emb, NQ, K, IvfCells, EmbD, IvfCells)
      .collect().map(_.toSeq).toSet
    assert(full == plain, "full-depth trained rerank != plain IVF")
  }

  test("sampled-trained ivf-pq: bounded train set, exact rescores, recall floor") {
    // the 100 TB training path: the Lloyd pass sees only the counter-
    // keyed sample, everything is encoded and served with the
    // sample-trained codebooks. The stride must genuinely subsample at
    // the fixture (non-vacuity) and the served quality must hold a
    // recall floor against the exact scan — codebooks trained on a
    // bounded sample, not a degraded index.
    val every = 3 // the sf0.001 fixture's stride (500 / (8·16))
    val n = emb.count()
    val sampleN = emb.filter(col("vec_id") % every === 0).count()
    assert(sampleN < n / 2,
      s"sample $sampleN not a genuine subsample of $n — vacuous")
    val r = Pq.topkTrained(emb, NQ, K, IvfCells, EmbD, IvfProbe,
      PqM, PqCodes, PqRerank, sampleEvery = every).collect()
    assert(r.length == NQ * K)
    // every returned score is the exact rescore (two-phase contract)
    val brute = Ann.bruteTopK(emb, NQ, n.toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    r.foreach { row =>
      val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
      assert(row.getAs[Double]("score") == brute(key),
        s"sampled-trained rescore for $key is not the exact score")
    }
    // recall floor vs the exact top-k. The dominant loss at this
    // fixture is nprobe (2 of 8 cells) and the rerank cut, NOT the
    // sample: the full-corpus-trained rung measures 0.39 here and the
    // sampled strides 0.41-0.43 (fewer training vectors smooth the
    // codebooks on this synthetic corpus). The floor pins "trained on
    // a sample" != "broken"; the anchor pins "sampling costs at most a
    // sliver vs the full-corpus pass".
    val exact = Ann.bruteTopK(emb, NQ, K).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
    val got = r.map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.35,
      f"sampled-trained recall $recall%.2f below the 0.35 floor")
    val fullTrained = Pq.topkTrained(emb, NQ, K, IvfCells, EmbD,
      IvfProbe, PqM, PqCodes, PqRerank).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
    val fullRecall = fullTrained.intersect(exact).size.toDouble / exact.size
    assert(recall >= fullRecall - 0.1,
      f"sampled recall $recall%.2f collapsed vs full-trained $fullRecall%.2f")
  }

  test("sampled spherical and OPQ trains: bounded train set, exact rescores, recall holds vs full") {
    // the sampled-train discipline extended to the engine's two other
    // trained passes: the spherical Lloyd step and the OPQ variance
    // ranking run over the counter-keyed sample only; encode and serve
    // cover everything. Quality contract: the sample-trained serve's
    // recall stays within 0.1 of the full-corpus-trained twin's (the
    // trained_sampled convention), and every returned score is still
    // the exact rescore.
    val every = 3
    val n = emb.count()
    assert(emb.filter(col("vec_id") % every === 0).count() < n / 2,
      "sample not a genuine subsample — vacuous")
    val brute = Ann.bruteTopK(emb, NQ, n.toInt).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id")) ->
        x.getAs[Double]("score")).toMap
    val exact = Ann.bruteTopK(emb, NQ, K).collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      rows.foreach { row =>
        val key = (row.getAs[Long]("qid"), row.getAs[Long]("id"))
        assert(row.getAs[Double]("score") == brute(key),
          s"sampled-train rescore for $key is not the exact score")
      }
      rows.map(x => (x.getAs[Long]("qid"), x.getAs[Long]("id"))).toSet
        .intersect(exact).size.toDouble / exact.size
    }
    val sphSampled = recallOf(Pq.topkSphericalResidual(emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      sampleEvery = every).collect())
    val sphFull = recallOf(Pq.topkSphericalResidual(emb, NQ, K,
      IvfCells, EmbD, IvfProbe, PqM, PqCodes, PqRerank).collect())
    assert(sphSampled >= sphFull - 0.1,
      f"sampled spherical recall $sphSampled%.2f collapsed vs " +
        f"full-trained $sphFull%.2f")
    val opqSampled = recallOf(Pq.topkOpqTrained(emb, NQ, K, IvfCells,
      EmbD, IvfProbe, PqM, PqCodes, PqRerank,
      sampleEvery = every).collect())
    val opqFull = recallOf(Pq.topkOpqTrained(emb, NQ, K, IvfCells,
      EmbD, IvfProbe, PqM, PqCodes, PqRerank).collect())
    assert(opqSampled >= opqFull - 0.1,
      f"sampled OPQ recall $opqSampled%.2f collapsed vs full-trained " +
        f"$opqFull%.2f")
  }
}

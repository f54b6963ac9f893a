package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SRP-LSH (signed-random-projection locality-sensitive hashing) bucketed
 * retrieval — the HASH-bucket alternative to the IVF coarse quantizer as
 * the candidate-generation scale path (Charikar 2002; multi-probe form
 * Lv et al. 2007). The reference's two-phase discipline (cheap candidate
 * cut, exact rescore — `ANNCode.py:300-340`) applied to a bucketing
 * family the engine's IVF/graph rungs don't cover:
 *
 *  - each vector collapses MAP-SIDE to a P-bit bucket key, one sign bit
 *    per fixed hyperplane (bit p = [dot(v, h_p) > 0]);
 *  - a query probes its own bucket plus the P Hamming-1 neighbours
 *    (multi-probe: flip one sign bit — the nearest misclassification is
 *    overwhelmingly a single near-zero margin, so probing the 1-flip
 *    shell recovers most boundary loss for P+1 bucket reads instead of
 *    a 2^P rehash or a second table);
 *  - candidates come from a bucket EQUI-JOIN (never all-pairs), then a
 *    bounded exact cosine rescore ranks the survivors.
 *
 * At 100 TB the bucket is a write-time partition key ([[ensureLayout]]):
 * probe-bucket selection becomes Parquet partition pruning and a query
 * touches ~(P+1)/2^P of the corpus. Assignment is embarrassingly
 * map-side (no training pass, unlike IVF's centroids) — the property
 * that makes LSH the standard choice when the corpus distribution
 * drifts too fast to retrain a quantizer.
 *
 * Hyperplane components are deterministic integers in [-500, 500] from
 * the [[graft.Fixture]] mixing arithmetic on a dedicated plane-key
 * space; the DuckDB oracle embeds the identical values as exact
 * literals. Every sign bit is the comparison of a left-fold DOUBLE dot
 * chain both engines evaluate term-for-term in the same order, so
 * bucket keys — and therefore candidate sets, scores, and ranks —
 * hash-match bit-for-bit.
 */
object Lsh {

  /** Deterministic integer hyperplane component for (plane p, dim j):
    * the Fixture hash on key = PlaneKeyBase + p, reduced to [-500, 500].
    * Integer components times float embeddings are exact in DOUBLE, so
    * the sign-bit comparison is bit-deterministic across engines. */
  final val PlaneKeyBase = 7777801L

  def planeComponent(p: Int, j: Int): Double = {
    val key = PlaneKeyBase + p
    val h = (key * (graft.Fixture.HMul + (j + 1) * graft.Fixture.JMul) +
      (j + 1) * 1013904223L) % graft.Fixture.BigP
    (h % 1001L - 500L).toDouble
  }

  /** Left-assoc dot chain of a FLOAT[] column against plane p's literal
    * components — term order matches the oracle's SQL chain exactly. */
  private def planeDot(v: Column, p: Int, d: Int): Column =
    (0 until d).map(j =>
      v.getItem(j).cast("double") * lit(planeComponent(p, j)))
      .reduceLeft(_ + _)

  /** P-bit bucket key: bit p set iff dot(v, h_p) > 0. */
  def bucketCol(v: Column, d: Int, nPlanes: Int): Column = {
    require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes=$nPlanes not in [1,62]")
    (0 until nPlanes).map(p =>
      when(planeDot(v, p, d) > lit(0.0), lit(1L << p)).otherwise(lit(0L)))
      .reduceLeft(_ + _)
  }

  /** (qid, qvec, qn2, bucket): each query's multi-probe set — its own
    * bucket plus the first `nFlips` Hamming-1 flips (the probe-depth
    * knob, LSH's `nprobe` analogue), all distinct by construction (so no
    * candidate pair needs de-duplication: a vector lives in exactly one
    * bucket). */
  private def probeSet(q: DataFrame, d: Int, nPlanes: Int,
                       nFlips: Int): DataFrame =
    q.withColumn("b0", bucketCol(col("qvec"), d, nPlanes))
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(col("b0") +: (0 until nFlips).map(p =>
          col("b0").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))

  private def cosScore: Column =
    graft.functions.VectorOps.dot(col("embedding"), col("qvec")) /
      (graft.functions.VectorOps.fnorm(col("n2")) *
        graft.functions.VectorOps.fnorm(col("qn2")))

  /**
   * Multi-probe SRP-LSH top-k: (qid, rank, id, score) with exact
   * cosine scores; approximation comes from the probe set only. The
   * probe relation is nq*(P+1) rows — broadcast — so the corpus scan is
   * one map-side bucket assignment + broadcast hash join; nothing
   * all-pairs, nothing shuffled.
   *
   * `nFlips` (default: all nPlanes) truncates the 1-flip shell — the
   * probe-depth knob; `nFlips = 0` probes the exact bucket only.
   * `probeAllBuckets = true` probes every occupied bucket (spec use:
   * buckets partition the corpus, so the full-probe result is provably
   * the brute-force top-k).
   */
  def topk(emb: DataFrame, nq: Int, k: Int, d: Int, nPlanes: Int,
           nFlips: Int = -1, probeAllBuckets: Boolean = false): DataFrame = {
    val flips = if (nFlips < 0) nPlanes else nFlips
    require(flips <= nPlanes, s"nFlips=$flips > nPlanes=$nPlanes")
    val V = graft.functions.VectorOps
    val codes = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"),
      bucketCol(col("embedding"), d, nPlanes).as("bucket"))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes =
      if (probeAllBuckets)
        q.crossJoin(codes.select(col("bucket")).distinct())
      else probeSet(q, d, nPlanes, flips)
    val scored = codes.join(broadcast(probes), Seq("bucket"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /**
   * Probe-depth TUNING sweep — the LSH analogue of the IVF family's
   * recall/nprobe grid (`Ivf.recallAtR`, `q_tune_nprobe`): for every
   * probe depth f in 0..P, recall@k vs candidate volume. One scored
   * candidate scan at FULL depth is persisted and every depth is a
   * filter + rank cut over it (each candidate pair carries the depth
   * that first admits it: 0 for the query's own bucket, p+1 for the
   * flip of bit p — a vector lives in exactly one bucket, so the
   * admitting probe is unique); ground truth is one brute pass.
   *
   * Output per depth: (nflips, buckets, cands, hits, recall) — the
   * recall-vs-I/O trade the operator ships with, as a hash-checked
   * table.
   */
  def probeSweep(emb: DataFrame, nq: Int, k: Int, d: Int,
                 nPlanes: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val codes = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"),
      bucketCol(col("embedding"), d, nPlanes).as("bucket"))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probeRows = q.withColumn("b0", bucketCol(col("qvec"), d, nPlanes))
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(
          struct(lit(0).as("reqd"), col("b0").as("bucket")) +:
            (0 until nPlanes).map(p => struct(lit(p + 1).as("reqd"),
              col("b0").bitwiseXOR(lit(1L << p)).as("bucket"))): _*))
          .as("pr"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("pr.reqd").as("reqd"), col("pr.bucket").as("bucket"))
    val scored = Dedup.persistScoped(
      codes.join(broadcast(probeRows), Seq("bucket"))
        .withColumn("score", cosScore)
        .select(col("qid"), col("id"), col("reqd"), col("score")))
    val truth = Dedup.persistScoped(Ann.bruteTopK(emb, nq, k)
      .select(col("qid"), col("id")))
    scored.count(); truth.count() // fill once; every cut reads the cache
    (0 to nPlanes).map { f =>
      val cf = scored.filter(col("reqd") <= f)
      val top = TopK.window(cf, k).select(col("qid"), col("id"))
      top.join(truth, Seq("qid", "id")).agg(count(lit(1)).as("hits"))
        .crossJoin(cf.agg(count(lit(1)).as("cands")))
        .select(lit(f).as("nflips"), lit(f + 1).as("buckets"),
          col("cands"), col("hits"),
          (col("hits").cast("double") / lit((nq * k).toDouble))
            .as("recall"))
    }.reduce(_.union(_))
  }

  /**
   * The OPERATING-POINT PICK off [[probeSweep]]'s table: the SHALLOWEST
   * depth whose recall meets `recallFloor` (cands is monotone in depth,
   * so shallowest-meeting = cheapest-meeting), falling back to the full
   * shell when nothing meets it. Same rows as the sweep plus a `chosen`
   * flag — the decision an operator actually deploys, hash-checked.
   */
  def probeSweepPick(emb: DataFrame, nq: Int, k: Int, d: Int, nPlanes: Int,
                     recallFloor: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = probeSweep(emb, nq, k, d, nPlanes).collect()
      .toList.sortBy(_.getAs[Int]("nflips"))
    val chosen = rows.find(_.getAs[Double]("recall") >= recallFloor)
      .map(_.getAs[Int]("nflips"))
      .getOrElse(rows.last.getAs[Int]("nflips"))
    rows.map { r =>
      (r.getAs[Int]("nflips"), r.getAs[Int]("buckets"),
        r.getAs[Long]("cands"), r.getAs[Long]("hits"),
        r.getAs[Double]("recall"), r.getAs[Int]("nflips") == chosen)
    }.toDF("nflips", "buckets", "cands", "hits", "recall", "chosen")
  }

  // --- bucket-partitioned layout at rest ---------------------------------

  /** Bump when the at-rest layout or the bucket expression changes. */
  private val LayoutVersion = 1

  /**
   * Materialize the LSH table AT REST: (id, embedding, n2) written once,
   * `partitionBy("bucket")` — probe-bucket selection becomes Parquet
   * partition pruning (PlanSpec asserts), the 100 TB layout where a
   * query's I/O is the probed buckets' files only. Immutable
   * version-named dir, atomic scratch publish (the [[Ivf.ensureIndex]]
   * discipline).
   */
  def ensureLayout(spark: SparkSession, sfDir: String, d: Int,
                   nPlanes: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // cache key = the SHARED source stamp (Fixture.srcVersion covers
    // embeddings mtimes too), so this layout and its stream-maintained
    // twin can never go stale independently of each other
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_lsh_v${LayoutVersion}_${safe}_p${nPlanes}_d${d}" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "lsh-")
      graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"), col("embedding"),
          graft.functions.VectorOps.norm2Sq(col("embedding")).as("n2"),
          bucketCol(col("embedding"), d, nPlanes).as("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"lsh layout publish failed: $path")
    }
    path.toString
  }

  /**
   * Multi-probe top-k OFF THE AT-REST LAYOUT — the at-rest twin of
   * [[topk]], returning identical rows: the probe-bucket set is bounded
   * (<= nq*(P+1) values), collected, and pushed into the scan as a
   * STATIC partition filter, so only the probed buckets' files are read.
   */
  def topkAtRest(spark: SparkSession, sfDir: String, emb: DataFrame,
                 nq: Int, k: Int, d: Int, nPlanes: Int): DataFrame =
    topkOffLayout(spark, ensureLayout(spark, sfDir, d, nPlanes),
      emb, nq, k, d, nPlanes)

  /** [[topkAtRest]]'s query half against an explicit layout path — shared
    * by the batch-built and stream-maintained layouts (both hold the
    * identical (id, embedding, n2, bucket) rows once drained). `tombs`
    * (id) rows are anti-joined out of the CANDIDATES only — base files
    * untouched, the merge-on-read contract (queries themselves come from
    * the external query relation, never the layout, so deleting a vector
    * never deletes a query). */
  def topkOffLayout(spark: SparkSession, path: String, emb: DataFrame,
                    nq: Int, k: Int, d: Int, nPlanes: Int,
                    tombs: Option[DataFrame] = None): DataFrame =
    topkOverStored(spark.read.parquet(path), emb, nq, k, d, nPlanes,
      tombs)

  /** The serve body over an explicit stored frame
    * (id, embedding, n2, bucket) — lets the upsert path interpose its
    * merged base∖updated ∪ delta view (both sides bucket-partitioned,
    * so the probe filter still prunes). */
  private def topkOverStored(stored: DataFrame, emb: DataFrame,
                             nq: Int, k: Int, d: Int, nPlanes: Int,
                             tombs: Option[DataFrame]): DataFrame = {
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = probeSet(q, d, nPlanes, nPlanes)
    val buckets = probes.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted
    // no broadcast hint on the tombstone anti-join: the delete set is
    // corpus-fraction-sized (it grows with the table, unlike the bounded
    // query/model relations), so AQE picks the strategy from its actual
    // runtime size — broadcast while small, shuffled once it is not
    val cand = tombs match {
      case Some(t) => stored.join(
        t.select(col("id")), Seq("id"), "left_anti")
      case None => stored
    }
    val scored = cand
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .join(broadcast(probes), Seq("bucket"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  // --- at-rest lifecycle: merge-on-read deletes + compaction --------------

  /** Bump when the LSH upsert delta layout changes. */
  private val UpsertLayoutVersion = 1

  /**
   * The UPDATE commit for the LSH layout — the last family missing the
   * upsert verb: updated rows (ids ≡ 0 mod `mod`, v' = −v — float-exact
   * and norm-preserving) RE-HASHED through the same sign-plane bucket
   * function and published as their own bucket-partitioned delta. LSH
   * has no trained model, so there is no stale-model subtlety: the
   * re-hash IS the whole update, and negation flips every plane dot,
   * so updated vectors land in complementary buckets. Norms carry over
   * bit-for-bit ((−x)² = x² per element, identical sums). Base files
   * never touched. Idempotent, atomic publish.
   */
  def ensureUpsertDelta(spark: SparkSession, layoutPath: String,
                        mod: Int, d: Int, nPlanes: Int): String = {
    import java.nio.file.{Files, Paths}
    require(mod >= 2, s"mod=$mod")
    val path = Paths.get(layoutPath + s"_upsertv${UpsertLayoutVersion}_mod$mod")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "lshup-")
      spark.read.parquet(layoutPath)
        .filter(col("id") % mod === 0)
        .select(col("id"),
          transform(col("embedding"), x => -x).as("embedding"),
          col("n2"))
        .withColumn("bucket", bucketCol(col("embedding"), d, nPlanes))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"lsh upsert delta publish failed: $path")
    }
    path.toString
  }

  /** [[topkAtRest]] under the update commit: the merged view — base
    * rows minus the updated ids (a pushed mod predicate, base files
    * byte-immutable) union the re-hashed delta — served by the same
    * probe pipeline. Queries stay the external raw relation, so an
    * updated vector's own raw query probes its OLD bucket while the
    * corpus copy lives in the complementary one — exactly what a real
    * vector update does to an SRP index. */
  def topkAtRestUpserted(spark: SparkSession, sfDir: String,
                         emb: DataFrame, nq: Int, k: Int, d: Int,
                         nPlanes: Int, mod: Int): DataFrame = {
    val base = ensureLayout(spark, sfDir, d, nPlanes)
    val delta = ensureUpsertDelta(spark, base, mod, d, nPlanes)
    val merged = spark.read.parquet(base)
      .filter(col("id") % mod =!= 0)
      .unionByName(spark.read.parquet(delta))
    topkOverStored(merged, emb, nq, k, d, nPlanes, None)
  }

  /** Upsert COMPACTION on the LSH layout — the
    * [[graft.operators.Pq.compactCodesUpsertMerge]] OPTIMIZE for the
    * bucket family: base rows of updated ids dropped, the re-hashed
    * delta folded in, one id-sorted file per bucket, published
    * atomically. The merged layout holds the merge-on-read view's
    * rows, so the plain serve is hash-equal to [[topkAtRestUpserted]]
    * (same oracle) with no excision predicate at query time. */
  /** Bump when the merged layout's shape or merge semantics change. */
  private val UpsertMergeLayoutVersion = 1

  def compactLayoutUpsertMerge(spark: SparkSession, sfDir: String,
                               d: Int, nPlanes: Int, mod: Int): String = {
    import java.nio.file.{Files, Paths}
    val basePath = ensureLayout(spark, sfDir, d, nPlanes)
    val deltaPath = ensureUpsertDelta(spark, basePath, mod, d, nPlanes)
    val dst = Paths.get(basePath +
      s"_upsmergedv${UpsertMergeLayoutVersion}_mod$mod")
    if (!Files.exists(dst.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(dst.getParent, "lshupsmerge-")
      val base = spark.read.parquet(basePath)
      val delta = spark.read.parquet(deltaPath)
        .select(base.columns.map(col): _*)
      base.join(delta.select(col("id")), Seq("id"), "left_anti")
        .unionByName(delta)
        .repartition(col("bucket"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("bucket")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, dst)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(dst.resolve("_SUCCESS")),
        s"lsh upsert-merge publish failed: $dst")
    }
    dst.toString
  }

  /** Bump when the LSH versioned upsert log layout changes. */
  private val UpsertLogLayoutVersion = 1

  /** The LSH family's VERSIONED update log
    * ([[graft.operators.Pq.ensureVersionedUpsertDeltas]]'s pattern):
    * the same re-hashed delta rows, each stamped with its commit
    * (1 = ids ≡ 0 mod 2·mod, 2 completes the set), bucket-partitioned
    * beside the byte-immutable base. */
  def ensureVersionedUpsertDeltas(spark: SparkSession, layoutPath: String,
                                  mod: Int, d: Int,
                                  nPlanes: Int): String = {
    import java.nio.file.{Files, Paths}
    require(mod >= 2, s"mod=$mod")
    val path = Paths.get(layoutPath +
      s"_upsertlogv${UpsertLogLayoutVersion}_mod$mod")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "lshupslog-")
      spark.read.parquet(layoutPath)
        .filter(col("id") % mod === 0)
        .select(col("id"),
          transform(col("embedding"), x => -x).as("embedding"),
          col("n2"))
        .withColumn("bucket", bucketCol(col("embedding"), d, nPlanes))
        .withColumn("commit_v",
          when(col("id") % (2L * mod) === 0, lit(1)).otherwise(lit(2)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"lsh versioned upsert log publish failed: $path")
    }
    path.toString
  }

  /** AS-OF serve over the LSH update log: snapshot v = base minus ids
    * updated by commits ≤ v plus those commits' re-hashed rows — asOf 0
    * is the pre-update layout, the latest asOf equals
    * [[topkAtRestUpserted]]. Excision is an id anti-join (the applied
    * prefix is corpus-fraction-sized — AQE, no broadcast hint). */
  def topkAtRestUpsertedAsOf(spark: SparkSession, sfDir: String,
                             emb: DataFrame, nq: Int, k: Int, d: Int,
                             nPlanes: Int, mod: Int,
                             asOf: Int): DataFrame = {
    val base = ensureLayout(spark, sfDir, d, nPlanes)
    val log = ensureVersionedUpsertDeltas(spark, base, mod, d, nPlanes)
    val delta = spark.read.parquet(log)
      .filter(col("commit_v") <= asOf)
      .select(col("id"), col("embedding"), col("n2"), col("bucket"))
    val merged = spark.read.parquet(base)
      .join(delta.select(col("id")), Seq("id"), "left_anti")
      .unionByName(delta)
    topkOverStored(merged, emb, nq, k, d, nPlanes, None)
  }

  /**
   * Write the deterministic DELETE SET (ids ≡ 0 mod `mod` of the stored
   * layout) as a tombstone sidecar beside the bucket layout — the
   * fixture form of a production delete commit, following the PQ codes
   * and postings pattern ([[Pq.ensureTombstones]]): base files are
   * NEVER touched (byte-immutable, spec-asserted), the sidecar is
   * bounded, compaction is the table service's later job. Idempotent.
   */
  def ensureTombstones(spark: SparkSession, layoutPath: String,
                       mod: Int): String = {
    import java.nio.file.{Files, Paths}
    require(mod >= 2, s"mod=$mod")
    val path = Paths.get(layoutPath + s"_tomb_mod$mod")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "lshtomb-")
      spark.read.parquet(layoutPath)
        .select(col("id")).filter(col("id") % mod === 0)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"lsh tombstone publish failed: $path")
    }
    path.toString
  }

  /** Multi-probe top-k off the at-rest layout WITH merge-on-read
    * deletes: tombstoned vectors stop being retrievable immediately;
    * the bucket files stay byte-immutable. */
  def topkAtRestWithDeletes(spark: SparkSession, sfDir: String,
                            emb: DataFrame, nq: Int, k: Int, d: Int,
                            nPlanes: Int, deleteMod: Int): DataFrame = {
    val root = ensureLayout(spark, sfDir, d, nPlanes)
    val tombPath = ensureTombstones(spark, root, deleteMod)
    topkOffLayout(spark, root, emb, nq, k, d, nPlanes,
      tombs = Some(spark.read.parquet(tombPath)))
  }

  /**
   * AS-OF (time-travel) serve on the LSH layout — the verb that
   * completes its lifecycle matrix (build / at-rest / stream / delete /
   * compact / delete-folding compact / AS-OF): the append-only
   * versioned delete log ([[Pq.ensureVersionedTombstones]] — a generic
   * commit-history sidecar over any id-carrying layout) applies only
   * commits with `commit_v <= asOf`; asOf 0 is the pre-delete snapshot,
   * the latest asOf equals the plain merge-on-read delete query. The
   * snapshot choice filters the bounded sidecar before the anti-join;
   * the immutable bucket files are shared by every snapshot.
   */
  def topkAtRestWithDeletesAsOf(spark: SparkSession, sfDir: String,
                                emb: DataFrame, nq: Int, k: Int, d: Int,
                                nPlanes: Int, deleteMod: Int,
                                asOf: Int): DataFrame = {
    val root = ensureLayout(spark, sfDir, d, nPlanes)
    val tombs = spark.read.parquet(
      Pq.ensureVersionedTombstones(spark, root, deleteMod))
      .filter(col("commit_v") <= asOf).select(col("id"))
    topkOffLayout(spark, root, emb, nq, k, d, nPlanes, tombs = Some(tombs))
  }

  /**
   * Compact a stream-maintained LSH layout: the many small
   * per-microbatch part files rewrite into one id-sorted file per
   * bucket (the table service's OPTIMIZE — the LSH twin of
   * [[Pq.compactCodesLayout]] and [[Search.compactPostingsLayout]]).
   * Row content is identical, so every query off the compacted layout
   * is hash-equal; id-sorting within each bucket restores row-group
   * skipping for the delete anti-join's id predicate pushdown.
   */
  /**
   * Compaction WITH the delete set folded in — the OPTIMIZE that
   * physically removes tombstoned rows: the rewrite anti-joins the
   * tombstones, so queries off the result equal the merge-on-read
   * delete-aware query with NO sidecar lookup at all. Output path is
   * content-addressed on a two-reduction digest of the tombstone id
   * set (the [[Pq.compactCodesLayoutWithDeletes]] discipline: count +
   * bit_xor + wrapping sum of per-id hashes — two equal-sized delete
   * sets can't silently reuse each other's compaction).
   */
  def compactLayoutWithDeletes(spark: SparkSession, srcPath: String,
                               tombs: DataFrame): String = {
    import java.nio.file.{Files, Paths}
    val dig = tombs
      .select(graft.operators.Dedup.strHash(col("id").cast("string")).as("h"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(col("h")), lit(0L)).as("hx"),
        coalesce(sum(pmod(col("h"), lit(1L << 60)).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("hs"))
      .collect()(0)
    val nDel = dig.getLong(0)
    val hDel = java.lang.Long.toHexString(dig.getLong(1))
    val sDel = java.lang.Long.toHexString(
      dig.getDecimal(2).remainder(new java.math.BigDecimal(1L << 60))
        .longValueExact())
    val dst = Paths.get(srcPath + s"_compacted_del${nDel}_${hDel}_$sDel")
    if (!Files.exists(dst.resolve("_DONE"))) {
      val tmp = Files.createTempDirectory(dst.getParent, "lshdelcompact-")
      spark.read.parquet(srcPath)
        .join(tombs.select(col("id")), Seq("id"), "left_anti")
        .repartition(col("bucket"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("bucket")
        .option("compression", "zstd").parquet(tmp.toString)
      Files.createFile(tmp.resolve("_DONE"))
      try Files.move(tmp, dst)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(dst.resolve("_DONE")),
        s"lsh delete-compaction publish failed: $dst")
    }
    dst.toString
  }

  def compactLayout(spark: SparkSession, srcPath: String): String = {
    import java.nio.file.{Files, Paths}
    val dst = Paths.get(srcPath + "_compacted")
    if (!Files.exists(dst.resolve("_DONE"))) {
      val tmp = Files.createTempDirectory(dst.getParent, "lshcompact-")
      spark.read.parquet(srcPath)
        .repartition(col("bucket"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("bucket")
        .option("compression", "zstd").parquet(tmp.toString)
      Files.createFile(tmp.resolve("_DONE"))
      try Files.move(tmp, dst)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(dst.resolve("_DONE")),
        s"lsh compaction publish failed: $dst")
    }
    dst.toString
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** events with `ts` normalized to the repo-wide contract: BIGINT
    * nanoseconds since epoch, naive wall-clock treated as UTC — exactly
    * what DuckDB's `epoch(ts)` computes on the same parquet, so oracle
    * SQL and Spark agree independent of the session time zone.
    *
    * The driver has shipped the column as TIMESTAMP(NANOS) (Spark 4
    * rejects it without `nanosAsLong`), as timestamp[us] NTZ, and a
    * LTZ read is possible under `inferTimestampNTZ=false` — normalize
    * ALL of them here, at the single choke point, so every downstream
    * consumer keeps its integer arithmetic (`ts div 1e9`; ns epochs
    * exceed 2^53, so double math would corrupt them). The NTZ path uses
    * pure wall-clock `timestampdiff` (time-zone-free by construction);
    * the LTZ path uses `unix_micros` (epoch is TZ-independent). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTsNanos(load(spark, sfDir, "events"))
  }

  /** Rewrites an events relation's `ts` to BIGINT epoch-nanos whatever
    * type the file delivered (shared by the batch loader above and the
    * streaming source, which reads the same files). */
  def normalizeTsNanos(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsNanos = raw.schema("ts").dataType match {
      case LongType => col("ts")
      case TimestampNTZType => expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000L
      case TimestampType => unix_micros(col("ts")) * 1000L
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other")
    }
    raw.withColumn("ts", tsNanos)
  }
}

/**
 * Deterministic, partitioning-invariant vector synthesis over the driver
 * tables (FIXTURES.md §3). The same arithmetic is emitted as DuckDB SQL by
 * [[graft.oracle.OracleGen]]; keeping the constants here keeps both sides
 * in lock-step.
 *
 * Two domains:
 *
 *  - '''intVec''': integer components in [-500, 500]. Dot products are
 *    exact integers in DOUBLE, so scores hash-match the oracle bit-for-bit
 *    regardless of aggregation order.
 *
 *  - '''fp16Vec''': components sgn * (1 + m/1024) * 2^s with m in [0,1024),
 *    s in {-1,0,1} — every value is exactly representable in IEEE half
 *    (11-bit significand), so the float32->fp16 cast is the identity and
 *    the reference's mantissa-truncation (`ANNCode.py:186-216`) reduces to
 *    integer arithmetic on m that plain SQL can replicate. Products of two
 *    components carry <= 24 significant bits -> all pairwise sums of dim
 *    products are EXACT in DOUBLE -> refinement scores/cushions are
 *    bit-reproducible across engines and partitionings.
 */
object Fixture {
  // mixing constants (shared with OracleGen; arbitrary odd multipliers).
  // Every hash is first reduced mod the Mersenne prime 2^31-1 so component
  // streams are NOT periodic in `key` with the small final modulus.
  final val HMul   = 2654435761L
  final val JMul   = 40503L
  final val SgnMul = 69621L
  final val SgnJ   = 12345L
  final val ScMul  = 48271L
  final val ScJ    = 16807L
  final val BigP   = 2147483647L

  /** BIGINT row key for lineitem (linenumber is 1..7; pairs can repeat in
    * the synthetic data, so vector tables must take DISTINCT keys). */
  def lineitemKey: Column = col("l_orderkey") * 10 + col("l_linenumber")

  // j must enter the MULTIPLIER: with j only additive, h(key2,j)-h(key1,j)
  // is constant across dims, so a single unlucky key delta collides every
  // dim at once and produces exact duplicate vectors.
  private def h(key: Column, j: Int): Column =
    (key * (HMul + (j + 1) * JMul) + lit((j + 1) * 1013904223L)) % BigP

  /** Integer-domain component: (((key*HMul + (j+1)*JMul) % P) % 1001) - 500. */
  def intComponent(key: Column, j: Int): Column =
    (h(key, j) % 1001L - 500L).cast("float")

  def intVec(key: Column, d: Int): Column =
    array((0 until d).map(j => intComponent(key, j)): _*)

  /** fp16-exact component pieces. */
  def mant(key: Column, j: Int): Column = h(key, j) % 1024L
  def sgn(key: Column, j: Int): Column =
    when(((key * (SgnMul + j * SgnJ) + lit(j.toLong)) % BigP) % 2L === 0L, 1.0)
      .otherwise(-1.0)
  /** scale exponent s in {-1, 0, 1} -> multiplier 2^s */
  def scaleExp(key: Column, j: Int): Column =
    ((key * (ScMul + j * ScJ) + lit(j.toLong)) % BigP) % 3L - 1L
  def scaleMul(key: Column, j: Int): Column = {
    val s = scaleExp(key, j)
    when(s === -1L, 0.5).when(s === 0L, 1.0).otherwise(2.0)
  }

  def fp16Component(key: Column, j: Int): Column =
    (sgn(key, j) * (lit(1.0) + mant(key, j).cast("double") / 1024.0) * scaleMul(key, j))
      .cast("float")

  def fp16Vec(key: Column, d: Int): Column =
    array((0 until d).map(j => fp16Component(key, j)): _*)

  /** Reduced component: mantissa truncated to keepM bits (drop = 10-keepM). */
  def fp16ReducedComponent(key: Column, j: Int, keepM: Int): Column = {
    val dropPow = 1L << (10 - keepM)
    val m  = mant(key, j)
    val rm = m - (m % dropPow)
    (sgn(key, j) * (lit(1.0) + rm.cast("double") / 1024.0) * scaleMul(key, j))
      .cast("float")
  }

  def fp16ReducedVec(key: Column, d: Int, keepM: Int): Column =
    array((0 until d).map(j => fp16ReducedComponent(key, j, keepM)): _*)

  /** Delta = 2^(e-15-keepM); component exponent is 15+s -> 2^(s-keepM). */
  def fp16DeltaComponent(key: Column, j: Int, keepM: Int): Column =
    (scaleMul(key, j) * lit(math.pow(2.0, -keepM))).cast("float")

  def fp16DeltaVec(key: Column, d: Int, keepM: Int): Column =
    array((0 until d).map(j => fp16DeltaComponent(key, j, keepM)): _*)

  /**
   * Int8 scalar-quantization rung for the precision ladder (beyond the
   * reference's fp16 truncation tiers — the IVF-SQ8-style cheap copy
   * vector stores ship): each component is quantized to an integer code
   * k = floor(v * 2^scaleLog2 + 0.5), dequantized as k / 2^scaleLog2.
   * The scale is a FIXED power of two (not the per-vector 127/max|v|
   * rescale a production SQ8 would use) so every dequantized value is an
   * exact dyadic rational — bit-reproducible across engines, which is
   * what puts this rung on the hash-matched oracle surface; at scale
   * you'd store per-block scales beside the codes. The fixture domain
   * |v| < 4 with scaleLog2 = 4 yields codes |k| <= 64, comfortably int8.
   *
   * Output matches the refine contract (id, vec, rvec, delta): rvec is
   * the dequantized copy, delta the CONSTANT per-component error bound
   * 0.5 / 2^scaleLog2 — the existing cushion algebra is agnostic to
   * where the element-wise bound came from, so the whole two-phase
   * refine pipeline runs unchanged on quantized data.
   */
  def int8Vectors(base: DataFrame, scaleLog2: Int): DataFrame = {
    val s = math.pow(2.0, scaleLog2)
    val half = (0.5 / s).toFloat
    base.select(col("id"), col("vec"),
      transform(col("vec"),
        x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float"))
        .as("rvec"),
      transform(col("vec"), _ => lit(half)).as("delta"))
  }

  /** The 4-bit rung's cheap copy: clamped 16-level codes
    * clamp(floor(v*2^s + 0.5), -8, 7) dequantized k/2^s, constant
    * half-step bound. The bound is only valid when no value actually
    * clamps (|v|*2^s <= 7.5) — callers must range-check like Demo does
    * for int8. */
  def sq4Vectors(base: DataFrame, scaleLog2: Int): DataFrame = {
    val s = math.pow(2.0, scaleLog2)
    val half = (0.5 / s).toFloat
    base.select(col("id"), col("vec"),
      transform(col("vec"),
        x => (least(lit(7L), greatest(lit(-8L), floor(x * s + lit(0.5))))
          .cast("double") / s).cast("float"))
        .as("rvec"),
      transform(col("vec"), _ => lit(half)).as("delta"))
  }

  /**
   * Vector table from lineitem: (id BIGINT, vec ARRAY<FLOAT>).
   * `fp16Domain = true` uses the fp16-exact domain (plus reduced/delta cols).
   */
  def vectors(spark: SparkSession, sfDir: String, d: Int): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(lineitemKey.as("id")).distinct()
      .select(col("id"), intVec(col("id"), d).as("vec"))

  def fp16Vectors(spark: SparkSession, sfDir: String, d: Int, keepM: Int): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(lineitemKey.as("id")).distinct()
      .select(col("id"),
        fp16Vec(col("id"), d).as("vec"),
        fp16ReducedVec(col("id"), d, keepM).as("rvec"),
        fp16DeltaVec(col("id"), d, keepM).as("delta"))

  /**
   * Deterministic Gaussian demo fixture (reference `ANNCode.py:816-822`:
   * N(0,1), N=2000, D=128, Qn=30, seed 42). Counter-based: each value is
   * a pure function of (seed, id, j) via splitmix64 + Box-Muller, so the
   * data is identical under any partitioning (FIXTURES.md §3 rule).
   * Mirrors reference precision semantics: `vec` is the fp16 round-trip
   * of the raw draw (ANNCode.py:825), `rvec`/`delta` reduce the raw draw.
   */
  def gaussianVectors(spark: SparkSession, n: Int, d: Int, keepM: Int,
                      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    import graft.functions.Fp16
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def gauss(id: Long, j: Int): Float = {
      val h1 = mix(seed * 0x100000001L + id * d + j)
      val h2 = mix(h1 + 1)
      val u1 = ((h1 >>> 11).toDouble + 0.5) / (1L << 53).toDouble
      val u2 = ((h2 >>> 11).toDouble + 0.5) / (1L << 53).toDouble
      (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
    }
    spark.range(n).as[Long].map { id =>
      val raw = Array.tabulate(d)(j => gauss(id, j))
      (id,
        raw.map(Fp16.roundTrip),
        raw.map(Fp16.reduceValue(_, 5, keepM)),
        raw.map(Fp16.deltaOf(_, keepM)))
    }.toDF("id", "vec", "rvec", "delta")
  }

  /** Query side: the `nq` smallest ids, same synthesis. */
  def queries(vectors: DataFrame, nq: Int): DataFrame =
    vectors.orderBy("id").limit(nq)
      .withColumnRenamed("id", "qid")
      .withColumnRenamed("vec", "qvec")
      .withColumnRenamed("rvec", "qrvec")
      .withColumnRenamed("delta", "qdelta")

  // ---- session-scoped shared fixture cache --------------------------------
  // Every refine-family query derives the SAME fixture relation (lineitem
  // scan + distinct + per-component synthesis) and then scans it 2-4
  // times; across the ~15 such queries in one bench/verify session that
  // is dozens of identical derivations. The cache persists one copy per
  // (session, sf-dir, params) for the session's lifetime (~hundreds of MB
  // at sf0.1 — the cluster-scale twin is materializing the fixture table
  // to parquet once). Values are identical to the uncached forms, so
  // oracle hashes are unaffected.
  // key: (session, domain tag, sf-dir, d, keepM) — the explicit tag keeps
  // the int- and fp16-domain keyspaces disjoint (no sentinel overloading)
  private val fixtureCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Int, Int), DataFrame]()
  private val cleanupHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Drop a session's entries when its context ends: in a JVM that cycles
    * sessions (repeated suites, notebooks) dead entries would otherwise
    * pin their DataFrame plans forever. The cached blocks themselves die
    * with the context; this just releases the map references. */
  private def hookCleanup(spark: SparkSession): Unit =
    if (cleanupHooked.add(spark))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            fixtureCache.keySet.removeIf(_._1 eq spark)
            cleanupHooked.remove(spark)
          }
        })

  private def cached(spark: SparkSession, tag: String, sfDir: String, d: Int,
                     keepM: Int)(mk: => DataFrame): DataFrame = {
    hookCleanup(spark)
    fixtureCache.computeIfAbsent((spark, tag, sfDir, d, keepM), _ =>
      mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  def vectorsCached(spark: SparkSession, sfDir: String, d: Int): DataFrame =
    cached(spark, "int", sfDir, d, 0)(vectors(spark, sfDir, d))

  /** Positional-record-index -> fixture-id map (idx i = i-th smallest
    * id): the remap key for index-addressed sources (.fvecs / header-bin
    * / positional .vec carry no row key; the fixture exports are written
    * id-sorted). One SKINNY global sort of the distinct key column —
    * never the D-wide vectors — computed once per (session, sf-dir) and
    * persisted; before this existed every source query re-ran the sort +
    * zipWithIndex + an uncached shuffle join per invocation (the r7
    * q_topk_cos_dispatch 98 s outlier). Dimension-independent: the id
    * set comes from the key column alone. */
  def idxToIdCached(spark: SparkSession, sfDir: String): DataFrame =
    cached(spark, "idxmap", sfDir, 0, 0) {
      import spark.implicits._
      Tables.lineitem(spark, sfDir)
        .select(lineitemKey.as("id")).distinct()
        .orderBy(col("id")).select(col("id")).as[Long].rdd
        .zipWithIndex()
        .map { case (id, idx) => (idx, id) }
        .toDF("idx", "id")
    }

  /** Parquet-backed like [[fp16VectorsModCached]]: every refine-family
    * query touches this fixture, so each fresh session previously re-paid
    * the full-corpus synthesis once before the in-memory cache took over;
    * now only the first session per machine does. */
  def fp16VectorsCached(spark: SparkSession, sfDir: String, d: Int,
                        keepM: Int): DataFrame =
    cached(spark, "fp16", sfDir, d, keepM)(
      parquetBacked(spark, s"fp16_d${d}_m$keepM", sfDir)(
        fp16Vectors(spark, sfDir, d, keepM)))

  // ---- parquet-backed fixture materialization -----------------------------
  // At D=128 the synthesis projection is 3x128 per-component hash/CASE
  // expression trees; evaluating it once per SESSION made q_refine_d128 the
  // heaviest query in the repo (~45s sequential, r6 verdict #1). Materialize
  // the evaluated rows to a tmpdir parquet table once per (sf-dir, d, keepM,
  // mod) — the cluster-scale twin of "write your feature table once" — and
  // have later sessions scan the stored bytes instead of re-running the
  // trees. Values are bit-identical, so oracle hashes are unaffected.
  /** Bump when the fixture arithmetic or stored layout changes: the version
    * participates in the cache path so stale tables can never be reused. */
  private val FixtureLayoutVersion = 1

  /** Source freshness stamp: the max mtime over the source tables' FILES
    * (plus the dirs themselves). A directory's own lastModified only
    * changes when entries are added/removed — rewriting existing part
    * files in place updates file mtimes but can leave the dir mtime
    * untouched, so a dir-only stamp could silently serve a stale
    * machine-wide cache. ONE function covers every source table a layout
    * can derive from (lineitem for the synthesized fixtures, embeddings
    * for the vector layouts, documents for the lexical ones): layouts
    * all key their cache dirs on the same stamp, so regenerating ANY
    * source table invalidates every derived layout together — a
    * per-table stamp let the batch and stream twins of one layout go
    * stale independently and break their asserted hash-equality. */
  private[graft] def srcVersion(sfDir: String): Long =
    Seq("lineitem.parquet", "embeddings.parquet", "documents.parquet")
      .map { t =>
        val dir = new java.io.File(s"$sfDir/$t")
        val files = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        (dir.lastModified +: files.map(_.lastModified)).max
      }.max

  private def parquetBacked(spark: SparkSession, tag: String, sfDir: String)
                           (mk: => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // the source version is baked into the dir NAME, so a published cache
    // dir is IMMUTABLE: fresh == exists, and no writer ever touches a dir
    // another process may be scanning. An in-place mode("overwrite") into
    // a fixed path would let two JVMs racing here (bench + verify share
    // the tmpdir) interleave their overwrite jobs and publish a mixed
    // parquet dir under _SUCCESS that every later session silently reuses.
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_fixture_v${FixtureLayoutVersion}_${tag}_${safe}_v${srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      // unique scratch dir + one atomic rename; losing a cross-JVM
      // publish race just discards byte-identical work (deterministic mk)
      val tmp = Files.createTempDirectory(path.getParent, s"$tag-")
      mk.write.mode("overwrite").option("compression", "zstd")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"fixture cache publish failed: $path")
    }
    spark.read.parquet(path.toString)
  }

  /** Deterministic `id % mod == 0` slice of the fp16 fixture, parquet-
    * materialized (see above) then session-cached: the filter sits below
    * the per-component synthesis projection, so only the slice is ever
    * synthesized/stored — at D=128 the full-corpus fixture is ~16x the
    * D=8 one, and the realistic-width queries only need a real slice. */
  def fp16VectorsModCached(spark: SparkSession, sfDir: String, d: Int,
                           keepM: Int, mod: Int): DataFrame =
    cached(spark, s"fp16mod$mod", sfDir, d, keepM)(
      parquetBacked(spark, s"fp16mod${mod}_d${d}_m$keepM", sfDir)(
        fp16Vectors(spark, sfDir, d, keepM).filter(col("id") % mod === 0)))
}

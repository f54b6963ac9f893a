package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/**
 * IVF (inverted-file) index over the embedding column: a fixed coarse
 * quantizer of `nCells` deterministic centroids; every vector is assigned
 * to its nearest cell map-side (no shuffle), and a query scans only its
 * `nprobe` closest cells.
 *
 * At 100 TB the assignment is a write-time partition/bucket key: the
 * table is laid out by cell, so probe-cell pruning becomes Parquet
 * partition pruning and each query touches nprobe/nCells of the data.
 * Here cells stay a column and the probe join is an equi-join on cell.
 *
 * Centroids are dyadic rationals (k/512 in [-1,1)) derived from the same
 * portable hash as the fixtures, so the DuckDB oracle reproduces the
 * assignment bit-for-bit (distance terms are exact products folded in a
 * fixed order).
 */
object Ivf {

  /** Deterministic dyadic centroid component for (cell, j). */
  def centroidComponent(cell: Int, j: Int): Double = {
    val h = (cell.toLong * Dedup.AMul + (j + 1).toLong * 48271L) % 2147483647L
    ((h % 1024L) - 512L).toDouble / 512.0
  }

  def centroid(cell: Int, d: Int): Array[Float] =
    Array.tabulate(d)(j => centroidComponent(cell, j).toFloat)

  /** d2-to-centroid columns c0..c{n-1} (codegen L2 fold vs literal). */
  private def cellDists(vecCol: Column, nCells: Int, d: Int): Seq[Column] =
    (0 until nCells).map { c =>
      VecExprs.l2Sq(vecCol, typedlit(centroid(c, d).toSeq)).as(s"c$c")
    }

  /** argmin over the c0.. columns, ties to the smaller cell id. */
  private def argminCell(nCells: Int): Column = {
    val m = least((0 until nCells).map(c => col(s"c$c")): _*)
    (0 until nCells).foldRight(lit(-1)) { (c, rest) =>
      when(col(s"c$c") === m, lit(c)).otherwise(rest)
    }
  }

  /** (id, embedding, cell): map-side nearest-centroid assignment. */
  def assign(emb: DataFrame, nCells: Int, d: Int): DataFrame =
    emb.select(col("vec_id").as("id") +: col("embedding") +:
        cellDists(col("embedding"), nCells, d): _*)
      .withColumn("cell", argminCell(nCells))
      .select(col("id"), col("embedding"), col("cell"))

  /** (qid, cell, proberank): each query's nprobe nearest cells. */
  def probeCells(queries: DataFrame, nCells: Int, d: Int, nprobe: Int): DataFrame = {
    val withD = queries.select(col("qid") +: col("qvec") +:
      cellDists(col("qvec"), nCells, d): _*)
    // unpivot cell distances to rows, rank, keep nprobe
    val stacked = withD.select(col("qid"), col("qvec"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    stacked.withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell"))
  }

  /**
   * PER-QUERY PROBE DEPTH — nprobe as a RELATION: `nps` is a (qid, np)
   * table and each query probes ITS OWN number of cells (the per-tenant
   * latency/recall knob every vector DB exposes per request), all
   * queries in one plan. One ranked probe pass to the LARGEST requested
   * depth, each qid keeping its own prefix; the scan's static partition
   * filter is the union of all probed cells. Output as [[topkIndexed]].
   */
  def topkIndexedMultiProbe(spark: org.apache.spark.sql.SparkSession,
                            sfDir: String, emb: DataFrame,
                            nps: Seq[(Long, Int)], k: Int, nCells: Int,
                            d: Int): DataFrame = {
    require(nps.nonEmpty, "topkIndexedMultiProbe: empty nprobe relation")
    import spark.implicits._
    val path = ensureIndex(spark, sfDir, nCells, d)
    val stored = spark.read.parquet(path) // (id, embedding, n2, cell)
    val nq = (nps.map(_._1).max + 1).toInt
    val npMax = nps.map(_._2).max
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val npr = broadcast(nps.toDF("qid", "np"))
    val withD = q.select(col("qid") +: col("qvec") +:
      cellDists(col("qvec"), nCells, d): _*)
    val stacked = withD.select(col("qid"), col("qvec"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = stacked.withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= npMax)
      .join(npr, Seq("qid"))
      .filter(col("proberank") <= col("np"))
      .select(col("qid"), col("qvec"), col("cell"))
      .join(q.select(col("qid"), col("qn2")), Seq("qid"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val scored = stored
      .filter(col("cell").isin(cells.toSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /** Cosine over the hoisted norms — shared by both physical paths. */
  private def cosScore: Column =
    graft.functions.VectorOps.dot(col("embedding"), col("qvec")) /
      (graft.functions.VectorOps.fnorm(col("n2")) *
        graft.functions.VectorOps.fnorm(col("qn2")))

  /** Bump when the index layout or the assignment expression changes.
    * v2: row metadata (lang, via vec_id = doc_id) stored WITH the
    * vectors so filtered search pushes its predicate into the scan. */
  private val IndexVersion = 2

  /**
   * Materialize the inverted file AT REST: (id, embedding, n2, lang)
   * written once, `partitionBy("cell")` — the write-time layout that
   * turns probe-cell selection into Parquet partition pruning, with row
   * metadata (lang, joined from documents on vec_id = doc_id) stored
   * beside the vectors so filtered search pushes its predicate into the
   * same scan. Cached per tmpdir with the same staleness discipline as
   * the other fixtures.
   */
  def ensureIndex(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                  nCells: Int, d: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // source version (max file mtime) in the dir NAME: published indexes
    // are immutable — fresh == exists — and racing processes each build a
    // private scratch dir and atomically rename, so an interleaved
    // in-place overwrite can never publish a mixed layout under _SUCCESS
    val ver = math.max(maxMtime(s"$sfDir/embeddings.parquet"),
      maxMtime(s"$sfDir/documents.parquet"))
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivf_v${IndexVersion}_${safe}_c${nCells}_d${d}_v$ver")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "ivf-")
      assign(graft.Tables.embeddings(spark, sfDir), nCells, d)
        .withColumn("n2", graft.functions.VectorOps.norm2Sq(col("embedding")))
        .join(graft.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("lang")), Seq("id"), "left")
        .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"ivf index publish failed: $path")
    }
    path.toString
  }

  /** Max mtime over a source table's files + the path itself (a dir's own
    * mtime misses in-place part rewrites — see Fixture.srcVersion). */
  private def maxMtime(src: String): Long = {
    val f = new java.io.File(src)
    val files = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
    (f.lastModified +: files.map(_.lastModified)).max
  }

  /**
   * IVF top-k off the partitioned index — the at-rest twin of [[topk]],
   * returning identical rows. The probe-cell set is computed from the
   * query side and collected (bounded: <= nq * nprobe values), then
   * pushed into the scan as a STATIC partition filter, so only the
   * probed cells' files are ever read (asserted in PlanSpec).
   */
  def topkIndexed(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                  emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                  nprobe: Int): DataFrame = {
    val path = ensureIndex(spark, sfDir, nCells, d)
    val stored = spark.read.parquet(path) // (id, embedding, n2, cell)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val scored = stored
      .filter(col("cell").isin(cells.toSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /**
   * IVF-SQ8: the canonical vector-database bandwidth configuration —
   * cell-pruned candidate generation, a CHEAP ranking pass over int8
   * scalar-quantized codes (asymmetric: candidate side dequantized
   * k/2^s, query side full precision), a `rerank`-deep cut, and an exact
   * full-precision rescore of only the survivors. At rest the codes are
   * the 1-byte column [[graft.sources.Disaggregated.writeInt8]] stores —
   * the cheap pass reads a quarter of the float bytes; here they are
   * derived map-side so the oracle twin stays a pure expression mirror.
   * Dequantized values are exact dyadic rationals (float-exact at
   * |v| * 2^s <= 127), so both passes are bit-reproducible in DuckDB.
   * Output (qid, rank, id, score) with full-precision scores;
   * approximation comes from nprobe pruning and the rerank cut only.
   */
  def topkSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
              nprobe: Int, scaleLog2: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val assigned = assign(emb, nCells, d)
      .withColumn("q8", transform(col("embedding"),
        x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float")))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    // cheap pass: quantized cosine — at rest this scan touches only the
    // code bytes, never the float embedding
    val cheap = assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    // exact rescore: only rerank*NQ survivors fetch the full vector
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * IVF-SQ8 with PER-DIMENSION TRAINED RANGES — the production form of
   * scalar quantization (FAISS `SQ8`'s trained variant): instead of one
   * global power-of-two scale, each dimension j quantizes into its own
   * observed [min_j, max_j] range with 256 levels —
   * code = floor((v - mn_j) * 255 / (mx_j - mn_j) + 0.5), dequantized
   * mn_j + code * (mx_j - mn_j)/255. TRAINING is one map-side-combining
   * aggregate over the corpus (2d doubles — min/max are order-
   * independent, so the stats are deterministic at any parallelism) and
   * APPLYING is a broadcast of that 1-row stats relation into the scan:
   * the one-pass train / map-side apply split a 100 TB quantizer
   * actually ships with. Degenerate dimensions (mx = mn) dequantize to
   * the constant. Every arithmetic step is exactly-rounded IEEE double
   * math both engines perform identically, so the rung is oracle-exact
   * without dyadic scales. Pipeline shape is [[topkSq8]]'s: cell-pruned
   * cheap rank over dequantized codes, rerank cut, exact rescore.
   */
  // TRAIN: one map-side-combining min/max aggregate, collected driver
  // side (2d doubles — bounded at any corpus size, the bm25-stats
  // discipline) and re-broadcast as array LITERALS. Embedding the
  // ranges as literals keeps the dequantization a single compact
  // indexed-lambda loop — 64 per-dimension CASE trees fused into the
  // score fold blow whole-stage codegen into the interpreted fallback
  // (measured 39x at the 4M-row soak). min/max are order-independent,
  // so the trained model is deterministic at any parallelism — which is
  // what lets [[topkSq8TrainedAtRest]] re-derive the ranges at serve
  // time instead of persisting a model sidecar next to the codes.
  private[graft] def sq8TrainedRanges(
      emb: DataFrame, d: Int): (IndexedSeq[Double], IndexedSeq[Double]) = {
    val statCols = (1 to d).flatMap(j => Seq(
      min(element_at(col("embedding"), j).cast("double")).as(s"mn$j"),
      max(element_at(col("embedding"), j).cast("double")).as(s"mx$j")))
    val statsRow = emb.agg(statCols.head, statCols.tail: _*).collect()(0)
    require(!statsRow.isNullAt(0),
      "sq8Trained: empty corpus — no range to train the quantizer on")
    ((0 until d).map(j => statsRow.getDouble(2 * j)),
      (0 until d).map(j => statsRow.getDouble(2 * j + 1)))
  }

  def topkSq8Trained(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                     nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val (mnArr, mxArr) = sq8TrainedRanges(emb, d)
    val mns = typedlit(mnArr)
    val mxs = typedlit(mxArr)
    val q8t = transform(col("embedding"), (x, i) => {
      val mn = element_at(mns, i + 1); val mx = element_at(mxs, i + 1)
      val v = x.cast("double")
      when(mx === mn, mn).otherwise(
        mn + floor((v - mn) * lit(255.0) / (mx - mn) + lit(0.5))
          .cast("double") * ((mx - mn) / lit(255.0)))
        .cast("float")
    })
    val assigned = assign(emb, nCells, d)
      .withColumn("q8t", q8t)
      .withColumn("n2q8t", V.norm2Sq(col("q8t")))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val cheap = assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q8t"), col("qvec")) /
        (V.fnorm(col("n2q8t")) * V.fnorm(col("qn2"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /** Bump when the trained-SQ8 code layout changes. */
  private val Sq8TrainedLayoutVersion = 1

  /**
   * TRAIN, THEN PERSIST the trained-SQ8 codes — the scalar-quantizer
   * twin of `Pq.ensureTrainedCodesFixture`: the per-dimension trained
   * ranges ([[sq8TrainedRanges]], a bounded 2d-double collect) encode
   * the corpus once as an ARRAY<TINYINT> of d bytes per row
   * (code_j = floor((v - mn_j)*255/(mx_j - mn_j) + 0.5) - 128, the
   * offset keeping 0..255 in signed-byte range; degenerate dimensions
   * store 0), cell-partitioned like every other index layout so probe
   * selection stays Parquet partition pruning. Because the training
   * aggregate is order-independent, the layout needs no model sidecar:
   * serve time re-derives bit-identical ranges from the same corpus.
   * Immutable version-named dir, atomic scratch publish.
   */
  def ensureSq8TrainedCodes(spark: org.apache.spark.sql.SparkSession,
                            sfDir: String, nCells: Int, d: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_sq8t_v${Sq8TrainedLayoutVersion}_${safe}_c${nCells}_d${d}" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val (mnArr, mxArr) = sq8TrainedRanges(emb, d)
      val code = array((1 to d).map { j =>
        val mn = mnArr(j - 1); val mx = mxArr(j - 1)
        if (mx == mn) lit(-128).cast("byte")
        else {
          val v = element_at(col("embedding"), j).cast("double")
          (floor((v - lit(mn)) * lit(255.0) / lit(mx - mn) + lit(0.5))
            .cast("int") - lit(128)).cast("byte")
        }
      }: _*)
      val tmp = Files.createTempDirectory(path.getParent, "sq8t-")
      assign(emb, nCells, d)
        .select(col("id"), col("cell"), code.as("code"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("cell")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"sq8t codes publish failed: $path")
    }
    path.toString
  }

  /**
   * [[topkSq8Trained]] OFF THE AT-REST TRAINED CODES — identical rows
   * (spec-asserted): serve time re-derives the min/max ranges (order-
   * independent aggregate → bit-identical model) and dequantizes
   * mn_j + code_j * (mx_j - mn_j)/255 with exactly [[topkSq8Trained]]'s
   * association, so the cheap scores match bit-for-bit while reading
   * d code BYTES per row instead of 4d float bytes. Probe cells are a
   * static partition filter (bounded collect, <= nq*nprobe values);
   * the cheap scan reads only (id, code); the bounded survivor set
   * fetches full vectors from the float table via broadcast join.
   * Train → persist trained codes → serve off the layout: the full
   * scalar-quantizer lifecycle in the production shape.
   */
  def topkSq8TrainedAtRest(spark: org.apache.spark.sql.SparkSession,
                           sfDir: String, emb: DataFrame, nq: Int, k: Int,
                           nCells: Int, d: Int, nprobe: Int,
                           rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val path = ensureSq8TrainedCodes(spark, sfDir, nCells, d)
    val (mnArr, mxArr) = sq8TrainedRanges(emb, d)
    val stored = spark.read.parquet(path) // (id, code, cell)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    // dequantize from the stored byte: bit-identical to the in-memory
    // rung because mn + k*((mx-mn)/255) is the same double expression
    // tree (the stored byte round-trips the floor'd level exactly)
    val q8t = array((1 to d).map { j =>
      val mn = mnArr(j - 1); val mx = mxArr(j - 1)
      if (mx == mn) lit(mn).cast("float")
      else (lit(mn) + (element_at(col("code"), j).cast("int") + lit(128))
        .cast("double") * lit((mx - mn) / 255.0)).cast("float")
    }: _*)
    val cheap = stored
      .filter(col("cell").isin(cells.toSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("q8t", q8t)
      .withColumn("n2q8t", V.norm2Sq(col("q8t")))
      .withColumn("score", V.dot(col("q8t"), col("qvec")) /
        (V.fnorm(col("n2q8t")) * V.fnorm(col("qn2"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * One LLOYD ITERATION of coarse-quantizer TRAINING — the missing
   * lifecycle stage between "centroids exist" and "index serves":
   * assign every vector to its nearest current centroid, then emit the
   * new centroid components as per-(cell, dimension) means. Output
   * (cell, j, n, mean): the mean IS the retrained centroid's j-th
   * component, n the cell occupancy (empty cells drop — standard Lloyd).
   *
   * Determinism: a float mean is order-dependent, so the sum pins its
   * order with [[TrainFold.orderedSums]]'s streaming sorted-group
   * fold — one shuffle, Spark's external (spillable) sort, each
   * group's components streamed to an O(1) accumulator in id order.
   * Bit-identical at any parallelism, exactly mirrored in DuckDB by
   * `list_reduce(list(x ORDER BY vec_id))`, and — unlike a
   * whole-group `collect_list` — per-group state is CONSTANT rather
   * than O(cell occupancy), so the GRADED plan is the plan a 100 TB
   * trainer runs.
   */
  def kmeansStep(emb: DataFrame, nCells: Int, d: Int): DataFrame =
    TrainFold.orderedSums(
      assign(emb, nCells, d)
        .select(col("cell"), col("id"), posexplode(col("embedding")))
        .select(col("cell"), (col("pos") + 1).cast("int").as("j"),
          col("id"), col("col").cast("double").as("x")),
      Seq("cell", "j"), "id", Seq("x" -> "s"))
      .select(col("cell"), col("j"), col("n"),
        (col("s") / col("n").cast("double")).as("mean"))

  // ---- spherical k-means (the cosine-metric trainer) ---------------------

  /** |init centroid c| as the engine computes it (j-ascending left fold
    * of squares, one sqrt) — shared with the oracle generator so both
    * sides embed the IDENTICAL double literal. */
  private[graft] def sphericalInitNorm(cell: Int, d: Int): Double = {
    val ss = (0 until d).map { j =>
      val x = centroidComponent(cell, j); x * x
    }.reduceLeft(_ + _)
    math.max(math.sqrt(ss), 1e-12)
  }

  /** Map-side spherical assignment against the INIT centroids:
    * cell = argmax over c of dot(x, c)/|c| (the |x| factor is common to
    * every cell and drops), ties to the smaller cell id. */
  private def assignSpherical(emb: DataFrame, nCells: Int,
                              d: Int): DataFrame = {
    // the init-centroid components k/512 are 10-bit dyadics — exactly
    // float-representable — so the codegen'd DotD loop over the FLOAT
    // centroid literal (ascending index, float->double widening) is
    // bit-identical to the explicit element_at*lit reduceLeft chain it
    // replaces, without the 1024-deep Column tree that overflowed the
    // converter stack at realistic widths
    val scoreCols = (0 until nCells).map { c =>
      (VecExprs.dotD(col("embedding"), typedlit(centroid(c, d).toSeq)) /
        lit(sphericalInitNorm(c, d))).as(s"s$c")
    }
    val m = greatest((0 until nCells).map(c => col(s"s$c")): _*)
    val argmax = (0 until nCells).foldRight(lit(-1)) { (c, rest) =>
      when(col(s"s$c") === m, lit(c)).otherwise(rest)
    }
    emb.select(col("vec_id").as("id") +: col("embedding") +: scoreCols: _*)
      .withColumn("cell", argmax)
      .select(col("id"), col("embedding"), col("cell"))
  }

  /**
   * One SPHERICAL k-means iteration (Dhillon & Modha 2001 — the
   * cosine-metric Lloyd step, what FAISS trains for inner-product/
   * cosine indexes): assign each vector to the ANGULARLY nearest init
   * centroid (argmax cos — the norm-independent form dot(x, c)/|c|),
   * recenter as the per-(cell, dim) ordered mean, then PROJECT BACK TO
   * THE SPHERE — the unit centroid is the mean scaled by its own
   * j-ordered norm fold. Output (cell, j, n, mean, unit): both the raw
   * Lloyd mean and the spherical centroid component, hash-checkable.
   *
   * Same scale shape as [[kmeansStep]]: one map-side assignment scan,
   * the [[TrainFold]] sorted-group fold (O(1) per-group state), plus a
   * d-bounded per-cell norm fold.
   */
  def kmeansSphericalStep(emb: DataFrame, nCells: Int, d: Int): DataFrame = {
    val mj = TrainFold.orderedSums(
      assignSpherical(emb, nCells, d)
        .select(col("cell"), col("id"), posexplode(col("embedding")))
        .select(col("cell"), (col("pos") + 1).cast("int").as("j"),
          col("id"), col("col").cast("double").as("x")),
      Seq("cell", "j"), "id", Seq("x" -> "s"))
      .select(col("cell"), col("j"), col("n"),
        (col("s") / col("n").cast("double")).as("mean"))
    // per-cell ||mean||^2 as a j-ordered fold (d-bounded groups)
    val norms = TrainFold.orderedSums(
      mj.select(col("cell"), col("j"),
        (col("mean") * col("mean")).as("m2")),
      Seq("cell"), "j", Seq("m2" -> "ss"))
      .select(col("cell"), col("ss"))
    mj.join(norms, Seq("cell"))
      .select(col("cell"), col("j"), col("n"), col("mean"),
        (col("mean") / graft.functions.VectorOps.fnorm(col("ss")))
          .as("unit"))
  }

  /**
   * IVF served with the spherically-trained centroids — the cosine twin
   * of [[topkLloyd]]: the trained UNIT centroids are a bounded model
   * collect (cells x d doubles) folded back as literals; corpus
   * assignment and query probing both rank by the plain dot against the
   * unit centroids (argmax dot == argmax cos against unit vectors);
   * survivors get the exact cosine rescore. Full probe provably equals
   * the brute scan (cells partition the corpus).
   */
  def topkSpherical(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                    nprobe: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val units = kmeansSphericalStep(emb, nCells, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Double]("unit"))
      .toMap
    val cells = units.keys.map(_._1).toSeq.distinct.sorted
    def sdot(vecCol: Column, c: Int): Column =
      (1 to d).map(j => element_at(vecCol, j).cast("double") *
        lit(units((c, j)))).reduceLeft(_ + _)
    def argmax(prefix: String): Column = {
      val m = greatest(cells.map(c => col(s"$prefix$c")): _*)
      cells.foldRight(lit(-1)) { (c, rest) =>
        when(col(s"$prefix$c") === m, lit(c)).otherwise(rest)
      }
    }
    val assigned = emb.select(col("vec_id").as("id") +: col("embedding") +:
        cells.map(c => sdot(col("embedding"), c).as(s"c$c")): _*)
      .withColumn("cell", argmax("c"))
      .select(col("id"), col("embedding"), col("cell"))
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val q0 = Ann.queriesOf(emb, nq)
      .select(col("qid"), col("qvec"), col("qn2"))
    val stacked = q0.select(col("qid") +: col("qvec") +: col("qn2") +:
        cells.map(c => sdot(col("qvec"), c).as(s"c$c")): _*)
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(cells.map(c =>
          struct(lit(c).as("cell"), col(s"c$c").as("sd"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("p.cell").as("cell"), col("p.sd").as("sd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sd").desc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /**
   * The k-means CONVERGENCE LEDGER — `iters + 1` rows
   * (iter, sse, cells): the coarse quantizer's total within-cluster SSE
   * and occupied-cell count under the model of each training iteration
   * (iter 0 = the dyadic init centroids, iter i = means retrained from
   * iter i-1's assignment). Lloyd's two half-steps each monotonically
   * shrink SSE, so the ledger is non-increasing — the textbook
   * convergence certificate, spec-asserted and hash-checked.
   *
   * Per iteration: one corpus scan computes assignment distances (the
   * per-vector min folds j-ordered), the SSE sums via the
   * [[TrainFold]] sorted-group fold (id-ordered, O(1) state — the
   * whole-corpus statistic never occupies one buffer), and the
   * retrained model is a bounded driver-side collect (occupied cells
   * x d doubles) folded back into the next iteration's distance
   * expressions as literals. The loop is driver-orchestrated but the
   * work is all cluster-side — iters scans total, the shape a 100 TB
   * trainer has no way around (and trims further by training on a
   * bounded sample, as [[graft.Soak]] does at 4M vectors).
   */
  def kmeansConverge(emb: DataFrame, nCells: Int, d: Int,
                     iters: Int): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    // INVARIANT (r18 advice): the retrain join below re-attaches the
    // persisted (id, cell) assignment to the raw embedding scan BY id —
    // bit-identical to re-deriving cell from `assigned` only because
    // vec_id is unique (the embeddings table's key contract; Tables
    // builds it from a distinct key column). A duplicated id would
    // cross-product against the assignment and corrupt the retrained
    // means silently, a failure mode the assigned-based derivation
    // could not have.
    // iter-0 model: the dyadic init centroids (float-exact doubles)
    var means: Map[(Int, Int), Double] =
      (for (g <- 0 until nCells; j <- 1 to d)
        yield (g, j) -> centroidComponent(g, j - 1).toFloat.toDouble).toMap
    val out = scala.collection.mutable.ArrayBuffer[(Int, Double, Long)]()
    for (it <- 0 to iters) {
      val cells = means.keys.map(_._1).toSeq.distinct.sorted
      def dist(vecCol: Column, c: Int): Column =
        (1 to d).map { j =>
          val diff = element_at(vecCol, j).cast("double") - lit(means((c, j)))
          diff * diff
        }.reduce(_ + _)
      def argmin(): Column = {
        val m = least(cells.map(c => col(s"c$c")): _*)
        cells.foldRight(lit(-1)) { (c, rest) =>
          when(col(s"c$c") === m, lit(c)).otherwise(rest)
        }
      }
      val assigned = emb.select(col("vec_id").as("id") +: col("embedding") +:
          cells.map(c => dist(col("embedding"), c).as(s"c$c")): _*)
        .withColumn("di", least(cells.map(c => col(s"c$c")): _*))
        .withColumn("cell", argmin())
        .select(col("id"), col("embedding"), col("cell"), col("di"))
      // SSE under the CURRENT model (the [[TrainFold]] sorted-group
      // fold — the corpus statistic never sits in one buffer) + the
      // occupied-cell count; the narrow (id, cell, di) projection is
      // persisted so the aggregates and the retrain share one
      // assignment computation
      val narrow = Dedup.persistScoped(
        assigned.select(col("id"), col("cell"), col("di")))
      val stats = TrainFold.orderedSums(narrow, Seq.empty, "id",
          Seq("di" -> "sse"))
        .crossJoin(narrow.agg(countDistinct(col("cell")).as("cells")))
        .select(col("sse"), col("cells"))
      if (it < iters) {
        // retrain: per-(cell, j) sorted-group means off this assignment.
        // The (id, cell) pairs come from the persisted narrow projection,
        // joined back to the raw embedding scan — re-deriving `cell` from
        // `assigned` here would re-evaluate (and re-codegen) the
        // nCells x d distance/argmin tree a second time per iteration,
        // doubling the dominant pass. Same rows either way (narrow IS
        // assigned's (id, cell) projection), so the id-ordered fold below
        // is bit-identical. The iteration's SSE/cells ledger row rides
        // the SAME collect (cross-joined onto the bounded means relation)
        // — ONE driver action per iteration instead of two, halving the
        // trainer's driver-serial round trips (r19 verdict #5: the suite
        // is driver-bound; iterative trainers' per-iteration collects
        // serialize on the driver under concurrency).
        val rows = TrainFold.orderedSums(
            emb.select(col("vec_id").as("id"), col("embedding"))
              .join(narrow.select(col("id"), col("cell")), Seq("id"))
              .select(col("cell"), col("id"), posexplode(col("embedding")))
              .select(col("cell"), (col("pos") + 1).cast("int").as("j"),
                col("id"), col("col").cast("double").as("x")),
            Seq("cell", "j"), "id", Seq("x" -> "s"))
          .select(col("cell"), col("j"),
            (col("s") / col("n").cast("double")).as("mean"))
          .crossJoin(stats)
          .collect()
        out += ((it, rows(0).getDouble(3), rows(0).getLong(4)))
        means = rows
          .map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(2))
          .toMap
      } else {
        val r = stats.collect()(0)
        out += ((it, r.getDouble(0), r.getLong(1)))
      }
    }
    val spark = emb.sparkSession
    import spark.implicits._
    out.toSeq.toDF("iter", "sse", "cells")
  }

  /**
   * Serve with the RETRAINED coarse quantizer — [[kmeansStep]]'s means
   * become the centroids of a full IVF query path: assignment, probe
   * selection, cell-pruned cosine top-k. The trained model is a BOUNDED
   * driver-side collect (occupied cells x d doubles — the "broadcast
   * the model, not the data" shape every trained quantizer here uses),
   * baked into the distance expressions as literals; distances fold
   * left-to-right over dimensions so the DuckDB mirror (ordered list +
   * list_reduce over the SAME retrained means) is bit-identical.
   * Probing every occupied cell provably recovers the exact scan
   * (spec-asserted) — approximation comes only from nprobe.
   */
  def topkLloyd(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                nprobe: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val means = kmeansStep(emb, nCells, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val cells = means.keys.map(_._1).toSeq.distinct.sorted
    def dist(vecCol: Column, c: Int): Column =
      (1 to d).map { j =>
        val diff = element_at(vecCol, j).cast("double") - lit(means((c, j)))
        diff * diff
      }.reduce(_ + _)
    def argmin(prefix: String): Column = {
      val m = least(cells.map(c => col(s"$prefix$c")): _*)
      cells.foldRight(lit(-1)) { (c, rest) =>
        when(col(s"$prefix$c") === m, lit(c)).otherwise(rest)
      }
    }
    val assigned = emb.select(col("vec_id").as("id") +: col("embedding") +:
        cells.map(c => dist(col("embedding"), c).as(s"c$c")): _*)
      .withColumn("cell", argmin("c"))
      .select(col("id"), col("embedding"), col("cell"))
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val q0 = Ann.queriesOf(emb, nq)
      .select(col("qid"), col("qvec"), col("qn2"))
    val stacked = q0.select(col("qid") +: col("qvec") +: col("qn2") +:
        cells.map(c => dist(col("qvec"), c).as(s"c$c")): _*)
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(cells.map(c =>
          struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("pr", row_number().over(w)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /**
   * BATCHED FARTHEST-FIRST SEEDING — the deterministic form of
   * k-means++ init at cluster scale (the k-means|| shape, Bahmani et
   * al. VLDB'12: oversample a BATCH of far points per round instead of
   * one point per scan, so k seeds cost ceil(k/L) corpus scans, not k).
   * Pick 0 is the smallest vec_id (the deterministic "arbitrary" start
   * of Gonzalez' farthest-first traversal); each round r then takes the
   * `perRound` vectors maximizing the minimum distance to ALL
   * previously chosen seeds (ties to the smaller id) — distances to the
   * in-flight round's picks are deliberately not counted, which is
   * exactly the oversampling approximation k-means|| trades for the
   * round reduction. Output (round, pick, id, mindist), `pick` the
   * within-round rank.
   *
   * Scale: each round is ONE corpus scan against |seeds| literal
   * centroid expressions (the model is a bounded driver collect of at
   * most nSeeds*d doubles, broadcast back as literals — the "broadcast
   * the model, never the data" discipline of every trained stage here)
   * followed by a global top-L TakeOrdered, so the full seeding is
   * ceil((nSeeds-1)/perRound) scans at any corpus size. Determinism:
   * per-seed distances fold j-ordered (bit-identical to the DuckDB
   * mirror's ordered list_reduce); the min over seeds and the
   * (mindist DESC, id ASC) selection are exact comparisons.
   *
   * Reference context: the reference fixes its quantizer grid a priori
   * (ANNCode.py:288-318); seeding is the standard init every trained
   * IVF deploys before [[kmeansStep]]'s Lloyd rounds.
   */
  def kmeansSeed(emb: DataFrame, nSeeds: Int, perRound: Int,
                 d: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val picks = seedPicks(emb, nSeeds, perRound, d)
    picks.map { case (round, pick, id, md, _) => (round, pick, id, md) }
      .toDF("round", "pick", "id", "mindist")
  }

  /** The seeding loop shared by [[kmeansSeed]] and [[topkSeeded]]:
    * (round, pick, id, mindist, embedding-as-doubles) in selection
    * order. Driver state is bounded at nSeeds*(d+3). */
  private def seedPicks(emb: DataFrame, nSeeds: Int, perRound: Int,
                        d: Int): Seq[(Int, Int, Long, Double, IndexedSeq[Double])] = {
    require(nSeeds >= 2, s"nSeeds $nSeeds must be >= 2")
    require(perRound >= 1, s"perRound $perRound must be >= 1")
    val first = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id").asc).limit(1).collect()
    require(first.nonEmpty, "kmeansSeed: empty corpus")
    val out = scala.collection.mutable.ArrayBuffer[
      (Int, Int, Long, Double, IndexedSeq[Double])]()
    out += ((0, 0, first(0).getLong(0), 0.0,
      first(0).getSeq[Float](1).map(_.toDouble).toIndexedSeq))
    var round = 1
    while (out.size < nSeeds) {
      val take = math.min(perRound, nSeeds - out.size)
      // min distance to every ALREADY-CHOSEN seed: per-seed j-ordered
      // literal folds, reduced by exact pairwise least
      val md = out.map { case (_, _, _, _, s) =>
        (1 to d).map { j =>
          val diff = element_at(col("embedding"), j).cast("double") -
            lit(s(j - 1))
          diff * diff
        }.reduce(_ + _)
      }.reduceLeft((a, b) => least(a, b))
      val picked = emb
        .select(col("vec_id").as("id"), col("embedding"), md.as("md"))
        .orderBy(col("md").desc, col("id").asc).limit(take).collect()
      picked.zipWithIndex.foreach { case (r, i) =>
        out += ((round, i, r.getLong(0), r.getDouble(2),
          r.getSeq[Float](1).map(_.toDouble).toIndexedSeq))
      }
      round += 1
    }
    out.toSeq
  }

  /**
   * Serve with the MAXMIN SEEDS as the coarse quantizer — the
   * composition that makes [[kmeansSeed]] a real index stage rather
   * than a report: the nSeeds picked vectors become cell centroids
   * (cell = selection index), assignment and probe ranking run against
   * them as literals (ties to the smaller cell), and the probed cells
   * get the exact cosine top-k — [[topkLloyd]]'s shape with the seeded
   * model instead of the retrained means. Probing every cell provably
   * recovers the exact scan; approximation comes only from nprobe.
   */
  def topkSeeded(emb: DataFrame, nq: Int, k: Int, nSeeds: Int,
                 perRound: Int, d: Int, nprobe: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val seeds = seedPicks(emb, nSeeds, perRound, d).map(_._5)
    val cells = seeds.indices
    def dist(vecCol: Column, c: Int): Column =
      (1 to d).map { j =>
        val diff = element_at(vecCol, j).cast("double") - lit(seeds(c)(j - 1))
        diff * diff
      }.reduce(_ + _)
    def argmin(prefix: String): Column = {
      val m = least(cells.map(c => col(s"$prefix$c")): _*)
      cells.foldRight(lit(-1)) { (c, rest) =>
        when(col(s"$prefix$c") === m, lit(c)).otherwise(rest)
      }
    }
    val assigned = emb.select(col("vec_id").as("id") +: col("embedding") +:
        cells.map(c => dist(col("embedding"), c).as(s"c$c")): _*)
      .withColumn("cell", argmin("c"))
      .select(col("id"), col("embedding"), col("cell"))
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val q0 = Ann.queriesOf(emb, nq)
      .select(col("qid"), col("qvec"), col("qn2"))
    val stacked = q0.select(col("qid") +: col("qvec") +: col("qn2") +:
        cells.map(c => dist(col("qvec"), c).as(s"c$c")): _*)
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(cells.map(c =>
          struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("pr", row_number().over(w)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  // --- occupancy-balanced cell split ------------------------------------

  /**
   * The SPLIT MODEL for occupancy REBALANCING — the index-maintenance
   * answer to cell skew (a hot cell makes every probe that hits it pay
   * its whole occupancy; at 100 TB a 10x-overweight cell is a 10x
   * latency tail): every cell holding more than num/den of the corpus
   * is split around a deterministic pivot pair — A = the cell's
   * smallest-id member, B = the member farthest from A (ties to the
   * smaller id; degenerately A itself when the cell is a single point
   * mass, which leaves the split a no-op rather than an error).
   * Returns (cell, pivotA, pivotB) sorted by cell; empty when nothing
   * exceeds the threshold. All driver state is bounded: the occupancy
   * table is nCells rows, the pivots at most 2*nCells vectors.
   * The threshold compare is exact integer arithmetic (occ*den >
   * num*n), so both engines agree with no float in the contract.
   */
  private[graft] def splitModel(emb: DataFrame, nCells: Int, d: Int,
      num: Int, den: Int): Seq[(Int, IndexedSeq[Float], IndexedSeq[Float])] = {
    val n = emb.count()
    val over = assign(emb, nCells, d).groupBy(col("cell"))
      .agg(count(lit(1)).as("occ"), min(col("id")).as("aid"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .filter { case (_, o, _) => o * den > num * n }
      .sortBy(_._1).toSeq
    if (over.isEmpty) return Seq.empty
    def vecsOf(ids: Seq[Long]): Map[Long, IndexedSeq[Float]] = emb
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toIndexedSeq).toMap
    val aVec = vecsOf(over.map(_._3))
    val aOf = over.map { case (c, _, a) => c -> aVec(a) }.toMap
    val cellsSplit = over.map(_._1)
    // B: within-cell argmax of the distance to A — one scan over the
    // split cells' rows against the A pivots as literals
    val distA = cellsSplit.foldRight(lit(0.0)) { (c, rest) =>
      when(col("cell") === c,
        VecExprs.l2Sq(col("embedding"), typedlit(aOf(c)))).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("dA").desc, col("id").asc)
    val bids = assign(emb, nCells, d)
      .filter(col("cell").isin(cellsSplit: _*))
      .withColumn("dA", distA)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("cell"), col("id")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bVec = vecsOf(bids.values.toSeq.distinct)
    over.map { case (c, _, a) => (c, aVec(a), bVec(bids(c))) }
  }

  /** (id, embedding, cell, sub): [[assign]] refined by the split model —
    * members of split cells go to the nearer pivot (ties to A, sub 0);
    * unsplit cells keep sub = 0. */
  private def assignSplit(emb: DataFrame, nCells: Int, d: Int,
      model: Seq[(Int, IndexedSeq[Float], IndexedSeq[Float])]): DataFrame = {
    val subCol = model.foldRight(lit(0)) { case ((c, a, b), rest) =>
      when(col("cell") === c,
        when(VecExprs.l2Sq(col("embedding"), typedlit(a)) <=
          VecExprs.l2Sq(col("embedding"), typedlit(b)), lit(0))
          .otherwise(lit(1))).otherwise(rest)
    }
    assign(emb, nCells, d).withColumn("sub", subCol)
  }

  /** The rebalance REPORT: (cell, sub, occ) occupancies after the
    * split — the artifact an index operator reads to confirm the hot
    * cells came apart. Hash-graded (exact integers). */
  def splitStats(emb: DataFrame, nCells: Int, d: Int, num: Int,
                 den: Int): DataFrame = {
    val model = splitModel(emb, nCells, d, num, den)
    assignSplit(emb, nCells, d, model)
      .groupBy(col("cell"), col("sub")).agg(count(lit(1)).as("occ"))
  }

  /**
   * Serve OVER THE REBALANCED CELLS: probe ranking runs against one
   * representative per (cell, sub) — the dyadic centroid for unsplit
   * cells, the pivots for split halves — with ties (d2, cell, sub), and
   * the probed sub-cells get the exact cosine top-k. Splitting refines
   * the partition, so probing every (cell, sub) provably recovers the
   * exact scan (spec-asserted); at equal nprobe the probed fraction of
   * the corpus shrinks by exactly the occupancy the split moved out of
   * the hot cells.
   */
  def topkSplit(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                nprobe: Int, num: Int, den: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val model = splitModel(emb, nCells, d, num, den)
    val splitSet = model.map(_._1).toSet
    val assigned = assignSplit(emb, nCells, d, model)
      .select(col("id"), col("embedding"), col("cell"), col("sub"))
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val repRows: Seq[Column] =
      (0 until nCells).filterNot(splitSet).map { c =>
        struct(lit(c).as("cell"), lit(0).as("sub"),
          VecExprs.l2Sq(col("qvec"), typedlit(centroid(c, d).toSeq)).as("d2"))
      } ++ model.flatMap { case (c, a, b) =>
        Seq(struct(lit(c).as("cell"), lit(0).as("sub"),
            VecExprs.l2Sq(col("qvec"), typedlit(a)).as("d2")),
          struct(lit(c).as("cell"), lit(1).as("sub"),
            VecExprs.l2Sq(col("qvec"), typedlit(b)).as("d2")))
      }
    val stacked = q
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(repRows: _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("p.cell"), col("p.sub"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("cell").asc, col("sub").asc)
    val probes = broadcast(stacked.withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell"), col("sub")))
    val scored = assigned.join(probes, Seq("cell", "sub"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /** Bump when the split-sidecar layout changes. */
  private val SplitLayoutVersion = 1

  /**
   * The REBALANCE AT REST — and only the partitions it touches: the
   * split model's hot cells are re-written ONCE into a (cell, sub)-
   * partitioned SIDECAR (id, embedding, n2, cell, sub), while the base
   * index layout ([[ensureIndex]]) stays byte-immutable — the
   * merge-on-read discipline of the tombstone/upsert sidecars
   * (`Pq.ensureTombstones`), applied to maintenance. At 100 TB this is
   * the difference between rewriting the whole inverted file and
   * rewriting the 2-3 hot cells that actually skewed: the rebalance
   * I/O is proportional to the occupancy it moves, not the corpus.
   * Immutable version-named dir, atomic scratch publish. Returns the
   * sidecar path ("" when nothing exceeds the threshold).
   */
  def ensureSplitSidecar(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String, nCells: Int, d: Int, num: Int,
                         den: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivfsplit_v${SplitLayoutVersion}_${safe}_c${nCells}_d${d}" +
        s"_f${num}of${den}_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val model = splitModel(emb, nCells, d, num, den)
      val tmp = Files.createTempDirectory(path.getParent, "ivfsplit-")
      val hot = model.map(_._1)
      assignSplit(emb, nCells, d, model)
        .filter(if (hot.isEmpty) lit(false) else col("cell").isin(hot: _*))
        .withColumn("n2", graft.functions.VectorOps.norm2Sq(col("embedding")))
        .select(col("id"), col("embedding"), col("n2"), col("cell"),
          col("sub"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("cell", "sub")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"split sidecar publish failed: $path")
    }
    path.toString
  }

  /**
   * [[topkSplit]] OFF THE AT-REST LAYOUTS — identical rows
   * (spec-asserted): probed UNSPLIT cells read the immutable base
   * index ([[ensureIndex]], cell partition pruning), probed split
   * halves read the sidecar ((cell, sub) partition pruning), and the
   * union gets the exact cosine top-k. Both probe sets are bounded
   * driver collects pushed as static partition filters, so each query
   * reads exactly its probed partitions — the serve path after a
   * production rebalance, where maintenance rewrote only the hot
   * cells' files.
   */
  def topkSplitAtRest(spark: org.apache.spark.sql.SparkSession,
                      sfDir: String, emb: DataFrame, nq: Int, k: Int,
                      nCells: Int, d: Int, nprobe: Int, num: Int,
                      den: Int): DataFrame = {
    val V = graft.functions.VectorOps
    val model = splitModel(emb, nCells, d, num, den)
    val splitSet = model.map(_._1).toSet
    val basePath = ensureIndex(spark, sfDir, nCells, d)
    val sidePath = ensureSplitSidecar(spark, sfDir, nCells, d, num, den)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val repRows: Seq[Column] =
      (0 until nCells).filterNot(splitSet).map { c =>
        struct(lit(c).as("cell"), lit(0).as("sub"),
          VecExprs.l2Sq(col("qvec"), typedlit(centroid(c, d).toSeq)).as("d2"))
      } ++ model.flatMap { case (c, a, b) =>
        Seq(struct(lit(c).as("cell"), lit(0).as("sub"),
            VecExprs.l2Sq(col("qvec"), typedlit(a)).as("d2")),
          struct(lit(c).as("cell"), lit(1).as("sub"),
            VecExprs.l2Sq(col("qvec"), typedlit(b)).as("d2")))
      }
    val stacked = q
      .select(col("qid"), col("qvec"), col("qn2"),
        explode(array(repRows: _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"),
        col("p.cell"), col("p.sub"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("cell").asc, col("sub").asc)
    val probes = stacked.withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell"), col("sub"))
    // bounded collects (<= nq * nprobe pairs) -> static partition filters
    val probedPairs = probes.select(col("cell"), col("sub")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val baseCells = probedPairs.map(_._1).distinct.filterNot(splitSet)
    val sidePairs = probedPairs.filter(p => splitSet(p._1))
    val bProbes = broadcast(probes)
    val fromBase =
      if (baseCells.isEmpty) None
      else Some(spark.read.parquet(basePath)
        .filter(col("cell").isin(baseCells.toSeq: _*))
        .select(col("id"), col("embedding"), col("n2"), col("cell"),
          lit(0).as("sub"))
        .join(bProbes, Seq("cell", "sub"))
        .withColumn("score", cosScore))
    val fromSide =
      if (sidePairs.isEmpty) None
      else Some(spark.read.parquet(sidePath)
        .filter(sidePairs.map { case (c, s0) =>
          col("cell") === c && col("sub") === s0 }.reduce(_ || _))
        .select(col("id"), col("embedding"), col("n2"), col("cell"),
          col("sub"))
        .join(bProbes, Seq("cell", "sub"))
        .withColumn("score", cosScore))
    val scored = (fromBase, fromSide) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalStateException("no probed partitions")
    }
    TopK.window(scored, k)
  }

  /**
   * IVF x PREFIX — the production two-stage configuration a vector DB
   * ships with Matryoshka embeddings: the coarse quantizer prunes CELLS
   * (only nprobe of nCells are read at all) and the width axis prunes
   * BYTES within them (the cheap rank reads only the first dPrefix
   * float components — [[graft.operators.Ann.prefixTopK]]'s scoring
   * over prefix norms), then the bounded survivor set is rescored at
   * full width. The two pruning axes compose multiplicatively:
   * scan cost ~ (nprobe/nCells) * (dPrefix/d) of the brute pass.
   */
  def topkPrefix(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                 nprobe: Int, dPrefix: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    require(dPrefix >= 1 && dPrefix < d, s"dPrefix $dPrefix not in [1, $d)")
    val V = graft.functions.VectorOps
    val assigned = assign(emb, nCells, d)
      .withColumn("vp", slice(col("embedding"), 1, dPrefix))
      .withColumn("n2p", V.norm2Sq(col("vp")))
    val q = Ann.queriesOf(emb, nq)
      .withColumn("qp", slice(col("qvec"), 1, dPrefix))
      .withColumn("qn2p", V.norm2Sq(col("qp")))
      .select(col("qid"), col("qvec"), col("qn2"), col("qp"), col("qn2p"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qp"), col("qn2p")), Seq("qid")))
    val cheap = assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("vp"), col("qp")) /
        (V.fnorm(col("n2p")) * V.fnorm(col("qn2p"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.select(col("qid"), col("qvec"), col("qn2"))),
        Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2"))))
    TopK.window(rescored, k)
  }

  /** 4-bit scalar quantization code: clamp(floor(v*2^s + 0.5), -8, 7) —
    * the clamp is what distinguishes the 4-bit rung (16 levels) from
    * SQ8's unclamped int8 range; dequantized k/2^s stays an exact dyadic
    * rational, so the rung is bit-reproducible in DuckDB. */
  private def sq4Code(x: Column, s: Double): Column =
    least(lit(7L), greatest(lit(-8L), floor(x * s + lit(0.5))))

  /**
   * IVF-SQ4 — the 4-bit rung of the precision ladder, between BQ's sign
   * bit and SQ8's byte: cell-pruned candidates, a cheap ranking pass
   * over 4-bit scalar-quantized codes (16 levels, candidate side
   * dequantized k/2^s, query side full precision), a deeper rerank cut
   * than SQ8 (coarser codes need a wider exact net), and an exact
   * rescore of the survivors. At rest the codes pack TWO per byte
   * ([[ensureSq4Codes]]) — the cheap pass reads d/2 bytes per row, an
   * 8x cut vs the float vector and half of SQ8. Here they are derived
   * map-side so the oracle twin stays a pure expression mirror; the
   * at-rest twin [[topkSq4AtRest]] returns identical rows.
   */
  def topkSq4(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
              nprobe: Int, scaleLog2: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val assigned = assign(emb, nCells, d)
      .withColumn("q4", transform(col("embedding"),
        x => (sq4Code(x, s).cast("double") / s).cast("float")))
      .withColumn("n2q4", V.norm2Sq(col("q4")))
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val cheap = assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q4"), col("qvec")) /
        (V.fnorm(col("n2q4")) * V.fnorm(col("qn2"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /** Bump when the SQ4 packing or layout changes. */
  private val Sq4LayoutVersion = 1

  /**
   * SQ4 codes AT REST: two 4-bit codes per stored byte — an
   * ARRAY<TINYINT> of d/2 bytes per row ((hi+8)*16 + (lo+8) - 128, the
   * offset keeping the packed value in signed-byte range), cell-
   * partitioned like every other index layout so probe-cell selection is
   * parquet partition pruning. The cheap pass over this layout reads
   * d/2 bytes/row: the sub-byte rung the bandwidth ladder was missing
   * between BQ (d/8 bytes wide-word) and int8 (d bytes).
   */
  def ensureSq4Codes(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String, nCells: Int, d: Int,
                     scaleLog2: Int): String = {
    require(d % 2 == 0, s"d=$d must be even for nibble packing")
    import java.nio.file.{Files, Paths}
    val s = math.pow(2.0, scaleLog2)
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_sq4_v${Sq4LayoutVersion}_${safe}_c${nCells}_d${d}" +
        s"_s${scaleLog2}_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "sq4-")
      val packed = array((0 until d / 2).map { i =>
        val hi = sq4Code(element_at(col("embedding"), 2 * i + 1), s)
        val lo = sq4Code(element_at(col("embedding"), 2 * i + 2), s)
        ((hi + 8) * 16 + (lo + 8) - 128).cast("byte")
      }: _*)
      assign(graft.Tables.embeddings(spark, sfDir), nCells, d)
        .select(col("id"), col("cell"), packed.as("packed"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").partitionBy("cell")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"sq4 codes publish failed: $path")
    }
    path.toString
  }

  /** [[topkSq4]] off the packed at-rest layout — identical rows: the
    * nibble round-trip (code -> packed byte -> code) is the identity, so
    * dequantization from the unpacked nibble equals the map-side
    * derivation. Probe cells are a static partition filter (bounded
    * collect, <= nq*nprobe values); the cheap scan reads only
    * (id, packed) — never the float embedding. */
  def topkSq4AtRest(spark: org.apache.spark.sql.SparkSession,
                    sfDir: String, emb: DataFrame, nq: Int, k: Int,
                    nCells: Int, d: Int, nprobe: Int, scaleLog2: Int,
                    rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val path = ensureSq4Codes(spark, sfDir, nCells, d, scaleLog2)
    val stored = spark.read.parquet(path) // (id, packed, cell)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val unpacked = array((1 to d).map { j =>
      val b = element_at(col("packed"), (j + 1) / 2).cast("int") + lit(128)
      val nib = if (j % 2 == 1) shiftright(b, 4) else b.bitwiseAND(lit(15))
      ((nib - lit(8)).cast("double") / s).cast("float")
    }: _*)
    val cheap = stored
      .filter(col("cell").isin(cells.toSeq: _*))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("q4", unpacked)
      .withColumn("n2q4", V.norm2Sq(col("q4")))
      .withColumn("score", V.dot(col("q4"), col("qvec")) /
        (V.fnorm(col("n2q4")) * V.fnorm(col("qn2"))))
    val cand = TopK.window(cheap, rerank).select(col("qid"), col("id"))
    val rescored = emb
      .select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(q.withColumnRenamed("qvec", "qvec_")
        .withColumnRenamed("qn2", "qn2_")), Seq("qid"))
      .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
        (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
    TopK.window(rescored, k)
  }

  /**
   * IVF cosine top-k: candidates restricted to the query's probe cells.
   * Output (qid, rank, id, score) — approximate by construction (recall
   * governed by nprobe/nCells).
   */
  def topk(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
           nprobe: Int): DataFrame = {
    val assigned = assign(emb, nCells, d)
      .withColumn("n2", graft.functions.VectorOps.norm2Sq(col("embedding")))
    val q = Ann.queriesOf(emb, nq)
      .select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k)
  }

  /**
   * The K-NN GRAPH build — every vector is its own query: candidates are
   * the vectors sharing its `nprobe` closest cells (self excluded), its
   * edges the top-`j` by exact cosine. This is the construction seed
   * every graph-ANN index starts from (NSW/HNSW insertion heuristics,
   * NN-descent initialization), expressed with the same bounded cell
   * equi-join as the query path so the N x N product NEVER materializes:
   * work is N x (probed-cell occupancy), linear in N at fixed occupancy,
   * and the probe relation (N*nprobe rows) is shuffle-joined on cell —
   * not broadcast, because at 100 TB the node side is the corpus itself.
   * Output (qid, rank, id, score), rank 1..j per node.
   */
  def knnGraph(emb: DataFrame, j: Int, nCells: Int, d: Int,
               nprobe: Int): DataFrame =
    knnGraphFor(
      emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      emb, j, nCells, d, nprobe)

  /** [[knnGraph]] for an EXPLICIT node set over an explicit corpus —
    * the incremental-maintenance primitive: a microbatch recomputes
    * edges only for its arriving nodes plus the existing nodes whose
    * probed cells received arrivals
    * ([[graft.streaming.StreamOps.ensureStreamKnnGraph]]). `nodes` is
    * (qid, qvec); `corpus` is (vec_id, embedding). */
  def knnGraphFor(nodes: DataFrame, corpus: DataFrame, j: Int, nCells: Int,
                  d: Int, nprobe: Int): DataFrame = {
    require(j >= 1, s"j=$j")
    val V = graft.functions.VectorOps
    val q = nodes.select(col("qid"), col("qvec"),
      V.norm2Sq(col("qvec")).as("qn2"))
    val probes = probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid"))
    val assigned = assign(corpus, nCells, d)
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .withColumn("score", cosScore)
    // the BOUNDED-HEAP cut, not the window form: the graph build scores
    // N·nprobe·occupancy candidate rows, and a rank window would LOCAL-
    // SORT that whole relation before its group limit — measured as a
    // disk-filling multi-hundred-GB spill at the 500k-node soak arm,
    // i.e. the build that "works on 60k rows" and dies at 10x. The
    // typed aggregator keeps at most j rows per (partition, qid) with
    // map-side partial merge, so only ~j·nodes rows cross the exchange
    // and nothing sorts the scored relation (identical output contract,
    // parity-spec'd in TopK).
    TopK.aggregate(scored, j)
  }

  /** Bump when the graph build or layout changes: the version is part of
    * the cache path, so stale graphs can never be silently reused. */
  private val KnnGraphLayoutVersion = 1

  /**
   * The k-NN graph AT REST: built once per (sf, j, nCells, d, nprobe)
   * into an immutable version-named parquet dir (atomic scratch-dir
   * publish — the [[graft.operators.Pq.ensureCodesFixture]] discipline)
   * and returned as a path every graph consumer reads. The build is the
   * expensive step (a corpus-sized probe join); queries, NN-descent,
   * clustering, and delete maintenance are all bounded reads of the
   * edge list — exactly how a graph index ships at 100 TB: build once,
   * serve many. Edge rows are id-sorted within files for row-group
   * skipping on src-id probes.
   */
  def ensureKnnGraph(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String, j: Int,
                     nCells: Int, d: Int, nprobe: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_knngraph_v${KnnGraphLayoutVersion}_${safe}_j${j}_c${nCells}" +
        s"_d${d}_p${nprobe}_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "knng-")
      knnGraph(graft.Tables.embeddings(spark, sfDir), j, nCells, d, nprobe)
        .sortWithinPartitions(col("qid"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"knn graph publish failed: $path")
    }
    // graph-build discipline: the prober-pairs sidecar ships WITH the
    // graph, so upsert maintenance never has to re-derive probe sets
    // from the corpus (see knnGraphUpsert's gainer pass)
    ensureKnnGraphProbes(spark, sfDir, nCells, d, nprobe)
    // ... and so does the target-bucketed edge sidecar, so the HOLDER
    // half of that maintenance never has to scan every edge either
    ensureKnnGraphByTarget(spark, path.toString, sfDir, j, nCells, d,
      nprobe)
    path.toString
  }

  /** Number of edge-TARGET buckets in the holder-probe sidecar: the
    * edge list re-partitioned on `pmod(id, KnnEdgeBuckets)` so "who
    * holds an edge to these ids?" prunes to the ids' buckets. 32 keeps
    * partitions corpus/32-sized at any N (the bucket count is a layout
    * constant, not a corpus function — the bucketed-join standard). */
  val KnnEdgeBuckets = 32

  /**
   * The edge list BUCKETED BY TARGET at rest — the holder-probe
   * sidecar completing [[ensureKnnGraphProbes]]' symmetry: the gainer
   * half of upsert maintenance asks "who PROBES these cells?" (cell-
   * partitioned sidecar), the holder half asks "who HOLDS AN EDGE TO
   * these ids?" — which on the primary qid-sorted layout is a full
   * edge scan per commit. Here the same edges are persisted partitioned
   * by `bkt = pmod(id, KnnEdgeBuckets)`, so the holder probe reads only
   * the updated ids' buckets (a literal IN on the partition column —
   * planning-time pruning, ≤ |update| of the 32 buckets when commits
   * are small). Rows within a bucket are id-sorted for row-group
   * skipping on the target-id semi-join. Derived FROM the published
   * primary layout (same edges, re-partitioned), version-keyed and
   * published atomically beside it.
   */
  def ensureKnnGraphByTarget(spark: org.apache.spark.sql.SparkSession,
                             graphPath: String, sfDir: String, j: Int,
                             nCells: Int, d: Int, nprobe: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_knnedges_tgt_v${KnnGraphLayoutVersion}_${safe}_j${j}" +
        s"_c${nCells}_d${d}_p${nprobe}_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "knnt-")
      spark.read.parquet(graphPath)
        .withColumn("bkt",
          pmod(col("id"), lit(KnnEdgeBuckets.toLong)).cast("int"))
        .repartition(col("bkt"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("bkt")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"knn edge-by-target sidecar publish failed: $path")
    }
    path.toString
  }

  /** The holder probe over the target-bucketed edge sidecar: nodes
    * holding an edge to any of `ids` (column `id`), read PARTITION-
    * PRUNED to the ids' buckets — a literal IN on the partition column
    * (the ids' bucket set is a bounded model, ≤ KnnEdgeBuckets ints,
    * however large the update set). The planning-time filter is what
    * makes holder discovery O(touched-bucket occupancy), not O(|E|). */
  private def holdersOf(byTarget: DataFrame, ids: DataFrame): DataFrame = {
    val bkts = ids
      .select(pmod(col("id"), lit(KnnEdgeBuckets.toLong)).cast("int")
        .as("bkt"))
      .distinct().collect().map(_.getInt(0)).sorted
    byTarget
      .filter(col("bkt").isin(bkts.map(Int.box): _*))
      .join(ids.select(col("id")), Seq("id"), "left_semi")
      .select(col("qid")).distinct()
  }

  /**
   * The (qid, cell) PROBER-PAIRS SIDECAR at rest — who probes which
   * cell, persisted CELL-PARTITIONED at graph-build time (the
   * [[ensureKnnGraph]] ensure-layout discipline; j-independent, so
   * keyed on (nCells, d, nprobe) only). This is the relation that
   * makes graph-upsert maintenance O(update), not O(N): "which nodes
   * would gain a candidate from cell c?" is a partition-pruned read of
   * the c partitions instead of a fresh probe assignment over the
   * whole corpus. At 100 TB the sidecar is nprobe·N small rows — a
   * fraction of the edge list itself — and each upsert commit touches
   * ≤ |new cells| of its nCells partitions. Rows within a partition
   * are qid-sorted for row-group skipping.
   */
  def ensureKnnGraphProbes(spark: org.apache.spark.sql.SparkSession,
                           sfDir: String, nCells: Int, d: Int,
                           nprobe: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_knnprobes_v${KnnGraphLayoutVersion}_${safe}_c${nCells}" +
        s"_d${d}_p${nprobe}_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "knnp-")
      val emb = graft.Tables.embeddings(spark, sfDir)
      probePairs(
          emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          nCells, d, nprobe)
        .repartition(col("cell"))
        .sortWithinPartitions(col("qid"))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("cell")
        .parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"knn prober sidecar publish failed: $path")
    }
    path.toString
  }

  /**
   * INCREMENTAL maintenance of a prober sidecar under an upsert commit
   * (ids ≡ 0 mod `mod`, v' = −v): only the TOUCHED cell partitions —
   * the updated nodes' old probe cells (stale rows to drop) plus their
   * new probe cells (fresh rows to land) — are rewritten, via dynamic
   * partition overwrite; every other partition's files are untouched
   * (spec-asserted by file mtimes). Touched-cell discovery never scans
   * the sidecar by qid (qid is not the partition key, so that read
   * could not prune) — old cells come from re-probing just the
   * |N/mod| updated vectors' ORIGINAL embeddings, so the commit's
   * compute is O(|updates|·d·nprobe) and its I/O is O(touched-cell
   * occupancy). After the commit the sidecar equals
   * [[probePairs]] over the updated view (spec-asserted), so the NEXT
   * upsert's gainer pass reads fresh truth.
   */
  def commitProberUpsert(spark: org.apache.spark.sql.SparkSession,
                         sidecar: String, emb: DataFrame, mod: Int,
                         nCells: Int, d: Int, nprobe: Int): Unit = {
    require(mod >= 2, s"mod=$mod")
    val updOld = emb.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val updNew = updOld.select(col("qid"),
      transform(col("qvec"), x => -x).as("qvec"))
    commitProberUpdates(spark, sidecar, updOld, updNew, nCells, d, nprobe)
  }

  /** [[commitProberUpsert]] with EXPLICIT (qid, qvec) old/new node
    * relations — the form a streaming maintainer drives per commit
    * (each microbatch's arrivals are its own update set; the mod-based
    * wrapper above is the batch fixture's shape). */
  def commitProberUpdates(spark: org.apache.spark.sql.SparkSession,
                          sidecar: String, updOld: DataFrame,
                          updNew: DataFrame, nCells: Int, d: Int,
                          nprobe: Int): Unit = {
    val oldPairs = probePairs(updOld, nCells, d, nprobe)
    val newPairs = probePairs(updNew, nCells, d, nprobe)
    // bounded models: <= nCells ints each
    val touched = (oldPairs.select(col("cell")).distinct().collect() ++
        newPairs.select(col("cell")).distinct().collect())
      .map(_.getInt(0)).distinct.sorted
    val updIds = updOld.select(col("qid"))
    val base = spark.read.parquet(sidecar)
      .filter(col("cell").isin(touched.map(Int.box): _*))
      .join(updIds, Seq("qid"), "left_anti")
      .select(col("qid"), col("cell"))
    val rewritten = base.unionByName(newPairs.select(col("qid"), col("cell")))
    // stage first: Spark (rightly) refuses to overwrite a path that is
    // also a read source of the same plan, so the touched partitions'
    // replacement rows land in a scratch dir and the dynamic-overwrite
    // write into the sidecar reads THAT
    val staging = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sidecar).getParent, "knnp-commit-")
    try {
      rewritten.write.mode("overwrite").parquet(staging.toString)
      val staged = spark.read.parquet(staging.toString)
      staged
        .repartition(col("cell"))
        .sortWithinPartitions(col("qid"))
        .write.mode("overwrite").option("compression", "zstd")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(sidecar)
      // dynamic overwrite only replaces partitions that RECEIVE rows: a
      // touched cell left with zero rows (every prober updated away)
      // must be emptied explicitly or its stale rows would survive
      val nonEmpty = staged.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSet
      touched.filterNot(nonEmpty).foreach { c =>
        val p = java.nio.file.Paths.get(sidecar, s"cell=$c")
        if (java.nio.file.Files.exists(p))
          graft.sources.VecFiles.deleteRecursively(p)
      }
    } finally graft.sources.VecFiles.deleteRecursively(staging)
  }

  /**
   * DELETE maintenance on the k-NN graph: removing ids drops their
   * nodes AND their incoming edges, and a survivor that held an edge to
   * a deleted id cannot backfill its j-th slot from the edge list alone
   * — the (j+1)-th neighbor was never stored. Affected survivors are
   * therefore RE-RANKED over the live corpus from their probed cells;
   * unaffected nodes keep their edges verbatim (deleting candidates
   * they never referenced cannot change their top-j). The result is
   * identical to rebuilding over the live corpus, at the cost of
   * |affected| x cell-occupancy instead of N — the bounded
   * write-amplification of a real graph-index delete.
   */
  def knnGraphDelete(emb: DataFrame, graph: DataFrame, tombs: DataFrame,
                     j: Int, nCells: Int, d: Int, nprobe: Int,
                     byTarget: Option[DataFrame] = None): DataFrame = {
    // no broadcast hints on the tombstone/affected joins: the delete set
    // is corpus-fraction-sized (it grows with the table, unlike bounded
    // query/model relations) and `affected` is the deleted set's
    // incoming-edge neighborhood — both unbounded as the corpus grows.
    // AQE picks the join strategy from the actual runtime sizes:
    // broadcast while small, shuffled once they are not — the same
    // honesty fix already applied to the LSH and PQ delete paths
    // (Lsh.topkOffLayout, Pq.topkOffCodesWithDeletes).
    val live = emb.join(tombs.select(col("id").as("vec_id")),
      Seq("vec_id"), "left_anti")
    val tombNodes = tombs.select(col("id").as("qid"))
    // survivors holding an edge to a deleted id — off the target-
    // bucketed sidecar when the graph ships one (partition-pruned to
    // the deleted ids' buckets, [[holdersOf]]); the full-edge semi-join
    // only for ad-hoc in-memory graphs that have no layout to prune
    val affected = byTarget
      .map(bt => holdersOf(bt, tombs.select(col("id"))))
      .getOrElse(graph
        .join(tombs.select(col("id")), Seq("id"), "left_semi")
        .select(col("qid")).distinct())
      .join(tombNodes, Seq("qid"), "left_anti")
    val keep = graph
      .join(tombNodes, Seq("qid"), "left_anti")
      .join(affected, Seq("qid"), "left_anti")
    val recomputed = knnGraphFor(
      live.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .join(affected, Seq("qid"), "left_semi"),
      live, j, nCells, d, nprobe)
    keep.unionByName(recomputed)
  }

  /**
   * TIME TRAVEL on the k-NN graph — the one index family that was
   * missing the as-of verb: the generic append-only versioned delete
   * log ([[graft.operators.Pq.ensureVersionedTombstones]], reused by
   * PQ/spherical/LSH/postings) keyed on the graph layout's node column
   * (`qid`), applied with `commit_v <= asOf` BEFORE the delete repair.
   * The repair itself ([[knnGraphDelete]]) is what versions the
   * RE-RANK: affected survivors re-rank over the as-of LIVE corpus
   * (emb minus the as-of tombstones), not just a node filter — so each
   * snapshot is identical to rebuilding the graph over that snapshot's
   * live set. asOf 0 is the pre-delete graph; the latest asOf equals
   * the plain merge-on-read delete. Base edge files never rewritten.
   */
  def knnGraphDeleteAsOf(spark: org.apache.spark.sql.SparkSession,
                         graphPath: String, emb: DataFrame, j: Int,
                         nCells: Int, d: Int, nprobe: Int,
                         deleteMod: Int, asOf: Int,
                         byTarget: Option[DataFrame] = None): DataFrame = {
    val tombs = spark.read.parquet(graft.operators.Pq
        .ensureVersionedTombstones(spark, graphPath, deleteMod,
          idCol = "qid"))
      .filter(col("commit_v") <= asOf)
      .select(col("qid").as("id"))
    knnGraphDelete(emb, spark.read.parquet(graphPath), tombs, j, nCells,
      d, nprobe, byTarget)
  }

  /**
   * UPSERT maintenance on the k-NN graph — the last family missing the
   * verb: updated vectors (ids ≡ 0 mod `mod`, v' = −v — float-exact,
   * norm-preserving) change their OWN neighborhoods AND can enter or
   * leave other nodes' top-j. The exact affected set under the graph's
   * cell-probe candidate semantics:
   *
   *  - HOLDERS: nodes with an edge to an updated id (their neighbor's
   *    value changed — or left their candidate pool entirely);
   *  - GAINERS: nodes whose probe set includes an updated vector's NEW
   *    cell (a candidate appeared; losing a non-edge candidate from an
   *    old cell can never change a top-j, so old cells need no case);
   *  - the updated nodes themselves (assignment, probes, and scores
   *    all move with −v).
   *
   * Everyone else keeps their edges verbatim: their vectors, probe
   * sets, and candidate pools are untouched. Affected nodes re-rank
   * over the UPDATED corpus view, so the result provably equals the
   * graph rebuilt over that view (spec-asserted) at
   * |affected| × occupancy cost instead of N.
   *
   * The GAINER pass reads `prober` — the (qid, cell) probe-pairs
   * relation persisted CELL-PARTITIONED at graph-build time
   * ([[ensureKnnGraphProbes]]) — filtered to the updated vectors' new
   * cells as a LITERAL IN on the partition column, so the scan is
   * partition-pruned to ≤ |new cells| of the sidecar's nCells
   * partitions (plan-asserted in PlanSpec). This replaces the previous
   * per-commit O(N·d·nprobe) corpus re-assign: maintenance I/O is now
   * proportional to the probed occupancy of the new cells, not to the
   * corpus — the IVF-split standard. The HOLDER pass is its symmetric
   * twin: when the graph ships its target-bucketed edge sidecar
   * ([[ensureKnnGraphByTarget]], passed as `byTarget`), "who holds an
   * edge to the updated ids" partition-prunes to the ids' buckets
   * ([[holdersOf]], plan-asserted) instead of semi-joining the whole
   * edge list per commit. Using the BUILD-TIME sidecar is
   * exact: a non-updated node's probe set never moves (its vector is
   * untouched), and updated nodes — whose probe rows in the sidecar
   * ARE stale — are in the affected set unconditionally, so their
   * stale pairs can only add qids already present. No broadcast hints
   * on the corpus-fraction-sized relations (the delete-path
   * discipline); the new-cell set is a bounded model (≤ nCells ints).
   */
  def knnGraphUpsert(emb: DataFrame, graph: DataFrame, prober: DataFrame,
                     mod: Int, j: Int, nCells: Int, d: Int,
                     nprobe: Int,
                     byTarget: Option[DataFrame] = None): DataFrame = {
    require(mod >= 2, s"mod=$mod")
    knnGraphUpsertFor(emb, graph, prober,
      emb.select(col("vec_id")).filter(col("vec_id") % mod === 0),
      j, nCells, d, nprobe, byTarget)
  }

  /** [[knnGraphUpsert]] over an EXPLICIT update-id set (new value −v
    * per updated id — the fixture's deterministic transform): the form
    * the versioned log's as-of serve drives, where the applied commit
    * prefix is a relation, not a mod. The update membership reaches
    * the corpus via a flag join (corpus-fraction-sized set — AQE, no
    * broadcast hint); everything downstream is the same affected-set
    * algebra over the prober sidecar. */
  def knnGraphUpsertFor(emb: DataFrame, graph: DataFrame,
                        prober: DataFrame, updIds: DataFrame, j: Int,
                        nCells: Int, d: Int, nprobe: Int,
                        byTarget: Option[DataFrame] = None): DataFrame = {
    val updatedView = emb
      .join(updIds.select(col("vec_id")).withColumn("upd", lit(1)),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("upd") === 1, transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    // holders off the target-bucketed sidecar when the graph ships one
    // (partition-pruned to the updated ids' buckets, [[holdersOf]] —
    // the symmetric completion of the gainer pass's sidecar); the
    // full-edge semi-join only for ad-hoc in-memory graphs
    val holders = byTarget
      .map(bt => holdersOf(bt, updIds.select(col("vec_id").as("id"))))
      .getOrElse(graph
        .join(updIds.select(col("vec_id").as("id")), Seq("id"),
          "left_semi")
        .select(col("qid")).distinct())
    // the updated vectors' NEW cells — a bounded collect (<= nCells
    // ints, a model), materialized as literals so the sidecar read
    // below prunes at PLANNING time (a static partition filter, not a
    // runtime semi-join the scan cannot see through)
    val newCells = assign(
        updatedView.join(updIds.select(col("vec_id")), Seq("vec_id"),
          "left_semi"), nCells, d)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val gainers = prober
      .filter(col("cell").isin(newCells.map(Int.box): _*))
      .select(col("qid")).distinct()
    val affected = holders
      .unionByName(gainers)
      .unionByName(updIds.select(col("vec_id").as("qid")))
      .distinct()
    val keep = graph.join(affected, Seq("qid"), "left_anti")
    val recomputed = knnGraphFor(
      updatedView.select(col("vec_id").as("qid"),
          col("embedding").as("qvec"))
        .join(affected, Seq("qid"), "left_semi"),
      updatedView, j, nCells, d, nprobe)
    keep.unionByName(recomputed)
  }

  /**
   * AS-OF on the graph's UPDATE log — upsert time travel's graph
   * member: the generic versioned log
   * ([[graft.operators.Pq.ensureVersionedTombstones]] keyed on the
   * graph layout's `qid`, here recording UPDATE commits: 1 = ids ≡ 0
   * mod 2·mod, 2 completes the set) applied with `commit_v <= asOf`
   * BEFORE the repair, which then runs the exact affected-set algebra
   * for that prefix — so snapshot v provably equals the graph rebuilt
   * over the view with only commits ≤ v applied (spec-asserted). asOf
   * 0 is the pre-update graph; the latest asOf equals the one-shot
   * [[knnGraphUpsert]].
   */
  def knnGraphUpsertAsOf(spark: org.apache.spark.sql.SparkSession,
                         graphPath: String, emb: DataFrame,
                         prober: DataFrame, mod: Int, j: Int,
                         nCells: Int, d: Int, nprobe: Int,
                         asOf: Int,
                         byTarget: Option[DataFrame] = None): DataFrame = {
    val updIds = spark.read.parquet(graft.operators.Pq
        .ensureVersionedTombstones(spark, graphPath, mod, idCol = "qid"))
      .filter(col("commit_v") <= asOf)
      .select(col("qid").as("vec_id"))
    knnGraphUpsertFor(emb, spark.read.parquet(graphPath), prober,
      updIds, j, nCells, d, nprobe, byTarget)
  }

  /** Bump when the compacted as-of graph layout changes. */
  private val KnnAsOfCompactLayoutVersion = 1

  /**
   * SNAPSHOT COMPACTION of the graph's batch update log — the OPTIMIZE
   * verb the STREAM's edge log already has
   * ([[graft.streaming.StreamOps]]'s compaction), carried to the batch
   * as-of path: [[knnGraphUpsertAsOf]] re-runs the prefix's
   * affected-set repair on EVERY read; this materializes snapshot
   * `asOf` ONCE into a published target-bucketed base (the
   * [[ensureKnnGraphByTarget]] layout, so future holder probes prune),
   * with the node-count conservation require at publish and an atomic
   * version-keyed dir. The post-compact as-of serve is a plain base
   * read — no repair joins or recompute left in the plan (PlanSpec
   * asserts) — and hash-equal to the per-read repair, i.e. to the
   * graph rebuilt over the commit-prefix view.
   */
  def ensureKnnGraphUpsertAsOfCompacted(
      spark: org.apache.spark.sql.SparkSession, graphPath: String,
      emb: DataFrame, prober: DataFrame, mod: Int, j: Int, nCells: Int,
      d: Int, nprobe: Int, asOf: Int,
      byTarget: Option[DataFrame] = None): String = {
    import java.nio.file.{Files, Paths}
    val path = Paths.get(graphPath +
      s"_upsasofcmp_v${KnnAsOfCompactLayoutVersion}_m${mod}_a$asOf")
    if (!Files.exists(path.resolve("_DONE"))) {
      val tmp = Files.createTempDirectory(path.getParent, "knnasofcmp-")
      val snap = knnGraphUpsertAsOf(spark, graphPath, emb, prober, mod,
        j, nCells, d, nprobe, asOf)
        .select(col("qid"), col("rank"), col("id"), col("score"))
      snap
        .withColumn("bkt", pmod(col("id"), lit(KnnEdgeBuckets.toLong))
          .cast("int"))
        .repartition(col("bkt")).sortWithinPartitions(col("id"))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("bkt").parquet(tmp.resolve("edges").toString)
      // node-count conservation at publish: the snapshot repair replaces
      // rows per node, it never adds or drops nodes
      val compactN = spark.read.parquet(tmp.resolve("edges").toString)
        .select(col("qid")).distinct().count()
      val baseN = spark.read.parquet(graphPath)
        .select(col("qid")).distinct().count()
      require(compactN == baseN,
        s"as-of graph compaction invariant broken: $compactN nodes " +
          s"after compact vs $baseN in the base graph")
      Files.createFile(tmp.resolve("_DONE"))
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_DONE")),
        s"compacted as-of graph publish failed: $path")
    }
    path.toString
  }

  /** The graph snapshot served AFTER as-of compaction: a plain read of
    * the compacted base — hash-equal to [[knnGraphUpsertAsOf]]'s
    * per-read repair, same oracle. */
  def knnGraphUpsertAsOfCompacted(
      spark: org.apache.spark.sql.SparkSession, graphPath: String,
      emb: DataFrame, prober: DataFrame, mod: Int, j: Int, nCells: Int,
      d: Int, nprobe: Int, asOf: Int,
      byTarget: Option[DataFrame] = None): DataFrame =
    spark.read.parquet(ensureKnnGraphUpsertAsOfCompacted(spark,
        graphPath, emb, prober, mod, j, nCells, d, nprobe, asOf,
        byTarget) + "/edges")
      .select(col("qid"), col("rank"), col("id"), col("score"))

  /** (qid, cell) probe pairs for a (qid, qvec) node set — exposed for
    * the streaming maintenance path's affected-node computation. */
  def probePairs(nodes: DataFrame, nCells: Int, d: Int,
                 nprobe: Int): DataFrame =
    probeCells(nodes.select(col("qid"), col("qvec")), nCells, d, nprobe)
      .select(col("qid"), col("cell"))

  /**
   * One NN-DESCENT refinement round over a k-NN graph (Dong et al.,
   * WWW 2011: "a neighbor of a neighbor is likely a neighbor"): the
   * candidate set becomes current edges UNION two-hop edges (each
   * node's neighbors' neighbors, self excluded), exactly rescored and
   * re-cut to `j`. Under an exact rescore a superset of candidates can
   * never lose a true edge, so graph quality is monotonically
   * non-decreasing per round (asserted in OperatorsSpec). At scale each
   * round is a self-join of the BOUNDED edge list (j^2 * N pairs) plus
   * two shuffle equi-joins against the corpus — never broadcast (both
   * sides are corpus-sized), never all-pairs.
   */
  def knnDescend(emb: DataFrame, graph: DataFrame, j: Int): DataFrame = {
    require(j >= 1, s"j=$j")
    val V = graft.functions.VectorOps
    val edges = graph.select(col("qid"), col("id"))
    val hop2 = edges.as("a")
      .join(edges.select(col("qid").as("mid"), col("id").as("nid")),
        col("id") === col("mid"))
      .select(col("qid"), col("nid").as("id"))
      .filter(col("id") =!= col("qid"))
    val cand = edges.union(hop2).distinct()
    val scored = cand
      .join(emb.select(col("vec_id").as("id"), col("embedding"),
        V.norm2Sq(col("embedding")).as("n2")), Seq("id"))
      .join(emb.select(col("vec_id").as("qid"),
        col("embedding").as("qvec"),
        V.norm2Sq(col("embedding")).as("qn2")), Seq("qid"))
      .withColumn("score", cosScore)
    TopK.window(scored, j)
  }

  /**
   * BEAM SEARCH over the k-NN graph — the graph-ANN query path (HNSW's
   * layer-0 descent, simplified to a fixed number of SYNCHRONIZED beam
   * rounds, which keeps it deterministic, relational, and oracle-
   * mirrorable): the beam starts at a PER-QUERY entry node — the
   * minimum id among members of the query's nearest coarse cell (the
   * coarse quantizer is the deterministic stand-in for HNSW's upper
   * layers; at 100x scale a single global entry wastes early rounds
   * crossing the space, while the nearest-cell entry starts the walk in
   * the query's neighborhood), falling back to the global minimum id
   * when that cell holds no corpus point — each round expands the
   * current beam by its graph neighbors, exactly scores beam ∪
   * neighbors against the query, and keeps the best `beam`; after
   * `rounds` rounds the top-k of the final beam is the answer. Per
   * query each round touches at most beam*(degree+1) vectors — the
   * whole search reads rounds*beam*degree vectors, NEVER the corpus;
   * every expansion is a bounded equi-join against the edge list. Each
   * round's beam (nq*beam rows) is eagerly localCheckpoint-ed — the
   * Dedup.connectedComponents lineage discipline — so the operator
   * survives rounds >> 4 without an iterative-plan blow-up.
   */
  def graphSearch(emb: DataFrame, graph: DataFrame, nq: Int, k: Int,
                  beam: Int, rounds: Int, nCells: Int, d: Int,
                  meter: Option[java.util.concurrent.atomic.LongAdder] =
                    None): DataFrame = {
    require(beam >= k, s"beam $beam must be >= k $k")
    require(rounds >= 1, s"rounds=$rounds")
    val V = graft.functions.VectorOps
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val edges = graph.select(col("qid").as("src"), col("id").as("dst"))
    // bounded driver-side seed (one row): the global fallback entry —
    // and the empty-corpus guard (a null aggregate means no entry node)
    val gminRow = emb.agg(min(col("vec_id"))).collect()(0)
    require(!gminRow.isNullAt(0),
      "graphSearch: empty corpus — no entry node to start the beam from")
    val gmin = gminRow.getLong(0)
    val top1 = probeCells(q, nCells, d, 1).select(col("qid"), col("cell"))
    val cellMin = assign(emb, nCells, d).groupBy(col("cell"))
      .agg(min(col("id")).as("mid"))
    val scoreSide = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"))
    def rescore(frontier: DataFrame): DataFrame = frontier
      .join(scoreSide, Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", cosScore)
    var beamDf: DataFrame = top1.join(cellMin, Seq("cell"), "left")
      .select(col("qid"), coalesce(col("mid"), lit(gmin)).as("id"))
    for (_ <- 1 to rounds) {
      val expanded = beamDf.union(
          beamDf.join(edges, beamDf("id") === edges("src"))
            .select(col("qid"), col("dst").as("id")))
        .distinct()
      meter.foreach(_.add(expanded.count()))
      beamDf = TopK.window(rescore(expanded), beam)
        .select(col("qid"), col("id"))
        .localCheckpoint(true)
    }
    TopK.window(rescore(beamDf), k)
  }

  // --- HNSW-style layered graph -----------------------------------------

  /**
   * The UPPER LAYERS of an HNSW-style hierarchy over the k-NN graph:
   * layer `l` (1..layers) keeps every `stride^l`-th id (the
   * deterministic analog of HNSW's geometric level draw — same
   * expected 1/stride thinning per level, but derived from the id so
   * both engines and every executor agree), and connects each member
   * to its top-`j` nearest members via the SAME bounded probed-cell
   * join as the base graph ([[knnGraphFor]] — at 100 TB layer 1 is
   * still corpus/stride nodes, so the build must stay a cell equi-join,
   * never all-pairs). Output (layer, qid, rank, id, score).
   */
  def layeredUpper(emb: DataFrame, j: Int, nCells: Int, d: Int,
                   nprobe: Int, stride: Int, layers: Int): DataFrame = {
    require(stride >= 2 && layers >= 1, s"stride=$stride layers=$layers")
    (1 to layers).map { l =>
      val mod = math.pow(stride.toDouble, l.toDouble).toLong
      val mem = emb.filter(col("vec_id") % mod === 0)
      knnGraphFor(
        mem.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        mem, j, nCells, d, nprobe)
        .withColumn("layer", lit(l))
    }.reduce(_ unionByName _)
  }

  /** The upper layers AT REST (layer-partitioned, id-sorted within
    * files), beside the [[ensureKnnGraph]] base layer — together the
    * standard production graph topology, built once, served many. */
  def ensureLayeredUpper(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String, j: Int, nCells: Int, d: Int,
                         nprobe: Int, stride: Int, layers: Int): String = {
    import java.nio.file.{Files, Paths}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_knnupper_v${KnnGraphLayoutVersion}_${safe}_j${j}_c${nCells}" +
        s"_d${d}_p${nprobe}_s${stride}_l${layers}" +
        s"_v${graft.Fixture.srcVersion(sfDir)}")
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Files.createTempDirectory(path.getParent, "knnu-")
      layeredUpper(graft.Tables.embeddings(spark, sfDir), j, nCells, d,
        nprobe, stride, layers)
        .sortWithinPartitions(col("qid"))
        .write.mode("overwrite").partitionBy("layer")
        .option("compression", "zstd").parquet(tmp.toString)
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileSystemException =>
        graft.sources.VecFiles.deleteRecursively(tmp) }
      require(Files.exists(path.resolve("_SUCCESS")),
        s"layered graph publish failed: $path")
    }
    path.toString
  }

  /**
   * LAYERED BEAM SEARCH — HNSW's full query shape: enter at the
   * sparse top layer's minimum member id (global-min fallback),
   * GREEDILY descend (per upper layer, `upperRounds` width-1 beam
   * rounds over that layer's edges — HNSW's ef=1 descent), then run
   * the usual width-`beam` rounds on the base graph from the descended
   * entry. Because the descent already lands the walk in the query's
   * neighborhood, the base search needs FEWER rounds than the flat
   * beam for the same recall — each upper round reads at most
   * (j+1) vectors per query, each base round at most beam*(j+1), and
   * the spec measures exactly this reads-vs-recall trade
   * (OperatorsSpec: recall >= flat at fewer total vector reads).
   * Deterministic, relational, and oracle-mirrorable like
   * [[graphSearch]]; `meter` (tests) accumulates rescored-pair counts.
   */
  def graphSearchLayered(emb: DataFrame, graph0: DataFrame,
                         upper: DataFrame, nq: Int, k: Int, beam: Int,
                         rounds: Int, upperRounds: Int, upperBeam: Int,
                         stride: Int, layers: Int,
                         meter: Option[java.util.concurrent.atomic.LongAdder] =
                           None): DataFrame = {
    require(beam >= k, s"beam $beam must be >= k $k")
    require(rounds >= 1 && upperRounds >= 1 && upperBeam >= 1 && layers >= 1,
      s"rounds=$rounds upperRounds=$upperRounds upperBeam=$upperBeam layers=$layers")
    val V = graft.functions.VectorOps
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val scoreSide = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"))
    def rescore(frontier: DataFrame): DataFrame = frontier
      .join(scoreSide, Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("score", cosScore)
    // bounded driver-side entry seed: top layer's min member id,
    // global min when the top layer is empty
    val modTop = math.pow(stride.toDouble, layers.toDouble).toLong
    val entRow = emb.agg(
      min(when(col("vec_id") % modTop === 0, col("vec_id"))).as("e"),
      min(col("vec_id")).as("g")).collect()(0)
    require(!entRow.isNullAt(1),
      "graphSearchLayered: empty corpus — no entry node")
    val entry = if (entRow.isNullAt(0)) entRow.getLong(1)
      else entRow.getLong(0)
    var cur: DataFrame = q.select(col("qid"), lit(entry).as("id"))
    for (l <- layers to 1 by -1) {
      val edgesL = upper.filter(col("layer") === l)
        .select(col("qid").as("src"), col("id").as("dst"))
      for (_ <- 1 to upperRounds) {
        val expanded = cur.union(
            cur.join(edgesL, cur("id") === edgesL("src"))
              .select(col("qid"), col("dst").as("id")))
          .distinct()
        meter.foreach(_.add(expanded.count()))
        cur = TopK.window(rescore(expanded), upperBeam)
          .select(col("qid"), col("id"))
          .localCheckpoint(true)
      }
    }
    val edges0 = graph0.select(col("qid").as("src"), col("id").as("dst"))
    var beamDf = cur
    for (_ <- 1 to rounds) {
      val expanded = beamDf.union(
          beamDf.join(edges0, beamDf("id") === edges0("src"))
            .select(col("qid"), col("dst").as("id")))
        .distinct()
      meter.foreach(_.add(expanded.count()))
      beamDf = TopK.window(rescore(expanded), beam)
        .select(col("qid"), col("id"))
        .localCheckpoint(true)
    }
    TopK.window(rescore(beamDf), k)
  }

  /**
   * Recall-vs-nprobe tuning sweep — the standard IVF index-tuning
   * workflow (pick the smallest probe depth that clears a recall floor,
   * the nprobe analog of the reference's Hoeffding delta grid-search,
   * `ANNCode.py:663-690`). Every grid point derives from ONE scored
   * candidate scan: per-query probe cells are ranked once to
   * `nprobes.max`, candidates in those cells are scored once (kept
   * narrow and persisted), and each grid point is just a proberank
   * filter + top-K + hits join against the exact ground truth (also
   * computed once) — no per-grid-point rescans of the corpus.
   * Output: one row per nprobe (nprobe, hits, recall, cand, bytes_cheap,
   * save) — the reference's tuning artifact reports (recall, save) pairs
   * (sweep CSV, `ANNCode.py:735,779-780`), so each grid point also
   * carries the bytes model (`ANNCode.py:316-318`): this rung scans the
   * full float vector of every candidate in the probed cells, so
   * bytes_cheap = 4d * candidates, and save is measured against the
   * brute baseline 4d * N * Q. Counts are exact integers; save is one
   * double division both engines evaluate identically.
   */
  def tuneNprobe(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                 nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= nCells),
      s"nprobes $nprobes out of [1, $nCells]")
    val npMax = nprobes.max
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val withD = q.select(col("qid") +: col("qvec") +: col("qn2") +:
      cellDists(col("qvec"), nCells, d): _*)
    val stacked = withD.select(col("qid"), col("qvec"), col("qn2"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= npMax)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell"),
        col("proberank")))
    val assigned = assign(emb, nCells, d)
      .withColumn("n2", graft.functions.VectorOps.norm2Sq(col("embedding")))
    val cand = Dedup.persistScoped(assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
      .select(col("qid"), col("id"), col("score"), col("proberank")))
    // K*NQ rows: every grid point's hits join broadcasts it rather than
    // letting the tiny side pick a sort-merge shuffle
    val truth = Dedup.persistScoped(
      Ann.bruteTopK(emb, nq, k).select(col("qid"), col("id")))
    // 1-row relations cross-joined under every grid point (constant-fold
    // cheap: the corpus count is one agg, shared via the persisted scan's
    // session)
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    val bFull = 4L * d  // float32 bytes/vector
    val denom = (bFull * nq).toDouble
    nprobes.sorted.map { np =>
      val flt = cand.filter(col("proberank") <= np)
      val candN = flt.agg(count(lit(1)).as("cand_n"))
      TopK.window(flt, k)
        .select(col("qid"), col("id"))
        .join(broadcast(truth), Seq("qid", "id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(candN).crossJoin(nTot)
        .select(lit(np).as("nprobe"), col("hits"),
          (col("hits").cast("double") / lit(k * nq)).as("recall"),
          col("cand_n").as("cand"),
          (col("cand_n") * lit(bFull)).as("bytes_cheap"),
          (lit(1.0) - (col("cand_n") * lit(bFull)).cast("double") /
            (col("n_total").cast("double") * lit(denom))).as("save"))
    }.reduce(_.union(_))
  }

  /**
   * The [[tuneNprobe]] sweep over the IVF-SQ8 rung — the operating-point
   * chooser for the canonical two-phase configuration: per grid point the
   * CHEAP pass reads 1 byte/dim of int8 codes for every candidate in the
   * probed cells, the rerank cut fetches full vectors for at most
   * rerank*Q survivors, and recall is that pipeline's end-to-end quality
   * against the exact ground truth. One persisted sq8-scored candidate
   * scan feeds every grid point (same shared-scan discipline as
   * [[tuneNprobe]]); the rescore per point touches only the bounded
   * survivor set. Output: (nprobe, hits, recall, cand, fetched,
   * bytes_cheap, bytes_rescore, save) with
   * save = 1 - (1d*cand + 4d*fetched) / (4d*N*Q) — the reference's
   * accounting shape (`ANNCode.py:316-318`) with the int8 rung's byte
   * widths.
   */
  def tuneNprobeSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                    nprobes: Seq[Int], scaleLog2: Int, rerank: Int): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= nCells),
      s"nprobes $nprobes out of [1, $nCells]")
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    val V = graft.functions.VectorOps
    val npMax = nprobes.max
    val s = math.pow(2.0, scaleLog2)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val withD = q.select(col("qid") +: col("qvec") +: col("qn2") +:
      cellDists(col("qvec"), nCells, d): _*)
    val stacked = withD.select(col("qid"), col("qvec"), col("qn2"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= npMax)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell"),
        col("proberank")))
    val assigned = assign(emb, nCells, d)
      .withColumn("q8", transform(col("embedding"),
        x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float")))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
    val cand = Dedup.persistScoped(assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
      .select(col("qid"), col("id"), col("score"), col("proberank")))
    val truth = Dedup.persistScoped(
      Ann.bruteTopK(emb, nq, k).select(col("qid"), col("id")))
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    val vFull = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"))
    val qFull = broadcast(q.withColumnRenamed("qvec", "qvec_")
      .withColumnRenamed("qn2", "qn2_"))
    val bCode = d.toLong       // int8: 1 byte/dim cheap read
    val bFull = 4L * d         // float32 rescore fetch
    val denom = (bFull * nq).toDouble
    nprobes.sorted.map { np =>
      val flt = cand.filter(col("proberank") <= np)
      val candN = flt.agg(count(lit(1)).as("cand_n"))
      val fetchedIds = TopK.window(flt, rerank).select(col("qid"), col("id"))
      val fetchedN = fetchedIds.agg(count(lit(1)).as("fetched_n"))
      val rescored = vFull.join(broadcast(fetchedIds), Seq("id"))
        .join(qFull, Seq("qid"))
        .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
          (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
      TopK.window(rescored, k)
        .select(col("qid"), col("id"))
        .join(broadcast(truth), Seq("qid", "id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(candN).crossJoin(fetchedN).crossJoin(nTot)
        .select(lit(np).as("nprobe"), col("hits"),
          (col("hits").cast("double") / lit(k * nq)).as("recall"),
          col("cand_n").as("cand"), col("fetched_n").as("fetched"),
          (col("cand_n") * lit(bCode)).as("bytes_cheap"),
          (col("fetched_n") * lit(bFull)).as("bytes_rescore"),
          (lit(1.0) -
            (col("cand_n") * lit(bCode) + col("fetched_n") * lit(bFull))
              .cast("double") /
            (col("n_total").cast("double") * lit(denom))).as("save"))
    }.reduce(_.union(_))
  }

  /**
   * The FULL 2-D TUNING GRID (nprobe x rerank) over the IVF-SQ8 rung —
   * the complete analog of the reference's 2-D sweep (mode fixed,
   * m_keep x delta grid, `ANNCode.py:729-789`): both knobs swept
   * together because their bytes trade against each other (a deeper
   * probe pays cheap-scan bytes, a deeper cut pays rescore bytes) and
   * the best operating point is NOT on either 1-D slice in general.
   * Still ONE persisted scored candidate scan at max(nprobes) carrying
   * proberank, one ground-truth pass; every grid point is a proberank
   * filter + a rank cut + a bounded rescore. Output one row per
   * (nprobe, rerank) with the [[tuneNprobeSq8]] accounting columns.
   */
  def tuneGridSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                  nprobes: Seq[Int], reranks: Seq[Int],
                  scaleLog2: Int): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= nCells),
      s"nprobes $nprobes out of [1, $nCells]")
    require(reranks.nonEmpty && reranks.forall(_ >= k),
      s"reranks $reranks must all be >= k=$k")
    val V = graft.functions.VectorOps
    val npMax = nprobes.max
    val s = math.pow(2.0, scaleLog2)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val withD = q.select(col("qid") +: col("qvec") +: col("qn2") +:
      cellDists(col("qvec"), nCells, d): _*)
    val stacked = withD.select(col("qid"), col("qvec"), col("qn2"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = broadcast(stacked
      .withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= npMax)
      .select(col("qid"), col("qvec"), col("qn2"), col("cell"),
        col("proberank")))
    val assigned = assign(emb, nCells, d)
      .withColumn("q8", transform(col("embedding"),
        x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float")))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
    val cand = Dedup.persistScoped(assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
      .select(col("qid"), col("id"), col("score"), col("proberank")))
    val truth = Dedup.persistScoped(
      Ann.bruteTopK(emb, nq, k).select(col("qid"), col("id")))
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    val vFull = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"))
    val qFull = broadcast(q.withColumnRenamed("qvec", "qvec_")
      .withColumnRenamed("qn2", "qn2_"))
    val bCode = d.toLong
    val bFull = 4L * d
    val denom = (bFull * nq).toDouble
    (for (np <- nprobes.sorted; rr <- reranks.sorted) yield {
      val flt = cand.filter(col("proberank") <= np)
      val candN = flt.agg(count(lit(1)).as("cand_n"))
      val fetchedIds = TopK.window(flt, rr).select(col("qid"), col("id"))
      val fetchedN = fetchedIds.agg(count(lit(1)).as("fetched_n"))
      val rescored = vFull.join(broadcast(fetchedIds), Seq("id"))
        .join(qFull, Seq("qid"))
        .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
          (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
      TopK.window(rescored, k)
        .select(col("qid"), col("id"))
        .join(broadcast(truth), Seq("qid", "id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(candN).crossJoin(fetchedN).crossJoin(nTot)
        .select(lit(np).as("nprobe"), lit(rr).as("rerank"), col("hits"),
          (col("hits").cast("double") / lit(k * nq)).as("recall"),
          col("cand_n").as("cand"), col("fetched_n").as("fetched"),
          (col("cand_n") * lit(bCode)).as("bytes_cheap"),
          (col("fetched_n") * lit(bFull)).as("bytes_rescore"),
          (lit(1.0) -
            (col("cand_n") * lit(bCode) + col("fetched_n") * lit(bFull))
              .cast("double") /
            (col("n_total").cast("double") * lit(denom))).as("save"))
    }).reduce(_.union(_))
  }

  /**
   * [[tuneGridSq8]] plus the OPERATING-POINT CHOICE over the full 2-D
   * grid: the `chosen` flag lands on the row with the highest bandwidth
   * saving among those clearing the recall floor (else highest recall),
   * ties to the smaller (nprobe, rerank) — rows are collected in that
   * ascending order, so `maxBy`'s first-wins tie-break matches the
   * oracle's ORDER BY. The sweep is the shared-scan pipeline; the choice
   * is driver-side over |grid| rows.
   */
  def chooseGridSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                    nprobes: Seq[Int], reranks: Seq[Int], scaleLog2: Int,
                    recallFloor: Double): DataFrame =
    chooseGridFromRows(emb.sparkSession,
      tuneGridSq8(emb, nq, k, nCells, d, nprobes, reranks, scaleLog2)
        .collect().toList.sortBy(r => (r.getInt(0), r.getInt(1))),
      recallFloor)

  /** [[chooseGridSq8]] over precollected sweep rows (MUST be sorted by
    * (nprobe, rerank) ascending — the tie-break order). */
  def chooseGridFromRows(spark: org.apache.spark.sql.SparkSession,
                         rows: Seq[org.apache.spark.sql.Row],
                         recallFloor: Double): DataFrame = {
    val indexed = rows.toList.zipWithIndex
    val meeting = indexed.filter(_._1.getAs[Double]("recall") >= recallFloor)
    val chosenIdx =
      if (meeting.nonEmpty) meeting.maxBy(_._1.getAs[Double]("save"))._2
      else indexed.maxBy(_._1.getAs[Double]("recall"))._2
    import spark.implicits._
    indexed.map { case (r, i) =>
      (r.getInt(0), r.getInt(1), r.getAs[Long]("hits"),
        r.getAs[Double]("recall"), r.getAs[Long]("cand"),
        r.getAs[Long]("fetched"), r.getAs[Long]("bytes_cheap"),
        r.getAs[Long]("bytes_rescore"), r.getAs[Double]("save"),
        i == chosenIdx)
    }.toDF("nprobe", "rerank", "hits", "recall", "cand", "fetched",
      "bytes_cheap", "bytes_rescore", "save", "chosen")
  }

  /**
   * INDEX INTROSPECTION — the ANALYZE surface of the IVF index: per-cell
   * occupancy (count, id range, corpus fraction). This is what an
   * operator looks at before choosing nprobe or deciding to re-train
   * centroids: a skewed occupancy histogram means probe cost varies
   * wildly per query and the biggest cells dominate every scan. One
   * map-side assignment pass + a partial-aggregating groupBy into
   * nCells rows — at 100 TB this is a single cheap scan, and at rest
   * the stats come free from the cell-partitioned layout's footer
   * counts. Output: (cell, n, min_id, max_id, frac).
   */
  def indexStats(emb: DataFrame, nCells: Int, d: Int): DataFrame = {
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    assign(emb, nCells, d)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .crossJoin(nTot)
      .select(col("cell"), col("n"), col("min_id"), col("max_id"),
        (col("n").cast("double") / col("n_total").cast("double")).as("frac"))
  }

  /**
   * PARETO FRONTIER of the 2-D tuning grid — the rows not dominated on
   * (recall, save): a grid point is dropped iff some other point has
   * recall >= AND save >= with at least one strict. This is the tuning
   * artifact an operator actually wants (the menu of efficient
   * operating points; every dominated row is strictly wasted bandwidth
   * at its recall). The sweep is the shared-scan [[tuneGridSq8]]
   * pipeline; dominance — like [[chooseGridSq8]]'s choice — is
   * driver-side over the |grid| collected rows, never touching the
   * corpus again. [[paretoFromRows]] takes precollected sweep rows so a
   * session can run the sweep ONCE and feed grid/choice/frontier.
   */
  def paretoGridSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                    nprobes: Seq[Int], reranks: Seq[Int],
                    scaleLog2: Int): DataFrame =
    paretoFromRows(emb.sparkSession,
      tuneGridSq8(emb, nq, k, nCells, d, nprobes, reranks, scaleLog2)
        .collect().toList.sortBy(r => (r.getInt(0), r.getInt(1))))

  /** [[paretoGridSq8]] over precollected sweep rows. */
  def paretoFromRows(spark: org.apache.spark.sql.SparkSession,
                     rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    def rec(r: org.apache.spark.sql.Row) = r.getAs[Double]("recall")
    def sv(r: org.apache.spark.sql.Row) = r.getAs[Double]("save")
    rows.filterNot(a => rows.exists(b =>
        rec(b) >= rec(a) && sv(b) >= sv(a) &&
          (rec(b) > rec(a) || sv(b) > sv(a))))
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Long]("hits"),
        rec(r), sv(r)))
      .toDF("nprobe", "rerank", "hits", "recall", "save")
  }

  /**
   * QUERY-ADAPTIVE PROBE DEPTH — per-query early termination on the
   * coarse quantizer (the FAISS-style adaptive-nprobe heuristic made
   * deterministic): instead of a fixed nprobe, each query probes the
   * cells whose centroid distance is within `ratio` of its NEAREST
   * centroid distance (capped at `npMax`). An easy query — one clearly
   * closest cell — pays one cell's scan; an ambiguous query near a cell
   * boundary automatically widens. Pure comparisons on the same exact
   * centroid-distance doubles both engines compute, so the probe set is
   * oracle-mirrorable. Output: (qid, rank, id, score, n_probed) — the
   * per-query probe count is part of the result, it IS the knob's
   * observable behavior.
   */
  def topkAdaptive(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                   ratio: Double, npMax: Int): DataFrame = {
    require(ratio >= 1.0, s"ratio $ratio must be >= 1")
    require(npMax >= 1 && npMax <= nCells, s"npMax $npMax out of [1, $nCells]")
    val V = graft.functions.VectorOps
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val withD = q.select(col("qid") +: col("qvec") +: col("qn2") +:
      cellDists(col("qvec"), nCells, d): _*)
    val stacked = withD.select(col("qid"), col("qvec"), col("qn2"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("qn2"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val wq = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
    val probes = broadcast(stacked
      .withColumn("proberank", row_number().over(w))
      .withColumn("d2min", min(col("d2")).over(wq))
      .filter(col("proberank") <= npMax &&
        col("d2") <= col("d2min") * lit(ratio))
      .select(col("qid"), col("qvec"), col("qn2"), col("cell")))
    val nProbed = broadcast(probes.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_probed")))
    val assigned = assign(emb, nCells, d)
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score", cosScore)
    TopK.window(scored, k).join(nProbed, Seq("qid"))
  }

  /**
   * RECALL@R CURVE for the probe rung — recall at several result depths
   * from ONE ranked pass each side (the standard ANN benchmark artifact:
   * recall@1 says whether the top hit survives, recall@rMax whether the
   * candidate pool is deep enough; a rung can be good at one and bad at
   * the other). The approximate side is ranked once to max(rs), the
   * brute ground truth once to max(rs); each curve point is a rank cut +
   * a count — no per-point rescans. Output: (r, hits, recall).
   */
  def recallAtR(emb: DataFrame, nq: Int, nCells: Int, d: Int, nprobe: Int,
                rs: Seq[Int]): DataFrame = {
    require(rs.nonEmpty && rs.forall(_ >= 1), s"rs $rs must be >= 1")
    val rMax = rs.max
    val V = graft.functions.VectorOps
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val assigned = assign(emb, nCells, d)
      .withColumn("n2", V.norm2Sq(col("embedding")))
    val appr = Dedup.persistScoped(TopK.window(
      assigned.join(probes, Seq("cell")).withColumn("score", cosScore), rMax)
      .select(col("qid"), col("rank"), col("id")))
    val truth = Dedup.persistScoped(Ann.bruteTopK(emb, nq, rMax)
      .select(col("qid"), col("rank"), col("id")))
    appr.count(); truth.count()   // fill once; every cut reads the cache
    rs.sorted.map { r =>
      appr.filter(col("rank") <= r).select(col("qid"), col("id"))
        .join(truth.filter(col("rank") <= r).select(col("qid"), col("id")),
          Seq("qid", "id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(r).as("r"), col("hits"),
          (col("hits").cast("double") / lit((r * nq).toDouble)).as("recall"))
    }.reduce(_.union(_))
  }

  /**
   * The OTHER tuning axis: recall-vs-RERANK sweep at a fixed probe depth
   * over the IVF-SQ8 rung. The cheap pass (and so bytes_cheap) is the
   * same for every grid point; what varies is how many survivors pay the
   * full-precision fetch — the cut depth is the knob that trades rescore
   * bandwidth for recall once nprobe is settled (the reference tunes its
   * analogous second knob, the cushion delta, the same way:
   * `ANNCode.py:729-789` sweeps m_keep x delta with mode fixed). ONE
   * persisted sq8-scored candidate scan and one ground-truth pass feed
   * every grid point; each point is just a deeper rank cut + a bounded
   * rescore. Output: (rerank, hits, recall, cand, fetched, bytes_cheap,
   * bytes_rescore, save) — same accounting shape as [[tuneNprobeSq8]].
   */
  def tuneRerankSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                    nprobe: Int, scaleLog2: Int, reranks: Seq[Int]): DataFrame = {
    require(reranks.nonEmpty && reranks.forall(_ >= k),
      s"reranks $reranks must all be >= k=$k")
    val V = graft.functions.VectorOps
    val s = math.pow(2.0, scaleLog2)
    val q = Ann.queriesOf(emb, nq).select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val assigned = assign(emb, nCells, d)
      .withColumn("q8", transform(col("embedding"),
        x => (floor(x * s + lit(0.5)).cast("double") / s).cast("float")))
      .withColumn("n2q8", V.norm2Sq(col("q8")))
    val cand = Dedup.persistScoped(assigned.join(probes, Seq("cell"))
      .withColumn("score", V.dot(col("q8"), col("qvec")) /
        (V.fnorm(col("n2q8")) * V.fnorm(col("qn2"))))
      .select(col("qid"), col("id"), col("score")))
    val truth = Dedup.persistScoped(
      Ann.bruteTopK(emb, nq, k).select(col("qid"), col("id")))
    val nTot = emb.agg(count(lit(1)).as("n_total"))
    val candN = cand.agg(count(lit(1)).as("cand_n"))
    val vFull = emb.select(col("vec_id").as("id"), col("embedding"),
      V.norm2Sq(col("embedding")).as("n2"))
    val qFull = broadcast(q.withColumnRenamed("qvec", "qvec_")
      .withColumnRenamed("qn2", "qn2_"))
    val bCode = d.toLong
    val bFull = 4L * d
    val denom = (bFull * nq).toDouble
    reranks.sorted.map { rr =>
      val fetchedIds = TopK.window(cand, rr).select(col("qid"), col("id"))
      val fetchedN = fetchedIds.agg(count(lit(1)).as("fetched_n"))
      val rescored = vFull.join(broadcast(fetchedIds), Seq("id"))
        .join(qFull, Seq("qid"))
        .withColumn("score", V.dot(col("embedding"), col("qvec_")) /
          (V.fnorm(col("n2")) * V.fnorm(col("qn2_"))))
      TopK.window(rescored, k)
        .select(col("qid"), col("id"))
        .join(broadcast(truth), Seq("qid", "id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(candN).crossJoin(fetchedN).crossJoin(nTot)
        .select(lit(rr).as("rerank"), col("hits"),
          (col("hits").cast("double") / lit(k * nq)).as("recall"),
          col("cand_n").as("cand"), col("fetched_n").as("fetched"),
          (col("cand_n") * lit(bCode)).as("bytes_cheap"),
          (col("fetched_n") * lit(bFull)).as("bytes_rescore"),
          (lit(1.0) -
            (col("cand_n") * lit(bCode) + col("fetched_n") * lit(bFull))
              .cast("double") /
            (col("n_total").cast("double") * lit(denom))).as("save"))
    }.reduce(_.union(_))
  }

  /**
   * [[tuneNprobeSq8]] plus the OPERATING-POINT CHOICE — the end of the
   * reference's tuning workflow (and [[Tune.tuneDelta]]'s discipline
   * verbatim): a `chosen` flag on the grid row with the highest
   * bandwidth saving among those clearing the recall floor, falling back
   * to the highest-recall row if none do; ties break to the smaller
   * nprobe (rows are collected ascending). The sweep itself is the
   * shared-scan pipeline; the choice is driver-side over |grid| rows.
   */
  def chooseNprobeSq8(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
                      nprobes: Seq[Int], scaleLog2: Int, rerank: Int,
                      recallFloor: Double): DataFrame = {
    val spark = emb.sparkSession
    val rows = tuneNprobeSq8(emb, nq, k, nCells, d, nprobes, scaleLog2,
      rerank).collect().toList.sortBy(_.getInt(0))
    val indexed = rows.zipWithIndex
    val meeting = indexed.filter(_._1.getAs[Double]("recall") >= recallFloor)
    val chosenIdx =
      if (meeting.nonEmpty) meeting.maxBy(_._1.getAs[Double]("save"))._2
      else indexed.maxBy(_._1.getAs[Double]("recall"))._2
    import spark.implicits._
    indexed.map { case (r, i) =>
      (r.getInt(0), r.getAs[Long]("hits"), r.getAs[Double]("recall"),
        r.getAs[Long]("cand"), r.getAs[Long]("fetched"),
        r.getAs[Long]("bytes_cheap"), r.getAs[Long]("bytes_rescore"),
        r.getAs[Double]("save"), i == chosenIdx)
    }.toDF("nprobe", "hits", "recall", "cand", "fetched", "bytes_cheap",
      "bytes_rescore", "save", "chosen")
  }
}

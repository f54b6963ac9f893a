package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Document deduplication for large-scale training-data pipelines: exact,
 * MinHash+LSH, SimHash, and n-gram Jaccard.
 *
 * Scale design (100 TB corpus):
 *  - every candidate-generation step is a hash-partitioned groupBy/join on
 *    a derived key (text digest, LSH band key, shingle) — no all-pairs
 *    product ever materializes;
 *  - the only pairwise joins are within LSH buckets / shared shingles,
 *    whose sizes are controlled by banding parameters;
 *  - hashes are arithmetic over md5 prefixes, so they are deterministic,
 *    partitioning-invariant, and reproducible in plain SQL (the DuckDB
 *    oracle mirrors them exactly) — no engine-specific hash functions.
 */
object Dedup {

  /** Big prime modulus for MinHash permutations. */
  final val P = 1000000007L
  final val AMul = 2654435761L
  final val BMul = 40503L

  // Intermediates persisted by the pipelines below. They must stay cached
  // until the *returned* (lazy) DataFrame has been consumed, so the
  // operators cannot unpersist them; callers release them afterwards —
  // either globally ([[releaseIntermediates]]) or per pipeline via
  // [[scopedRelease]], which keeps two concurrent pipelines in one
  // session from draining each other's still-needed caches.
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val scope =
    new scala.util.DynamicVariable[Option[java.util.Queue[DataFrame]]](None)
  private def track(df: DataFrame): DataFrame = {
    scope.value.getOrElse(tracked).add(df)
    df
  }
  private def persistTracked(df: DataFrame): DataFrame =
    track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Persist an intermediate of an EXTERNAL composition (e.g. a corpus
    * pipeline built on these operators) under the same release discipline
    * as the internal ones: freed by [[releaseIntermediates]] or the
    * enclosing [[scopedRelease]]. */
  def persistScoped(df: DataFrame): DataFrame = persistTracked(df)

  /** True while the calling thread is constructing under
    * [[scopedRelease]] — operators use this to tell managed callers
    * (Bench/Verify, which release per query) from bare library callers
    * (who get self-contained results instead of a leak; see
    * Refine.fetchedSplit). */
  def scopeActive: Boolean = scope.value.isDefined

  /** Globally-tracked intermediates currently awaiting release —
    * test hook for the no-leak contract. */
  private[graft] def trackedCount: Int = tracked.size

  /** Run `f` (a pipeline construction) with its persisted intermediates
    * tracked in a private scope; returns the result plus a release
    * callback that unpersists ONLY that scope's intermediates. */
  def scopedRelease[T](f: => T): (T, () => Unit) = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def drain(): Unit = {
      var d = q.poll()
      while (d != null) { d.unpersist(blocking = false); d = q.poll() }
    }
    val r =
      try scope.withValue(Some(q))(f)
      catch {
        // a throwing construction would orphan the scoped persists (the
        // release handle is never returned): free them before rethrowing
        case e: Throwable => drain(); throw e
      }
    (r, () => drain())
  }

  /** Release every globally-tracked intermediate persisted by this
    * object's pipelines (those not built under [[scopedRelease]]). Call
    * once the DataFrames returned by [[lshPairs]] / [[ngramJaccardPairs]]
    * have been consumed (long-lived sessions would otherwise accumulate
    * cached blocks across calls). */
  def releaseIntermediates(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking = false); d = tracked.poll() }
  }

  /** Portable 60-bit string hash: first 15 hex chars of md5 as BIGINT. */
  def strHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** i-th MinHash permutation of a base token hash. */
  def perm(h: Column, i: Int): Column = {
    val a = (AMul * (i + 1)) % P
    val b = (BMul * (i + 1)) % P
    (lit(a) * (h % P) + lit(b)) % P
  }

  /** Tokens column (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  // ---- exact dedup -------------------------------------------------------

  /**
   * Exact duplicate groups by content digest: one row per distinct text,
   * keeping the smallest doc_id (hash-partitioned groupBy; at 100 TB this
   * is the standard "hash, shuffle by digest, keep min" pass).
   */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---- MinHash + LSH -----------------------------------------------------

  /** MinHash signature over distinct shingles (from [[wordNgrams]]):
    * doc_id plus m0..m{n-1} columns (min shingle hash under n independent
    * permutations). */
  def minhashSignatures(grams: DataFrame, numHashes: Int): DataFrame = {
    val g = grams.withColumn("th", strHash(col("gram")))
    g.groupBy(col("doc_id"))
      .agg(
        min(perm(col("th"), 0)).as("m0"),
        (1 until numHashes).map(i => min(perm(col("th"), i)).as(s"m$i")): _*)
  }

  /**
   * LSH candidate pairs: signatures banded (`bands` x `rowsPerBand`); docs
   * sharing any band key become a pair. Output: (doc_a, doc_b, est_jaccard)
   * where est_jaccard = matching minhashes / numHashes.
   * The band join shuffles on the band key — bucket sizes, not corpus
   * size, bound the pair blow-up.
   */
  def lshPairs(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val n = bands * rowsPerBand
    // The signature pipeline (shingle explode + hash + n permutations +
    // groupBy) is the dominant cost; it feeds three scans below (band
    // explode + both sides of the est_jaccard join), so materialize it
    // once. At cluster scale the equivalent is a checkpoint to parquet;
    // MEMORY_AND_DISK keeps the library self-contained. Released by
    // [[releaseIntermediates]] once the caller has consumed the result.
    val s = persistTracked(sigs)
    // One band-key array per doc, posexploded to (doc_id, band, bk):
    // a single self-join on (band, bk) replaces `bands` separate
    // re-derived self-joins; both join sides shuffle on the same key,
    // so the exchange is computed once and reused.
    val bandKeys = array((0 until bands).map { b =>
      concat_ws(",",
        (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }: _*)
    val banded = s.select(col("doc_id"),
      posexplode(bandKeys).as(Seq("band", "bk")))
    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("bk"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"), col("bk"))
    val cand = l.join(r, Seq("band", "bk")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val a = s.toDF(s.columns.map(c => if (c == "doc_id") "doc_a" else s"a_$c"): _*)
    val bdf = s.toDF(s.columns.map(c => if (c == "doc_id") "doc_b" else s"b_$c"): _*)
    val matches = (0 until n)
      .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, "doc_a").join(bdf, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / n).as("est_jaccard"))
  }

  // ---- SimHash -----------------------------------------------------------

  /**
   * SimHash fingerprint over token multiset: bit k of the fingerprint is 1
   * iff sum over tokens of (+1 if bit k of token hash else -1) > 0.
   */
  def simhash(docs: DataFrame, bits: Int): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("th", strHash(col("tok")))
    val bitSums = (0 until bits).map(k =>
      sum(when(shiftright(col("th"), k).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$k"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits)
      .map(k => when(col(s"s$k") > 0, 1L << k).otherwise(0L))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /**
   * Near-dup pairs by SimHash hamming distance, same-`source` semantics.
   *
   * Candidate generation is simhash prefix banding, not a block self-join:
   * the fingerprint is split into `maxHamming + 1` contiguous bit bands
   * (pigeonhole: two fingerprints within hamming distance maxHamming are
   * EQUAL on at least one band — the Hamming-ball recall guarantee), and
   * candidates come from an equi-join on (band, band value). Bucket
   * sizes — not corpus or `source` block sizes — bound the pair blow-up,
   * so the plan survives a 100x corpus where any fixed-cardinality
   * blocking key would go quadratic. The same-source restriction and the
   * exact hamming test are post-filters; results are identical to the
   * all-pairs-within-source form (which the DuckDB oracle still uses).
   */
  def simhashPairs(docs: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    // a zero-width band has mask 0 -> every row shares band value 0 and
    // the equi-join silently degenerates into a corpus-wide cross join
    require(bits >= maxHamming + 1,
      s"simhashPairs needs bits >= maxHamming + 1 (got bits=$bits, maxHamming=$maxHamming)")
    val nb = maxHamming + 1
    val widths = Array.tabulate(nb)(i => bits / nb + (if (i < bits % nb) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val sh = simhash(docs, bits)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val bandVals = array((0 until nb).map { b =>
      shiftright(col("simhash"), offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1))
    }: _*)
    val banded = sh.select(col("doc_id"), col("simhash"), col("source"),
      posexplode(bandVals).as(Seq("band", "bv")))
    val l = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"),
      col("source").as("src_a"), col("band"), col("bv"))
    val r = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"),
      col("source").as("src_b"), col("band"), col("bv"))
    l.join(r, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b") && col("src_a") === col("src_b"))
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      // a pair can agree on several bands; results are deterministic per
      // pair, so a distinct on the output row dedups them
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /**
   * Dedup-cluster resolution: connected components over a near-dup pair
   * graph by min-label propagation. Every doc in a component ends with
   * the component's smallest doc_id as `comp` — the canonical keeper a
   * training-data pipeline retains (`WHERE doc_id = comp`), with the
   * rest dropped as near-duplicates.
   *
   * Iterates to the EXACT fixpoint: each round joins the edge list
   * against the current labels and takes the min over neighbors, so it
   * converges in <= graph-diameter rounds (near-dup clusters are
   * shallow). Per round: one shuffle join of the (bounded) edge list +
   * one aggregation — no all-pairs product, no driver-side graph. At
   * 100 TB the same loop runs with the edge list checkpointed to
   * parquet; for adversarial long-chain graphs swap in the
   * large-star/small-star variant (same join primitive, O(log n)
   * rounds).
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b"): DataFrame = {
    // materialize the pair pipeline once; the both-directions edge list
    // would otherwise recompute it for each union branch
    // materialize AND truncate lineage every round (localCheckpoint):
    // a persist alone truncates physical execution but not the logical
    // plan, and with the label relation referenced several times per
    // round the analyzed plan would grow exponentially in the iteration
    // count — the driver ends up spinning inside Catalyst, the classic
    // iterative-DataFrame trap. Checkpointed blocks are reclaimed by
    // the context cleaner once the superseded DataFrames are GC'd.
    val base = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val edges = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      // one hop over the graph...
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("comp").as("nbr_comp")),
          Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_comp")).as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("doc_id"))
        .select(col("doc_id"), least(col("comp"), col("nbr_min")).as("comp"))
      // ...then pointer-jump (comp := comp's comp): labels always point
      // at a real node, so the self-join is total; this halves the
      // remaining diameter each round -> O(log n) rounds on chains
      val next = stepped
        .join(stepped.select(col("doc_id").as("comp"), col("comp").as("cc")),
          Seq("comp"))
        .select(col("doc_id"), least(col("comp"), col("cc")).as("comp"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("doc_id"), col("comp").as("old")), Seq("doc_id"))
        .filter(col("comp") < col("old")).count()
      labels = next
    }
    labels
  }

  // ---- n-gram Jaccard ----------------------------------------------------

  /** Distinct word n-grams per doc: (doc_id, source, gram).
    *
    * The token array is hoisted into a column before the gram lambda:
    * higher-order functions run interpreted with no common-subexpression
    * elimination, so an inline `split` inside the lambda is re-executed
    * for every array element (measured 10x slower at sf0.1). */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("__toks", tokens(col("text")))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), col("source"),
        explode(gramsArray(col("__toks"), n)).as("gram"))

  /** Per-row DISTINCT n-gram array over a token array column. Doing the
    * de-dup map-side (`array_distinct` before the explode) instead of a
    * global `.distinct()` removes an entire shuffle from every gram
    * pipeline; the two are equivalent because `doc_id` is one row per
    * document (the tables' primary key). */
  private def gramsArray(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*)))

  /**
   * Exact n-gram Jaccard similarity for pairs sharing >= 1 gram within a
   * blocking key (source). Intersections come from a shuffle join on the
   * gram itself — never an all-pairs product.
   *
   * `maxDf` drops stop-shingles (grams present in more than maxDf docs of
   * a source) from the gram universe before joining: a gram shared by f
   * docs contributes f^2 join rows, so without the cap one ubiquitous
   * shingle turns the join quadratic in the block size (the shuffle-join
   * equivalent of skew salting; Jaccard is then computed consistently
   * over the capped universe on both sides).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        maxDf: Int = 200): DataFrame = {
    // df-cap via a window over the gram table (one shuffle on the very
    // key the intersection join needs) instead of a groupBy + join back,
    // which re-derived the expensive explode+distinct twice. The capped
    // table then feeds three scans (counts + both join sides), so
    // materialize it once (cluster-scale twin: checkpoint to parquet).
    // Released by [[releaseIntermediates]] after the result is consumed.
    val g = persistTracked(wordNgrams(docs, n)
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("source"), col("gram"))))
      .filter(col("df") <= maxDf)
      .drop("df"))
    val counts = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val l = g.select(col("source"), col("doc_id").as("doc_a"), col("gram"))
    val r = g.select(col("source"), col("doc_id").as("doc_b"), col("gram"))
    val inter = l.join(r, Seq("source", "gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_grams").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("un"), col("jaccard"))
  }

  // ---- exact-substring (span-level) dedup ---------------------------------

  /**
   * EXACT-SUBSTRING deduplication statistics — span-level dedup in the
   * style of Lee et al. 2022 ("Deduplicating Training Data Makes
   * Language Models Better"), whose suffix-array duplication criterion
   * is restated here over fixed-width token windows: a w-token window
   * is DUPLICATED when its exact text occurs >= 2 times anywhere in
   * the corpus (cross-document or within one document). Where
   * [[ngramJaccardPairs]] scores document PAIRS, this scores the SPANS
   * themselves — the operator that finds boilerplate headers, licence
   * blocks, and copy-pasted passages a doc-level dedup never removes.
   *
   * Returns one row per document:
   * (doc_id, n_toks, dup_starts, dup_tokens, dup_frac) where
   * `dup_starts` counts duplicated window starts and `dup_tokens` is
   * the size of the UNION of the duplicated windows (overlapping
   * windows merged as intervals — not w * dup_starts), i.e. exactly
   * the token count a span-removal pass would delete.
   *
   * Scale design: the position table is one map-side explode (corpus
   * tokens read once); duplicate detection is ONE hash aggregate on
   * the window text; marking is an equi-join on that same key — a
   * SEMI join, so a window occurring f times contributes f rows
   * (linear), never the f^2 of a pair join — and the interval union is
   * a per-document running-max window whose partition is bounded by
   * document length. No all-pairs product at any corpus size.
   */
  /** (docs with token arrays, w-window position table) shared by the
    * span statistics and the span-removal clean. split keeps empties on
    * repeated separators — filtered so token positions match DuckDB's
    * list_filter'd string_split. The window is carried as its FULL md5
    * digest (`gkey`), never the window text: every downstream shuffle/
    * group/join keys on 32 bytes regardless of w (at Lee et al.'s
    * w = 50 the text key would be ~300 bytes), and 128 bits keeps
    * collisions negligible at any corpus size (the 60-bit [[strHash]]
    * would birthday-collide past ~2^30 windows). */
  private def windowTable(docs: DataFrame, w: Int): (DataFrame, DataFrame) = {
    val toksC = filter(split(col("text"), " "), x => length(x) >= 1)
    val d = docs.select(col("doc_id"), toksC.as("__toks"))
      .withColumn("n_toks", size(col("__toks")))
    val g = d.filter(col("n_toks") >= w)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_toks") - w)).as("pos"), col("__toks"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          (0 until w).map(o => element_at(col("__toks"), col("pos") + o + 1)): _*))
          .as("gkey"))
    (d, g)
  }

  def substringDedup(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"window width $w must be >= 2")
    val (_, g) = windowTable(docs, w)
    // duplicated windows: the gram occurs >= 2 times corpus-wide. min/max
    // over pre-combined partials would also work for the cross-doc-only
    // variant; the >= 2 occurrence count matches the suffix-array rule.
    val dup = g.groupBy(col("gkey")).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2).select(col("gkey"))
    coverageOffDups(docs, w, dup)
  }

  /** [[substringDedup]]'s coverage pass against an EXPLICIT duplicated-
    * gram set — shared with the stream-maintained gram-count state
    * ([[graft.streaming.StreamOps.streamSubstringDedupOnce]]). */
  private[graft] def coverageOffDups(docs: DataFrame, w: Int,
                                     dup: DataFrame): DataFrame = {
    val (d, g) = windowTable(docs, w)
    val m = g.join(dup, Seq("gkey")).select(col("doc_id"), col("pos"))
    // interval union per doc: a start contributes the part of
    // [pos, pos+w) past the running max end of all earlier windows
    val winPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cover = greatest(lit(0), col("pos") + w -
      greatest(coalesce(max(col("pos") + w).over(winPrev), lit(0)), col("pos")))
    val agg = m.withColumn("__cover", cover)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_starts"),
        sum(col("__cover")).cast("long").as("dup_tokens"))
    d.select(col("doc_id"), col("n_toks").cast("long").as("n_toks"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("dup_starts"), lit(0L)).as("dup_starts"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_toks"))
          .as("dup_frac"))
  }

  /**
   * EXACT-SUBSTRING span-removal CLEAN — the output half of Lee et al.
   * 2022's dedup: every duplicated w-token window is removed from every
   * occurrence EXCEPT its canonical first (the min-(doc_id, pos)
   * occurrence keeps the text, so no content is lost from the corpus —
   * their keep-one-copy rule). Returns one row per document:
   * (doc_id, n_toks, removed_tokens, kept_text) where kept_text is the
   * document with the non-canonical duplicated spans' token coverage
   * deleted (token-rebuilt: single-space joined).
   *
   * Scale design: same bounded shapes as [[substringDedup]] — one hash
   * window over the gram key ranks occurrences (count + row_number in
   * one shuffle), removal starts aggregate to ONE array per document
   * (bounded by the document's own length — no cross-document state),
   * and the span deletion is a pure map-side higher-order-function
   * rewrite of the token array.
   */
  def substringClean(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"window width $w must be >= 2")
    val (d, g) = windowTable(docs, w)
    val wg = Window.partitionBy(col("gkey"))
    val ranked = g
      .withColumn("__occ", count(lit(1)).over(wg))
      .withColumn("__rn", row_number().over(
        wg.orderBy(col("doc_id"), col("pos"))))
    val removals = ranked.filter(col("__occ") >= 2 && col("__rn") > 1)
      .select(col("doc_id"), col("pos"))
    applyRemovals(d, removals, w)
  }

  /** [[substringClean]] served off an EXPLICIT keeper state — one row
    * per window digest with its canonical (min) occurrence and count,
    * as the stream-maintained state holds it
    * ([[graft.streaming.StreamOps.streamSubstringCleanOnce]]). */
  private[graft] def cleanOffState(docs: DataFrame, w: Int,
                                   state: DataFrame): DataFrame = {
    val (d, g) = windowTable(docs, w)
    val removals = g.join(state.filter(col("occ") >= 2), Seq("gkey"))
      .filter(!(col("doc_id") === col("keep_doc") &&
        col("pos") === col("keep_pos")))
      .select(col("doc_id"), col("pos"))
    applyRemovals(d, removals, w)
  }

  /** Delete the removal windows' token coverage from each document: the
    * per-doc starts array is bounded by the doc's own length, the span
    * deletion a map-side HOF rewrite. */
  private def applyRemovals(d: DataFrame, removals: DataFrame,
                            w: Int): DataFrame = {
    val rm = removals.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    val keptToks = filter(
      transform(sequence(lit(0), col("n_toks") - 1), i =>
        when(exists(col("__starts"), p => p <= i && i < p + w), lit(null))
          .otherwise(element_at(col("__toks"), i + 1))),
      x => x.isNotNull)
    d.join(rm, Seq("doc_id"), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept", keptToks)
      .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
        (col("n_toks") - size(col("__kept"))).cast("long").as("removed_tokens"),
        concat_ws(" ", col("__kept")).as("kept_text"))
  }

  // ---- decontamination ---------------------------------------------------

  /**
   * Train/eval decontamination: flag training documents that share word
   * n-grams with an evaluation corpus — the standard LLM pre-training
   * scrub (exact n-gram collision flagging, GPT-3 appendix-C style).
   * Returns one row per training doc with >= n tokens:
   * (doc_id, n_grams, hit_grams, contam_frac, contaminated).
   *
   * Scale design: the eval side is distilled to its DISTINCT gram set
   * (eval corpora are orders of magnitude smaller than the training
   * corpus) and broadcast, so the probe is a map-side hash join — the
   * training grams are never shuffled for the membership test. Per-doc
   * totals ride the same exploded pass, and the one shuffle is the final
   * per-doc aggregate, which map-side combines down to one row per doc
   * (a doc's grams are co-partitioned with it by explode). At corpus
   * scale the same shape holds with the eval grams checkpointed and the
   * broadcast replaced by a bloom-filter pre-probe if the eval set out-
   * grows the broadcast budget (the exact join then only sees bloom
   * survivors).
   */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int,
                    minHits: Int = 1): DataFrame = {
    val evalGrams = wordNgrams(evalDocs, n).select(col("gram")).distinct()
    docs.withColumn("__toks", tokens(col("text")))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), explode(gramsArray(col("__toks"), n)).as("gram"))
      .join(broadcast(evalGrams.withColumn("__hit", lit(1L))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("hit_grams"))
      .withColumn("contam_frac",
        col("hit_grams").cast("double") / col("n_grams"))
      .withColumn("contaminated",
        (col("hit_grams") >= minHits).cast("int"))
  }

  // ---- SemDeDup: semantic dedup keeper rule ------------------------------

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): within each semantic-
   * duplicate cluster, KEEP the member with the LOWEST cosine to the
   * cluster centroid — the paper's diversity-preserving rule (the
   * centroid-nearest member is the most redundant; the farthest member
   * carries the most residual information) — and drop the rest.
   *
   * `clusters` is a (doc_id, comp) assignment of duplicate-group members
   * (here: the thresholded-knn-edge connected components the
   * `q_semantic_clusters` query computes; vectors in no cluster are
   * implicitly kept and never enter this stage). The centroid is the
   * bit-deterministic per-(comp, dim) ordered mean
   * ([[TrainFold.orderedSumsLong]]: streaming sorted-group fold, O(1)
   * per-group state at any occupancy — comp labels are id-derived longs,
   * hence the long-keyed fold), assembled into a bounded d-element array
   * per cluster; the member scores are position-ordered left-fold dots
   * (HOF form — members are the bounded duplicate-group subset, not the
   * corpus). Ranking is total ((score asc, doc_id asc)), so the keeper
   * is unique and partitioning-invariant.
   *
   * Output: (comp, kept_id, n_members, kept_score) — one row per
   * cluster.
   *
   * Scale: the corpus-sized work is the clusters join (id equi-join);
   * everything downstream is proportional to duplicate-group membership.
   * The mean fold shuffles members once on (comp, j); no step ever
   * holds more than one running accumulator per group.
   */
  def semDedup(emb: DataFrame, clusters: DataFrame): DataFrame = {
    val V = graft.functions.VectorOps
    val members = clusters.join(
      emb.select(col("vec_id").as("doc_id"), col("embedding")),
      Seq("doc_id"))
    // per-(comp, j) ordered mean: sums fold in doc_id order, bit-exact
    val exploded = members.select(col("comp"), col("doc_id"),
      posexplode(col("embedding")).as(Seq("j", "x")))
    val sums = TrainFold.orderedSumsLong(exploded, Seq("comp", "j"),
      "doc_id", Seq("x" -> "sx"))
    // assemble the bounded d-element centroid array per cluster
    val means = sums.withColumn("m", col("sx") / col("n"))
      .groupBy(col("comp"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
          s => s.getField("m")).as("mvec"),
        max(col("n")).as("n_members"))
    val scored = members.join(means, Seq("comp"))
      .withColumn("score",
        V.asum(zip_with(V.toDouble(col("embedding")), col("mvec"),
          (a, b) => a * b)) /
          (V.fnorm(V.norm2Sq(col("embedding"))) *
            V.fnorm(V.asum(zip_with(col("mvec"), col("mvec"),
              (a, b) => a * b)))))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("score").asc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("comp"), col("doc_id").as("kept_id"),
        col("n_members"), col("score").as("kept_score"))
  }

  /**
   * The CLEANED CORPUS [[semDedup]]'s decision produces: every vector
   * outside any duplicate cluster survives untouched, clustered vectors
   * survive only as their cluster's keeper. Output (vec_id, clustered):
   * the training corpus after semantic dedup, with the flag recording
   * which survivors were cluster keepers. One id anti-join over the
   * drop set (clustered members minus keepers). The drop set is bounded
   * by duplicate-CLUSTER membership, which is data-dependent — tiny on
   * a mostly-unique corpus, but it can approach corpus scale on a
   * heavily-duplicated one — so the join strategy is left to the
   * optimizer: AQE broadcasts it when its runtime size is under the
   * threshold and falls back to a shuffled anti-join when it is not,
   * instead of a forced broadcast that would OOM the driver on the
   * flooded case.
   */
  def semDedupClean(emb: DataFrame, clusters: DataFrame): DataFrame = {
    val keepers = semDedup(emb, clusters)
      .select(col("kept_id").as("doc_id"))
    val dropped = clusters.select(col("doc_id"))
      .join(keepers, Seq("doc_id"), "left_anti")
    emb.select(col("vec_id"))
      .join(dropped.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      .join(clusters
          .select(col("doc_id").as("vec_id"), lit(1).as("clustered")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("clustered"), lit(0))
        .as("clustered"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators for training-data pipelines over `documents`:
 * token statistics, heuristic language ID, quality scoring, and shingle
 * fingerprinting. Everything is per-document map-side column arithmetic
 * plus at most one hash-partitioned aggregation — embarrassingly parallel
 * at 100 TB. Ratios are emitted as single divisions of exact integer
 * counts so the DuckDB oracle matches bit-for-bit.
 */
object TextOps {

  /** Stopword marker lists (tiny broadcast-side literals). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "y", "de", "que"),
    "fr" -> Seq("le", "la", "et", "de", "est"),
    "zh" -> Seq("de0", "shi4", "le0", "bu4", "zai4"))

  val Stopwords: Seq[String] =
    LangMarkers.flatMap(_._2).distinct.sorted

  private def toks = split(col("text"), " ")

  /** Token statistics: counts and mean token length (exact-int ratios). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), col("n_chars"), explode(toks).as("tok"))
    t.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(length(col("tok"))).as("sum_len"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("sum_len").cast("double") / col("n_tokens")).as("mean_token_len"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"))
  }

  /**
   * Heuristic language ID: count marker-token hits per language, predict
   * the argmax (ties broken by language code ascending). Output keeps the
   * labeled `lang` for accuracy joins.
   */
  def langId(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("lang"), explode(toks).as("tok"))
    val hitCols = LangMarkers.map { case (code, words) =>
      sum(when(col("tok").isin(words: _*), 1).otherwise(0)).as(s"hits_$code")
    }
    val agg = t.groupBy(col("doc_id"), col("lang")).agg(hitCols.head, hitCols.tail: _*)
    // argmax with deterministic tie-break: fold over languages in order,
    // strictly-greater replaces — first (alphabetically) max wins
    val (pred, best) = LangMarkers.map(_._1).foldLeft((lit(""), lit(-1L))) {
      case ((p, b), code) =>
        val h = col(s"hits_$code").cast("long")
        (when(h > b, lit(code)).otherwise(p), when(h > b, h).otherwise(b))
    }
    agg.select(col("doc_id"), col("lang"), pred.as("pred_lang"), best.as("marker_hits"),
      when(pred === col("lang"), 1).otherwise(0).as("is_match"))
  }

  /**
   * Quality score in [0,1]-ish: blend of distinct-token ratio, stopword
   * ratio, and a length band (fixed expression tree over integer counts).
   */
  def quality(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), col("n_chars"), explode(toks).as("tok"))
    val agg = t.groupBy(col("doc_id"), col("n_chars"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(when(col("tok").isin(Stopwords: _*), 1).otherwise(0)).as("stop_hits"))
    agg.select(
      col("doc_id"), col("n_tokens"),
      (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
      (col("stop_hits").cast("double") / col("n_tokens")).as("stopword_ratio"),
      (when(col("n_tokens") >= 20 && col("n_tokens") <= 200, 1.0).otherwise(0.0) * 0.4
        + (col("n_distinct").cast("double") / col("n_tokens")) * 0.4
        + (col("stop_hits").cast("double") / col("n_tokens")) * 0.2).as("quality"))
  }

  /**
   * BPE-ish subword unit counting: a regex that splits words into
   * alternating vowel/consonant runs approximates byte-pair-style subword
   * granularity (real tokenizer vocabularies aren't available here).
   * Output: (doc_id, n_words, n_units, n_distinct_units, units_per_word).
   */
  def bpeUnits(docs: DataFrame): DataFrame = {
    // pure map-side projection — no explode, no shuffle: the per-doc
    // counts come straight off the extracted array (size/array_distinct),
    // so at corpus scale this is a single scan with zero exchanges. The
    // array is hoisted into a column once (post-explode recomputation of
    // per-doc expressions was the old formulation's hidden cost), and
    // docs with no units are dropped to mirror explode semantics.
    val units = col("__units")
    docs
      .withColumn("__units",
        regexp_extract_all(col("text"), lit("[aeiou]+|[^aeiou ]+"), lit(0)))
      .filter(size(units) > 0)
      .select(col("doc_id"), size(toks).cast("long").as("n_words"),
        size(units).cast("long").as("n_units"),
        size(array_distinct(units)).cast("long").as("n_distinct_units"))
      .withColumn("units_per_word",
        col("n_units").cast("double") / col("n_words"))
  }

  /** Winnowing-style fingerprint: min hash over 3-token shingles. */
  def fingerprint(docs: DataFrame): DataFrame =
    Dedup.wordNgrams(docs, 3)
      .withColumn("gh", Dedup.strHash(col("gram")))
      .groupBy(col("doc_id"))
      .agg(min(col("gh")).as("fingerprint"), count(lit(1)).as("n_shingles"))

  /**
   * Repetition metrics per document over MULTISET word n-grams (the
   * Gopher/FineWeb corpus-quality filters: high duplicate-n-gram fraction
   * or a dominant single gram flags boilerplate/spam):
   * (doc_id, total_grams, distinct_grams, max_gram_cnt, rep_ratio,
   * top_gram_frac). All counts are exact integers, the two ratios single
   * divisions — oracle-reproducible. Two hash aggregations, map-side
   * partial, no join.
   */
  def repetition(docs: DataFrame, n: Int): DataFrame = {
    // token array hoisted into a column: HOF lambdas run interpreted with
    // no CSE, so an inline split would re-execute per array element
    val tk = col("__toks")
    val grams = transform(
      sequence(lit(0), size(tk) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o + 1)): _*))
    docs.withColumn("__toks", Dedup.tokens(col("text")))
      .filter(size(tk) >= n)
      .select(col("doc_id"), explode(grams).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        max(col("c")).as("max_gram_cnt"))
      .select(col("doc_id"), col("total_grams"), col("distinct_grams"),
        col("max_gram_cnt"),
        (lit(1.0) - col("distinct_grams").cast("double") / col("total_grams"))
          .as("rep_ratio"),
        (col("max_gram_cnt").cast("double") / col("total_grams"))
          .as("top_gram_frac"))
  }

  // ---- PII scrubbing -----------------------------------------------------

  /** Scrub patterns: RE2-safe character-class regexes (no backrefs, no
    * lookaround) so Spark's Java regex engine and DuckDB's RE2 match and
    * replace identically — which is what lets the CLEANED TEXT itself sit
    * on the hash-matched oracle surface, not just the counts. */
  final val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  final val LongNumRe = "[0-9]{6,}"

  /**
   * PII scrubbing — the standard pre-training redaction stage: replace
   * email addresses and long digit runs with typed placeholder tokens
   * and report per-document match counts. Emails are scrubbed FIRST
   * (their local parts contain digit runs; the number pass must see the
   * placeholder, not the address). Pure map-side per-row rewriting —
   * zero shuffle at any corpus size.
   * Output: (doc_id, n_emails, n_longnums, clean_text).
   */
  def scrubPii(docs: DataFrame): DataFrame = {
    val noEmail = regexp_replace(col("text"), EmailRe, "<EMAIL>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(noEmail, lit(LongNumRe), lit(0)))
        .as("n_longnums"),
      regexp_replace(noEmail, LongNumRe, "<NUM>").as("clean_text"))
  }

  /**
   * Context-window chunking: split each document into `chunkTokens`-token
   * windows with `overlap` tokens shared between consecutive chunks (the
   * standard LLM pre-training prep for a fixed context length). Start
   * offsets run 0, step, 2*step ... while start == 0 or start < n -
   * overlap (a trailing window living entirely inside the previous
   * window's overlap is never emitted); the final chunk may be short.
   * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
   *
   * Pure map-side explode — zero shuffle at any corpus size; output
   * volume is ceil(n/step) rows per document.
   */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    val tk = col("__toks")
    docs.withColumn("__toks", Dedup.tokens(col("text")))
      .select(col("doc_id"), tk,
        explode(sequence(lit(0),
          greatest(size(tk) - overlap - 1, lit(0)), lit(step))).as("start"))
      .select(col("doc_id"),
        call_function("div", col("start").cast("long"), lit(step.toLong))
          .as("chunk_id"),
        slice(tk, col("start") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /**
   * Sequence packing: assign documents, in deterministic `doc_id` order,
   * to consecutive fixed token-budget bins — the concat-then-split
   * training prep. A document belongs to the bin its FIRST token lands
   * in (exclusive running token count div budget), so a long document
   * may straddle into the next bin's budget; per-pack stats expose that
   * via fill_ratio. Output: (pack_id, n_docs, n_tokens, first_doc,
   * last_doc, fill_ratio).
   *
   * Scale design: the exclusive prefix sum is DISTRIBUTED — a global-
   * order window would drag the whole corpus into one partition, so
   * instead the corpus is range-partitioned by doc_id, each partition
   * computes a local running sum, and the tiny per-partition totals
   * (one row per partition) are window-scanned and broadcast back as
   * offsets. The result is partition-count-invariant: a doc's exclusive
   * cumsum is the token count of all smaller doc_ids, whatever the
   * sampled range boundaries were.
   */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive, got $budget")
    // no sortWithinPartitions here: the local window below sorts by
    // doc_id within each __pid itself, and nothing else consumes order —
    // only the RANGE partitioning (smaller ids in earlier partitions)
    // matters for correctness.
    // __pid is consumed by BOTH the offsets aggregate and the local
    // window; the persist pins both branches to ONE physical exchange (a
    // shared InMemoryRelation) instead of relying on Spark's exchange-
    // reuse rule to deduplicate two identical subtrees — with reuse
    // disabled, independently re-sampled range boundaries could assign
    // the same doc different __pids in the two branches and silently
    // corrupt pack assignments. Freed by Dedup's release discipline
    // (scopedRelease / releaseIntermediates), same as the other
    // pipelines' intermediates.
    val sized = Dedup.persistScoped(docs
      .select(col("doc_id"), size(Dedup.tokens(col("text"))).cast("long")
        .as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .withColumn("__pid", spark_partition_id()))
    val offsets = sized.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__offset",
        coalesce(sum(col("__psum")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sized
      .withColumn("__local", coalesce(sum(col("n_tokens")).over(localW), lit(0L)))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum0", col("__local") + col("__offset"))
      .withColumn("pack_id", call_function("div", col("__cum0"), lit(budget)))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / budget)
  }

  /**
   * One BPE merge round — the pair-count statistic byte-pair-encoding
   * vocabulary induction (Sennrich et al., ACL 2016) ranks its merges
   * by: count every ADJACENT SYMBOL PAIR across the corpus (symbols =
   * characters before the first merge), weighted by word frequency,
   * and surface the top candidates under a (count desc, pair asc)
   * total order.
   *
   * The scale shape is the whole point: the corpus collapses to its
   * WORD-FREQUENCY table first (one hash agg — the vocabulary is
   * bounded regardless of corpus size: ~millions of types for 100 TB
   * of text), and pair generation explodes positions over unique words
   * only — corpus bytes are read exactly once, pair counting runs over
   * the vocabulary. This is why real BPE trainers (HF tokenizers,
   * SentencePiece) train from word counts, not raw text.
   */
  def bpePairCounts(docs: DataFrame, topN: Int): DataFrame = {
    val wf = docs
      .select(explode(Dedup.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    wf
      // Spark's sequence(1, n) flips to DESCENDING when n < 1 — guard
      // short words out before generating positions
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
  }

  /**
   * The full iterative BPE TRAINING LOOP over `rounds` merge rounds —
   * what [[bpePairCounts]]'s single round unrolls into a trained merge
   * table (round, pair, n): symbolize the word-frequency vocabulary
   * (characters joined by a '·' separator that cannot occur in the
   * corpus — words containing it are excluded), then per round count
   * adjacent symbol pairs weighted by word frequency, pick the top
   * pair under the (count desc, pair asc) total order, and apply the
   * merge to every vocabulary entry.
   *
   * The merge applies via boundary-padded literal replace
   * ('·a·b·' -> '·ab·' on '·'+sym+'·'), which (a) can never fuse
   * across a symbol boundary and (b) has IDENTICAL left-to-right
   * non-overlapping continuation semantics in the JVM and DuckDB
   * (verified: '·l·l·l·l·' -> '·ll·l·l·' in both). On a run of 2k+
   * identical merge-adjacent symbols this applies ceil(k/2)-ish merges
   * per round rather than the per-run greedy pairing some trainers
   * use — a documented corner where BPE implementations already
   * differ; later rounds converge the same vocabulary.
   *
   * Scale shape: the corpus is read ONCE into the word-frequency
   * table; every round is one hash agg over pairs exploded from
   * UNIQUE words plus a 1-row driver collect (the chosen merge — the
   * model, not the data) folded back in as literals. This is exactly
   * the distributed-BPE structure (HF tokenizers / SentencePiece train
   * from word counts), and why the loop costs |vocab|·rounds, not
   * corpus·rounds.
   */
  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val sep = "·"
    // Spark's split keeps a trailing "" on zero-width matches — filter
    // empties so symbolization matches DuckDB's string_split(w, '')
    val chars = filter(split(col("w"), ""), x => x =!= lit(""))
    var wf = docs.select(explode(Dedup.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains(sep))
      .select(concat_ws(sep, chars).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("freq"))
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = wf
        .withColumn("s", split(col("sym"), sep))
        .filter(size(col("s")) >= 2)
        .select(col("freq"),
          explode(sequence(lit(1), size(col("s")) - 1)).as("i"),
          col("s"))
        .select(concat(element_at(col("s"), col("i")), lit(sep),
          element_at(col("s"), col("i") + 1)).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (pair, n) = (top(0).getString(0), top(0).getLong(1))
        out += ((r, pair, n))
        val padded = concat(lit(sep), col("sym"), lit(sep))
        val replaced = call_function("replace", padded,
          lit(sep + pair + sep), lit(sep + pair.replace(sep, "") + sep))
        wf = wf.withColumn("sym",
          replaced.substr(lit(2), length(replaced) - 2))
        r += 1
      }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    out.toSeq.toDF("round", "pair", "n")
  }

  /**
   * ENCODE the corpus with a TRAINED BPE tokenizer — the apply half of
   * the [[bpeTrain]] lifecycle (train -> encode), i.e. what an LLM
   * data pipeline runs over every document once the merge table is
   * frozen. Per document: whitespace words are ·-symbolized exactly as
   * in training and the trained merges applied in ranked order; the
   * document's token count under the trained vocabulary is the sum of
   * its words' post-merge symbol counts. Returns one row per document
   * with >= 1 encodable word:
   * (doc_id, n_words, bpe_tokens, tokens_per_word).
   *
   * Scale design: the merge chain applies over the DISTINCT WORD
   * VOCABULARY only (bounded — ~millions of types at 100 TB), never
   * the corpus: encode is |vocab| * rounds literal replaces, and the
   * per-document roll-up is a broadcast join of the (word -> token
   * count) table onto the exploded corpus — corpus bytes are read
   * once, with one map-side-combined aggregate per document. This is
   * the precompute-the-word-encodings structure fast tokenizers use.
   * Words containing the separator are excluded on both sides, as in
   * training.
   */
  def bpeEncode(docs: DataFrame, rounds: Int): DataFrame = {
    val sep = "·"
    // the trained model: `rounds` merge pairs — a bounded collect
    val merges = bpeTrain(docs, rounds).orderBy(col("round")).collect()
      .map(_.getString(1))
    val chars = filter(split(col("w"), ""), x => x =!= lit(""))
    val words = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains(sep))
    val vocab0 = words.select(col("w")).distinct()
      .withColumn("sym", concat_ws(sep, chars))
    val encoded = merges.foldLeft(vocab0) { (v, pair) =>
      val padded = concat(lit(sep), col("sym"), lit(sep))
      val replaced = call_function("replace", padded,
        lit(sep + pair + sep), lit(sep + pair.replace(sep, "") + sep))
      v.withColumn("sym", replaced.substr(lit(2), length(replaced) - 2))
    }.select(col("w"), size(split(col("sym"), sep)).cast("long").as("n_sym"))
    words.join(broadcast(encoded), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("bpe_tokens"))
      .withColumn("tokens_per_word",
        col("bpe_tokens").cast("double") / col("n_words"))
  }

  /**
   * Temperature-flattened MULTILINGUAL SAMPLING (the mT5/XLM-R α-
   * smoothing, α = 0.5): per-language budgets take_l = floor(total ·
   * √n_l / Σ√n_l) — up-weighting low-resource languages relative to
   * proportional sampling — then an exact-count md5-keyed selection
   * per language (the [[graft.sources.VecFiles.subsample]] discipline:
   * deterministic, partitioning-invariant, no Bernoulli variance).
   *
   * The language histogram is a tiny aggregate collected driver-side
   * (|langs| rows — the model, not the data); budgets are baked in as
   * literals. Σ√n folds in lang order so the DuckDB mirror's ordered
   * list_reduce rounds identically (√ is correctly rounded in both
   * engines). At 100 TB the selection window per language is the same
   * one-exchange rank the stratified sampler pays.
   *
   * CONTRACT NOTE: `total` is a CEILING, not an exact size — per-
   * language floors under-deliver by up to |langs|-1 rows (further when
   * a language's population caps its take), exactly as mT5's sampler
   * does; the budgets stay floor-exact rather than redistributing the
   * remainder so every per-language take is a pure function of the
   * histogram (the property the DuckDB mirror and the driver hash rely
   * on).
   */
  def temperatureSample(docs: DataFrame, total: Int): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureSample: empty corpus")
    val weights = counts.map { case (l, n) => l -> math.sqrt(n.toDouble) }
    val tot = weights.map(_._2).reduceLeft(_ + _)
    val takes = weights.map { case (l, w) =>
      l -> math.floor(total * w / tot).toLong }
    val takeCase = takes.foldRight(lit(0L)) { case ((l, t), rest) =>
      when(col("lang") === l, lit(t)).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":temp"))),
        col("doc_id"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= takeCase)
      .select(col("doc_id"), col("lang"))
  }

  /**
   * φ-HEAVY HITTERS by count-min sketch PROPOSE + exact VERIFY — the
   * frequent-items member of the sketch family (`q_sketches` covers HLL
   * cardinality and GK quantiles; Cormode & Muthukrishnan 2005): every
   * word `n`-gram whose corpus count is at least `ceil(total / relDiv)`
   * (the φ = 1/relDiv heavy-hitter definition; integer arithmetic:
   * `(total+relDiv-1) / relDiv`), with its EXACT count — the corpus-
   * level boilerplate-phrase detector (the per-document twin is
   * [[repetition]]'s Gopher filters).
   *
   * The production shape at 100 TB: the gram multiset is never grouped
   * — or even globally de-duplicated — at full cardinality on the hot
   * path. Phase 1 folds the stream map-side into a BOUNDED
   * `rows x width` counter grid (rows·width longs regardless of corpus
   * size — the model), collected and broadcast. Phase 2 probes
   * PARTITION-LOCALLY: each partition de-duplicates its own grams in a
   * local set and scores each one's MIN-of-counters estimate against
   * the broadcast grid, emitting only the survivors (estimate >=
   * threshold) — the full vocabulary never crosses an exchange; the
   * only gram-keyed shuffles in the whole pipeline are over the
   * candidate SLIVER (phase 2's distinct and phase 3's exact count,
   * both bounded by the sketch's pruning). Counters only ever ADD
   * other grams' counts, so the estimate can only OVERestimate —
   * candidates are a PROVABLE SUPERSET of the true heavy hitters, no
   * false negative possible. Phase 3 exactly counts the candidates
   * only. The overestimate-only guarantee makes the output EXACTLY the
   * plain `GROUP BY gram HAVING count >= T` relation, so the oracle is
   * that simple SQL — the sketch is load-bearing for cost, provably
   * invisible to the answer. Pruning holds at ANY scale because both
   * the threshold (total/relDiv) and the collision noise (total/width)
   * scale linearly with the stream: width >> relDiv keeps noise below
   * threshold at 1 GB or 100 TB (the CMS-HH sizing rule, hence the
   * 32768 default for relDiv = 5000).
   *
   * Hashes: row r buckets gram g by the engine's Murmur3 `hash` of
   * `"r#" + g` mod width — deterministic, but NEVER mirrored in the
   * oracle (bucket choice moves work, not answers).
   *
   * Output: (gram, cnt) — every true heavy hitter with its exact count.
   */
  def heavyHitters(docs: DataFrame, n: Int, relDiv: Long, rows: Int = 4,
                   width: Int = 32768): DataFrame = {
    val grams = gramStream(docs, n)
    // the grid is the bounded model (rows·width longs — ~1 MB at the
    // defaults): collect it ONCE; it serves both the stream total and
    // the broadcast probe side. The total needs no separate count()
    // scan: every gram increments exactly one row-0 counter, so row 0's
    // counters sum to the stream length (exact integers).
    val gridArr = collectGrid(hhGrid(grams, rows, width), rows, width)
    val total = gridArr(0).sum
    val threshold = (total + relDiv - 1) / relDiv
    val candidates = hhCandidates(grams, gridArr, threshold, rows, width)
    // phase 3: exact counts for the candidate set only
    grams.join(broadcast(candidates), Seq("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(threshold))
  }

  /** The rows×width counter grid as a dense driver-side array (missing
    * buckets are 0) — the CMS model in its broadcastable form. */
  private[graft] def collectGrid(grid: DataFrame, rows: Int,
                                 width: Int): Array[Array[Long]] = {
    val arr = Array.ofDim[Long](rows, width)
    grid.collect().foreach(r =>
      arr(r.getAs[Int]("r"))(r.getAs[Int]("b")) = r.getAs[Long]("c"))
    arr
  }

  /** The gram MULTISET: every window position of every doc with >= n
    * tokens — [[heavyHitters]]' stream. */
  private[graft] def gramStream(docs: DataFrame, n: Int): DataFrame = {
    val tk = col("__toks")
    val gramsCol = transform(
      sequence(lit(0), size(tk) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o + 1)): _*))
    docs.withColumn("__toks", Dedup.tokens(col("text")))
      .filter(size(tk) >= n)
      .select(explode(gramsCol).as("gram"))
  }

  private def hhBuckets(rows: Int, width: Int): Column = {
    def bucket(r: Int): Column =
      pmod(hash(concat(lit(s"$r#"), col("gram"))), lit(width))
    explode(array((0 until rows).map(r =>
      struct(lit(r).as("r"), bucket(r).as("b"))): _*))
  }

  /** [[heavyHitters]]' phase 1: the bounded counter grid (<= rows*width
    * rows after the map-side combine — the only aggregate that ever
    * sees the full stream). */
  private[graft] def hhGrid(grams: DataFrame, rows: Int,
                            width: Int): DataFrame =
    grams.select(hhBuckets(rows, width).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** [[heavyHitters]]' phase 2 (the sketch probe): PARTITION-LOCAL
    * min-of-counters estimates against the broadcast grid — each
    * partition de-duplicates its own grams in a local set and emits
    * only the survivors, so the full vocabulary never crosses an
    * exchange (a global `distinct()` here would cost the same shuffle
    * as the exact GROUP BY the sketch exists to avoid); the closing
    * distinct() runs over the candidate sliver only. Bucket keys are
    * computed by the SAME codegen'd `hash` expression phase 1 used
    * (never a driver-side Murmur3 re-implementation). Exposed so specs
    * can assert the pruning power and overestimate-only bound directly. */
  private[graft] def hhCandidates(grams: DataFrame,
                                  gridArr: Array[Array[Long]],
                                  threshold: Long, rows: Int,
                                  width: Int): DataFrame = {
    val spark = grams.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gridArr)
    val pre = grams.select(col("gram"),
        array((0 until rows).map(r =>
          pmod(hash(concat(lit(s"$r#"), col("gram"))), lit(width))): _*)
          .as("bks"))
      .as[(String, Array[Int])]
    pre.mapPartitions { it =>
      val g = bc.value
      // the local set is CAPPED (flush-and-continue): per-partition gram
      // dedup is a best-effort bandwidth saver — the closing distinct()
      // over the candidate sliver is authoritative — so a high-vocabulary
      // partition must never turn the saver into an unbounded heap (the
      // global distinct() this probe replaced was at least spillable).
      // 1M strings ≈ tens of MB; past that, drop the memo and re-emit.
      val seenCap = 1 << 20
      val seen = new java.util.HashSet[String]()
      it.flatMap { case (gram, bks) =>
        if (seen.size >= seenCap) seen.clear()
        if (!seen.add(gram)) Iterator.empty
        else {
          var est = Long.MaxValue
          var r = 0
          while (r < g.length) {
            val c = g(r)(bks(r)); if (c < est) est = c; r += 1
          }
          if (est >= threshold) Iterator.single(gram) else Iterator.empty
        }
      }
    }.toDF("gram").distinct()
  }
}

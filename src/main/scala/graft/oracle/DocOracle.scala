package graft.oracle

import graft.operators.Dedup

/**
 * DuckDB oracle SQL for the documents-table operators (dedup suite + text
 * analysis), mirroring [[graft.operators.Dedup]] / [[graft.operators.TextOps]]
 * expression-for-expression. All similarity/ratio outputs are single
 * divisions of exact integer aggregates -> bit-identical doubles.
 */
object DocOracle {
  import Dedup.{P, AMul, BMul}

  /** Portable 60-bit md5-prefix hash (DuckDB dialect). */
  def strHash(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  private def permExpr(i: Int): String = {
    val a = (AMul * (i + 1)) % P
    val b = (BMul * (i + 1)) % P
    s"MIN(($a * (th % $P) + $b) % $P) AS m$i"
  }

  /** Exploded unigram CTE (multiset). */
  val tokCte =
    "tok AS (SELECT doc_id, lang, n_chars, unnest(string_split(text, ' ')) AS tok FROM documents)"

  /** Distinct word n-gram CTE: g(doc_id, source, gram). */
  def gramCte(n: Int): String = {
    val gram = (1 to n).map(o => s"tk[i+${o - 1}]").mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
       |g AS (SELECT DISTINCT doc_id, source, gram FROM (
       |  SELECT doc_id, source,
       |    unnest(list_transform(generate_series(1, len(tk) - ${n - 1}), i -> $gram)) AS gram
       |  FROM toks WHERE len(tk) >= $n))""".stripMargin
  }

  /** Train/eval n-gram decontamination, mirroring [[Dedup.decontaminate]]
    * with eval = `doc_id % mod == 0` and train = the rest. */
  def decontaminateSql(n: Int, mod: Int, minHits: Int = 1): String = {
    val gram = (1 to n).map(o => s"tk[i+${o - 1}]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |g AS (SELECT DISTINCT doc_id, gram FROM (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(tk) - ${n - 1}), i -> $gram)) AS gram
       |  FROM toks WHERE len(tk) >= $n)),
       |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % $mod = 0),
       |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % $mod <> 0)
       |SELECT tr.doc_id, COUNT(*) AS n_grams, COUNT(ev.gram) AS hit_grams,
       |  CAST(COUNT(ev.gram) AS DOUBLE) / COUNT(*) AS contam_frac,
       |  CASE WHEN COUNT(ev.gram) >= $minHits THEN 1 ELSE 0 END AS contaminated
       |FROM tr LEFT JOIN ev USING (gram)
       |GROUP BY tr.doc_id""".stripMargin
  }

  /** Context-window chunking, mirroring [[graft.operators.TextOps.chunkDocs]]. */
  def chunkDocsSql(chunkTokens: Int, overlap: Int): String = {
    val step = chunkTokens - overlap
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |s AS (SELECT doc_id, tk,
       |  unnest(generate_series(0, greatest(len(tk) - $overlap - 1, 0), $step)) AS start
       |  FROM toks)
       |SELECT doc_id, start // $step AS chunk_id,
       |  len(list_slice(tk, start + 1, least(start + $chunkTokens, len(tk))))
       |    AS n_chunk_tokens,
       |  array_to_string(list_slice(tk, start + 1, least(start + $chunkTokens, len(tk))), ' ')
       |    AS chunk_text
       |FROM s""".stripMargin
  }

  /** Sequence packing, mirroring [[graft.operators.TextOps.packSequences]]
    * (the oracle states the semantics directly as one global-order window;
    * the engine computes the same exclusive prefix sum distributed). */
  def packSequencesSql(budget: Long): String =
    s"""WITH sized AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |  COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
       |  FROM sized)
       |SELECT CAST(cum0 // $budget AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       |  CAST(SUM(n_tokens) AS DOUBLE) / $budget AS fill_ratio
       |FROM c GROUP BY 1""".stripMargin

  def dedupExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  def minhashLshSql(shingle: Int, numHashes: Int, bands: Int, rows: Int): String = {
    val perms = (0 until numHashes).map(permExpr).mkString(",\n  ")
    def bandKey(a: String, b: Int) =
      "concat_ws(','," + (0 until rows).map(r => s"$a.m${b * rows + r}").mkString(",") + ")"
    val bandJoins = (0 until bands).map { b =>
      s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b
         |  ON ${bandKey("a", b)} = ${bandKey("b", b)} AND a.doc_id < b.doc_id""".stripMargin
    }.mkString("\nUNION\n")
    val matches = (0 until numHashes)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${gramCte(shingle)},
       |gh AS (SELECT doc_id, ${strHash("gram")} AS th FROM g),
       |sig AS (SELECT doc_id,
       |  $perms
       |  FROM gh GROUP BY doc_id),
       |cand AS (SELECT DISTINCT doc_a, doc_b FROM ($bandJoins))
       |SELECT c.doc_a, c.doc_b,
       |  CAST($matches AS DOUBLE) / $numHashes AS est_jaccard
       |FROM cand c JOIN sig a ON c.doc_a = a.doc_id JOIN sig b ON c.doc_b = b.doc_id""".stripMargin
  }

  /** Shared CTE chain ending in sh(doc_id, simhash, source); `base` is
    * the doc relation it fingerprints (a CTE name or `documents`). */
  private def simhashCtes(bits: Int, base: String = "documents"): String = {
    val sums = (0 until bits)
      .map(k => s"SUM(CASE WHEN (th >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k")
      .mkString(",\n  ")
    val fp = (0 until bits)
      .map(k => s"(CASE WHEN s$k > 0 THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM $base),
       |th AS (SELECT doc_id, ${strHash("tok")} AS th FROM tok0),
       |bs AS (SELECT doc_id,
       |  $sums
       |  FROM th GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM bs),
       |sh AS (SELECT f.doc_id, f.simhash, d.source FROM fp f JOIN $base d ON f.doc_id = d.doc_id)""".stripMargin
  }

  def simhashPairsSql(bits: Int, maxHamming: Int): String =
    s"""WITH ${simhashCtes(bits)}
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /**
   * Dedup-cluster oracle for [[graft.operators.Dedup.connectedComponents]]
   * over the simhash pair graph: transitive closure via a recursive CTE,
   * then the component min — (doc_id, comp).
   */
  def dedupGroupsSql(bits: Int, maxHamming: Int): String =
    s"""WITH RECURSIVE ${simhashCtes(bits)},
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT DISTINCT src AS doc_id, src AS lab FROM edges
       |  UNION
       |  SELECT e.src AS doc_id, r.lab
       |  FROM edges e JOIN reach r ON r.doc_id = e.dst)
       |SELECT doc_id, MIN(lab) AS comp FROM reach GROUP BY doc_id""".stripMargin

  def ngramJaccardSql(n: Int, minJaccard: Double, maxDf: Int = 200): String =
    s"""WITH ${gramCte(n).replace("g AS (", "g0 AS (")},
       |keep AS (SELECT source, gram FROM g0 GROUP BY source, gram
       |         HAVING COUNT(*) <= $maxDf),
       |g AS (SELECT g0.doc_id, g0.source, g0.gram
       |      FROM g0 JOIN keep ON g0.source = keep.source AND g0.gram = keep.gram),
       |counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM g a JOIN g b ON a.source = b.source AND a.gram = b.gram
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |j AS (SELECT i.doc_a, i.doc_b, i.inter,
       |    ca.n_grams + cb.n_grams - i.inter AS un,
       |    CAST(i.inter AS DOUBLE) / (ca.n_grams + cb.n_grams - i.inter) AS jaccard
       |  FROM inter i JOIN counts ca ON i.doc_a = ca.doc_id
       |               JOIN counts cb ON i.doc_b = cb.doc_id)
       |SELECT doc_a, doc_b, inter, un, jaccard FROM j WHERE jaccard >= $minJaccard""".stripMargin

  /** Repetition metrics over MULTISET n-grams (TextOps.repetition):
    * ratios are single divisions over exact integer counts. */
  def repetitionSql(n: Int): String = {
    val gram = (1 to n).map(o => s"tk[i+${o - 1}]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |gm AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(tk) - ${n - 1}), i -> $gram)) AS gram
       |  FROM toks WHERE len(tk) >= $n),
       |gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM gm GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(SUM(c) AS BIGINT) AS total_grams,
       |  COUNT(*) AS distinct_grams,
       |  CAST(MAX(c) AS BIGINT) AS max_gram_cnt,
       |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS rep_ratio,
       |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_gram_frac
       |FROM gc GROUP BY doc_id""".stripMargin
  }

  def tokenStatsSql: String =
    s"""WITH $tokCte
       |SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct,
       |  CAST(SUM(len(tok)) AS DOUBLE) / COUNT(*) AS mean_token_len,
       |  CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS distinct_ratio
       |FROM tok GROUP BY doc_id""".stripMargin

  /** φ-heavy hitters ([[graft.operators.TextOps.heavyHitters]]): the
    * engine runs count-min PROPOSE + exact VERIFY, but the sketch's
    * overestimate-only guarantee (counters only ever add other grams'
    * counts, so min-of-counters >= true count — no false negative can
    * exist) makes the output PROVABLY equal to the plain exact
    * threshold relation, which is all this oracle needs to be. The
    * threshold is pure integer arithmetic on the gram total (`//` =
    * DuckDB integer division). The gram MULTISET here is the engine's:
    * every window position of every doc with >= n tokens. */
  def heavyHittersSql(n: Int, relDiv: Long): String = {
    val gram = (0 until n).map(o => s"tk[i+$o]").mkString(" || ' ' || ")
    s"""WITH g AS (SELECT $gram AS gram
       |  FROM (SELECT string_split(text, ' ') AS tk FROM documents
       |        WHERE len(string_split(text, ' ')) >= $n),
       |       UNNEST(generate_series(1, len(tk) - ${n - 1})) AS t(i)),
       |tot AS (SELECT COUNT(*) AS total FROM g),
       |cnt AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram)
       |SELECT gram, cnt FROM cnt, tot
       |WHERE cnt >= (total + $relDiv - 1) // $relDiv""".stripMargin
  }

  def langIdSql(markers: Seq[(String, Seq[String])]): String = {
    val hitCols = markers.map { case (code, ws) =>
      val lst = ws.map(w => s"'$w'").mkString(", ")
      s"SUM(CASE WHEN tok IN ($lst) THEN 1 ELSE 0 END) AS hits_$code"
    }.mkString(",\n  ")
    val gm = "GREATEST(" + markers.map(m => s"hits_${m._1}").mkString(", ") + ")"
    val pred = "CASE " + markers.map(m =>
      s"WHEN hits_${m._1} = gm THEN '${m._1}'").mkString(" ") + " END"
    s"""WITH $tokCte,
       |agg AS (SELECT doc_id, lang,
       |  $hitCols
       |  FROM tok GROUP BY doc_id, lang),
       |g2 AS (SELECT *, $gm AS gm FROM agg)
       |SELECT doc_id, lang, $pred AS pred_lang,
       |  CAST(gm AS BIGINT) AS marker_hits,
       |  CASE WHEN ($pred) = lang THEN 1 ELSE 0 END AS is_match
       |FROM g2""".stripMargin
  }

  def qualitySql(stopwords: Seq[String]): String = {
    val lst = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH $tokCte,
       |agg AS (SELECT doc_id, n_chars, COUNT(*) AS n_tokens,
       |    COUNT(DISTINCT tok) AS n_distinct,
       |    SUM(CASE WHEN tok IN ($lst) THEN 1 ELSE 0 END) AS stop_hits
       |  FROM tok GROUP BY doc_id, n_chars)
       |SELECT doc_id, n_tokens,
       |  CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
       |  CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       |  (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 1.0 ELSE 0.0 END) * 0.4
       |    + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.4
       |    + (CAST(stop_hits AS DOUBLE) / n_tokens) * 0.2 AS quality
       |FROM agg""".stripMargin
  }

  def bpeUnitsSql: String =
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_words,
      |    unnest(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+')) AS u
      |  FROM documents)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  COUNT(*) AS n_units, COUNT(DISTINCT u) AS n_distinct_units,
      |  CAST(COUNT(*) AS DOUBLE) / n_words AS units_per_word
      |FROM t GROUP BY doc_id, n_words""".stripMargin

  def fingerprintSql(n: Int): String =
    s"""WITH ${gramCte(n)},
       |gh AS (SELECT doc_id, ${strHash("gram")} AS gh FROM g)
       |SELECT doc_id, MIN(gh) AS fingerprint, COUNT(*) AS n_shingles
       |FROM gh GROUP BY doc_id""".stripMargin

  /**
   * End-to-end corpus-clean oracle ([[graft.SparkEntry.qCorpusClean]]):
   * quality gate -> exact dedup keeper -> simhash near-dup pairs over the
   * survivors -> recursive-CTE connected components (component-min
   * keeper; unpaired docs keep themselves) -> per-lang funnel counts.
   */
  def corpusCleanSql(stopwords: Seq[String], floor: Double,
                     bits: Int, maxHamming: Int): String = {
    val lst = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE
       |tokq AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |qagg AS (SELECT doc_id, COUNT(*) AS n_tokens,
       |    COUNT(DISTINCT tok) AS n_distinct,
       |    SUM(CASE WHEN tok IN ($lst) THEN 1 ELSE 0 END) AS stop_hits
       |  FROM tokq GROUP BY doc_id),
       |qpass AS (SELECT doc_id FROM qagg
       |  WHERE (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 1.0 ELSE 0.0 END) * 0.4
       |      + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.4
       |      + (CAST(stop_hits AS DOUBLE) / n_tokens) * 0.2 >= $floor),
       |kept AS (SELECT d.* FROM documents d JOIN qpass USING (doc_id)),
       |ek AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
       |ex AS (SELECT k.* FROM kept k JOIN ek USING (doc_id)),
       |${simhashCtes(bits, "ex")},
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT DISTINCT src AS doc_id, src AS lab FROM edges
       |  UNION
       |  SELECT e.src AS doc_id, r.lab
       |  FROM edges e JOIN reach r ON r.doc_id = e.dst),
       |labels AS (SELECT doc_id, MIN(lab) AS comp FROM reach GROUP BY doc_id),
       |fin AS (SELECT e.* FROM ex e LEFT JOIN labels l USING (doc_id)
       |  WHERE l.comp IS NULL OR l.comp = e.doc_id),
       |raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY lang),
       |cq AS (SELECT lang, COUNT(*) AS c FROM kept GROUP BY lang),
       |ce AS (SELECT lang, COUNT(*) AS c FROM ex GROUP BY lang),
       |cf AS (SELECT lang, COUNT(*) AS c FROM fin GROUP BY lang)
       |SELECT r.lang, r.n_raw,
       |  CAST(COALESCE(cq.c, 0) AS BIGINT) AS n_quality,
       |  CAST(COALESCE(ce.c, 0) AS BIGINT) AS n_exact,
       |  CAST(COALESCE(cf.c, 0) AS BIGINT) AS n_final
       |FROM raw r LEFT JOIN cq ON r.lang = cq.lang
       |  LEFT JOIN ce ON r.lang = ce.lang
       |  LEFT JOIN cf ON r.lang = cf.lang""".stripMargin
  }

  /** Vocabulary seed: global top-N tokens with a (count desc, tok) total
    * order, so the selected set is deterministic under ties. */
  def vocabSql(n: Int): String =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
       |FROM t GROUP BY tok
       |ORDER BY n_occurrences DESC, tok LIMIT $n""".stripMargin

  /** Twin of [[graft.operators.TextOps.bpePairCounts]]: word-frequency
    * table, per-position adjacent character pairs over unique words
    * (unnest(range) — empty for words shorter than 2, matching the
    * engine's length guard), frequency-weighted counts, (n desc, pair)
    * total order. */
  def bpeMergeSql(topN: Int): String =
    s"""WITH wf AS (SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |p AS (SELECT w, freq, unnest(range(1, length(w))) AS i FROM wf)
       |SELECT substr(w, CAST(i AS INTEGER), 2) AS pair,
       |  CAST(SUM(freq) AS BIGINT) AS n
       |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT $topN""".stripMargin

  /** Twin of [[graft.operators.TextOps.bpeTrain]]: the iterative merge
    * loop unrolled as one CTE chain per round — pair counts over the
    * ·-symbolized word-frequency table, the (n desc, pair) top-1 pick,
    * and the boundary-padded literal-replace merge (replace has the
    * same left-to-right non-overlapping continuation semantics in
    * DuckDB and the JVM). Integer counts only — no float anywhere. */
  def bpeTrainSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH wf0 AS MATERIALIZED (
        |  SELECT array_to_string(string_split(w, ''), '·') AS sym,
        |    COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 1 AND w NOT LIKE '%·%'
        |  GROUP BY 1)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |p$r AS (SELECT s, freq, unnest(range(1, len(s))) AS i FROM
        |    (SELECT string_split(sym, '·') AS s, freq FROM wf${r - 1}
        |     WHERE len(string_split(sym, '·')) >= 2)),
        |pc$r AS (SELECT s[CAST(i AS INTEGER)] || '·' || s[CAST(i AS INTEGER) + 1] AS pair,
        |    CAST(SUM(freq) AS BIGINT) AS n FROM p$r GROUP BY 1),
        |m$r AS MATERIALIZED (SELECT $r AS round, pair, n FROM pc$r
        |  ORDER BY n DESC, pair LIMIT 1),
        |wf$r AS MATERIALIZED (SELECT substr(rp, 2, length(rp) - 2) AS sym, freq FROM (
        |    SELECT replace('·' || w.sym || '·', '·' || m.pair || '·',
        |      '·' || replace(m.pair, '·', '') || '·') AS rp, w.freq
        |    FROM wf${r - 1} w CROSS JOIN m$r m))""".stripMargin)
    }
    sb.append("\n" + (1 to rounds)
      .map(r => s"SELECT round, pair, n FROM m$r")
      .mkString("", "\nUNION ALL ", ""))
    sb.toString
  }

  /** Twin of [[graft.operators.Dedup.substringDedup]]: fixed-width
    * token windows with positions (unnest(range) — empty when the doc
    * is shorter than w), the >= 2-occurrence duplicate rule as one
    * aggregate, the semi-join mark, and the same running-max interval
    * union (a start covers the part of [pos, pos+w) past the max end
    * of all earlier duplicated windows in the doc). Integer token
    * arithmetic throughout; the one division is BIGINT -> DOUBLE on
    * both engines. */
  def substringDedupSql(w: Int): String = {
    val gram = (0 until w)
      .map(o => s"s[CAST(pos+$o+1 AS INTEGER)]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> length(x) >= 1) AS s
       |  FROM documents),
       |d AS (SELECT doc_id, len(s) AS n_toks, s FROM t),
       |p AS (SELECT doc_id, unnest(range(0, n_toks - $w + 1)) AS pos, s
       |  FROM d WHERE n_toks >= $w),
       |g AS MATERIALIZED (SELECT doc_id, pos, md5($gram) AS gkey FROM p),
       |dup AS (SELECT gkey FROM g GROUP BY gkey HAVING COUNT(*) >= 2),
       |m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gkey)),
       |c AS (SELECT doc_id,
       |    greatest(0, pos + $w - greatest(coalesce(max(pos + $w) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), pos))
       |    AS cover
       |  FROM m),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_starts,
       |    CAST(SUM(cover) AS BIGINT) AS dup_tokens
       |  FROM c GROUP BY doc_id)
       |SELECT d.doc_id, CAST(d.n_toks AS BIGINT) AS n_toks,
       |  coalesce(agg.dup_starts, 0) AS dup_starts,
       |  coalesce(agg.dup_tokens, 0) AS dup_tokens,
       |  CAST(coalesce(agg.dup_tokens, 0) AS DOUBLE) / d.n_toks AS dup_frac
       |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** Twin of [[graft.operators.Dedup.substringClean]]: the same window
    * table, occurrences ranked per gram by (doc_id, pos) — rank 1 is
    * the canonical keeper — removal starts gathered to one ordered
    * list per doc, and the span deletion as the same nested
    * list_transform/list_filter rewrite of the token array. */
  def substringCleanSql(w: Int): String = {
    val gram = (0 until w)
      .map(o => s"s[CAST(pos+$o+1 AS INTEGER)]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> length(x) >= 1) AS s
       |  FROM documents),
       |d AS (SELECT doc_id, len(s) AS n_toks, s FROM t),
       |p AS (SELECT doc_id, unnest(range(0, n_toks - $w + 1)) AS pos, s
       |  FROM d WHERE n_toks >= $w),
       |g AS MATERIALIZED (SELECT doc_id, pos, md5($gram) AS gkey FROM p),
       |o AS (SELECT doc_id, pos,
       |    COUNT(*) OVER (PARTITION BY gkey) AS occ,
       |    row_number() OVER (PARTITION BY gkey ORDER BY doc_id, pos) AS rn
       |  FROM g),
       |rm AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
       |  FROM o WHERE occ >= 2 AND rn > 1 GROUP BY doc_id),
       |c AS (SELECT d.doc_id, d.n_toks, d.s,
       |    coalesce(rm.starts, CAST([] AS BIGINT[])) AS starts
       |  FROM d LEFT JOIN rm USING (doc_id)),
       |k AS (SELECT doc_id, n_toks, list_filter(
       |    list_transform(range(0, n_toks), i -> CASE
       |      WHEN len(list_filter(starts, q -> q <= i AND i < q + $w)) > 0
       |      THEN NULL ELSE s[CAST(i + 1 AS INTEGER)] END),
       |    x -> x IS NOT NULL) AS kept FROM c)
       |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       |  CAST(n_toks - len(kept) AS BIGINT) AS removed_tokens,
       |  -- array_to_string([]) is NULL in DuckDB; the engine's concat_ws
       |  -- of an empty array is '' — align on ''
       |  coalesce(array_to_string(kept, ' '), '') AS kept_text
       |FROM k""".stripMargin
  }

  /** Twin of [[graft.operators.TextOps.bpeEncode]]: the training chain
    * of [[bpeTrainSql]] re-derived verbatim (wf/pc/m per round — the
    * chooser re-derives the model), plus a parallel voc_r chain that
    * applies each round's merge to the DISTINCT-WORD vocabulary, then
    * the per-document roll-up joining exploded words to their encoded
    * symbol counts. */
  def bpeEncodeSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH wf0 AS MATERIALIZED (
        |  SELECT array_to_string(string_split(w, ''), '·') AS sym,
        |    COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 1 AND w NOT LIKE '%·%'
        |  GROUP BY 1),
        |voc0 AS MATERIALIZED (
        |  SELECT w, array_to_string(string_split(w, ''), '·') AS sym
        |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) >= 1 AND w NOT LIKE '%·%')""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |p$r AS (SELECT s, freq, unnest(range(1, len(s))) AS i FROM
        |    (SELECT string_split(sym, '·') AS s, freq FROM wf${r - 1}
        |     WHERE len(string_split(sym, '·')) >= 2)),
        |pc$r AS (SELECT s[CAST(i AS INTEGER)] || '·' || s[CAST(i AS INTEGER) + 1] AS pair,
        |    CAST(SUM(freq) AS BIGINT) AS n FROM p$r GROUP BY 1),
        |m$r AS MATERIALIZED (SELECT $r AS round, pair, n FROM pc$r
        |  ORDER BY n DESC, pair LIMIT 1),
        |wf$r AS MATERIALIZED (SELECT substr(rp, 2, length(rp) - 2) AS sym, freq FROM (
        |    SELECT replace('·' || w.sym || '·', '·' || m.pair || '·',
        |      '·' || replace(m.pair, '·', '') || '·') AS rp, w.freq
        |    FROM wf${r - 1} w CROSS JOIN m$r m)),
        |voc$r AS MATERIALIZED (SELECT w, substr(rp, 2, length(rp) - 2) AS sym FROM (
        |    SELECT v.w, replace('·' || v.sym || '·', '·' || m.pair || '·',
        |      '·' || replace(m.pair, '·', '') || '·') AS rp
        |    FROM voc${r - 1} v CROSS JOIN m$r m))""".stripMargin)
    }
    sb.append(s""",
      |enc AS (SELECT w, CAST(len(string_split(sym, '·')) AS BIGINT) AS n_sym
      |  FROM voc$rounds),
      |dw AS (SELECT doc_id, w FROM
      |    (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) >= 1 AND w NOT LIKE '%·%')
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens,
      |  CAST(SUM(n_sym) AS DOUBLE) / COUNT(*) AS tokens_per_word
      |FROM dw JOIN enc USING (w) GROUP BY doc_id""".stripMargin)
    sb.toString
  }

  /** Twin of [[graft.operators.TextOps.temperatureSample]]: α = 0.5
    * temperature weights (√n, correctly rounded in both engines), the
    * Σ√n fold in lang order via ordered list_reduce (matching the
    * engine's driver-side reduceLeft), floor'd per-lang budgets, then
    * the md5-keyed exact-count rank per language. */
  def temperatureSampleSql(total: Int): String =
    s"""WITH lc AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       |s AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
       |    (a, v) -> a + v) AS tot FROM lc),
       |tk AS (SELECT lang,
       |    CAST(floor($total * sqrt(CAST(n AS DOUBLE)) / s.tot) AS BIGINT) AS take
       |  FROM lc, s),
       |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
       |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':temp'), doc_id) AS rn
       |  FROM documents)
       |SELECT r.doc_id, r.lang FROM r JOIN tk ON tk.lang = r.lang
       |WHERE r.rn <= tk.take""".stripMargin

  /** Stratified sample: exact-count md5-keyed selection per lang. */
  def stratifiedSampleSql(nPer: Int): String =
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
       |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) AS rn
       |  FROM documents) WHERE rn <= $nPer""".stripMargin

  /** P7 seeded subsample + per-lang sample stats (VecFiles.subsample:
    * md5-keyed exact-count selection, same key string both engines). */
  def subsampleSql(n: Int): String =
    s"""WITH s AS (SELECT doc_id, lang FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id LIMIT $n)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM s GROUP BY lang""".stripMargin
}

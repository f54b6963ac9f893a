package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/**
 * Column-level dense-vector operations over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`.
 *
 * All score accumulation is in DOUBLE and folds strictly in array-element
 * order (`aggregate` is a left fold), so results are bit-reproducible
 * across partitionings AND across engines (the DuckDB oracle generates the
 * same left-associated sum) — see FIXTURES.md §3.
 *
 * Mirrors the reference's dense kernels (`/root/reference/ANNCode.py:45-52`
 * normalize, `:264-281` exact scores) as Catalyst higher-order functions:
 * everything here stays inside WholeStageCodegen, no UDFs.
 */
object VectorOps {

  /** Elementwise cast to ARRAY<DOUBLE> (float*float would lose bits). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold sum of an ARRAY<DOUBLE>. */
  def asum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two ARRAY<FLOAT> columns, in DOUBLE, array order
    * (codegen'd fused loop — see [[VecExprs]]). */
  def dot(a: Column, b: Column): Column = VecExprs.dotD(a, b)

  /** HOF twin of [[dot]] (any numeric arrays; used for parity tests). */
  def dotHof(a: Column, b: Column): Column =
    asum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  /** Squared L2 norm. */
  def norm2Sq(v: Column): Column = dot(v, v)

  /** L2 norm with the reference's 1e-12 floor (ANNCode.py:45-52). */
  def norm2(v: Column): Column = greatest(sqrt(norm2Sq(v)), lit(1e-12))

  /** Row-wise L2 normalization -> ARRAY<DOUBLE> unit vector. */
  def l2Normalize(v: Column): Column = {
    val n = norm2(v)
    transform(toDouble(v), x => x / n)
  }

  /** Squared Euclidean distance (codegen'd). */
  def l2DistSq(a: Column, b: Column): Column = VecExprs.l2Sq(a, b)

  /** HOF twin of [[l2DistSq]] for parity tests. */
  def l2DistSqHof(a: Column, b: Column): Column =
    asum(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)))

  /** Cosine similarity (unit-space dot if inputs pre-normalized; else normalizes). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Elementwise |a - b|. */
  def absDiff(a: Column, b: Column): Column =
    zip_with(toDouble(a), toDouble(b), (x, y) => abs(x - y))

  /** Elementwise abs. */
  def vabs(v: Column): Column = transform(toDouble(v), x => abs(x))

  /** Elementwise a - b (in DOUBLE). */
  def vdiff(a: Column, b: Column): Column =
    zip_with(toDouble(a), toDouble(b), (x, y) => x - y)

  // ---- cushion expressions (paper Table 2; ANNCode.py call sites noted) ----

  /** l1 cushion: dot(|q|, Delta_i) (refine_cos_l1, ANNCode.py:411-413).
    * HOF form (qAbs is ARRAY<DOUBLE>); hot paths use VecExprs.absDot. */
  def cushionL1(qAbs: Column, delta: Column): Column = dotHof(qAbs, delta)

  /** Hoeffding cushion, squared norm: sum_j (q_j Delta_j)^2 (ANNCode.py:354).
    * Returned un-rooted so fixture sums stay exact; caller applies sqrt. */
  def cushionHoeffNorm2(q: Column, delta: Column): Column =
    asum(zip_with(toDouble(q), toDouble(delta), (x, y) => (x * y) * (x * y)))

  /** sum_j ((q_j - r_j) Delta_j)^2 — Hoeffding term for L2 (ANNCode.py:630). */
  def cushionHoeffNorm2Diff(q: Column, r: Column, delta: Column): Column = {
    // two chained 2-ary zip_withs: no per-element struct allocation
    val diff = zip_with(toDouble(q), toDouble(r), (x, y) => x - y)
    asum(zip_with(diff, toDouble(delta), (a, d) => (a * d) * (a * d)))
  }

  /**
   * Symmetric-interval L2 lower bound on ||a + eps||^2, |eps_j| <= Delta_j:
   * sum_j max(|a_j| - Delta_j, 0)^2  (_lb_sym, ANNCode.py:500-505).
   */
  def lbSym(a: Column, delta: Column): Column =
    asum(zip_with(toDouble(a), toDouble(delta), (x, d) => {
      val l = greatest(abs(x) - d, lit(0.0)); l * l
    }))

  /**
   * Sign-aware L2 lower bound (_lb_tz, ANNCode.py:508-522): with
   * s = sign(x_tilde) (negative when signbit, i.e. -0.0 counts negative;
   * our reduced values come from sign/mantissa ints so plain comparison
   * suffices), b = a*s:
   *   b <= 0        -> a^2
   *   0 < b < Delta -> 0
   *   b >= Delta    -> (|a| - Delta)^2
   */
  def lbTz(a: Column, delta: Column, xTilde: Column): Column = {
    // b = a * sign(x_tilde) is an exact negation, so a^2 == b^2 and
    // |a| == b on the b > 0 branch — the triple (a, delta, x_tilde)
    // collapses to two 2-ary zip_withs with no struct allocation.
    val b = zip_with(toDouble(a), toDouble(xTilde), (x, xt) => {
      // signbit including -0.0; string probe avoids ANSI divide-by-zero
      val s = when(xt < 0.0 ||
        (xt === 0.0 && startswith(xt.cast("string"), lit("-"))), -1.0)
        .otherwise(1.0)
      x * s
    })
    asum(zip_with(b, toDouble(delta), (bb, d) =>
      when(bb <= 0.0, bb * bb)
        .when(bb < d, lit(0.0))
        .otherwise((bb - d) * (bb - d))))
  }

  // ---- fp16 reduction as column ops -------------------------------------

  private val reduceUdf = udf { (v: Seq[Float], keepE: Int, keepM: Int) =>
    v.map(x => Fp16.reduceValue(x, keepE, keepM))
  }
  private val reduceWordUdf = udf { (v: Seq[Float], keepE: Int, keepM: Int) =>
    v.map(x => Fp16.reduceWord(x, keepE, keepM).toShort)
  }
  private val deltaUdf = udf { (v: Seq[Float], keepM: Int) =>
    v.map(x => Fp16.deltaOf(x, keepM))
  }
  private val roundTripUdf = udf { (v: Seq[Float]) => v.map(Fp16.roundTrip) }

  /** Reduced-precision copy of an ARRAY<FLOAT> (reference reduce_precision_*). */
  def reduceVec(v: Column, keepE: Int, keepM: Int): Column =
    reduceUdf(v, lit(keepE), lit(keepM))

  /** Raw reduced fp16 words as ARRAY<SMALLINT>. */
  def reduceVecWords(v: Column, keepE: Int, keepM: Int): Column =
    reduceWordUdf(v, lit(keepE), lit(keepM))

  /** Per-coordinate "no-peek" Delta bound (reference delta_from_exp).
    * Valid for full-exponent (keep_exp) reductions only — see Fp16. */
  def deltaVec(v: Column, keepM: Int): Column =
    deltaUdf(v, lit(keepM))

  /** Floored norm used by every unit-space ratio, in one place so the
    * Spark-side expression can never drift from the oracle templates. */
  def fnorm(x: Column): Column = greatest(sqrt(x), lit(1e-12))

  /** fp16 round-trip of every element (reference ANNCode.py:825 DBf). */
  def fp16RoundTrip(v: Column): Column = roundTripUdf(v)
}

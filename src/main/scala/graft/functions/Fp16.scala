package graft.functions

/**
 * IEEE-754 half-precision (FP16) bit manipulation, pure JVM integer math.
 *
 * JDK 17 has no `Float.floatToFloat16` (added in JDK 20), so the
 * float32 -> fp16 conversion (round-to-nearest-even, like numpy's
 * `astype(float16)`) is hand-rolled here.
 *
 * Semantics mirror the reference artifact's bit-accurate field ops:
 * `/root/reference/ANNCode.py:160-258` (`_split_fields`,
 * `_combine_fields`, `_truncate_mantissa`, `reduce_precision_keep_exp`,
 * `reduce_precision_keep_both`, `delta_from_exp`). Layout:
 * [sign:1][exp:5][mant:10], bias 15.
 */
object Fp16 {
  final val ExpBits  = 5
  final val ExpBias  = 15
  final val ManBits  = 10

  /** float32 -> fp16 bit word (round-to-nearest-even). Returns Int in [0, 0xFFFF]. */
  def floatToHalfBits(f: Float): Int = {
    val fbits = java.lang.Float.floatToRawIntBits(f)
    val sign  = (fbits >>> 16) & 0x8000
    val v     = fbits & 0x7fffffff
    if (v >= 0x47800000) {
      // >= 2^16: Inf, NaN, or overflow-to-Inf
      if (v > 0x7f800000) sign | 0x7e00        // NaN
      else sign | 0x7c00                       // Inf
    } else if (v >= 0x38800000) {
      // normal half range [2^-14, 65520); RNE via bias add, carry may
      // legitimately overflow into the exponent (65520.. -> Inf)
      val r       = v - 0x38000000             // rebias exponent 127 -> 15
      val rounded = r + 0xFFF + ((r >> 13) & 1)
      sign | (rounded >> 13)
    } else if (v >= 0x33000000) {
      // subnormal half range [2^-25, 2^-14): value = mant24 * 2^(e-150),
      // quantum 2^-24 -> q = mant24 >> (126-e) with RNE
      val e     = v >>> 23
      val mant  = (v & 0x7fffff) | 0x800000
      val shift = 126 - e                      // 14..24
      val q     = mant >>> shift
      val rem   = mant & ((1 << shift) - 1)
      val half  = 1 << (shift - 1)
      val qr    = if (rem > half || (rem == half && (q & 1) == 1)) q + 1 else q
      sign | qr
    } else {
      sign                                     // rounds to +/-0
    }
  }

  /** fp16 bit word -> float32 (exact widening). */
  def halfBitsToFloat(h: Int): Float = {
    val hw   = h & 0xFFFF
    val neg  = (hw & 0x8000) != 0
    val e    = (hw >> 10) & 0x1F
    val m    = hw & 0x3FF
    val mag: Float =
      if (e == 0) m * 5.9604645e-8f            // subnormal: m * 2^-24 (exact)
      else if (e == 31) {
        if (m == 0) Float.PositiveInfinity else Float.NaN
      } else java.lang.Float.intBitsToFloat(((e + 112) << 23) | (m << 13))
    if (neg) -mag else mag
  }

  /** f32 -> fp16 -> f32 round trip (the reference's "full precision" is fp16-valued). */
  def roundTrip(f: Float): Float = halfBitsToFloat(floatToHalfBits(f))

  @inline def signOf(w: Int): Int = (w >> 15) & 0x1
  @inline def expOf(w: Int): Int  = (w >> 10) & 0x1F
  @inline def manOf(w: Int): Int  = w & 0x3FF

  @inline def combine(s: Int, e: Int, m: Int): Int =
    ((s & 1) << 15) | ((e & 0x1F) << 10) | (m & 0x3FF)

  /** Zero the low (10 - keepM) mantissa bits (truncation toward zero, no rounding). */
  @inline def truncateMantissa(m: Int, keepM: Int): Int = {
    val drop = ManBits - keepM
    (m >> drop) << drop
  }

  /**
   * Truncate mantissa (and optionally exponent) of the fp16 form of `x`.
   * Returns the reduced fp16 word. `keepE = 5` keeps the full exponent
   * (reference `reduce_precision_keep_exp`); smaller zeroes low exp bits
   * (reference `reduce_precision_keep_both`).
   */
  def reduceWord(x: Float, keepE: Int, keepM: Int): Int = {
    val w  = floatToHalfBits(x)
    val m2 = truncateMantissa(manOf(w), keepM)
    val e2 =
      if (keepE == ExpBits) expOf(w)
      else { val drop = ExpBits - keepE; (expOf(w) >> drop) << drop }
    combine(signOf(w), e2, m2)
  }

  /** Reduced value as float32 (fp16 word with truncated fields, widened). */
  def reduceValue(x: Float, keepE: Int, keepM: Int): Float =
    halfBitsToFloat(reduceWord(x, keepE, keepM))

  /**
   * "No-peek" per-coordinate error step from the kept exponent field:
   * normals 2^(e-15-keepM), subnormals 2^(1-15-keepM).
   * (reference `delta_from_exp`, paper Eq.(7))
   *
   * Only a valid bound when the reduction kept the FULL exponent —
   * mirroring the reference, whose refinement path always reduces via
   * `reduce_precision_keep_exp` (ANNCode.py:827); its `keep_e` parameter
   * affects the bytes model, never the data. Exponent-truncating
   * reductions ([[reduceWord]] with keepE < 5) exist as a library
   * projection (`reduce_precision_keep_both`) whose error is
   * diagnostic-only, as in the reference (ANNCode.py:241).
   */
  def deltaFromExp(e: Int, keepM: Int): Float = {
    val ee = if (e == 0) 1 else e
    math.pow(2.0, ee - ExpBias - keepM).toFloat
  }

  /** Delta for the mantissa-truncated reduction of `x` (full exponent). */
  def deltaOf(x: Float, keepM: Int): Float =
    deltaFromExp(expOf(floatToHalfBits(x)), keepM)
}

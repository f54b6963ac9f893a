package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fp16

class Fp16Spec extends AnyFunSuite {

  test("floatToHalfBits matches numpy astype(float16) on fixture corpus") {
    // resource: comma-separated f32bits:h16bits pairs generated from numpy
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fp16_expected.txt"))
    val pairs = try src.mkString.trim.split(",") finally src.close()
    assert(pairs.length > 1000)
    pairs.foreach { p =>
      val Array(fb, hb) = p.split(":")
      val f = java.lang.Float.intBitsToFloat(fb.toInt)
      val got = Fp16.floatToHalfBits(f)
      assert(got == hb.toInt,
        s"f=$f (bits $fb): got $got expected $hb")
    }
  }

  test("roundTrip is identity on fp16-exact values") {
    for (m <- 0 until 1024; s <- Seq(1.0f, -1.0f)) {
      val x = s * (1.0f + m / 1024.0f)
      assert(Fp16.roundTrip(x) == x)
      assert(Fp16.roundTrip(x * 2) == x * 2)
      assert(Fp16.roundTrip(x / 2) == x / 2)
    }
  }

  test("halfBitsToFloat inverts floatToHalfBits for all 16-bit words (finite)") {
    for (w <- 0 until 65536) {
      val e = (w >> 10) & 0x1F
      if (e != 31) { // skip Inf/NaN
        val f = Fp16.halfBitsToFloat(w)
        assert(Fp16.floatToHalfBits(f) == w, s"word $w -> $f")
      }
    }
  }

  test("truncation is toward zero, sign-preserving, and error <= delta") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20000) {
      val x = (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(30) - 15).toFloat
      val xf = Fp16.roundTrip(x) // fp16-valued "full precision" (ANNCode.py:825)
      for (keepM <- Seq(0, 2, 4, 6, 8, 10)) {
        val r = Fp16.reduceValue(x, 5, keepM)
        val d = Fp16.deltaOf(x, keepM)
        assert(math.abs(r) <= math.abs(xf), s"x=$x keepM=$keepM: |r| > |fp16(x)|")
        assert(r == 0.0f || (r > 0) == (xf > 0), s"sign flip x=$x")
        assert(math.abs(xf - r) <= d, s"x=$x keepM=$keepM: |xf-r|=${math.abs(xf - r)} > delta=$d")
      }
      // keepM=10, keepE=5: reduced == fp16 exactly
      assert(Fp16.reduceValue(x, 5, 10) == xf)
    }
  }

  test("keepE<5: reduction is a bit mask; error-vs-fp16 decomposes exactly") {
    // reduce_precision_keep_both (ANNCode.py:219-242): both field
    // truncations only ZERO bits, so the reduced word is exactly
    // halfWord & mask — magnitude is monotone in the low 15 word bits,
    // hence toward-zero and sign-preserving for any (keepE, keepM).
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20000) {
      val x = (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(30) - 15).toFloat
      val xf = Fp16.roundTrip(x)
      val w = Fp16.floatToHalfBits(x)
      for (keepE <- 0 to 5; keepM <- Seq(0, 3, 6, 10)) {
        val mask = 0x8000 |
          (((0x1F >> (5 - keepE)) << (5 - keepE)) << 10) |
          ((0x3FF >> (10 - keepM)) << (10 - keepM))
        val rw = Fp16.reduceWord(x, keepE, keepM)
        assert(rw == (w & mask), s"x=$x keepE=$keepE keepM=$keepM")
        val r = Fp16.halfBitsToFloat(rw)
        val err = math.abs(xf - r) // the reference's abs_error_vs_fp16
        assert(r == 0.0f || (r > 0) == (xf > 0), s"sign flip x=$x")
        assert(math.abs(r) <= math.abs(xf))
        // toward-zero on both fields => error IS the magnitude loss
        assert(err == math.abs(xf) - math.abs(r), s"x=$x keepE=$keepE keepM=$keepM")
        // when the exponent field is untouched the keepE=5 delta bound
        // still holds; exponent loss is diagnostic-only (Fp16.scala doc)
        val e = Fp16.expOf(w); val drop = 5 - keepE
        if (((e >> drop) << drop) == e)
          assert(err <= Fp16.deltaOf(x, keepM),
            s"x=$x keepE=$keepE keepM=$keepM err=$err")
      }
    }
  }

  test("known half values") {
    assert(Fp16.floatToHalfBits(1.0f) == 0x3C00)
    assert(Fp16.floatToHalfBits(-2.0f) == 0xC000)
    assert(Fp16.floatToHalfBits(65504.0f) == 0x7BFF)
    assert(Fp16.floatToHalfBits(66000.0f) == 0x7C00) // overflow -> Inf
    assert(Fp16.halfBitsToFloat(0x0001) == 5.9604645e-8f) // smallest subnormal
    assert(Fp16.deltaFromExp(15, 6) == math.pow(2.0, -6).toFloat)
    assert(Fp16.deltaFromExp(0, 6) == math.pow(2.0, 1 - 15 - 6).toFloat) // subnormal
  }
}

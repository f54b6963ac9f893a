package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Fp16

/** ScalaCheck properties for the fp16/cushion invariants (FIXTURES.md §5,
  * paper §3.1-3.2 analytic invariants). */
object PropertySpec extends Properties("fp16") {

  val floats: Gen[Float] = Gen.oneOf(
    Gen.choose(-65000f, 65000f),
    Gen.choose(-1e-4f, 1e-4f),
    Gen.choose(-2f, 2f),
    Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f, 65504f, 5.9604645e-8f))

  val keepMs: Gen[Int] = Gen.choose(0, 10)

  property("truncation: |fp16(x)-r| <= delta, toward zero, sign-preserving") =
    Prop.forAll(floats, keepMs) { (x: Float, m: Int) =>
      val xf = Fp16.roundTrip(x)
      val r = Fp16.reduceValue(x, 5, m)
      val d = Fp16.deltaOf(x, m)
      math.abs(xf - r) <= d &&
        math.abs(r) <= math.abs(xf) &&
        (r == 0.0f || xf == 0.0f || (r > 0) == (xf > 0))
    }

  property("keepM=10 keepE=5 is the identity on fp16 values") =
    Prop.forAll(floats) { x: Float =>
      Fp16.reduceValue(x, 5, 10) == Fp16.roundTrip(x)
    }

  property("sign-aware lower bound tz >= symmetric bound sym") = {
    val vecs = Gen.listOfN(8, floats)
    Prop.forAll(vecs, vecs, keepMs) { (q: List[Float], x: List[Float], m: Int) =>
      val r = x.map(Fp16.reduceValue(_, 5, m))
      val d = x.map(Fp16.deltaOf(_, m))
      val a = q.zip(r).map { case (qq, rr) => qq.toDouble - rr.toDouble }
      val sym = a.zip(d).map { case (aa, dd) =>
        val l = math.max(math.abs(aa) - dd, 0.0); l * l
      }.sum
      val tz = a.zip(r.zip(d)).map { case (aa, (rr, dd)) =>
        val s = if (rr < 0 || (rr == 0.0f && 1.0f / rr < 0)) -1.0 else 1.0
        val b = aa * s
        if (b <= 0) aa * aa
        else if (b < dd) 0.0
        else (math.abs(aa) - dd) * (math.abs(aa) - dd)
      }.sum
      tz + 1e-9 >= sym
    }
  }

  property("l1 cushion (unit q) <= ||Delta||_2 (Cauchy-Schwarz tightness)") = {
    val vecs = Gen.listOfN(8, floats)
    Prop.forAll(vecs, vecs, keepMs) { (q: List[Float], x: List[Float], m: Int) =>
      val d = x.map(Fp16.deltaOf(_, m))
      val nq = math.sqrt(q.map(v => v.toDouble * v).sum)
      nq <= 1e-9 || {
        val l1c = q.zip(d).map { case (qq, dd) => math.abs(qq.toDouble) * dd }.sum / nq
        val dl2 = math.sqrt(d.map(v => v.toDouble * v).sum)
        l1c <= dl2 + 1e-9
      }
    }
  }

  property("delta monotone in dropped mantissa bits") =
    Prop.forAll(floats) { x: Float =>
      (0 to 10).map(m => Fp16.deltaOf(x, m))
        .sliding(2).forall { case Seq(hi, lo) => hi >= lo }
    }
}

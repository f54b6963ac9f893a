// Hosted inside the org.apache.spark.sql package tree: the expression
// type-coercion interface (AbstractDataType) and the Spark 4 Column <->
// Expression bridge (classic.ExpressionUtils) are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, TernaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, FloatType, DataType, DoubleType}
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Codegen'd vector-fold expressions over ARRAY<FLOAT> columns.
 *
 * The higher-order-function formulations (`zip_with` + `aggregate`)
 * allocate one or two intermediate arrays per evaluated row pair; inside
 * an N x Q refinement cross join that's the dominant cost. These
 * expressions emit a single fused loop (double accumulator, array order,
 * no allocation) into whole-stage codegen — numerically identical to the
 * HOF forms (same fold order, same per-element expression trees), so the
 * DuckDB oracles are unaffected.
 *
 * Element nulls are not expected (vectors are dense). Mismatched input
 * lengths raise (matching numpy's shape-broadcast error in the
 * reference) instead of silently folding a prefix.
 *
 * Codegen hygiene: every generated local is obtained from
 * `ctx.freshName` — several fold expressions share one generated
 * method, and Spark's generated projection/predicate entry points bind
 * the input row to a local named `i` (`CodegenContext.INPUT_ROW`), so
 * any fixed name (even brace-scoped: Java forbids shadowing an
 * enclosing local) would fail Janino with "Redefinition of local
 * variable" and knock the plan back to interpreted mode.
 */
object VecExprs {

  private val arrF = ArrayType(FloatType)

  // public: called from generated Java via the static forwarder
  def checkLen(n1: Int, n2: Int): Unit =
    if (n1 != n2) throw new IllegalArgumentException(
      s"graft vector fold: length mismatch ($n1 vs $n2)")

  // public: called from generated Java via the static forwarder
  def checkBits(n: Int): Unit =
    if (n > 64) throw new IllegalArgumentException(
      s"graft sign-pack: $n dims exceed one 64-bit word")

  abstract class VecFold2 extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(arrF, arrF)
    override def dataType: DataType = DoubleType
    /** Java source for one loop step over the given fresh locals,
      * accumulating into `acc`; temps must also come from `ctx.freshName`. */
    protected def javaBody(ctx: CodegenContext, acc: String, x: String, y: String): String
    /** Scala mirror of one element step. */
    protected def step(acc: Double, x: Double, y: Double): Double

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      checkLen(a.numElements(), b.numElements())
      val n = a.numElements()
      var acc = 0.0; var i = 0
      while (i < n) { acc = step(acc, a.getFloat(i), b.getFloat(i)); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("vfN"); val acc = ctx.freshName("vfAcc")
        val i = ctx.freshName("vfI")
        val x = ctx.freshName("vfX"); val y = ctx.freshName("vfY")
        s"""
           |org.apache.spark.sql.graft.VecExprs.checkLen($a.numElements(), $b.numElements());
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  ${javaBody(ctx, acc, x, y)}
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
  }

  /** sum x_i * y_i */
  case class DotD(left: Expression, right: Expression) extends VecFold2 {
    protected def javaBody(ctx: CodegenContext, acc: String, x: String, y: String) =
      s"$acc += $x * $y;"
    protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** sum (x_i - y_i)^2 */
  case class L2Sq(left: Expression, right: Expression) extends VecFold2 {
    protected def javaBody(ctx: CodegenContext, acc: String, x: String, y: String) = {
      val d = ctx.freshName("vfD")
      s"double $d = $x - $y; $acc += $d * $d;"
    }
    protected def step(acc: Double, x: Double, y: Double): Double = {
      val d = x - y; acc + d * d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** sum |x_i| * y_i  (cos_l1 cushion numerator: x = q, y = Delta) */
  case class AbsDot(left: Expression, right: Expression) extends VecFold2 {
    protected def javaBody(ctx: CodegenContext, acc: String, x: String, y: String) =
      s"$acc += java.lang.Math.abs($x) * $y;"
    protected def step(acc: Double, x: Double, y: Double): Double =
      acc + math.abs(x) * y
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** sum (x_i * y_i)^2  (Hoeffding cushion: x = q, y = Delta) */
  case class HoeffSum(left: Expression, right: Expression) extends VecFold2 {
    protected def javaBody(ctx: CodegenContext, acc: String, x: String, y: String) = {
      val t = ctx.freshName("vfT")
      s"double $t = $x * $y; $acc += $t * $t;"
    }
    protected def step(acc: Double, x: Double, y: Double): Double = {
      val t = x * y; acc + t * t
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /**
   * Sign-bit pack: ARRAY<FLOAT> (length <= 64) -> BIGINT with bit i set
   * iff x_i > 0 — the binary-quantization code word. One fused loop,
   * no allocation; the DuckDB oracle mirrors it as an exact integer sum
   * of CASE WHEN embedding[i+1] > 0 THEN 1<<i terms.
   */
  case class SignPack(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(arrF)
    override def dataType: DataType = org.apache.spark.sql.types.LongType

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      checkBits(n)
      var acc = 0L; var i = 0
      while (i < n) { if (a.getFloat(i) > 0f) acc |= 1L << i; i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("vfN"); val acc = ctx.freshName("vfAcc")
        val i = ctx.freshName("vfI")
        s"""
           |int $n = $a.numElements();
           |org.apache.spark.sql.graft.VecExprs.checkBits($n);
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getFloat($i) > 0f) $acc |= 1L << $i;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  abstract class VecFold3 extends TernaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(arrF, arrF, arrF)
    override def dataType: DataType = DoubleType
    /** Java source for one loop step over the given fresh locals,
      * accumulating into `acc`; temps must also come from `ctx.freshName`. */
    protected def javaBody(ctx: CodegenContext, acc: String, q: String, r: String, d: String): String
    protected def step(acc: Double, q: Double, r: Double, d: Double): Double

    override def nullSafeEval(e1: Any, e2: Any, e3: Any): Any = {
      val a = e1.asInstanceOf[ArrayData]; val b = e2.asInstanceOf[ArrayData]
      val c = e3.asInstanceOf[ArrayData]
      checkLen(a.numElements(), b.numElements())
      checkLen(a.numElements(), c.numElements())
      val n = a.numElements()
      var acc = 0.0; var i = 0
      while (i < n) { acc = step(acc, a.getFloat(i), b.getFloat(i), c.getFloat(i)); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, c) => {
        val n = ctx.freshName("vfN"); val acc = ctx.freshName("vfAcc")
        val i = ctx.freshName("vfI")
        val q = ctx.freshName("vfQ"); val r = ctx.freshName("vfR")
        val d = ctx.freshName("vfDl")
        s"""
           |org.apache.spark.sql.graft.VecExprs.checkLen($a.numElements(), $b.numElements());
           |org.apache.spark.sql.graft.VecExprs.checkLen($a.numElements(), $c.numElements());
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $q = (double) $a.getFloat($i);
           |  double $r = (double) $b.getFloat($i);
           |  double $d = (double) $c.getFloat($i);
           |  ${javaBody(ctx, acc, q, r, d)}
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
  }

  /** sum ((q_i - r_i) * d_i)^2  (L2 Hoeffding term) */
  case class HoeffDiffSum(first: Expression, second: Expression, third: Expression)
      extends VecFold3 {
    protected def javaBody(ctx: CodegenContext, acc: String, q: String, r: String, d: String) = {
      val t = ctx.freshName("vfT")
      s"double $t = ($q - $r) * $d; $acc += $t * $t;"
    }
    protected def step(acc: Double, q: Double, r: Double, d: Double): Double = {
      val t = (q - r) * d; acc + t * t
    }
    override protected def withNewChildrenInternal(e1: Expression, e2: Expression, e3: Expression) =
      copy(first = e1, second = e2, third = e3)
  }

  /** sum max(|q_i - r_i| - d_i, 0)^2  (_lb_sym, ANNCode.py:500-505) */
  case class LbSymE(first: Expression, second: Expression, third: Expression)
      extends VecFold3 {
    protected def javaBody(ctx: CodegenContext, acc: String, q: String, r: String, d: String) = {
      val a2 = ctx.freshName("vfA2"); val l = ctx.freshName("vfL")
      s"""double $a2 = $q - $r;
         |double $l = java.lang.Math.max(java.lang.Math.abs($a2) - $d, 0.0);
         |$acc += $l * $l;""".stripMargin
    }
    protected def step(acc: Double, q: Double, r: Double, d: Double): Double = {
      val l = math.max(math.abs(q - r) - d, 0.0); acc + l * l
    }
    override protected def withNewChildrenInternal(e1: Expression, e2: Expression, e3: Expression) =
      copy(first = e1, second = e2, third = e3)
  }

  /** Sign-aware lower bound (_lb_tz, ANNCode.py:508-522); r is the reduced
    * value whose sign steers the branch (signbit: -0.0 counts negative). */
  case class LbTzE(first: Expression, second: Expression, third: Expression)
      extends VecFold3 {
    protected def javaBody(ctx: CodegenContext, acc: String, q: String, r: String, d: String) = {
      val a2 = ctx.freshName("vfA2"); val s = ctx.freshName("vfS")
      val b2 = ctx.freshName("vfB2"); val l = ctx.freshName("vfL")
      s"""double $a2 = $q - $r;
         |double $s = ($r < 0.0 || ($r == 0.0 && java.lang.Double.doubleToRawLongBits($r) != 0L)) ? -1.0 : 1.0;
         |double $b2 = $a2 * $s;
         |if ($b2 <= 0.0) { $acc += $a2 * $a2; }
         |else if ($b2 >= $d) { double $l = $b2 - $d; $acc += $l * $l; }""".stripMargin
    }
    protected def step(acc: Double, q: Double, r: Double, d: Double): Double = {
      val a2 = q - r
      val s = if (r < 0.0 || (r == 0.0 &&
        java.lang.Double.doubleToRawLongBits(r) != 0L)) -1.0 else 1.0
      val b2 = a2 * s
      if (b2 <= 0.0) acc + a2 * a2
      else if (b2 >= d) { val l = b2 - d; acc + l * l }
      else acc
    }
    override protected def withNewChildrenInternal(e1: Expression, e2: Expression, e3: Expression) =
      copy(first = e1, second = e2, third = e3)
  }

  // ---- Column wrappers (Spark 4: Column <-> Expression via classic utils)
  private def c(e: Expression): Column = ExpressionUtils.column(e)
  private def x(col: Column): Expression = ExpressionUtils.expression(col)
  def dotD(a: Column, b: Column): Column     = c(DotD(x(a), x(b)))
  def l2Sq(a: Column, b: Column): Column     = c(L2Sq(x(a), x(b)))
  def absDot(a: Column, b: Column): Column   = c(AbsDot(x(a), x(b)))
  def hoeffSum(a: Column, b: Column): Column = c(HoeffSum(x(a), x(b)))
  def signPack(a: Column): Column            = c(SignPack(x(a)))
  def hoeffDiffSum(q: Column, r: Column, d: Column): Column =
    c(HoeffDiffSum(x(q), x(r), x(d)))
  def lbSymE(q: Column, r: Column, d: Column): Column =
    c(LbSymE(x(q), x(r), x(d)))
  def lbTzE(q: Column, r: Column, d: Column): Column =
    c(LbTzE(x(q), x(r), x(d)))
}

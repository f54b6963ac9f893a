package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs
import graft.functions.VectorOps

/** Codegen folds must be bit-identical to the HOF formulations. */
class VecExprsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randomRows(n: Int, d: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    def f(): Float = rnd.nextInt(8) match {
      case 0 => 0.0f
      case 1 => -0.0f
      case 2 => (rnd.nextFloat() - 0.5f) * 1e-40f // subnormal territory
      case _ => (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(20) - 10).toFloat
    }
    import spark.implicits._
    (0 until n).map(_ => (Array.fill(d)(f()), Array.fill(d)(f()),
      Array.fill(d)(math.abs(f())))).toDF("a", "b", "d")
  }

  test("codegen folds match HOF folds bit-for-bit on adversarial floats") {
    val df = randomRows(2000, 16, 7)
    val cmp = df.select(
      VecExprs.dotD(col("a"), col("b")).as("e_dot"),
      VectorOps.dotHof(col("a"), col("b")).as("h_dot"),
      VecExprs.l2Sq(col("a"), col("b")).as("e_l2"),
      VectorOps.l2DistSqHof(col("a"), col("b")).as("h_l2"),
      VecExprs.absDot(col("a"), col("d")).as("e_abs"),
      VectorOps.cushionL1(VectorOps.vabs(col("a")), col("d")).as("h_abs"),
      VecExprs.hoeffSum(col("a"), col("d")).as("e_hs"),
      VectorOps.cushionHoeffNorm2(col("a"), col("d")).as("h_hs"),
      VecExprs.hoeffDiffSum(col("a"), col("b"), col("d")).as("e_hd"),
      VectorOps.cushionHoeffNorm2Diff(col("a"), col("b"), col("d")).as("h_hd"),
      VecExprs.lbSymE(col("a"), col("b"), col("d")).as("e_sym"),
      VectorOps.lbSym(VectorOps.vdiff(col("a"), col("b")), col("d")).as("h_sym"),
      VecExprs.lbTzE(col("a"), col("b"), col("d")).as("e_tz"),
      VectorOps.lbTz(VectorOps.vdiff(col("a"), col("b")), col("d"), col("b")).as("h_tz"))
    cmp.collect().zipWithIndex.foreach { case (r, i) =>
      for (j <- 0 until 14 by 2) {
        val e = r.getDouble(j); val h = r.getDouble(j + 1)
        assert(java.lang.Double.doubleToRawLongBits(e) ==
          java.lang.Double.doubleToRawLongBits(h),
          s"row $i field $j: codegen $e != hof $h")
      }
    }
  }

  test("multiple folds in one projection compile under forced codegen") {
    // fallback=false turns any Janino failure (e.g. colliding local
    // names when several folds share one generated method) into a hard
    // error instead of a silent interpreted-mode regression
    val strict = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .appName("codegen-strict").getOrCreate()
    try {
      import strict.implicits._
      val df = Seq((Array(1f, 2f), Array(3f, 4f), Array(0.5f, 1f)))
        .toDF("a", "b", "d")
      val r = df.select(
        VecExprs.dotD(col("a"), col("b")).as("v1"),
        VecExprs.l2Sq(col("a"), col("b")).as("v2"),
        VecExprs.absDot(col("a"), col("d")).as("v3"),
        VecExprs.hoeffSum(col("a"), col("d")).as("v4"),
        VecExprs.hoeffDiffSum(col("a"), col("b"), col("d")).as("v5"),
        VecExprs.lbSymE(col("a"), col("b"), col("d")).as("v6"),
        VecExprs.lbTzE(col("a"), col("b"), col("d")).as("v7")).collect()(0)
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
    } finally {
      strict.conf.unset("spark.sql.codegen.fallback")
      strict.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("folds compile where the generated input-row local is named 'i'") {
    // GenerateUnsafeProjection / GeneratePredicate bind the input row to a
    // local named `i` (CodegenContext.INPUT_ROW) and have NO interpreted
    // fallback — a fixed-name generated local (even brace-scoped: Java
    // forbids shadowing an enclosing local) fails Janino right here.
    // Regression test for the round-1 "Redefinition of local variable i"
    // bug that silently dropped the hot N x Q plans to interpreted mode.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GreaterThan, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.{GeneratePredicate, GenerateUnsafeProjection}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arrT = ArrayType(FloatType, containsNull = false)
    def ref(ord: Int) = BoundReference(ord, arrT, nullable = false)
    val exprs = Seq(
      VecExprs.DotD(ref(0), ref(1)),
      VecExprs.L2Sq(ref(0), ref(1)),
      VecExprs.AbsDot(ref(0), ref(2)),
      VecExprs.HoeffSum(ref(0), ref(2)),
      VecExprs.HoeffDiffSum(ref(0), ref(1), ref(2)),
      VecExprs.LbSymE(ref(0), ref(1), ref(2)),
      VecExprs.LbTzE(ref(0), ref(1), ref(2)))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws on Janino error
    val row = InternalRow(
      ArrayData.toArrayData(Array(1f, 2f)),
      ArrayData.toArrayData(Array(3f, 4f)),
      ArrayData.toArrayData(Array(0.5f, 1f)))
    val out = proj(row)
    assert(out.getDouble(0) == 11.0) // 1*3 + 2*4
    assert(out.getDouble(1) == 8.0)  // 4 + 4
    val pred = GeneratePredicate.generate(
      GreaterThan(VecExprs.DotD(ref(0), ref(1)), Literal(0.0)))
    assert(pred.eval(row))
  }

  test("length mismatch raises in both eval modes") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arrT = ArrayType(FloatType, containsNull = false)
    val e = VecExprs.DotD(
      BoundReference(0, arrT, nullable = false),
      BoundReference(1, arrT, nullable = false))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1f, 2f, 3f)),
      ArrayData.toArrayData(Array(1f, 2f)))
    intercept[IllegalArgumentException] { e.eval(row) }
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    intercept[IllegalArgumentException] { proj(row) }
  }

  test("interpreted eval matches codegen path") {
    // force interpreted evaluation by filtering through a literal Dataset op
    val df = randomRows(200, 8, 11)
    val viaExpr = df.select(VecExprs.dotD(col("a"), col("b")).as("v")).collect().map(_.getDouble(0))
    val rows = df.select(col("a"), col("b")).collect()
    rows.zip(viaExpr).foreach { case (r, v) =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      var acc = 0.0
      for (i <- a.indices) acc += a(i).toDouble * b(i).toDouble
      assert(java.lang.Double.doubleToRawLongBits(acc) ==
        java.lang.Double.doubleToRawLongBits(v))
    }
  }
}

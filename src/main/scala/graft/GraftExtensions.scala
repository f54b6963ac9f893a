package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.VecExprs._

/**
 * SQL surface for the engine's vector kernels: registers the codegen'd
 * fold expressions as SQL functions, so `spark.sql` / JDBC users can run
 * the scoring primitives without the Scala DSL.
 *
 * Two registration paths:
 *  - config: `spark.sql.extensions=graft.GraftExtensions`
 *  - runtime: `GraftExtensions.register(spark)`
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          builder(exprs)
        }))
    }
}

object GraftExtensions {
  /** (sql name, arity, builder) for every exposed kernel. */
  val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",       2, (e: Seq[Expression]) => DotD(e(0), e(1))),
    ("graft_l2sq",      2, (e: Seq[Expression]) => L2Sq(e(0), e(1))),
    ("graft_absdot",    2, (e: Seq[Expression]) => AbsDot(e(0), e(1))),
    ("graft_hoeff",     2, (e: Seq[Expression]) => HoeffSum(e(0), e(1))),
    ("graft_hoeffdiff", 3, (e: Seq[Expression]) => HoeffDiffSum(e(0), e(1), e(2))),
    ("graft_lb_sym",    3, (e: Seq[Expression]) => LbSymE(e(0), e(1), e(2))),
    ("graft_lb_tz",     3, (e: Seq[Expression]) => LbTzE(e(0), e(1), e(2))))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          builder(exprs)
        },
        "scala_udf")
    }
}

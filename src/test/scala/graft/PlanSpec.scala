package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/**
 * Plan-shape regression tests: the scale properties we rely on must be
 * visible in the optimized physical plan, not just hoped for.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("window top-K gets map-side WindowGroupLimit pushdown (partial before exchange)") {
    val plan = SparkEntry.qTopkCos(spark, dir).queryExecution.executedPlan.toString
    // Catalyst's InferWindowGroupLimit turns rank<=k into a bounded
    // per-partition group limit ahead of the shuffle — the built-in
    // equivalent of a custom partial top-K strategy (SURVEY §7 stretch).
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"), s"no partial pushdown in:\n$plan")
  }

  test("query side of the cross join is broadcast") {
    val plan = SparkEntry.qTopkCos(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"queries not broadcast:\n$plan")
  }

  test("codegen fold expressions appear in the scoring projection") {
    val plan = SparkEntry.qTopkCos(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("dotd("), s"codegen dot not in plan:\n$plan")
  }

  test("fixture scan prunes lineitem to the two key columns") {
    val plan = SparkEntry.qTopkCos(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"),
      s"scan not pruned:\n$plan")
  }
}

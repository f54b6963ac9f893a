package graft

import org.apache.spark.sql.SparkSession

/**
 * Scheduler-pool propagation for parallel-collection fan-outs.
 *
 * Spark job-group/pool assignment is a THREAD-LOCAL property inherited at
 * thread-creation time. Scala parallel collections run bodies on shared
 * ForkJoin worker threads created lazily by whichever computation first
 * grew the pool — so jobs submitted inside a `.par` body land in the
 * default pool (or a stale one), silently defeating per-query FAIR
 * isolation. Capture the caller's pool and re-assert it inside each task.
 */
object Sched {
  def currentPool(spark: SparkSession): String =
    spark.sparkContext.getLocalProperty("spark.scheduler.pool")

  /** Run `body` with the given pool set on the current (worker) thread.
    * `pool == null` clears the property (default pool). The previous pool
    * is restored on exit — ForkJoin workers are shared, so a leaked pool
    * would silently re-route whatever runs next on the same thread. */
  def inPool[T](spark: SparkSession, pool: String)(body: => T): T = {
    val prev = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    try body
    finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", prev)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/**
 * Local profiling aid (optimization rounds): run named queries several
 * times inside ONE JVM so steady-state per-query times are attributable
 * (the cold-JVM BENCH_ONLY path has ±50% noise from sbt/JIT/session
 * startup, which drowns per-operator deltas).
 *
 * Not a driver surface: the bench contract (`graft.Bench`) is untouched.
 *
 *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
 *     sbt "runMain graft.ProfileQ q_a,q_b [reps] [planOutDir]"
 *
 * Prints one line per (query, rep): `[profile] name rep t_sec`. With a
 * planOutDir, also writes `<dir>/<name>.txt` — the explain("formatted")
 * of the query AFTER a run (AQE-finalized), the artifact the
 * `plans/r18/` deliverables are built from.
 */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val planDir = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      // mirror Bench's perf configs (r18 advice: profiles must be taken
      // under the same planner conditions as the bench they guide)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietBoundedWindowWarning()
    names.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      (1 to reps).foreach { rep =>
        spark.sparkContext.setJobDescription(s"$name rep $rep")
        val s0 = System.nanoTime()
        val (df, release) = graft.operators.Dedup.scopedRelease(
          SparkEntry.queries(name)(spark, sfDir))
        try df.count() finally release()
        println(f"[profile] $name $rep ${(System.nanoTime() - s0) / 1e9}%.2f")
      }
      planDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        // re-run once more so the captured plan is AQE-finalized
        val (df, release) = graft.operators.Dedup.scopedRelease(
          SparkEntry.queries(name)(spark, sfDir))
        try {
          // collect() (not count()) so df's OWN AdaptiveSparkPlan executes
          // and finalizes — count() builds a separate aggregate execution
          // and leaves df.queryExecution un-finalized. Bounded: every
          // declared query returns a small ledger/top-k relation (Verify
          // dumps them all), so the pull is driver-safe.
          df.collect()
          val raw = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$name.txt"),
            raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } finally release()
      }
    }
    spark.stop()
  }
}

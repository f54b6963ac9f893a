package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parameter-sweep harness (reference `sweep_and_plot`,
 * `/root/reference/ANNCode.py:729-789`): run the accounting metrics for a
 * grid of (mode, keepM [, delta]) configurations and union the rows into
 * one `metrics` DataFrame — the artifact's CSV result table. Plots are
 * presentation, not engine surface; [[writeCsv]] is the K1 sink.
 */
object Sweep {

  final case class Grid(
      modes: Seq[String] = Refine.Modes,
      keepMs: Seq[Int] = Seq(4, 6, 8),
      deltas: Seq[Double] = Seq(0.7),   // Hoeffding modes only
      k: Int = 10)

  /** All-config metrics table: (mode, m_keep, delta, recall, save, fpr). */
  def run(vectors: Int => DataFrame, queries: DataFrame, d: Int,
          grid: Grid): DataFrame = {
    val configs = for {
      m <- grid.modes
      km <- grid.keepMs
      dl <- if (m.endsWith("hoeff")) grid.deltas else Seq(grid.deltas.head)
    } yield Refine.Params(m, k = grid.k, keepM = km, delta = dl)
    import scala.collection.parallel.CollectionConverters._
    configs.par.map { p =>
      // vectors is keyed by keepM: reduced copy + delta depend on it
      Refine.metrics(vectors(p.keepM), queries, p, d)
    }.toList.reduce(_ unionByName _)
  }

  /** K1 sink: the sweep CSV (`ANNCode.py:733-735, 779-780`). */
  def writeCsv(metrics: DataFrame, path: String): Unit =
    metrics.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}

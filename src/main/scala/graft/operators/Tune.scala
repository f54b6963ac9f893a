package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Hoeffding-delta tuning (paper §4.1-4.2: "delta grid-searched per
 * dataset" over a log grid in [1e-12, 1e-1] to hit a recall floor).
 * Returns the full grid's metrics plus a `chosen` flag on the row with
 * the highest bandwidth saving among those meeting the floor (falling
 * back to the highest-recall row if none do).
 */
object Tune {

  val DefaultGrid: Seq[Double] =
    Seq(1e-12, 1e-9, 1e-6, 1e-3, 1e-2, 5e-2, 1e-1, 3e-1, 7e-1)

  def tuneDelta(vectors: DataFrame, queries: DataFrame, mode: String,
                k: Int, keepM: Int, d: Int, recallFloor: Double,
                grid: Seq[Double] = DefaultGrid): DataFrame = {
    require(mode.endsWith("hoeff"), s"delta tuning only applies to Hoeffding modes, got $mode")
    val spark = vectors.sparkSession
    val p0 = Refine.Params(mode, k = k, keepM = keepM)
    val gt = Refine.exactTopK(vectors, queries, p0).cache()
    gt.count()
    import scala.collection.parallel.CollectionConverters._
    val rows =
      try
        grid.par.map { dl =>
          Refine.metrics(vectors, queries, p0.copy(delta = dl), d,
            groundTruth = Some(gt)).collect()(0)
        }.toList
      finally gt.unpersist(blocking = false)

    val meeting = rows.filter(_.getDouble(3) >= recallFloor)
    val chosen =
      if (meeting.nonEmpty) meeting.maxBy(_.getDouble(4))   // max saving
      else rows.maxBy(_.getDouble(3))                       // best recall
    import spark.implicits._
    rows.map { r =>
      (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r == chosen)
    }.toDF("mode", "m_keep", "delta", "recall", "save", "fpr", "chosen")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecExprs

/**
 * IVF (inverted-file) index over the embedding column: a fixed coarse
 * quantizer of `nCells` deterministic centroids; every vector is assigned
 * to its nearest cell map-side (no shuffle), and a query scans only its
 * `nprobe` closest cells.
 *
 * At 100 TB the assignment is a write-time partition/bucket key: the
 * table is laid out by cell, so probe-cell pruning becomes Parquet
 * partition pruning and each query touches nprobe/nCells of the data.
 * Here cells stay a column and the probe join is an equi-join on cell.
 *
 * Centroids are dyadic rationals (k/512 in [-1,1)) derived from the same
 * portable hash as the fixtures, so the DuckDB oracle reproduces the
 * assignment bit-for-bit (distance terms are exact products folded in a
 * fixed order).
 */
object Ivf {

  /** Deterministic dyadic centroid component for (cell, j). */
  def centroidComponent(cell: Int, j: Int): Double = {
    val h = (cell.toLong * Dedup.AMul + (j + 1).toLong * 48271L) % 2147483647L
    ((h % 1024L) - 512L).toDouble / 512.0
  }

  def centroid(cell: Int, d: Int): Array[Float] =
    Array.tabulate(d)(j => centroidComponent(cell, j).toFloat)

  /** d2-to-centroid columns c0..c{n-1} (codegen L2 fold vs literal). */
  private def cellDists(vecCol: Column, nCells: Int, d: Int): Seq[Column] =
    (0 until nCells).map { c =>
      VecExprs.l2Sq(vecCol, typedlit(centroid(c, d).toSeq)).as(s"c$c")
    }

  /** argmin over the c0.. columns, ties to the smaller cell id. */
  private def argminCell(nCells: Int): Column = {
    val m = least((0 until nCells).map(c => col(s"c$c")): _*)
    (0 until nCells).foldRight(lit(-1)) { (c, rest) =>
      when(col(s"c$c") === m, lit(c)).otherwise(rest)
    }
  }

  /** (id, embedding, cell): map-side nearest-centroid assignment. */
  def assign(emb: DataFrame, nCells: Int, d: Int): DataFrame =
    emb.select(col("vec_id").as("id") +: col("embedding") +:
        cellDists(col("embedding"), nCells, d): _*)
      .withColumn("cell", argminCell(nCells))
      .select(col("id"), col("embedding"), col("cell"))

  /** (qid, cell, proberank): each query's nprobe nearest cells. */
  def probeCells(queries: DataFrame, nCells: Int, d: Int, nprobe: Int): DataFrame = {
    val withD = queries.select(col("qid") +: col("qvec") +:
      cellDists(col("qvec"), nCells, d): _*)
    // unpivot cell distances to rows, rank, keep nprobe
    val stacked = withD.select(col("qid"), col("qvec"),
      explode(array((0 until nCells).map(c =>
        struct(lit(c).as("cell"), col(s"c$c").as("d2"))): _*)).as("p"))
      .select(col("qid"), col("qvec"), col("p.cell"), col("p.d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    stacked.withColumn("proberank", row_number().over(w))
      .filter(col("proberank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell"))
  }

  /**
   * IVF cosine top-k: candidates restricted to the query's probe cells.
   * Output (qid, rank, id, score) — approximate by construction (recall
   * governed by nprobe/nCells).
   */
  def topk(emb: DataFrame, nq: Int, k: Int, nCells: Int, d: Int,
           nprobe: Int): DataFrame = {
    val assigned = assign(emb, nCells, d)
      .withColumn("n2", graft.functions.VectorOps.norm2Sq(col("embedding")))
    val q = Ann.queriesOf(emb, nq)
      .select(col("qid"), col("qvec"), col("qn2"))
    val probes = broadcast(probeCells(q, nCells, d, nprobe)
      .join(q.select(col("qid"), col("qn2")), Seq("qid")))
    val scored = assigned.join(probes, Seq("cell"))
      .withColumn("score",
        graft.functions.VectorOps.dot(col("embedding"), col("qvec")) /
          (graft.functions.VectorOps.fnorm(col("n2")) *
            graft.functions.VectorOps.fnorm(col("qn2"))))
    TopK.window(scored, k)
  }
}
